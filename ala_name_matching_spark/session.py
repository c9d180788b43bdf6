"""SparkSession factory tuned for the ER pipeline.

Local-mode testing on local[N]; the same configs are what we would pass to
spark-submit on a real cluster (AQE, Arrow, skew-join). Shuffle partitions
default to the core count — at 100 TB production scale this would be set to
~2-3x total executor cores and AQE coalescing handles the rest.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def er_conf(shuffle_partitions: int | None = None) -> dict:
    """The engine's standard Spark conf, master-agnostic.

    These are exactly the `--conf` flags the production `spark-submit
    --py-files` invocation passes (jobs/run_er.py); get_spark() applies the
    same dict for in-process sessions so tests, benches, and cluster runs
    execute under one configuration.
    """
    conf = {
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.coalescePartitions.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.session.timeZone": "UTC",
        "spark.sql.execution.arrow.pyspark.enabled": "true",
        "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
    }
    if shuffle_partitions is not None:
        conf["spark.sql.shuffle.partitions"] = str(shuffle_partitions)
    return conf


def iceberg_conf(
    catalog: str = "er",
    warehouse: str = "/tmp/er_warehouse",
    jars_package: str = "org.apache.iceberg:iceberg-spark-runtime-4.0_2.13:1.10.0",
) -> dict:
    """Spark conf for the production Iceberg deployment (north_rule input).

    This container ships no Iceberg runtime jar (verified by
    tests/test_iceberg_plumbing.py), so these keys are exercised only as
    configuration plumbing here; on a cluster with the runtime jar the same
    dict makes `--format iceberg` in jobs/run_er.py read/write real Iceberg
    tables and CheckpointManager's parquet+_SUCCESS phases become snapshot
    commits (sources/checkpoints.py module docstring maps each method).
    """
    return {
        "spark.jars.packages": jars_package,
        "spark.sql.extensions": (
            "org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions"
        ),
        f"spark.sql.catalog.{catalog}": "org.apache.iceberg.spark.SparkCatalog",
        f"spark.sql.catalog.{catalog}.type": "hadoop",
        f"spark.sql.catalog.{catalog}.warehouse": warehouse,
    }


def get_spark(
    app_name: str = "ala_name_matching_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    master = master or f"local[{cpus}]"
    executor_memory = None
    if shuffle_partitions is None:
        # local[N] -> N; local-cluster[e,c,m] -> e*c; "local[*]"/yarn -> cpus
        inner = master[master.find("[") + 1 : master.find("]")] if "[" in master else ""
        if "," in inner:  # local-cluster[execs, cores_per_exec, mem_mb]
            execs, cores_per, mem_mb = (int(x) for x in inner.split(","))
            shuffle_partitions = execs * cores_per
            executor_memory = f"{max(512, mem_mb - 512)}m"
        else:
            shuffle_partitions = cpus if inner in ("", "*") else int(inner)

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "24g"))
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
    )
    for k, v in er_conf(shuffle_partitions).items():
        builder = builder.config(k, v)
    if executor_memory is not None:
        builder = builder.config("spark.executor.memory", executor_memory)
    if master.startswith("local-cluster"):
        # Multi-JVM executors spawn their own python workers, which need the
        # package importable (the spark-submit --py-files analog; plain
        # local[N] shares the driver's sys.path so this is a no-op there).
        import sys as _sys

        repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        builder = (
            builder.config("spark.executorEnv.PYTHONPATH", repo_root)
            .config("spark.pyspark.python", _sys.executable)
        )
        # On a real cluster each executor is container/cgroup-limited to its
        # granted cores; on one shared host every executor JVM sees ALL host
        # CPUs and sizes its GC/JIT/netty pools host-wide, so a "2-core"
        # executor quietly borrows extra cores -- which distorts any
        # cluster-size scaling measurement. Cap the JVM's visible processor
        # count (and the python workers' BLAS/OMP pools) at the granted
        # cores, like the production container boundary does.
        inner = master[master.find("[") + 1 : master.find("]")]
        if "," in inner:
            cores_per = int(inner.split(",")[1])
            # ParallelGC: with ActiveProcessorCount=2 G1's concurrent cycles
            # fall behind on allocation-heavy batch stages and degenerate
            # into multi-second mixed pauses (observed as 2-4x run-to-run
            # variance); the throughput collector is the standard choice for
            # small-core batch executors. Bigger code cache: Spark codegen
            # churns JIT-compiled classes and a full code cache silently
            # disables compilation mid-run.
            builder = (
                builder.config(
                    "spark.executor.extraJavaOptions",
                    f"-XX:ActiveProcessorCount={cores_per} "
                    "-XX:+UseParallelGC -XX:ReservedCodeCacheSize=512m",
                )
                .config("spark.executorEnv.OMP_NUM_THREADS", "1")
                .config("spark.executorEnv.OPENBLAS_NUM_THREADS", "1")
                .config("spark.executorEnv.ARROW_CPU_COUNT", str(cores_per))
            )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
