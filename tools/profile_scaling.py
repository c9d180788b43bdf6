"""Per-phase profile of one pipeline run at a given executor count.

Companion to bench_scaling.py: same cluster/child setup, but prints the
[phase]/[cc] timing lines (ALA_SPARK_PHASE_TIMING=1) for every run so the
non-scaling component of the two-cluster-size criterion can be located.

Usage: python tools/profile_scaling.py [n_turns] [execs] [n_warm] [n_timed]
"""

from __future__ import annotations

import os
import subprocess
import sys

from bench_scaling import CORES_PER_EXEC, EXEC_MEM_MB, STORAGE_DIR  # noqa: E402

CHILD = r"""
import json, shutil, sys, tempfile, time
sys.path.insert(0, ".")
from ala_name_matching_spark.plans.pipeline import run_pipeline
from ala_name_matching_spark.session import get_spark
from ala_name_matching_spark.sources.checkpoints import CheckpointManager
from ala_name_matching_spark.sources.transcripts import synthesize_transcripts

n_turns, execs, cores_per, mem_mb, n_warm, n_timed = (int(x) for x in sys.argv[1:7])
storage = sys.argv[7] if len(sys.argv) > 7 and sys.argv[7] != "-" else None
total_cores = execs * cores_per
work = tempfile.mkdtemp(prefix=f"scaleprof_{execs}x{cores_per}_", dir=storage)
spark = get_spark(
    "scaleprof", master=f"local-cluster[{execs},{cores_per},{mem_mb}]",
    extra_conf={
        "spark.local.dir": f"{work}/spark-local",
        "spark.sql.files.maxPartitionBytes": str(8 * 1024 * 1024),
        # identical to bench_scaling: only fire for order-of-magnitude
        # stragglers/hangs (lower multipliers duplicated healthy CPU-bound
        # tasks on the saturated host and doubled p4's wall time)
        "spark.speculation": "true",
        "spark.speculation.multiplier": "6",
        "spark.speculation.quantile": "0.95",
        "spark.speculation.minTaskRuntime": "10s",
    },
)
inp = f"{work}/input"
synthesize_transcripts(spark, n_turns, partitions=total_cores * 2).drop(
    "entity_id"
).write.mode("overwrite").parquet(inp)
t = spark.read.parquet(inp)


def one_run(tag):
    ckdir = f"{work}/ck_{tag}"
    ck = CheckpointManager(spark, ckdir, enabled=True)
    t0 = time.time()
    out = run_pipeline(t, checkpoints=ck)
    n = ck.row_count("p6_clusters")
    if n is None:
        n = out.count()
    w = time.time() - t0
    print(f"[run {tag}] wall={w:.2f}s rows={n}", flush=True)
    shutil.rmtree(ckdir, ignore_errors=True)
    return n, w


for i in range(n_warm):
    one_run(f"warm{i}")
for i in range(n_timed):
    one_run(f"t{i}")
shutil.rmtree(work, ignore_errors=True)
spark.stop()
"""


def main():
    n_turns = int(sys.argv[1]) if len(sys.argv) > 1 else 9_600_000
    execs = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    n_warm = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    n_timed = int(sys.argv[4]) if len(sys.argv) > 4 else 1
    from bench_scaling import _cpu_budget_prefix

    env = dict(os.environ, ALA_SPARK_PHASE_TIMING="1")
    proc = subprocess.Popen(
        _cpu_budget_prefix(execs)
        + [sys.executable, "-c", CHILD, str(n_turns), str(execs),
           str(CORES_PER_EXEC), str(EXEC_MEM_MB), str(n_warm), str(n_timed),
           STORAGE_DIR or "-"],
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        env=env,
        stdout=subprocess.PIPE,
        stderr=subprocess.DEVNULL,
        text=True,
    )
    for line in proc.stdout:
        if line.startswith(("[phase]", "[cc]", "[run", "[ckpt]")):
            print(line, end="", flush=True)
    proc.wait()
    return proc.returncode


if __name__ == "__main__":
    raise SystemExit(main())
