"""One-off per-phase diagnosis of the two-cluster-size scaling gap.

Runs the same child protocol as tools/bench_scaling.py (taskset-pinned
local-cluster, tmpfs storage, forced-distributed CC lane) but with
ALA_SPARK_PHASE_TIMING=1, one warm-up and one timed run, printing the
per-phase wall so the non-scaling component is visible directly.

Usage: python tools/diag_scaling.py [n_turns] [execs]
"""

from __future__ import annotations

import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from bench_scaling import CORES_PER_EXEC, EXEC_MEM_MB, STORAGE_DIR, _cpu_budget_prefix

CHILD = r"""
import json, os, shutil, sys, tempfile, time
sys.path.insert(0, ".")
os.environ["ALA_SPARK_DRIVER_CC_MAX_EDGES"] = "0"
os.environ["ALA_SPARK_PHASE_TIMING"] = "1"
from ala_name_matching_spark.plans.pipeline import run_pipeline
from ala_name_matching_spark.session import get_spark
from ala_name_matching_spark.sources.checkpoints import CheckpointManager
from ala_name_matching_spark.sources.transcripts import synthesize_transcripts

n_turns, execs, cores_per, mem_mb = (int(x) for x in sys.argv[1:5])
storage = sys.argv[5] if len(sys.argv) > 5 and sys.argv[5] != "-" else None
work = tempfile.mkdtemp(prefix=f"scalediag_{execs}x{cores_per}_", dir=storage)
spark = get_spark(
    "scalediag", master=f"local-cluster[{execs},{cores_per},{mem_mb}]",
    extra_conf={
        "spark.local.dir": f"{work}/spark-local",
        "spark.sql.files.maxPartitionBytes": str(8 * 1024 * 1024),
        "spark.speculation": "true",
        "spark.speculation.multiplier": "6",
        "spark.speculation.quantile": "0.95",
        "spark.speculation.minTaskRuntime": "10s",
    },
)
inp = f"{work}/input"
synthesize_transcripts(spark, n_turns, partitions=64).drop(
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
    shutil.rmtree(ckdir, ignore_errors=True)
    return n, w


print("== warmup ==", flush=True)
one_run("warm0")
print("== timed ==", flush=True)
n, w = one_run("t0")
shutil.rmtree(work, ignore_errors=True)
print(json.dumps({"executors": execs, "rows": n, "wall_sec": round(w, 3),
                  "turns_per_sec": round(n_turns / w, 1)}))
spark.stop()
"""


def main():
    n_turns = int(sys.argv[1]) if len(sys.argv) > 1 else 9_600_000
    execs = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    out = subprocess.run(
        _cpu_budget_prefix(execs)
        + [sys.executable, "-c", CHILD, str(n_turns), str(execs),
           str(CORES_PER_EXEC), str(EXEC_MEM_MB), STORAGE_DIR or "-"],
        capture_output=True, text=True,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        timeout=3600,
    )
    print(out.stdout)
    if out.returncode != 0:
        print(out.stderr[-4000:])
    return out.returncode


if __name__ == "__main__":
    raise SystemExit(main())
