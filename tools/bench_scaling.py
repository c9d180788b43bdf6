"""Two-parallelism scaling evidence (north_rule; see BASELINE.md protocol).

Runs the identical ER pipeline on the identical synthesized input at
local[N] and local[4N] (default N=8) in separate subprocesses (clean JVMs),
reports turns/sec at both and scaling efficiency
    eff = (throughput_4N / throughput_N) / 4
and writes BENCH/BASELINE.md. Acceptance: eff >= 0.8.

Usage: python tools/bench_scaling.py [n_turns] [N]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

CHILD = r"""
import json, sys, time
sys.path.insert(0, ".")
from ala_name_matching_spark.plans.pipeline import run_pipeline
from ala_name_matching_spark.session import get_spark
from ala_name_matching_spark.sources.transcripts import synthesize_transcripts

n_turns, cores = int(sys.argv[1]), int(sys.argv[2])
spark = get_spark("scalebench", master=f"local[{cores}]", shuffle_partitions=cores)
t = synthesize_transcripts(spark, n_turns, partitions=cores * 2).cache()
t.count()  # materialize input outside the timed window
t0 = time.time()
out = run_pipeline(t.drop("entity_id"))
n = out.count()
wall = time.time() - t0
print(json.dumps({"cores": cores, "rows": n, "wall_sec": round(wall, 3),
                  "turns_per_sec": round(n_turns / wall, 1)}))
spark.stop()
"""


def run(n_turns: int, cores: int) -> dict:
    out = subprocess.run(
        [sys.executable, "-c", CHILD, str(n_turns), str(cores)],
        capture_output=True,
        text=True,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        timeout=3600,
    )
    last = [l for l in out.stdout.strip().splitlines() if l.startswith("{")]
    if not last:
        raise RuntimeError(f"child failed (cores={cores}):\n{out.stderr[-3000:]}")
    return json.loads(last[-1])


def main():
    n_turns = int(sys.argv[1]) if len(sys.argv) > 1 else 150_000
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    a = run(n_turns, n)
    b = run(n_turns, 4 * n)
    eff = (b["turns_per_sec"] / a["turns_per_sec"]) / 4
    result = {
        "n_turns": n_turns,
        "run_A": a,
        "run_B": b,
        "scaling_efficiency": round(eff, 3),
        "acceptance": "eff >= 0.8",
        "pass": eff >= 0.8,
    }
    print(json.dumps(result, indent=1))
    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/BASELINE.md", "w") as fh:
        fh.write(
            "# BENCH/BASELINE -- two-parallelism scaling evidence (north_rule)\n\n"
            "Same job, same input, two local parallelism levels (sandbox protocol\n"
            "from BASELINE.md; no real cluster available):\n\n"
            f"- input: {n_turns} synthesized transcript turns (seed=42, deterministic)\n"
            f"- run A: local[{a['cores']}] -> {a['turns_per_sec']} turns/sec "
            f"(wall {a['wall_sec']} s)\n"
            f"- run B: local[{b['cores']}] -> {b['turns_per_sec']} turns/sec "
            f"(wall {b['wall_sec']} s)\n\n"
            f"scaling efficiency = ({b['turns_per_sec']} / {a['turns_per_sec']}) / 4 "
            f"= **{eff:.3f}** (acceptance >= 0.8: {'PASS' if eff >= 0.8 else 'FAIL'})\n"
        )
    return 0 if eff >= 0.8 else 1


if __name__ == "__main__":
    raise SystemExit(main())
