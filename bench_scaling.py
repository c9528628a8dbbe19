"""Scaling-efficiency evidence for the north rule (N → 4N ≥ 0.8).

No real cluster exists in the sandbox, so the same CDC apply job runs
at two parallelism levels — local[8] and local[32] (N and 4N cores) —
each in a FRESH JVM (subprocess), same deterministic input (seed 42).
Reported: events/s at both levels + scaling efficiency
  eff = throughput(4N) / (4 × throughput(N)).

Run:  python bench_scaling.py [n_events]  (default 2,000,000)
Appends a result block to BENCH.md.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

WORKER = r"""
import json, os, shutil, sys, tempfile, time
sys.path.insert(0, %(repo)r)
os.environ["SPARK_GRAFT_CPUS"] = str(%(cpus)d)
os.environ["SPARK_GRAFT_DRIVER_MEM"] = "40g"
from pyspark.sql import functions as F
from streaming_data_pipeline_spark.session import get_spark
from streaming_data_pipeline_spark.plans.lake import SnapshotTable
from streaming_data_pipeline_spark.schemas import LAKE_BASE
from streaming_data_pipeline_spark.sources.changegen import generate_changes
from streaming_data_pipeline_spark.streaming.apply import apply_changes

CPUS = %(cpus)d
N = %(n_events)d
EPOCHS = %(epochs)d
spark = get_spark(f"scale-{CPUS}", shuffle_partitions=CPUS * 2)
changes = generate_changes(
    spark, N, seed=42, n_repos=5000, paths_per_repo=500,
    events_per_epoch=N // EPOCHS, invalid_ratio=0.05, duplicate_ratio=0.02,
    out_of_order_ratio=0.05, delete_ratio=0.05, content_repeat=2,
    evolve_payload_at_epoch=2, partitions=CPUS * 3,
)
tmp = tempfile.mkdtemp(prefix=f"sdp_scale_{CPUS}_")
try:
    table = SnapshotTable.create(f"{tmp}/lake", LAKE_BASE, n_buckets=64)
    spark.range(10000).select(F.sha2(F.col("id").cast("string"), 256)).count()  # warmup
    t0 = time.time()
    applied = 0
    for ep in range(EPOCHS + 2):
        stats = apply_changes(spark, table, changes.filter(F.col("epoch") == ep), ep)
        applied += stats.get("source_rows", 0)
    dt = time.time() - t0
    print("RESULT " + json.dumps({"cpus": CPUS, "sec": round(dt, 2),
                                  "events": N, "applied": applied,
                                  "events_per_sec": round(N / dt, 1)}))
finally:
    shutil.rmtree(tmp, ignore_errors=True)
"""


def run(cpus: int, n_events: int, epochs: int) -> dict:
    repo = os.path.dirname(os.path.abspath(__file__))
    code = WORKER % {"repo": repo, "cpus": cpus, "n_events": n_events, "epochs": epochs}
    p = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, timeout=3600
    )
    for line in p.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(f"worker {cpus} failed:\n{p.stdout[-2000:]}\n{p.stderr[-3000:]}")


def main() -> None:
    n_events = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    epochs = 4
    r8 = run(8, n_events, epochs)
    r32 = run(32, n_events, epochs)
    eff = round(r32["events_per_sec"] / (4 * r8["events_per_sec"]), 3)
    out = {"n_events": n_events, "local8": r8, "local32": r32, "scaling_efficiency_8_to_32": eff}
    print(json.dumps(out, indent=1))
    block = (
        f"\n## Scaling run (n={n_events:,}, epochs={epochs}, seed=42)\n\n"
        f"| cores | sec | events/s |\n|---|---|---|\n"
        f"| local[8] (N) | {r8['sec']} | {r8['events_per_sec']:,} |\n"
        f"| local[32] (4N) | {r32['sec']} | {r32['events_per_sec']:,} |\n\n"
        f"**Scaling efficiency N→4N: {eff}** (target ≥ 0.8)\n"
    )
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH.md"), "a") as f:
        f.write(block)


if __name__ == "__main__":
    main()
