"""Round-6 profiling harness (NOT the graded bench — bench.py is frozen).

Modes:
  explain <outdir> [names...]   capture .explain("formatted") for headline
                                queries into <outdir>/<name>.txt
  time [names...]               noop-sink isolated per-query timing (guide §1.4)
  cdc [mor|cow|stream ...]      run just the CDC sections once with
                                SDP_PHASE_TIMING=1 phase breakdown

Uses the same session/config as bench.py so numbers are comparable.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

HEADLINE = [
    "cdc_final_state",
    "cdc_lww_dedup",
    "q1_pricing_summary",
    "top_customers_by_revenue",
    "user_top3_events",
    "dedup_exact",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "text_quality",
    "ann_cosine_topk",
    "ann_lsh",
    "ann_ivf",
    "dedup_clusters",
    "multimodal_decode",
]


def get_session():
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g")
    from streaming_data_pipeline_spark.session import get_spark

    return get_spark("sdp-profile", shuffle_partitions=CPUS * 2)


def main() -> None:
    mode = sys.argv[1] if len(sys.argv) > 1 else "time"
    import __spark_entry__ as entrymod

    qs = {**entrymod.queries(), **entrymod.bench_extra_queries()}
    spark = get_session()
    spark.range(1000).count()

    if mode == "explain":
        outdir = sys.argv[2]
        names = sys.argv[3:] or HEADLINE
        os.makedirs(outdir, exist_ok=True)
        for name in names:
            df = qs[name](spark, SF_DIR)
            txt = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            with open(os.path.join(outdir, f"{name}.txt"), "w") as f:
                f.write(txt)
            print(f"wrote {name} ({len(txt)} chars)")
        return

    if mode == "time":
        names = sys.argv[2:] or HEADLINE
        # warm like bench.py
        warm_sf = "/root/testdata/sf0.001"
        if not os.path.isdir(warm_sf):
            warm_sf = SF_DIR
        qs["cdc_final_state"](spark, warm_sf).count()
        timings = {}
        for _rep in range(3):
            for name in names:
                spark.sparkContext.setJobDescription(f"profile:{name}")
                t0 = time.time()
                df = qs[name](spark, SF_DIR)
                df.write.format("noop").mode("overwrite").save()
                timings.setdefault(name, []).append(round(time.time() - t0, 3))
                spark.sparkContext.setJobDescription(None)
        out = {
            n: {"median": sorted(ts)[len(ts) // 2], "samples": ts}
            for n, ts in timings.items()
        }
        print(json.dumps(out, indent=1))
        return

    if mode == "cdc":
        import shutil

        os.environ["SDP_PHASE_TIMING"] = "1"
        import bench as benchmod

        sections = sys.argv[2:] or ["mor", "cow", "stream"]
        wal_tmp = tempfile.mkdtemp(prefix="sdp_prof_wal_")
        try:
            wal = benchmod.materialize_wal(spark, wal_tmp)
            from streaming_data_pipeline_spark.schemas import CHANGE_EVENT

            flat = f"{wal_tmp}/flat"
            if "stream" in sections:
                spark.read.schema(CHANGE_EVENT).parquet(wal).write.mode(
                    "overwrite"
                ).parquet(flat)
            results = {}
            for sec in sections:
                os.sync()
                time.sleep(3)
                if sec == "stream":
                    stream_tmp = tempfile.mkdtemp(prefix="sdp_prof_stream_")
                    try:
                        s, n = benchmod.run_cdc_stream(spark, flat, stream_tmp)
                    finally:
                        shutil.rmtree(stream_tmp, ignore_errors=True)
                else:
                    s, n = benchmod.run_cdc_apply(spark, wal, mode=sec)
                results[sec] = {"sec": round(s, 3), "events": n}
                print(f"SECTION {sec}: {s:.3f}s  ({n} events)", flush=True)
            print(json.dumps(results))
        finally:
            shutil.rmtree(wal_tmp, ignore_errors=True)
        return

    raise SystemExit(f"unknown mode {mode}")


if __name__ == "__main__":
    main()
