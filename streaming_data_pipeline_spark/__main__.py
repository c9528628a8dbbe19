"""spark-submit entry point.

    spark-submit --py-files sdp.zip -m streaming_data_pipeline_spark \
        run --wal /data/change_wal --table /data/repo_lake \
            --checkpoint /data/ckpt [--kafka host:9092 --topic t] \
            [--mode mor|cow] [--n-buckets 1024] [--soak 10s]

Subcommands:
    run        start the CDC tailer (availableNow unless --soak)
    compact    fold merge-on-read deltas into base files
    metrics    print per-epoch metrics + overall health
    lineage    print epoch → offsets → files lineage records
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="streaming_data_pipeline_spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    run_p = sub.add_parser("run")
    run_p.add_argument("--wal", help="change-event parquet dir (file WAL)")
    run_p.add_argument("--kafka", help="bootstrap servers (swaps the file WAL)")
    run_p.add_argument("--topic", default="change-events")
    run_p.add_argument("--table", required=True)
    run_p.add_argument("--checkpoint", required=True)
    run_p.add_argument("--mode", default="mor", choices=["mor", "cow"])
    run_p.add_argument("--n-buckets", type=int, default=256)
    run_p.add_argument("--soak", help="processingTime trigger, e.g. '10 seconds'")
    run_p.add_argument("--compact-every", type=int, default=8)
    run_p.add_argument(
        "--max-files-per-trigger", type=int, default=None,
        help="microbatch size cap (WAL files per epoch); default drains "
        "availableNow in engine-chosen batches",
    )

    for name in ("compact", "metrics", "lineage", "remove-orphans"):
        sp = sub.add_parser(name)
        sp.add_argument("--table", required=True)

    ex = sub.add_parser("expire-snapshots", help="drop old snapshots and their unshared data files")
    ex.add_argument("--table", required=True)
    ex.add_argument("--keep-last", type=int, default=2)

    rb = sub.add_parser("rebucket", help="rewrite the table into a new bucket modulus")
    rb.add_argument("--table", required=True)
    rb.add_argument("--n-buckets", type=int, required=True, dest="new_buckets")

    rp = sub.add_parser("replay-dlq", help="reprocess retryable dead letters as a batch epoch")
    rp.add_argument("--table", required=True)
    rp.add_argument("--epoch", type=int, required=True, help="fresh epoch id for the replay commit")
    rp.add_argument("--mode", default="mor", choices=["mor", "cow"])

    es = sub.add_parser("export-shard", help="curated training shard from the current snapshot")
    es.add_argument("--table", required=True)
    es.add_argument("--out", required=True)
    es.add_argument("--rates", default="{}", help='per-lang keep %% as JSON, e.g. \'{"python":100}\'')
    es.add_argument("--default-rate", type=int, default=10)

    rs = sub.add_parser("refresh-shard", help="bring a shard forward via the change feed (no full rescan)")
    rs.add_argument("--table", required=True)
    rs.add_argument("--out", required=True)

    args = p.parse_args(argv)

    from .plans.lake import SnapshotTable
    from .session import get_spark

    spark = get_spark("sdp-cli")

    if args.cmd == "run":
        from .schemas import LAKE_BASE
        from .streaming.stream import start_cdc_stream

        table = (
            SnapshotTable.load(args.table)
            if SnapshotTable(args.table).exists()
            else SnapshotTable.create(args.table, LAKE_BASE, n_buckets=args.n_buckets)
        )
        source = None
        if args.kafka:
            from .sources.kafka import kafka_change_stream

            source = kafka_change_stream(spark, args.kafka, args.topic)
        elif not args.wal:
            p.error("run requires --wal or --kafka")
        # one runner for both sources: epoch markers, lineage (offsets_for
        # parses file-WAL records AND kafka topic/partition/offset maps)
        # and MOR compaction cadence are source-agnostic
        q = start_cdc_stream(
            spark,
            table,
            args.wal or "",
            args.checkpoint,
            mode=args.mode,
            processing_time=args.soak,
            compact_every=args.compact_every,
            max_files_per_trigger=args.max_files_per_trigger,
            source=source,
        )
        q.awaitTermination()
        return 0

    table = SnapshotTable.load(args.table)
    if args.cmd == "compact":
        from .plans.maintenance import compact

        v = compact(spark, table, max_files_per_bucket=1)
        print(json.dumps({"version": v}))
    elif args.cmd == "metrics":
        from .streaming.metrics import epoch_metrics, overall_health

        epoch_metrics(spark, table.root).show(100, truncate=False)
        print("overall:", overall_health(spark, table.root))
    elif args.cmd == "lineage":
        from .streaming.exactly_once import EpochLog

        for rec in EpochLog(table.root).lineage():
            print(json.dumps(rec))
    elif args.cmd == "remove-orphans":
        from .plans.maintenance import remove_orphan_files

        deleted = remove_orphan_files(table)
        print(json.dumps({"deleted_files": len(deleted)}))
    elif args.cmd == "expire-snapshots":
        from .plans.maintenance import expire_snapshots

        deleted = expire_snapshots(table, keep_last=args.keep_last)
        print(json.dumps({"deleted_files": len(deleted), "kept_last": args.keep_last}))
    elif args.cmd == "rebucket":
        from .plans.maintenance import rebucket

        v = rebucket(spark, table, args.new_buckets)
        print(json.dumps({"version": v, "n_buckets": args.new_buckets}))
    elif args.cmd == "replay-dlq":
        from .streaming.replay import replay_dlq

        stats = replay_dlq(spark, table, epoch=args.epoch, mode=args.mode)
        print(json.dumps({k: v for k, v in stats.items() if k != "files"}))
    elif args.cmd == "export-shard":
        from .plans.export import export_training_mix

        man = export_training_mix(
            spark, table, args.out,
            rates=json.loads(args.rates), default_rate=args.default_rate,
        )
        print(json.dumps(man))
    elif args.cmd == "refresh-shard":
        from .plans.refresh import refresh_training_mix

        man = refresh_training_mix(spark, table, args.out)
        print(json.dumps(man))
    return 0


if __name__ == "__main__":
    sys.exit(main())
