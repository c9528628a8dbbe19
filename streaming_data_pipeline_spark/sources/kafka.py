"""Kafka source/sink adapters — the on-cluster swap for the file WAL.

The reference consumes/produces JSON over Kafka (reference:
src/consumer.py:50-88 — S4, src/producer.py:127-163 — S3). In the
sandbox there is no broker and no kafka-sql jar, so these builders are
import-light and only touch Spark APIs when called; the streaming
runner (streaming/stream.py) takes any source DataFrame shaped like
CHANGE_EVENT, so swapping the file tailer for `kafka_change_stream`
is one call at wiring time.

Offsets/exactly-once: with Kafka the checkpoint WAL stores a
topic→partition→offset map instead of file records; the runner's
offsets_for (streaming/stream.py) parses BOTH formats from
<ckpt>/sources/0/<batchId> and records Kafka epochs' lineage as
"topic:partition:endOffset" strings in the commit marker. Nothing else
in the engine changes — epoch markers and idempotent applies are
source-agnostic (pass this stream as ``source=`` to start_cdc_stream).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..schemas import CHANGE_EVENT, JSON_OPTS as _JSON_OPTS


def kafka_change_stream(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str = "change-events",
    starting_offsets: str = "earliest",
    max_offsets_per_trigger: int | None = None,
) -> DataFrame:
    """readStream from Kafka → parsed CHANGE_EVENT columns.

    Malformed JSON rows surface with null required fields and are
    routed to the DLQ by the normal validation split (the PERMISSIVE
    analog of the reference's decode-error handling,
    src/consumer.py:74-81)."""
    reader = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
        .option("failOnDataLoss", "false")
    )
    if max_offsets_per_trigger:
        reader = reader.option("maxOffsetsPerTrigger", max_offsets_per_trigger)
    return parse_kafka_records(reader.load())


def parse_kafka_records(raw: DataFrame) -> DataFrame:
    """Kafka-record rows (value/topic/partition/offset) → CHANGE_EVENT
    columns. Factored out of the readStream builder so the parse
    semantics are testable without a broker: malformed JSON yields null
    required fields (from_json's PERMISSIVE analog of the reference's
    decode-error handling, src/consumer.py:74-81) and is routed to the
    DLQ by the normal validation split — covered by
    tests/test_kafka_contract.py."""
    parsed = raw.select(
        F.from_json(F.col("value").cast("string"), CHANGE_EVENT, _JSON_OPTS).alias("e"),
        F.col("topic"),
        F.col("partition"),
        F.col("offset"),
    )
    return parsed.select("e.*")


def to_kafka_records(df: DataFrame, key_cols: tuple[str, ...] = ("repo", "path")) -> DataFrame:
    """CHANGE_EVENT rows → the Kafka PRODUCER frame (key, value) the
    `kafka` sink expects (S3, reference: src/producer.py:127-163).

    The reference publishes UNKEYED JSON and relies on topic-level
    ordering; Kafka only orders within a partition, so at CDC scale the
    record key MUST carry the entity identity — keying by (repo, path)
    lands every change of a key in one partition, preserving LSN order
    end-to-end without a global sort. The value is canonical JSON that
    `parse_kafka_records` round-trips losslessly (pinned by
    tests/test_kafka_contract.py), so producer → consumer is an
    identity on valid CHANGE_EVENT rows. Usage:

        to_kafka_records(df).write.format("kafka").options(
            **{"kafka.bootstrap.servers": servers, "topic": topic}).save()
    """
    return df.select(
        # structural key, not a delimiter join: '|' inside repo/path (or a
        # null component, which concat_ws silently skips) would collide
        # distinct entities — fatal on a log-compacted topic where the key
        # decides which record survives
        F.to_json(F.struct(*[F.col(c) for c in key_cols])).alias("key"),
        F.to_json(F.struct(*[F.col(c) for c in df.columns]), _JSON_OPTS).alias("value"),
    )


def kafka_dlq_sink_options(bootstrap_servers: str, topic: str = "dead-letter") -> dict:
    """writeStream options for mirroring the DLQ table to a Kafka topic
    (reference keeps a dead-letter TOPIC, src/utils.py:44-49; our DLQ
    is a table first — the topic mirror is optional egress):

        dlq_df.select(F.to_json(F.struct("*")).alias("value"))
              .writeStream.format("kafka").options(**opts)...
    """
    return {
        "kafka.bootstrap.servers": bootstrap_servers,
        "topic": topic,
    }


# ---------------------------------------------------------------------------
# Topic admin (O4, reference: src/utils.py:27-68 create_kafka_topics)
# ---------------------------------------------------------------------------

DEFAULT_TOPIC_SPECS = (
    # the reference's layout: 3-partition event topic, 1-partition DLQ
    # (src/utils.py:38-49). At CDC scale the event topic's partition
    # count bounds consumer parallelism — size it like shuffle
    # partitions, not like the demo.
    {"name": "change-events", "partitions": 3, "replication_factor": 1},
    {"name": "dead-letter", "partitions": 1, "replication_factor": 1},
)


def ensure_topics(admin, specs=DEFAULT_TOPIC_SPECS, *, strict: bool = True) -> dict:
    """Idempotent topic bootstrap against an INJECTED admin client (any
    object with `list_topics() -> {name: partition_count}` and
    `create_topic(name, partitions, replication_factor)` — a thin shim
    over confluent-kafka's AdminClient or kafka-python's
    KafkaAdminClient on a real deployment; no broker library ships in
    this sandbox, so the semantics are pinned against a fake in
    tests/test_kafka_contract.py).

    Improves on the reference in two ways a real operator needs:
    create-if-absent is IDEMPOTENT (the reference returns False when a
    topic already exists and the create future raises), and an existing
    topic with the WRONG partition count is surfaced (``strict=True``
    raises; else recorded) — a silent mismatch would cap consumer
    parallelism and break key→partition affinity assumptions.

    Returns {"created": [...], "existing": [...], "mismatched": [...]}.
    """
    existing = admin.list_topics()
    out: dict[str, list] = {"created": [], "existing": [], "mismatched": []}
    for spec in specs:
        name = spec["name"]
        want = int(spec["partitions"])
        if name in existing:
            have = int(existing[name])
            if have != want:
                out["mismatched"].append({"name": name, "have": have, "want": want})
            else:
                out["existing"].append(name)
            continue
        admin.create_topic(name, want, int(spec.get("replication_factor", 1)))
        out["created"].append(name)
    # every absent topic is created and every spec validated BEFORE any
    # raise: failing fast on the first mismatch would leave later topics
    # (e.g. the DLQ) unbootstrapped and report only a partial picture
    if strict and out["mismatched"]:
        raise ValueError(
            f"{len(out['mismatched'])} topic(s) exist with the wrong "
            f"partition count: {out['mismatched']}; repartitioning a "
            "live topic reshuffles key->partition affinity — resolve "
            "explicitly (strict=False records instead). "
            f"Absent topics were still created: {out['created']}"
        )
    return out
