"""Driver-contract smoke for __spark_entry__.entry — the one entry
point the per-round driver exercises directly (runs it and requires
>= 0 rows with a stable schema). Everything else in the module is
pinned by test_queries_oracle; this pins the flagship."""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod


@pytest.fixture(scope="module")
def spark():
    from streaming_data_pipeline_spark.session import get_spark

    s = get_spark("test-entry-contract")
    yield s


def test_entry_runs_and_schema_is_stable(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert [f.name for f in df.schema.fields] == [
        "repo",
        "path",
        "commit",
        "lang",
        "content_sha",
        "lsn",
    ]
    # deterministic: same session, same result set
    again = entrymod.entry(spark).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))
