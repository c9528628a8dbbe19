"""Real `spark-submit --py-files` smoke (north rule: "run via
spark-submit --py-files on a multi-executor cluster").

test_cli.py drives the same subcommands in-process; this test pays the
JVM-startup cost once to prove the actual deployment path: the package
zipped exactly as an operator would ship it, submitted with
`spark-submit --master local[8] --py-files sdp.zip` from a cwd where
the repo is NOT importable — so every import inside the job resolves
from the shipped zip — and the resulting lake verified equal
(state-hash) to an in-process apply of the same WAL."""

from __future__ import annotations

import os
import shutil
import subprocess
import sys
import zipfile

import pytest

from streaming_data_pipeline_spark.plans.lake import SnapshotTable
from streaming_data_pipeline_spark.schemas import LAKE_BASE
from streaming_data_pipeline_spark.sources.changegen import generate_changes

SPARK_SUBMIT = shutil.which("spark-submit") or "/opt/spark/bin/spark-submit"

LAUNCHER = """\
import sys
from streaming_data_pipeline_spark.__main__ import main
sys.exit(main(sys.argv[1:]))
"""


def _build_zip(dest: str) -> str:
    """Zip the package source tree (no __pycache__) with the package dir
    at the zip root — the layout `--py-files` expects."""
    pkg_root = os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))
    )
    pkg = os.path.join(pkg_root, "streaming_data_pipeline_spark")
    zpath = os.path.join(dest, "sdp.zip")
    with zipfile.ZipFile(zpath, "w", zipfile.ZIP_DEFLATED) as z:
        for root, dirs, files in os.walk(pkg):
            dirs[:] = [d for d in dirs if d != "__pycache__"]
            for f in files:
                if f.endswith(".py") or f.endswith(".yaml"):
                    full = os.path.join(root, f)
                    z.write(full, os.path.relpath(full, pkg_root))
    return zpath


@pytest.mark.skipif(
    not os.path.exists(SPARK_SUBMIT), reason="no spark-submit on PATH"
)
def test_spark_submit_py_files_runs_the_tailer(spark, tmp_path):
    wal = str(tmp_path / "wal")
    root = str(tmp_path / "lake")
    ckpt = str(tmp_path / "ckpt")
    changes = generate_changes(
        spark, 3000, seed=23, events_per_epoch=1000, invalid_ratio=0.1,
        delete_ratio=0.05, partitions=4,
    )
    changes.write.partitionBy("epoch").mode("overwrite").parquet(wal)

    zpath = _build_zip(str(tmp_path))
    launcher = tmp_path / "launcher.py"
    launcher.write_text(LAUNCHER)

    env = dict(os.environ)
    env.update(
        SPARK_GRAFT_CPUS="8",
        SPARK_GRAFT_DRIVER_MEM="4g",
        PYSPARK_PYTHON=sys.executable,
        PYSPARK_DRIVER_PYTHON=sys.executable,
    )
    # cwd = tmp_path: the repo is not importable there, so the job's
    # imports MUST come from the shipped zip — this is the actual
    # cluster deployment contract, not a PYTHONPATH accident
    env.pop("PYTHONPATH", None)
    p = subprocess.run(
        [
            SPARK_SUBMIT,
            "--master", "local[8]",
            "--py-files", zpath,
            str(launcher),
            "run", "--wal", wal, "--table", root,
            "--checkpoint", ckpt, "--n-buckets", "8",
        ],
        cwd=str(tmp_path),
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert p.returncode == 0, f"spark-submit failed:\n{p.stdout[-3000:]}\n{p.stderr[-5000:]}"

    # the submitted job's lake must equal an in-process apply of the
    # same WAL — same engine, different deployment vehicle
    from streaming_data_pipeline_spark.streaming.apply import apply_changes

    table = SnapshotTable.load(root)
    got = table.state_hash(spark)
    ref = SnapshotTable.create(str(tmp_path / "ref_lake"), LAKE_BASE, n_buckets=8)
    apply_changes(spark, ref, changes.drop("epoch"), epoch=0)
    assert got == ref.state_hash(spark)
    assert table.current_state(spark).count() > 0
