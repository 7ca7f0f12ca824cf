"""Checkpoint/resume catalog: atomic per-partition commits + lineage."""

import pytest
from pyspark.sql import functions as F

from easyner_spark.io.catalog import CheckpointCatalog


@pytest.fixture()
def docs(spark):
    return spark.range(0, 400).select(
        F.col("id").cast("string").alias("doc_id"),
        F.pmod("id", F.lit(8)).cast("int").alias("batch_id"),
        F.concat(F.lit("text-"), F.col("id")).alias("text"),
    )


def test_write_read_roundtrip_and_counters(spark, docs, tmp_path):
    cat = CheckpointCatalog(str(tmp_path / "wh"))
    snap = cat.write_stage(docs, "documents")
    assert len(snap["counters"]) == 8
    back = cat.read_stage(spark, "documents")
    assert back.count() == 400
    c = cat.counters("documents")
    assert sum(v["rows"] for v in c.values()) == 400


def test_resume_skips_committed_partitions(spark, docs, tmp_path):
    cat = CheckpointCatalog(str(tmp_path / "wh"))
    # simulate a killed job: only batches 0-3 committed
    half = docs.filter(F.col("batch_id") < 4)
    snap1 = cat.write_stage(half, "documents")
    assert sorted(int(b) for b in snap1["counters"]) == [0, 1, 2, 3]

    # resume with the FULL input: only 4-7 are computed/committed
    snap2 = cat.write_stage(docs, "documents")
    assert sorted(int(b) for b in snap2["counters"]) == [4, 5, 6, 7]

    # re-run once more: no-op
    snap3 = cat.write_stage(docs, "documents")
    assert snap3 == {}

    back = cat.read_stage(spark, "documents")
    assert back.count() == 400
    assert len(cat.history("documents")) == 2


def test_content_hash_stable_across_parallelism(spark, docs, tmp_path):
    cat1 = CheckpointCatalog(str(tmp_path / "a"))
    cat2 = CheckpointCatalog(str(tmp_path / "b"))
    cat1.write_stage(docs.repartition(2), "s")
    cat2.write_stage(docs.repartition(16), "s")
    h1 = {b: v["content_hash"] for b, v in cat1.counters("s").items()}
    h2 = {b: v["content_hash"] for b, v in cat2.counters("s").items()}
    assert h1 == h2


def test_empty_input_default_flags_stale_and_keeps_rows(spark, docs, tmp_path):
    """Without the opt-in, a fully-empty re-run input is treated as a
    caller bug: committed rows keep serving, and the returned snapshot
    carries the stale marker so the caller can tell."""
    cat = CheckpointCatalog(str(tmp_path / "wh"))
    cat.write_stage(docs, "s")
    snap = cat.write_stage(docs.filter(F.lit(False)), "s")
    assert snap == {"stale_empty_input": True}
    assert cat.read_stage(spark, "s").count() == 400


def test_allow_empty_retracts_everything(spark, docs, tmp_path):
    """A stage whose row set legitimately shrinks to zero (e.g. the
    minted-entity dimension once all surfaces resolve) retracts all
    committed batches under allow_empty=True."""
    cat = CheckpointCatalog(str(tmp_path / "wh"))
    cat.write_stage(docs, "s")
    snap = cat.write_stage(docs.filter(F.lit(False)), "s", allow_empty=True)
    assert sorted(snap["retracted"]) == list(range(8))
    assert cat.read_stage(spark, "s").count() == 0
    # idempotent: a second empty re-run is a plain no-op
    assert cat.write_stage(docs.filter(F.lit(False)), "s", allow_empty=True) == {}


def test_orphan_partitions_invisible_until_committed(spark, docs, tmp_path):
    """Snapshot isolation: partition directories written by a crashed
    job (data present, manifest missing) must not be visible to
    readers and must be recomputed (overwritten) on resume."""
    import glob
    import shutil

    cat = CheckpointCatalog(str(tmp_path / "wh"))
    cat.write_stage(docs.filter(F.col("batch_id") < 6), "s")

    # simulate a crash AFTER data write but BEFORE manifest commit for
    # batches 6-7: write their parquet dirs directly, no manifest entry
    (
        docs.filter(F.col("batch_id") >= 6)
        .write.mode("append")
        .partitionBy("batch_id")
        .parquet(str(tmp_path / "wh" / "s"))
    )
    assert glob.glob(str(tmp_path / "wh" / "s" / "batch_id=7"))  # orphan exists

    visible = cat.read_stage(spark, "s")
    assert visible.filter(F.col("batch_id") >= 6).count() == 0  # invisible
    assert visible.count() == 300  # 6 of 8 batches x 50

    # resume commits 6-7 (dynamic overwrite replaces the orphan files)
    snap = cat.write_stage(docs, "s")
    assert sorted(int(b) for b in snap["counters"]) == [6, 7]
    assert cat.read_stage(spark, "s").count() == 400
