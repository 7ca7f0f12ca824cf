"""Structured Streaming ingest: incremental files → documents, dedup,
resume across restarts, windowed streaming aggregate."""

import glob
import os

import pytest
from pyspark.sql import functions as F

from easyner_spark.corpus import GAZETTEER, make_pages_pdf
from easyner_spark.streaming.ingest import (
    PAGES_SCHEMA,
    read_page_stream,
    start_ingest,
    streaming_entity_counts,
)


def _write_pages(spark, pdf, path):
    spark.createDataFrame(pdf, PAGES_SCHEMA).coalesce(1).write.mode("append").parquet(path)


@pytest.fixture()
def dirs(tmp_path):
    d = {
        "in": str(tmp_path / "incoming"),
        "wh": str(tmp_path / "wh"),
        "ckpt": str(tmp_path / "ckpt"),
    }
    os.makedirs(d["in"])
    return d


def test_incremental_ingest_and_restart(spark, dirs):
    pdf = make_pages_pdf(n_docs=60)
    _write_pages(spark, pdf.iloc[:30], dirs["in"])

    q = start_ingest(spark, dirs["in"], dirs["wh"], dirs["ckpt"], n_batches=4)
    q.processAllAvailable()
    q.stop()

    def read_epochs():
        dfs = [
            spark.read.parquet(d)
            for d in sorted(glob.glob(os.path.join(dirs["wh"], "documents_epoch*")))
            if not d.endswith(".json")
        ]
        out = dfs[0]
        for d in dfs[1:]:
            out = out.unionByName(d)
        return out

    docs1 = glob.glob(os.path.join(dirs["wh"], "documents_epoch*/batch_id=*/*.parquet"))
    n1 = read_epochs().count()
    assert n1 > 0 and docs1

    # second tranche arrives + stream RESTARTS from checkpoint: only the
    # new files are processed (no duplicate epochs)
    _write_pages(spark, pdf.iloc[30:], dirs["in"])
    q2 = start_ingest(spark, dirs["in"], dirs["wh"], dirs["ckpt"], n_batches=4)
    q2.processAllAvailable()
    q2.stop()

    all_docs = read_epochs()
    n2 = all_docs.count()
    assert n2 > n1
    # no url ingested twice across epochs
    assert all_docs.groupBy("url").count().filter(F.col("count") > 1).count() == 0


def test_stream_dedup_by_url(spark, dirs):
    pdf = make_pages_pdf(n_docs=20)
    dup = pdf.iloc[:10].copy()
    _write_pages(spark, pdf.iloc[:10], dirs["in"])
    _write_pages(spark, dup, dirs["in"])  # same urls + same warc_ts again

    stream = read_page_stream(spark, dirs["in"])
    q = (
        stream.writeStream.format("memory")
        .queryName("dedup_out")
        .option("checkpointLocation", dirs["ckpt"])
        .outputMode("append")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    out = spark.sql("SELECT url, count(*) c FROM dedup_out GROUP BY url HAVING c > 1")
    assert out.count() == 0


def test_streaming_windowed_entity_counts(spark, dirs):
    pdf = make_pages_pdf(n_docs=40)
    _write_pages(spark, pdf, dirs["in"])
    stream = spark.readStream.schema(PAGES_SCHEMA).parquet(dirs["in"])
    agg = streaming_entity_counts(stream, GAZETTEER, window="1 hour")
    q = (
        agg.writeStream.format("memory")
        .queryName("win_counts")
        .option("checkpointLocation", dirs["ckpt"])
        .outputMode("append")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    # append mode emits only closed windows; just assert the stream ran
    # and the sink table exists with the right schema
    cols = set(spark.sql("SELECT * FROM win_counts").columns)
    assert cols == {"window", "surface", "n"}


def test_stream_canonical_url_dedup(spark, dirs):
    """canonicalize_urls=True: tracking-param/case/slash variants of one
    page share a dedup key (and thus one doc_id downstream); raw mode
    keeps them distinct."""
    pdf = make_pages_pdf(n_docs=4)
    variants = pdf.iloc[:2].copy()
    # same pages re-crawled at the SAME warc_ts under messy url variants
    variants["url"] = [
        variants["url"].iloc[0] + "?utm_source=feed",
        variants["url"].iloc[1] + "/",
    ]
    _write_pages(spark, pdf.iloc[:2], dirs["in"])
    _write_pages(spark, variants, dirs["in"])

    stream = read_page_stream(spark, dirs["in"], canonicalize_urls=True)
    q = (
        stream.writeStream.format("memory")
        .queryName("canon_out")
        .option("checkpointLocation", dirs["ckpt"])
        .outputMode("append")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    rows = spark.sql("SELECT url FROM canon_out").collect()
    # 2 canonical pages, not 4 raw variants — and no utm/trailing-slash
    assert len(rows) == 2
    assert all("utm_" not in r["url"] and not r["url"].endswith("/") for r in rows)


def test_epoch_dedup_pairs_incremental(spark, tmp_path):
    """Two ingest epochs through epoch_dedup_pairs: epoch-1 pairs are
    the self-join of epoch 1; epoch-2 pairs touch epoch-2 docs only
    (new x new + new x corpus, never re-emitting corpus x corpus); the
    committed signature stage accumulates both epochs."""
    from easyner_spark.io.catalog import CheckpointCatalog
    from easyner_spark.streaming.ingest import epoch_dedup_pairs

    wh = str(tmp_path / "wh_epochdedup")
    mk = lambda rows: spark.createDataFrame(rows, "doc_id long, text string")
    # near-dup families: docs sharing long normalized text collide
    e1 = mk([
        (1, "the quick brown fox jumps over the lazy dog again and again"),
        (2, "the quick brown fox jumps over the lazy dog again and again"),
        (3, "completely unrelated web page about database engines entirely"),
    ])
    p1 = {(r["doc_a"], r["doc_b"]) for r in
          epoch_dedup_pairs(spark, wh, e1).collect()}
    assert (1, 2) in p1 and all(a != b for a, b in p1)

    e2 = mk([
        (4, "the quick brown fox jumps over the lazy dog again and again"),
        (5, "fresh never-seen text with no duplicate partner anywhere here"),
    ])
    p2 = {(r["doc_a"], r["doc_b"]) for r in
          epoch_dedup_pairs(spark, wh, e2).collect()}
    # every epoch-2 pair touches a new doc; the old (1,2) pair is NOT re-emitted
    assert all(4 in p or 5 in p for p in p2)
    assert (1, 2) not in p2
    assert (1, 4) in p2 and (2, 4) in p2  # new doc linked to its corpus dups

    cat = CheckpointCatalog(wh)
    sigs = cat.read_stage(spark, "minhash_sigs")
    assert {r["doc_id"] for r in sigs.select("doc_id").collect()} == {1, 2, 3, 4, 5}


def test_epoch_dedup_commit_is_append_only_per_epoch(spark, tmp_path):
    """ADVICE r3: committing an epoch must touch ONLY that epoch's own
    batch-id range — earlier epochs' signature partitions are never
    rewritten (O(epoch) commit, not O(corpus)) — and a re-ingested doc
    with unchanged content must not duplicate its signature row."""
    from easyner_spark.io.catalog import CheckpointCatalog
    from easyner_spark.streaming.ingest import epoch_dedup_pairs

    wh = str(tmp_path / "wh_epochappend")
    nb = 8
    mk = lambda rows: spark.createDataFrame(rows, "doc_id long, text string")
    e1 = mk([
        (1, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
        (2, "one two three four five six seven eight nine ten eleven"),
    ])
    epoch_dedup_pairs(spark, wh, e1, n_batches=nb)
    cat = CheckpointCatalog(wh)
    done1 = cat.committed_batches("minhash_sigs")
    counters1 = cat.counters("minhash_sigs")
    assert done1 and max(done1) < nb  # epoch 0 range

    # epoch 2: one unchanged re-ingest (doc 1) + one new doc
    e2 = mk([
        (1, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
        (3, "red orange yellow green blue indigo violet colors spectrum x"),
    ])
    epoch_dedup_pairs(spark, wh, e2, n_batches=nb)
    done2 = cat.committed_batches("minhash_sigs")
    counters2 = cat.counters("minhash_sigs")
    new_batches = done2 - done1
    # the new partitions live strictly in the next epoch's range...
    assert new_batches and all(nb <= b < 2 * nb for b in new_batches)
    # ...and every epoch-1 partition's counters are byte-identical (no
    # rewrite, no re-hash)
    assert all(counters2[b] == counters1[b] for b in done1)
    # unchanged re-ingest collapsed: doc 1 has exactly one signature row
    sigs = cat.read_stage(spark, "minhash_sigs")
    per_doc = {
        r["doc_id"]: r["n"]
        for r in sigs.groupBy("doc_id").count().withColumnRenamed("count", "n").collect()
    }
    assert per_doc == {1: 1, 2: 1, 3: 1}

    # epoch 3: a CHANGED re-ingest keeps both versions
    e3 = mk([(2, "totally rewritten page text that is nothing like before")])
    epoch_dedup_pairs(spark, wh, e3, n_batches=nb)
    sigs3 = cat.read_stage(spark, "minhash_sigs")
    assert sigs3.filter(F.col("doc_id") == 2).count() == 2


def test_epoch_dedup_verifies_against_latest_signature_only(spark, tmp_path):
    """Review fix: a doc with several committed signature versions must
    be verified against its LATEST version only — a stale version must
    not admit a pair, and multi-version joins must not duplicate
    emitted rows. A compact_stage between the versions and the probe
    must NOT break this: the version order lives in the explicit epoch
    column, which compaction preserves while rewriting batch ids."""
    from pyspark.sql import functions as SF

    from easyner_spark.io.catalog import CheckpointCatalog
    from easyner_spark.streaming.ingest import epoch_dedup_pairs

    wh = str(tmp_path / "wh_latestsig")
    mk = lambda rows: spark.createDataFrame(rows, "doc_id long, text string")
    text_a = "the quick brown fox jumps over the lazy dog again and again"
    text_b = "entirely different replacement content with no overlap at all"
    # epoch 0: docs 1 and 2 share text A
    epoch_dedup_pairs(spark, wh, mk([(1, text_a), (2, text_a)]))
    # epoch 1: doc 1 rewritten to text B (both versions stay committed)
    epoch_dedup_pairs(spark, wh, mk([(1, text_b)]))
    # compaction flattens the batch-id keyspace — the version ordering
    # must survive it (review r4: a batch-id-derived epoch did not)
    CheckpointCatalog(wh).compact_stage(
        spark, "minhash_sigs", SF.pmod(SF.xxhash64("doc_id"), SF.lit(8))
    )
    # epoch 2: doc 9 arrives with text A — it band-collides with doc
    # 1's STALE signature and doc 2's current one
    rows = epoch_dedup_pairs(spark, wh, mk([(9, text_a)])).collect()
    pairs = [(r["doc_a"], r["doc_b"]) for r in rows]
    assert set(pairs) == {(2, 9)}  # stale (1,9) rejected
    assert len(pairs) == 1         # and no duplicate emissions


def test_compact_stage_resets_keyspace_and_keeps_rows(spark, tmp_path):
    """compact_sig_stage rewrites an epoch-grown stage into one
    n_batches keyspace with an identical row set, GCs orphan
    generations, records epoch_base atomically, and the epoch service
    keeps working afterwards."""
    from easyner_spark.io.catalog import CheckpointCatalog
    from easyner_spark.streaming.ingest import epoch_dedup_pairs

    wh = str(tmp_path / "wh_compact")
    nb = 8
    mk = lambda rows: spark.createDataFrame(rows, "doc_id long, text string")
    epoch_dedup_pairs(spark, wh, mk(
        [(1, "alpha beta gamma delta epsilon zeta eta theta iota kappa")]
    ), n_batches=nb)
    epoch_dedup_pairs(spark, wh, mk(
        [(2, "one two three four five six seven eight nine ten eleven")]
    ), n_batches=nb)
    cat = CheckpointCatalog(wh)
    before = {
        (r["doc_id"], tuple(r["sig"]))
        for r in cat.read_stage(spark, "minhash_sigs").collect()
    }
    assert max(cat.committed_batches("minhash_sigs")) >= nb  # grown
    # plant an orphan generation (a crashed past compaction) — the next
    # compaction must GC it
    orphan = os.path.join(wh, "minhash_sigs.gen7")
    os.makedirs(orphan, exist_ok=True)
    from easyner_spark.streaming.ingest import compact_sig_stage

    compact_sig_stage(spark, wh, n_batches=nb)
    assert not os.path.exists(orphan)
    after_batches = cat.committed_batches("minhash_sigs")
    assert after_batches and max(after_batches) < nb  # reset keyspace
    assert len(cat.history("minhash_sigs")) == 1      # manifest reset
    # the wrapper recorded the epoch continuation point atomically
    assert cat._load_manifest("minhash_sigs")["epoch_base"] == 1
    after = {
        (r["doc_id"], tuple(r["sig"]))
        for r in cat.read_stage(spark, "minhash_sigs").collect()
    }
    assert after == before
    # the epoch service continues: next commit lands in range 1
    epoch_dedup_pairs(spark, wh, mk(
        [(3, "red orange yellow green blue indigo violet colors spectrum x")]
    ), n_batches=nb)
    new = cat.committed_batches("minhash_sigs") - after_batches
    assert new and all(nb <= b < 2 * nb for b in new)


def test_epoch_dedup_handles_content_revert(spark, tmp_path):
    """Review r4 pass 3: a doc whose content REVERTS to a previously
    committed version must re-advance its epoch (anti-join is against
    the LATEST version only) so pair verification tracks the current
    content again."""
    from easyner_spark.streaming.ingest import epoch_dedup_pairs

    wh = str(tmp_path / "wh_revert")
    mk = lambda rows: spark.createDataFrame(rows, "doc_id long, text string")
    text_a = "the quick brown fox jumps over the lazy dog again and again"
    text_b = "entirely different replacement content with no overlap at all"
    epoch_dedup_pairs(spark, wh, mk([(1, text_a), (2, text_a)]))  # ep 0
    epoch_dedup_pairs(spark, wh, mk([(1, text_b)]))               # ep 1
    epoch_dedup_pairs(spark, wh, mk([(1, text_a)]))               # ep 2: revert
    # doc 9 arrives with text A: doc 1's CURRENT content is A again,
    # so BOTH (1,9) and (2,9) must verify
    rows = epoch_dedup_pairs(spark, wh, mk([(9, text_a)])).collect()
    pairs = {(r["doc_a"], r["doc_b"]) for r in rows}
    assert (1, 9) in pairs and (2, 9) in pairs
    assert len(rows) == len(pairs)  # no duplicate emissions


def test_epoch_dedup_reads_legacy_warehouse_without_epoch_column(spark, tmp_path):
    """A signature stage committed by the pre-epoch-column code (rows
    are doc_id/sig/batch_id only) must keep working: epochs derive from
    the batch id and commits stay in the legacy shape (no mixed parquet
    schemas across partition dirs)."""
    from easyner_spark.io.catalog import CheckpointCatalog
    from easyner_spark.stages.canonical import minhash_signatures
    from easyner_spark.streaming.ingest import _sig_batch_key, epoch_dedup_pairs

    wh = str(tmp_path / "wh_legacy")
    nb = 8
    text_a = "the quick brown fox jumps over the lazy dog again and again"
    docs = spark.createDataFrame(
        [(1, text_a), (2, text_a)], "doc_id long, text string"
    )
    legacy = minhash_signatures(docs, id_col="doc_id", name_col="text").select(
        "doc_id", "sig", _sig_batch_key(nb, 0).alias("batch_id")
    )
    cat = CheckpointCatalog(wh)
    cat.write_stage(legacy, "minhash_sigs", resume_mode="skip_committed")

    rows = epoch_dedup_pairs(
        spark,
        wh,
        spark.createDataFrame([(9, text_a)], "doc_id long, text string"),
        n_batches=nb,
    ).collect()
    pairs = {(r["doc_a"], r["doc_b"]) for r in rows}
    assert pairs == {(1, 9), (2, 9)}
    # the stage schema stayed legacy (no epoch column materialized)
    sigs = cat.read_stage(spark, "minhash_sigs")
    assert "epoch" not in sigs.columns
    assert {r["doc_id"] for r in sigs.select("doc_id").collect()} == {1, 2, 9}


def test_legacy_stage_compaction_materializes_epochs(spark, tmp_path):
    """Review r4 pass 4: compacting a LEGACY stage (version implicit in
    the batch id) must bake the derived epoch column in during the
    rewrite — otherwise flattening the keyspace collapses every
    version to epoch 0 and latest-version selection degrades to the
    sig tiebreak."""
    from easyner_spark.io.catalog import CheckpointCatalog
    from easyner_spark.stages.canonical import minhash_signatures
    from easyner_spark.streaming.ingest import (
        _sig_batch_key,
        compact_sig_stage,
        epoch_dedup_pairs,
    )

    wh = str(tmp_path / "wh_legacycompact")
    nb = 8
    text_a = "the quick brown fox jumps over the lazy dog again and again"
    text_b = "entirely different replacement content with no overlap at all"
    mk = lambda rows: spark.createDataFrame(rows, "doc_id long, text string")
    cat = CheckpointCatalog(wh)
    legacy = minhash_signatures(
        mk([(1, text_a), (2, text_a)]), id_col="doc_id", name_col="text"
    ).select("doc_id", "sig", _sig_batch_key(nb, 0).alias("batch_id"))
    cat.write_stage(legacy, "minhash_sigs", resume_mode="skip_committed")
    # legacy-shape second version for doc 1 (range 1)
    epoch_dedup_pairs(spark, wh, mk([(1, text_b)]), n_batches=nb)
    sigs = cat.read_stage(spark, "minhash_sigs")
    assert "epoch" not in sigs.columns  # still legacy before compaction

    compact_sig_stage(spark, wh, n_batches=nb)
    sigs2 = cat.read_stage(spark, "minhash_sigs")
    assert "epoch" in sigs2.columns  # upgraded during the rewrite
    eps = {
        (r["doc_id"], r["epoch"]) for r in sigs2.select("doc_id", "epoch").collect()
    }
    assert (1, 0) in eps and (1, 1) in eps and (2, 0) in eps

    # and latest-version verification still works post-compaction:
    # doc 1's current content is B, so only (2, 9) verifies
    rows = epoch_dedup_pairs(spark, wh, mk([(9, text_a)]), n_batches=nb).collect()
    assert {(r["doc_a"], r["doc_b"]) for r in rows} == {(2, 9)}


def test_epoch_dedup_rejects_mismatched_n_batches(spark, tmp_path):
    """n_batches is load-bearing for epoch numbering — a mismatching
    later call must fail loudly, not silently collide epochs."""
    import pytest as _pytest

    from easyner_spark.streaming.ingest import compact_sig_stage, epoch_dedup_pairs

    wh = str(tmp_path / "wh_nbpin")
    mk = lambda rows: spark.createDataFrame(rows, "doc_id long, text string")
    epoch_dedup_pairs(spark, wh, mk(
        [(1, "alpha beta gamma delta epsilon zeta eta theta iota kappa")]
    ), n_batches=8)
    with _pytest.raises(ValueError, match="n_batches"):
        epoch_dedup_pairs(spark, wh, mk([(2, "x y z")]), n_batches=64)
    with _pytest.raises(ValueError, match="n_batches"):
        compact_sig_stage(spark, wh, n_batches=64)


def test_pin_n_batches_semantics(tmp_path):
    """Pin is written before the first commit; an empty stage can
    re-pin (a crashed first run never locks it); a stage WITH data
    rejects mismatches; a legacy manifest key migrates to the sidecar
    and survives compaction's manifest rebuild."""
    from easyner_spark.io.catalog import CheckpointCatalog
    from easyner_spark.streaming.ingest import _pin_n_batches

    cat = CheckpointCatalog(str(tmp_path / "wh_pin"))
    assert _pin_n_batches(cat, "s", 64, has_data=False) == 64
    # empty stage: a different value re-pins instead of raising
    assert _pin_n_batches(cat, "s", 256, has_data=False) == 256
    # with data: pinned value wins, mismatch raises
    assert _pin_n_batches(cat, "s", 256, has_data=True) == 256
    with pytest.raises(ValueError, match="n_batches"):
        _pin_n_batches(cat, "s", 64, has_data=True)

    # transitional: pin recorded by the earlier code in the MANIFEST
    cat._store_manifest("t", {"stage": "t", "snapshots": [], "sig_n_batches": 32})
    assert _pin_n_batches(cat, "t", 32, has_data=True) == 32
    # ...is migrated into the sidecar (which compaction cannot drop)
    assert cat.load_config("t")["n_batches"] == 32
    with pytest.raises(ValueError, match="n_batches"):
        _pin_n_batches(cat, "t", 64, has_data=True)


def test_epoch_dedup_rejects_mixed_signature_family(spark, tmp_path):
    """The sig-family datatype is pinned in the config sidecar: a stage
    committed with the default xxhash64 bigint signatures must reject a
    later call injecting a different-typed sig_fn (mixed families match
    nothing, silently) — while a SAME-typed custom family is accepted."""
    from pyspark.sql import functions as SF

    from easyner_spark.streaming.ingest import epoch_dedup_pairs

    wh = str(tmp_path / "wh_sigfamily")
    mk = lambda rows: spark.createDataFrame(rows, "doc_id long, text string")
    epoch_dedup_pairs(
        spark, wh, mk([(1, "alpha beta gamma delta epsilon zeta eta theta")])
    )

    def md5_fn(docs):
        return docs.select(
            "doc_id", SF.array(SF.md5(SF.col("text").cast("binary"))).alias("sig")
        )

    with pytest.raises(ValueError, match="signature"):
        epoch_dedup_pairs(
            spark, wh, mk([(2, "one two three four five six seven")]), sig_fn=md5_fn
        )

    def bigint_fn(docs):
        return docs.select(
            "doc_id", SF.array(SF.xxhash64("text")).alias("sig")
        )

    # same datatype (array<bigint>) — accepted (the pin is a TYPE check;
    # semantic family consistency stays the caller's contract)
    epoch_dedup_pairs(
        spark, wh, mk([(3, "eight nine ten eleven twelve thirteen")]),
        sig_fn=bigint_fn,
    )


def test_streaming_sliding_window_entity_counts(spark, dirs):
    """Sliding-window mode: each mention lands in window/slide
    overlapping windows, so per-window totals must sum to slide-factor
    x the tumbling totals over the same stream (complete mode exposes
    open windows for the check)."""
    pdf = make_pages_pdf(n_docs=40)
    _write_pages(spark, pdf, dirs["in"])

    def run(name, **kw):
        stream = spark.readStream.schema(PAGES_SCHEMA).parquet(dirs["in"])
        agg = streaming_entity_counts(stream, GAZETTEER, **kw)
        q = (
            agg.writeStream.format("memory")
            .queryName(name)
            .outputMode("complete")
            .start()
        )
        q.processAllAvailable()
        q.stop()
        return spark.sql(
            f"SELECT surface, SUM(n) AS t FROM {name} GROUP BY surface"
        ).collect()

    tumb = {r["surface"]: r["t"] for r in run("slide_t", window="1 hour")}
    slid = {
        r["surface"]: r["t"]
        for r in run("slide_s", window="1 hour", slide="30 minutes")
    }
    assert tumb and set(slid) == set(tumb)
    assert all(slid[s] == 2 * tumb[s] for s in tumb)
