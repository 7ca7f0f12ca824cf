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
