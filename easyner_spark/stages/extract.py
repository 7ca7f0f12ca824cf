"""Stage 1 — deterministic text extraction: pages → documents.

Reference analog: the loaders (scripts/text_loader.py:6-24,
scripts/cord_loader.py:14-103) — line-strip + single-space join and a
deterministic id with sha256 fallback (cord_loader.py:82-83). Target
contract adds: input is a table of Common-Crawl-style pages and the
extracted ``text`` must be byte-identical per url (enforced by the
audit below).

Plan shape: the pre-extracted branch (``text IS NOT NULL``) is pure
column ops (no Python); only the html-only branch pays the pandas-UDF
cost, and the two branches are unioned back. At 100 TB this means the
usually-dominant pass-through rows never leave the JVM.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

from ..textops import extract_html, extract_title

_EXTRACT_SCHEMA = T.StructType(
    [
        T.StructField("title", T.StringType()),
        T.StructField("text", T.StringType()),
    ]
)


@F.pandas_udf(_EXTRACT_SCHEMA)
def _extract_udf(html: pd.Series) -> pd.DataFrame:
    titles, texts = [], []
    for b in html:
        if b is None:
            titles.append("")
            texts.append("")
        else:
            t, x = extract_html(bytes(b))
            titles.append(t)
            texts.append(x)
    return pd.DataFrame({"title": titles, "text": texts})


@F.pandas_udf(T.StringType())
def _title_udf(html: pd.Series) -> pd.Series:
    # title-only probe: the pass-through branch (usually dominant) must
    # not pay the full body-extraction regex cost
    return pd.Series(
        [extract_title(bytes(b)) if b is not None else "" for b in html]
    )


def extract_documents(
    pages: DataFrame,
    n_batches: int = 64,
    lang_filter: str | None = "en",
) -> DataFrame:
    """pages(url, warc_ts, html, text, lang) → documents.

    documents(doc_id, url, title, text, lang, warc_ts, batch_id):

    * ``doc_id`` = sha2(url, 256) — deterministic, collision-safe id
      (reference fallback semantics, cord_loader.py:82-83, keyed by url
      because url is the page identity per the input contract).
    * ``text`` = pass-through when present (byte-identical per url),
      else deterministic extraction from ``html``.
    * ``batch_id`` = pmod(xxhash64(url), n_batches) — a stable lineage/
      partition key independent of task scheduling (replaces the
      reference's file-suffix batch id, scripts/splitter.py:72).
    * empty-text rows are dropped (reference drops empty abstracts,
      cord_loader.py:41-42, pubmed_bulk.py:114-116).
    """
    if lang_filter is not None:
        pages = pages.filter(F.col("lang") == lang_filter)

    base = pages.withColumn(
        "batch_id", F.pmod(F.xxhash64("url"), F.lit(n_batches)).cast("int")
    ).withColumn("doc_id", F.sha2(F.col("url"), 256))

    passthrough = base.filter(F.col("text").isNotNull()).select(
        "doc_id",
        "url",
        _title_udf("html").alias("title"),
        F.col("text"),
        "lang",
        "warc_ts",
        "batch_id",
    )
    extracted = (
        base.filter(F.col("text").isNull())
        .withColumn("ext", _extract_udf("html"))
        .select(
            "doc_id",
            "url",
            F.col("ext.title").alias("title"),
            F.col("ext.text").alias("text"),
            "lang",
            "warc_ts",
            "batch_id",
        )
    )
    docs = passthrough.unionByName(extracted)
    return docs.filter(F.length("text") > 0)


def audit_hashes(documents: DataFrame) -> DataFrame:
    """Per-partition audit of the byte-identical-text invariant.

    audit(batch_id, n_docs, text_hash_sum) where text_hash_sum is an
    order-insensitive bit_xor of xxhash64(sha2(url || NUL || text)). Two
    runs (or engine vs oracle) over the same pages must agree per
    batch; disagreement pinpoints the partition that diverged
    (SURVEY.md §4 custom-work item 3).
    """
    h = F.sha2(F.concat(F.col("url"), F.lit("\x00"), F.col("text")), 256)
    return (
        documents.select("batch_id", F.xxhash64(h).alias("h"))
        .groupBy("batch_id")
        .agg(
            F.count("*").alias("n_docs"),
            F.expr("bit_xor(h)").alias("text_hash_sum"),
        )
    )
