"""Corpus loaders — the reference's four source modules as Spark scans.

Reference analogs (SURVEY.md §2.1):
* S1 — CORD metadata.csv loader (scripts/cord_loader.py:14-103):
  drop rows with empty title/abstract, pick the doc id by the
  precedence chain cord_uid > doi > pmcid > pubmed_id > mag_id >
  who_covidence_id > arxiv_id > sha256(title), optional subset
  semi-filter by uid list.
* S3 — free-text loader (scripts/text_loader.py:6-24): one document
  per *.txt file, lines stripped and joined with a single space,
  doc id = prefix_i by sorted filename order, title = basename.
* S5 — batch-file scan (scripts/splitter_pubmed.py:15-35 and every
  downstream stage): numeric filename suffix = batch id.
* S6 — batch range filter (main.py:187-198): keep batches in
  [lo, hi] — a partition-pruning predicate.
* S2 — PubMed eFetch download (scripts/downloader.py) needs network
  access and is replaced by the pages scan in the web-graft target;
  ``pubmed_efetch_source`` raises NotImplementedError with the
  cluster recipe.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

CORD_ID_PRECEDENCE = [
    "cord_uid",
    "doi",
    "pmcid",
    "pubmed_id",
    "mag_id",
    "who_covidence_id",
    "arxiv_id",
]


def cord_csv_loader(
    spark: SparkSession,
    metadata_csv: str,
    subset_uids: DataFrame | None = None,
) -> DataFrame:
    """S1: metadata.csv → documents(doc_id, title, abstract, …).

    The id precedence chain is one ``coalesce`` of null-normalized
    columns with a sha2(title) fallback (cord_loader.py:53-83); the
    subset filter is a broadcast LEFT-SEMI join on lowercased uid
    (cord_loader.py:20-25,85-86).
    """
    df = spark.read.csv(metadata_csv, header=True, multiLine=True, escape='"')
    present = [c for c in CORD_ID_PRECEDENCE if c in df.columns]
    id_candidates = [
        F.when(F.length(F.trim(F.col(c))) > 0, F.trim(F.col(c))) for c in present
    ]
    doc_id = F.coalesce(*id_candidates, F.sha2(F.col("title"), 256))
    out = (
        df.filter(
            (F.length(F.trim(F.coalesce(F.col("title"), F.lit("")))) > 0)
            & (F.length(F.trim(F.coalesce(F.col("abstract"), F.lit("")))) > 0)
        )
        .withColumn("doc_id", doc_id)
    )
    if subset_uids is not None:
        subset = subset_uids.select(
            F.lower(F.trim(F.col(subset_uids.columns[0]))).alias("_uid")
        )
        out = out.join(
            F.broadcast(subset),
            F.lower(F.col("cord_uid")) == F.col("_uid"),
            "left_semi",
        )
    return out.select("doc_id", "title", "abstract")


def freetext_loader(
    spark: SparkSession, input_glob: str, prefix: str = "doc"
) -> DataFrame:
    """S3: each text file → one document; lines stripped + space-joined
    (byte-identical to text_loader.py:17 semantics); id = prefix_i in
    sorted-filename order; title = file basename without extension."""
    # line order within a file: monotonically_increasing_id is strictly
    # increasing within a partition and a small text file is one split,
    # so sorting by it reconstructs file order deterministically
    lines = spark.read.text(input_glob).select(
        F.input_file_name().alias("file"),
        F.monotonically_increasing_id().alias("o"),
        F.col("value"),
    )
    docs = lines.groupBy("file").agg(
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col("o"), F.trim("value").alias("t")))
                ),
                lambda s: s["t"],
            ),
        ).alias("text")
    )
    # deterministic id by sorted filename order (text_loader.py:12,19)
    from pyspark.sql import Window

    w = Window.orderBy("file")
    return docs.select(
        F.concat(F.lit(f"{prefix}_"), (F.row_number().over(w) - 1).cast("string")).alias(
            "doc_id"
        ),
        F.regexp_extract(
            F.element_at(F.split(F.col("file"), "/"), -1), r"^(.*?)(\.[^.]*)?$", 1
        ).alias("title"),
        "text",
    )


def batch_json_scan(
    spark: SparkSession,
    input_dir: str,
    batch_range: tuple[int, int] | None = None,
) -> DataFrame:
    """S5+S6: scan a folder of batch JSON files; batch_id recovered from
    the numeric filename suffix (regex, ner_main.py:22-28 /
    entity_merger.py:112-113 = F3); optional [lo, hi] range filter
    (partition-pruning analog of main.py:187-198)."""
    df = spark.read.json(input_dir).withColumn(
        "batch_id",
        F.regexp_extract(F.input_file_name(), r"(\d+)\.json$", 1).cast("int"),
    )
    if batch_range is not None:
        lo, hi = batch_range
        df = df.filter(F.col("batch_id").between(lo, hi))
    return df


def pubmed_efetch_source(*_args, **_kwargs):
    """S2: the reference downloads PubMed XML via the NCBI eutils API
    (scripts/downloader.py:13-94). Network access is unavailable here
    and the web-graft target replaces this source with the pages scan;
    on a cluster, implement as mapPartitions HTTP fetch over PMID
    ranges + last-write-wins dropDuplicates('pmid')."""
    raise NotImplementedError(
        "network source; replaced by the pages table in this target"
    )
