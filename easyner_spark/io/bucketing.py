"""Bucketed-table writers: pre-shuffled storage for co-located joins.

At 10^12 documents the KG fact tables (mentions, linked, triples, the
signature stage) are all repeatedly joined and aggregated on the SAME
keys (doc_id, ent_id, src). Spark's native bucketing trades one write-
time shuffle for ZERO join/agg shuffles forever after: a table written
with ``bucketBy(n, key)`` records the hash-partitioning in the catalog,
and the planner joins two tables bucketed on the same key with the same
bucket count WITHOUT an Exchange on either side (sortBy additionally
removes the per-task Sort for sort-merge joins). That is the difference
between re-shuffling 100 TB per query and streaming co-located bucket
pairs.

Scope note: DataFrameWriter bucketing requires ``saveAsTable`` (the
bucket metadata lives in the catalog, not the parquet footers);
``option("path", ...)`` keeps the files at an explicit location
(external table) so the warehouse layout stays under the caller's
control — same layout contract as io/catalog.py stages. Reference has
no counterpart (single-process dict loops, Aitslab/EasyNER main.py);
this is pure Spark-side scale architecture.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    path: str,
    bucket_cols: list[str] | str,
    n_buckets: int = 64,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as a bucketed (and bucket-sorted) external table.

    ``n_buckets`` sizes the join parallelism forever (bucket-pruning
    aside, a bucketed join runs one task per bucket): at 100 TB pick
    buckets of ~128-512 MB, i.e. thousands of buckets, NOT the default
    64. Joining two tables bucketed on the same key requires equal
    bucket counts — pin one constant per key domain in the deployment
    config (mismatched counts silently fall back to a full shuffle).
    """
    cols = [bucket_cols] if isinstance(bucket_cols, str) else list(bucket_cols)
    w = df.write.mode(mode).option("path", path).bucketBy(n_buckets, *cols)
    if sort:
        w = w.sortBy(*cols)
    w.format("parquet").saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    """Catalog read — REQUIRED for bucketed data. ``spark.read.parquet``
    on the same files would discard the bucket metadata and re-shuffle."""
    return spark.table(table)
