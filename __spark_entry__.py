"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship KG query (co-occurrence triple
ranking over the documents table) at sf0.001. ``queries()`` /
``oracle_sql()`` expose every implemented operator from SURVEY.md §2
plus the training-data-pipeline operators; every entry has a DuckDB
oracles (including the iterative connected-components algorithm,
checked against a recursive-CTE closure, and the real engine UDF paths
cross-checked against pure SQL) and are verified bit-for-bit in
tests/test_queries_oracle.py (stricter than the driver's value-hash:
exact cell equality after canonical sorting).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from easyner_spark.queries import ORACLES, QUERIES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: full KG slice
    (tokenize → gazetteer NER → NEL link → co-occurrence triples →
    ranked triple counts)."""
    return QUERIES["kg_triple_counts"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
