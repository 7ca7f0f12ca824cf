"""Strict local Spark-vs-DuckDB comparator (mirrors the driver's check:
row count + schema + order-insensitive values, but stricter — exact
cell equality after canonical sorting)."""

from __future__ import annotations

import duckdb
import pandas as pd

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def duck_con(sf_dir: str) -> "duckdb.DuckDBPyConnection":
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _norm_cell(x):
    """Arrays arrive as list (Spark) vs numpy.ndarray (DuckDB) — same
    values, different str() forms; normalize to tuples of NATIVE python
    scalars (ndarray.tolist() — numpy>=2 reprs np.float64(...) inside
    tuples) before compare."""
    if type(x).__name__ == "ndarray":
        x = x.tolist()
    if isinstance(x, (list, tuple)):
        return tuple(_norm_cell(v) for v in x)
    return x


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].map(_norm_cell).astype(str)
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def compare_query(spark, sf_dir: str, name: str, spark_fn, oracle_sql: str) -> str | None:
    """Returns None on match, else a human-readable diff summary.

    Also ENFORCES the scalar-only output invariant (CLAUDE.md): the
    driver's canonicalizer sorts raw pandas columns and crashes on
    list cells (`unhashable type: 'list'` — the round-4
    embed_label_centroids red row), while _norm_cell below stringifies
    them, so a local pass would otherwise hide the driver failure."""
    df = spark_fn(spark, sf_dir)
    nonscalar = [
        f.name
        for f in df.schema.fields
        if f.dataType.typeName() in ("array", "map", "struct")
    ]
    if nonscalar:
        return (
            f"{name}: non-scalar output columns {nonscalar} — the driver "
            "hasher cannot canonicalize array/map/struct cells; explode to "
            "per-element rows or render a deterministic string"
        )
    sdf = df.toPandas()
    con = duck_con(sf_dir)
    ddf = con.execute(oracle_sql).df()
    con.close()
    if sorted(sdf.columns) != sorted(ddf.columns):
        return f"{name}: columns differ spark={sorted(sdf.columns)} duck={sorted(ddf.columns)}"
    if len(sdf) != len(ddf):
        return f"{name}: rowcount spark={len(sdf)} duck={len(ddf)}"
    a, b = canon(sdf), canon(ddf)
    # numeric tolerance for float cols, exact otherwise
    for c in a.columns:
        if pd.api.types.is_float_dtype(a[c]) or pd.api.types.is_float_dtype(b[c]):
            av, bv = a[c].astype(float), b[c].astype(float)
            ok = ((av - bv).abs() < 1e-9) | (av.isna() & bv.isna())
            if not ok.all():
                bad = (~ok).idxmax()
                return f"{name}: float col {c} differs, e.g. row {bad}: {a[c][bad]} vs {b[c][bad]}"
        else:
            if not (a[c].astype(str) == b[c].astype(str)).all():
                bad = (a[c].astype(str) != b[c].astype(str)).idxmax()
                return f"{name}: col {c} differs, e.g. row {bad}: {a[c][bad]!r} vs {b[c][bad]!r}"
    return None
