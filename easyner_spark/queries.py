"""Driver-contract queries: Spark DataFrame implementations + DuckDB oracles.

Each entry exercises operators from SURVEY.md §2 over the driver's
testdata tables (documents / TPC-H star / events / embeddings). The
KG-pipeline queries treat ``documents.text`` as whitespace-token prose:
token := non-empty split(' ') element, sentence := window of 10 tokens
— so every stage (tokenize → mention → link → analyze → triple) is
expressible both as an idiomatic Spark plan and as ANSI SQL DuckDB can
run for the value-hash comparison.

Cross-engine determinism rules used throughout (see tests):
* counts/ranks are BIGINT/INT with explicit casts on both sides;
* money aggregates go through DECIMAL(18,2) (exact) and are cast to
  DOUBLE only at the end — one identical rounding on both engines;
* ratios divide exact integers (IEEE-identical) and are round()ed;
* hashes are md5 hex strings (identical in Spark and DuckDB);
* timestamps are compared as unix microseconds (unix_micros /
  epoch_us), never as engine-native timestamp values.
"""

from __future__ import annotations

import functools
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

# ---------------------------------------------------------------------------
# shared dimension literals (embedded: the contract gazetteer / NEL lookup
# for the word-soup corpus; reference analogs: dictionaries/*.txt and the
# 3-column NEL TSV of scripts/nel.py:20-25)
# ---------------------------------------------------------------------------

GAZ: dict[str, str] = {
    "spark": "engine",
    "join": "op",
    "hash": "op",
    "sort": "op",
    "merge": "op",
    "filter": "op",
    "scan": "op",
    "window": "op",
    "stream": "op",
    "batch": "op",
    "table": "obj",
    "row": "obj",
    "column": "obj",
    "vector": "obj",
    "dup": "marker",
}

NEL: dict[str, tuple[str, str]] = {
    "spark": ("CONCEPT:1", "Apache Spark"),
    "join": ("CONCEPT:2", "Join Operator"),
    "hash": ("CONCEPT:3", "Hash Function"),
    "table": ("CONCEPT:4", "Table"),
    "row": ("CONCEPT:5", "Row"),
    "window": ("CONCEPT:6", "Window Operator"),
    "scan": ("CONCEPT:7", "Scan Operator"),
}

SEARCH_TERMS = ["spark", "dup"]
STOPWORDS = ["the", "a", "of", "to", "in", "and", "is"]
N_BATCHES = 8
SENT_LEN = 10
MINHASH_SEEDS = 8
LSH_PLANES = 8
KNN_QUERIES = 10
KNN_K = 3
IVF_NLIST = 8
IVF_NPROBE = 2

_GAZ_ITEMS = sorted(GAZ.items())
_NEL_ITEMS = sorted((e, i, n) for e, (i, n) in NEL.items())


def _sql_values_gaz() -> str:
    return ", ".join(f"('{t}', '{c}')" for t, c in _GAZ_ITEMS)


def _sql_values_nel() -> str:
    return ", ".join(f"('{e}', '{i}', '{n}')" for e, i, n in _NEL_ITEMS)


def _read(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


_SPREAD_OPEN_COST = 4 * 1024 * 1024  # spark.sql.files.openCostInBytes default


def _table_bytes(sf_dir: str, name: str) -> int | None:
    """On-disk bytes of a testdata table (file or directory); None for
    non-local paths (cluster: leave the scan alone)."""
    import os

    path = f"{sf_dir}/{name}.parquet"
    try:
        if os.path.isfile(path):
            return os.path.getsize(path)
        return sum(
            os.path.getsize(os.path.join(r, f))
            for r, _d, fs in os.walk(path)
            for f in fs
        )
    except OSError:
        return None


def _spread(df: DataFrame, sf_dir: str, name: str) -> DataFrame:
    """Input-skew guard (r6 opt, guide §2.5): the testdata parquet files
    hold ONE row group, so Spark's byte-range splits collapse onto a
    single task and every narrow expression chain above the first
    exchange runs on one core. When the table is small enough that the
    scan cannot yield defaultParallelism real splits (bytes <
    parallelism × openCostInBytes — the same constant Spark's split
    packing charges per file), spread the still-narrow rows round-robin
    across the cores: a few MB of shuffle that unlocks the tokenize/
    slide work. Scale-adaptive by construction — a production table is
    past the threshold (or non-local → probe returns None) and no
    shuffle is added. The probe is a local stat call, not a Spark job,
    so sub-second queries don't pay a JVM round-trip for it."""
    b = _table_bytes(sf_dir, name)
    if b is None:
        return df
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    if b < target * _SPREAD_OPEN_COST:
        df = df.repartition(target)
    return df


# ---------------------------------------------------------------------------
# shared Spark building blocks
# ---------------------------------------------------------------------------

def _embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """embeddings scan behind the same _spread guard (vector math above
    the first exchange is the expensive part)."""
    return _spread(_read(spark, sf_dir, "embeddings"), sf_dir, "embeddings")



def _doc_tokens(docs: DataFrame) -> DataFrame:
    """(doc_id, text) → (doc_id, pos, token): ONE definition of the
    contract tokenization (non-empty split(' ') elements, within-row
    order via posexplode — narrow, no shuffle). tokens() and the
    epoch-dedup sig_fn both build on this, so the oracle's _TOKS_CTE
    has exactly one Spark twin."""
    return docs.select(
        "doc_id",
        F.posexplode(F.split("text", " ")).alias("pos", "token"),
    ).filter(F.col("token") != "")


def tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → (doc_id, pos, sent_idx, batch_id, token). Narrow plan:
    posexplode keeps within-row order, no shuffle (the _spread guard
    redistributes the pre-explode rows when the scan is one split)."""
    return (
        _doc_tokens(_spread(_read(spark, sf_dir, "documents").select("doc_id", "text"), sf_dir, "documents"))
        .select(
            "doc_id",
            "pos",
            F.expr(f"CAST(pos DIV {SENT_LEN} AS INT)").alias("sent_idx"),
            F.expr(f"CAST(doc_id % {N_BATCHES} AS INT)").alias("batch_id"),
            "token",
        )
    )


_TOKS_CTE = f"""
WITH toks0 AS (
  SELECT doc_id, unnest(lst) AS token, unnest(range(len(lst))) AS p
  FROM (SELECT doc_id, string_split(text, ' ') AS lst FROM documents) t
),
toks AS (
  SELECT doc_id,
         CAST(p AS INT) AS pos,
         CAST(p // {SENT_LEN} AS INT) AS sent_idx,
         CAST(doc_id % {N_BATCHES} AS INT) AS batch_id,
         token
  FROM toks0 WHERE token <> ''
)
"""


def gaz_df(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(_GAZ_ITEMS, "term string, class string")


def nel_df(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(_NEL_ITEMS, "entity string, id string, name string")


def mentions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gazetteer match = broadcast semi-style inner join token==term."""
    return (
        tokens(spark, sf_dir)
        .join(F.broadcast(gaz_df(spark)), F.col("token") == F.col("term"))
        .select(
            "doc_id",
            "batch_id",
            "sent_idx",
            "pos",
            F.col("token").alias("surface"),
            "class",
        )
    )


_MENTIONS_CTE = (
    _TOKS_CTE
    + f""",
gaz(term, class) AS (VALUES {_sql_values_gaz()}),
mentions AS (
  SELECT doc_id, batch_id, sent_idx, pos, token AS surface, class
  FROM toks JOIN gaz ON token = term
)
"""
)


def linked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEL: broadcast left join + deterministic mint (J1 re-spec)."""
    from .stages.nel import link_entities

    lk = nel_df(spark)
    out, _ = link_entities(mentions(spark, sf_dir), lk)
    return out.select(
        "doc_id", "batch_id", "sent_idx", "pos", "surface", "class", "ent_id", "ent_name"
    )


_LINKED_CTE = (
    _MENTIONS_CTE
    + f""",
nel(entity, id, name) AS (VALUES {_sql_values_nel()}),
miss(surface, mint_id) AS (
  SELECT surface,
         'easyner:' || CAST(ROW_NUMBER() OVER (ORDER BY surface) AS VARCHAR)
  FROM (SELECT DISTINCT m.surface
        FROM mentions m LEFT JOIN nel ON m.surface = nel.entity
        WHERE nel.id IS NULL) u
),
linked AS (
  SELECT m.doc_id, m.batch_id, m.sent_idx, m.pos, m.surface, m.class,
         COALESCE(nel.id, miss.mint_id) AS ent_id,
         COALESCE(nel.name, m.surface) AS ent_name
  FROM mentions m
  LEFT JOIN nel ON m.surface = nel.entity
  LEFT JOIN miss ON m.surface = miss.surface
)
"""
)


def sentences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sentence windows rebuilt from tokens (deterministic order-by-pos).

    r6 opt (guide §2.4): a sentence is a fixed window of SENT_LEN raw
    split positions of one row's text, so the rebuild is intra-row —
    slice the split array per window and drop empty tokens. The old
    groupBy(doc_id, sent_idx)+collect_list shuffled every token and
    object-hash-aggregated them back into the very arrays the row
    already held; this plan is narrow (scan → project → explode, ZERO
    exchanges). Row set and values are identical: slice order == pos
    order, concat_ws == array_join, size(non-empty) == count(*), and
    windows with no non-empty token had no group before == filtered
    here."""
    docs = _spread(_read(spark, sf_dir, "documents").select("doc_id", "text"), sf_dir, "documents")
    return (
        docs.select(
            "doc_id",
            F.expr("split(text, ' ')").alias("_raw"),
        )
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    f"transform(sequence(0, CAST((size(_raw) + {SENT_LEN - 1})"
                    f" DIV {SENT_LEN} AS INT) - 1),"
                    f" i -> named_struct("
                    f"'sent_idx', CAST(i AS INT),"
                    f" 'toks', filter(slice(_raw, i * {SENT_LEN} + 1,"
                    f" {SENT_LEN}), x -> x != '')))"
                )
            ).alias("_s"),
        )
        .select(
            "doc_id",
            F.col("_s.sent_idx").alias("sent_idx"),
            F.expr("concat_ws(' ', _s.toks)").alias("sent_text"),
            F.expr("size(_s.toks)").cast("bigint").alias("n_tokens"),
        )
        .filter(F.col("n_tokens") > 0)
    )


_SENTENCES_CTE = (
    _TOKS_CTE
    + """,
sentences AS (
  SELECT doc_id, sent_idx,
         string_agg(token, ' ' ORDER BY pos) AS sent_text,
         CAST(count(*) AS BIGINT) AS n_tokens
  FROM toks GROUP BY doc_id, sent_idx
)
"""
)

# trigram shingles over in-doc token sequence (for dedup/fingerprint ops)


def shingles(spark: SparkSession, sf_dir: str) -> DataFrame:
    # r6 opt (guide §2.4): the non-empty token sequence of a document
    # is derivable intra-row from its text — filter(split(...)) — so
    # the shingle slide needs NO groupBy/collect_list exchange at all.
    # Every shingle consumer (jaccard/containment/minhash/boilerplate/
    # contamination/novelty) drops one full-corpus shuffle. Same rows:
    # filter() preserves split order == pos order, and the slide
    # expression below is byte-identical to _shingles_from_tokens'.
    per_doc = _spread(
        _read(spark, sf_dir, "documents").select("doc_id", "text"),
        sf_dir,
        "documents",
    ).select(
        "doc_id",
        F.expr("filter(split(text, ' '), x -> x != '')").alias("toks"),
    )
    return _slide_shingles(per_doc)


def _shingles_from_tokens(t: DataFrame) -> DataFrame:
    """(doc_id, pos, token) → (doc_id, shingle). Split out so composite
    queries (train_corpus_curated) can feed ONE materialized token
    frame to every shingle consumer instead of re-tokenizing per
    branch."""
    # window-free construction: collect per doc then slide — cheaper than
    # a 3-way self-join and keeps one shuffle
    per_doc = t.groupBy("doc_id").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "token"))),
            lambda s: s["token"],
        ).alias("toks")
    )
    return _slide_shingles(per_doc)


def _slide_shingles(per_doc: DataFrame) -> DataFrame:
    """(doc_id, toks array) → (doc_id, shingle): the ONE trigram slide
    expression, shared by the shuffled token-frame path
    (_shingles_from_tokens) and the narrow from-text path (shingles)
    so the two can never drift."""
    return per_doc.select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(0, greatest(size(toks) - 3, -1)),"
                " i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2]))"
            )
        ).alias("shingle"),
    ).filter(F.col("shingle") != "")


_SHINGLES_CTE = (
    _TOKS_CTE
    + """,
doc_toks AS (
  SELECT doc_id, list(token ORDER BY pos) AS toks FROM toks GROUP BY doc_id
),
shingles AS (
  SELECT doc_id, toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3] AS shingle
  FROM (SELECT doc_id, toks, unnest(range(greatest(len(toks) - 2, 0))) AS i
        FROM doc_toks) z
)
"""
)


# ---------------------------------------------------------------------------
# the registry
# ---------------------------------------------------------------------------

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


# --------------------------- KG pipeline queries ---------------------------


@register(
    "kg_tokens",
    _TOKS_CTE + "SELECT doc_id, pos, sent_idx, batch_id, token FROM toks",
)
def q_kg_tokens(spark, sf_dir):
    return tokens(spark, sf_dir)


@register(
    "kg_sentences",
    _SENTENCES_CTE + "SELECT doc_id, sent_idx, sent_text, n_tokens FROM sentences",
)
def q_kg_sentences(spark, sf_dir):
    return sentences(spark, sf_dir).select("doc_id", "sent_idx", "sent_text", "n_tokens")


@register(
    "kg_mentions",
    _MENTIONS_CTE
    + "SELECT doc_id, batch_id, sent_idx, pos, surface, class FROM mentions",
)
def q_kg_mentions(spark, sf_dir):
    return mentions(spark, sf_dir)


@register(
    "kg_linked",
    _LINKED_CTE
    + "SELECT doc_id, batch_id, sent_idx, pos, surface, class, ent_id, ent_name FROM linked",
)
def q_kg_linked(spark, sf_dir):
    return linked(spark, sf_dir)


@register(
    "kg_new_entities",
    _MENTIONS_CTE
    + f""",
nel(entity, id, name) AS (VALUES {_sql_values_nel()})
SELECT surface AS entity,
       'easyner:' || CAST(ROW_NUMBER() OVER (ORDER BY surface) AS VARCHAR) AS id,
       surface AS name
FROM (SELECT DISTINCT m.surface
      FROM mentions m LEFT JOIN nel ON m.surface = nel.entity
      WHERE nel.id IS NULL) u
""",
)
def q_kg_new_entities(spark, sf_dir):
    from .stages.nel import link_entities

    _, new = link_entities(mentions(spark, sf_dir), nel_df(spark))
    return new


def _two_phase_rank(agg, count_col, tie_cols, out="rnk"):
    """Global RANK() over (count_col DESC, tie_cols) without a global
    sort. Requirement: (count_col, *tie_cols) is unique per row, so
    RANK == bucket-local row_number + rows-in-higher-buckets. The big
    table windows hash-partitioned BY count_col; only the per-bucket
    count table (|distinct counts| rows — Zipf-bounded) crosses a
    single partition for the offset prefix-sum. Same pattern as the
    NEL mint (stages/nel.py:_dense_rank_by), numeric leading key.

    The input aggregate is localCheckpoint-ed: rank side and offset
    side both consume it, and Catalyst does not dedupe the two logical
    subtrees (no ReusedExchange across a multi-consumer fan-out) —
    without this the upstream pipeline executes twice. Offsets derive
    from the windowed side so both consumers share the
    exchange-on-count_col subplan (ReusedExchange)."""
    agg = agg.localCheckpoint()
    local = agg.withColumn(
        "_r",
        F.row_number().over(W.partitionBy(count_col).orderBy(*tie_cols)),
    )
    # offset = rows in HIGHER-count buckets, via a theta self-join over
    # the per-bucket count table instead of an unpartitioned prefix-sum
    # window: O(|distinct counts|²) on a Zipf-bounded aggregate, zero
    # single-partition exchanges anywhere in the plan
    cnts = local.groupBy(count_col).agg(F.count("*").alias("_n"))
    higher = cnts.select(
        F.col(count_col).alias("_k2"), F.col("_n").alias("_n2")
    )
    offsets = (
        cnts.join(F.broadcast(higher), F.col("_k2") > F.col(count_col), "left")
        .groupBy(count_col)
        .agg(F.coalesce(F.sum("_n2"), F.lit(0)).alias("_off"))
    )
    return (
        local.join(F.broadcast(offsets), count_col)
        .withColumn(out, (F.col("_off") + F.col("_r")).cast("bigint"))
        .drop("_r", "_off")
    )


@register(
    "kg_entity_frequency",
    _MENTIONS_CTE
    + """
SELECT surface,
       CAST(count(*) AS BIGINT) AS total_count,
       CAST(count(DISTINCT doc_id) AS BIGINT) AS articles_spanned,
       CAST(count(DISTINCT batch_id) AS BIGINT) AS batches_spanned,
       round(CAST(count(*) AS DOUBLE) / count(DISTINCT doc_id), 6) AS freq_per_article,
       round(CAST(count(*) AS DOUBLE) / count(DISTINCT batch_id), 6) AS freq_per_batch,
       string_agg(DISTINCT CAST(batch_id AS VARCHAR), '; ' ORDER BY CAST(batch_id AS VARCHAR)) AS batch_set,
       CAST(RANK() OVER (ORDER BY count(*) DESC, surface) AS BIGINT) AS rnk
FROM mentions
GROUP BY surface
""",
)
def q_kg_entity_frequency(spark, sf_dir):
    m = mentions(spark, sf_dir)
    # r6 opt (guide §2.3): the one-shot agg with TWO count(DISTINCT)
    # groups planned an Expand — every mention row was tripled and
    # object-hash-aggregated (no codegen) over a 4-column key. Two-level
    # instead: pre-aggregate by (surface, doc_id, batch_id) — a codegen
    # hash agg whose exchange carries one row per (surface, doc) — then
    # derive every statistic without any distinct aggregate (batch_id
    # is doc_id-determined, so (surface, doc_id) is unique in g;
    # batches_spanned == size of the collected batch set). Same values.
    g = m.groupBy("surface", "doc_id", "batch_id").agg(
        F.count("*").alias("c")
    )
    agg = (
        g.groupBy("surface")
        .agg(
            F.sum("c").cast("bigint").alias("total_count"),
            F.count("*").cast("bigint").alias("articles_spanned"),
            F.array_sort(
                F.collect_set(F.col("batch_id").cast("string"))
            ).alias("_bs"),
        )
        .select(
            "surface",
            "total_count",
            "articles_spanned",
            F.size("_bs").cast("bigint").alias("batches_spanned"),
            F.array_join(F.col("_bs"), "; ").alias("batch_set"),
        )
    )
    # (total_count DESC, surface) is a unique total order (surface is
    # the group key), so RANK == the two-phase bucketed row_number —
    # no global single-partition window (the round-2 weak item).
    return _two_phase_rank(agg, "total_count", ["surface"]).select(
        "surface",
        "total_count",
        "articles_spanned",
        "batches_spanned",
        F.round(
            F.col("total_count").cast("double") / F.col("articles_spanned"), 6
        ).alias("freq_per_article"),
        F.round(
            F.col("total_count").cast("double") / F.col("batches_spanned"), 6
        ).alias("freq_per_batch"),
        "batch_set",
        "rnk",
    )


@register(
    "kg_id_frequency",
    _LINKED_CTE
    + """
SELECT ent_id,
       min(ent_name) AS name,
       string_agg(DISTINCT surface, '; ' ORDER BY surface) AS entities_list,
       CAST(count(*) AS BIGINT) AS total_count,
       CAST(count(DISTINCT doc_id) AS BIGINT) AS articles_spanned,
       CAST(RANK() OVER (ORDER BY count(*) DESC, ent_id) AS BIGINT) AS rnk
FROM linked
GROUP BY ent_id
""",
)
def q_kg_id_frequency(spark, sf_dir):
    lk = linked(spark, sf_dir)
    agg = lk.groupBy("ent_id").agg(
        F.min("ent_name").alias("name"),
        F.array_join(F.array_sort(F.collect_set("surface")), "; ").alias(
            "entities_list"
        ),
        F.count("*").alias("total_count"),
        F.countDistinct("doc_id").alias("articles_spanned"),
    )
    # (total_count DESC, ent_id) is unique per row — two-phase bucketed
    # rank, same reasoning as kg_entity_frequency.
    return _two_phase_rank(agg, "total_count", ["ent_id"]).select(
        "ent_id", "name", "entities_list", "total_count", "articles_spanned", "rnk"
    )


@register(
    "kg_triples",
    _LINKED_CTE
    + """
SELECT a.ent_name AS subj,
       'co_occurs_with' AS pred,
       b.ent_name AS obj,
       a.doc_id, a.sent_idx,
       a.pos AS subj_pos, b.pos AS obj_pos
FROM linked a JOIN linked b
  ON a.doc_id = b.doc_id AND a.sent_idx = b.sent_idx AND a.pos < b.pos
""",
)
def q_kg_triples(spark, sf_dir):
    # r6 opt (guide §2.3/§2.4): both self-join sides re-ran the full
    # tokenize→NER→NEL chain (2 parquet scans + 2 SMJ exchanges of
    # independently recomputed data in the before plan). Materialize
    # once, projected to the four columns the pair join consumes.
    lk = (
        linked(spark, sf_dir)
        .select("doc_id", "sent_idx", "pos", "ent_name")
        .localCheckpoint()
    )
    a, b = lk.alias("a"), lk.alias("b")
    return a.join(
        b,
        (F.col("a.doc_id") == F.col("b.doc_id"))
        & (F.col("a.sent_idx") == F.col("b.sent_idx"))
        & (F.col("a.pos") < F.col("b.pos")),
    ).select(
        F.col("a.ent_name").alias("subj"),
        F.lit("co_occurs_with").alias("pred"),
        F.col("b.ent_name").alias("obj"),
        F.col("a.doc_id").alias("doc_id"),
        F.col("a.sent_idx").alias("sent_idx"),
        F.col("a.pos").alias("subj_pos"),
        F.col("b.pos").alias("obj_pos"),
    )


@register(
    "kg_triple_counts",
    _LINKED_CTE
    + """
SELECT subj, pred, obj, n_cooccur,
       CAST(RANK() OVER (ORDER BY n_cooccur DESC, subj, obj) AS BIGINT) AS rnk
FROM (
  SELECT a.ent_name AS subj, 'co_occurs_with' AS pred, b.ent_name AS obj,
         CAST(count(*) AS BIGINT) AS n_cooccur
  FROM linked a JOIN linked b
    ON a.doc_id = b.doc_id AND a.sent_idx = b.sent_idx AND a.pos < b.pos
  GROUP BY 1, 2, 3
) t
""",
)
def q_kg_triple_counts(spark, sf_dir):
    """Global rank without a global sort: (n_cooccur DESC, subj, obj)
    is unique per row, so RANK == the two-phase bucketed row_number —
    see _two_phase_rank for the partitioning/ReusedExchange argument."""
    t = QUERIES["kg_triples"](spark, sf_dir)
    agg = t.groupBy("subj", "pred", "obj").agg(F.count("*").alias("n_cooccur"))
    return _two_phase_rank(agg, "n_cooccur", ["subj", "obj"]).select(
        "subj", "pred", "obj", "n_cooccur", "rnk"
    )


@register(
    "kg_entity_search",
    _SENTENCES_CTE
    + f"""
SELECT s.doc_id, s.sent_idx, s.sent_text
FROM sentences s
WHERE EXISTS (
  SELECT 1 FROM toks t
  WHERE t.doc_id = s.doc_id AND t.sent_idx = s.sent_idx
    AND t.token IN ({', '.join(repr(t) for t in SEARCH_TERMS)})
)
""",
)
def q_kg_entity_search(spark, sf_dir):
    # r6 opt (guide §2.4): the before plan re-ran the tokenize pipeline
    # for the semi-join probe side (2 parquet scans + a distinct + a
    # semi-join exchange). The EXISTS is a per-sentence ANY over the
    # sentence's own tokens — and sent_text is the non-empty tokens
    # single-space-joined, so split(sent_text) reproduces exactly that
    # token set. With the narrow sentences() rebuild the whole query is
    # scan → project → explode → filter: ZERO exchanges, zero joins.
    terms = F.array(*[F.lit(t) for t in SEARCH_TERMS])
    return (
        sentences(spark, sf_dir)
        .filter(F.arrays_overlap(F.split("sent_text", " "), terms))
        .select("doc_id", "sent_idx", "sent_text")
    )


@register(
    "kg_doc_term_freq",
    _MENTIONS_CTE
    + """
SELECT doc_id, surface, CAST(count(*) AS BIGINT) AS n,
       CAST(ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY count(*) DESC, surface) AS BIGINT) AS rnk
FROM mentions GROUP BY doc_id, surface
""",
)
def q_kg_doc_term_freq(spark, sf_dir):
    m = mentions(spark, sf_dir).groupBy("doc_id", "surface").agg(F.count("*").alias("n"))
    return m.withColumn(
        "rnk",
        F.row_number()
        .over(W.partitionBy("doc_id").orderBy(F.desc("n"), "surface"))
        .cast("bigint"),
    )


@register(
    "kg_batch_counters",
    f"""
SELECT CAST(doc_id % {N_BATCHES} AS INT) AS batch_id,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens,
       md5(string_agg(md5(text), '' ORDER BY md5(text))) AS batch_audit
FROM documents
GROUP BY 1
""",
)
def q_kg_batch_counters(spark, sf_dir):
    d = _read(spark, sf_dir, "documents")
    return (
        d.select(
            F.expr(f"CAST(doc_id % {N_BATCHES} AS INT)").alias("batch_id"),
            F.size(F.split("text", " ")).alias("n_tok"),
            F.md5(F.col("text").cast("binary")).alias("h"),
        )
        .groupBy("batch_id")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tok").cast("bigint").alias("n_tokens"),
            F.md5(
                F.array_join(F.array_sort(F.collect_list("h")), "").cast("binary")
            ).alias("batch_audit"),
        )
    )


# ----------------------- TPC-H relational plumbing -------------------------
# These exercise the generic operator surface (S1/P1-P3/J/A/W/U in
# SURVEY.md §2) on the star schema; money math goes through
# DECIMAL(18,2) on both engines so sums are exact and hash-identical.


@register(
    "tpch_pricing_summary",
    """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
       CAST(count(*) AS BIGINT) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2003-01-01 00:00:00'
GROUP BY l_returnflag, l_linestatus
""",
)
def q_tpch_pricing_summary(spark, sf_dir):
    li = _read(spark, sf_dir, "lineitem")
    d = lambda c: F.col(c).cast("decimal(18,2)")  # noqa: E731
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2003-01-01 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(d("l_quantity")).cast("double").alias("sum_qty"),
            F.sum(d("l_extendedprice")).cast("double").alias("sum_base_price"),
            F.sum(d("l_extendedprice") * (F.lit(1) - d("l_discount")))
            .cast("double")
            .alias("sum_disc_price"),
            F.count("*").alias("count_order"),
        )
    )


@register(
    "tpch_revenue_by_nation",
    """
SELECT n.n_name AS nation,
       CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
       CAST(count(*) AS BIGINT) AS n_lineitems
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
GROUP BY n.n_name
""",
)
def q_tpch_revenue_by_nation(spark, sf_dir):
    li = _read(spark, sf_dir, "lineitem")
    o = _read(spark, sf_dir, "orders")
    c = _read(spark, sf_dir, "customer")
    n = _read(spark, sf_dir, "nation")
    d = lambda c_: F.col(c_).cast("decimal(18,2)")  # noqa: E731
    # dims broadcast; the only real shuffle is lineitem⋈orders on orderkey
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.sum(d("l_extendedprice") * (F.lit(1) - d("l_discount")))
            .cast("double")
            .alias("revenue"),
            F.count("*").alias("n_lineitems"),
        )
    )


@register(
    "tpch_profit_by_nation_year",
    """
SELECT n.n_name AS nation,
       CAST(EXTRACT(year FROM o.o_orderdate) AS INT) AS o_year,
       CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS profit,
       CAST(count(*) AS BIGINT) AS n_lineitems
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey AND p.p_type = 'ECONOMY'
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
JOIN orders o ON l.l_orderkey = o.o_orderkey
GROUP BY n.n_name, EXTRACT(year FROM o.o_orderdate)
""",
)
def q_tpch_profit_by_nation_year(spark, sf_dir):
    """TPC-H Q9-shaped five-way join (part filter → supplier nation →
    order year): the multi-join planning surface. part/supplier/nation
    are broadcast dims; the only big-big shuffle is lineitem⋈orders on
    orderkey, and the part filter prunes lineitem BEFORE that shuffle
    (Catalyst pushes the broadcast join below the exchange)."""
    li = _read(spark, sf_dir, "lineitem")
    p = _read(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    s = _read(spark, sf_dir, "supplier")
    n = _read(spark, sf_dir, "nation")
    o = _read(spark, sf_dir, "orders")
    d = lambda c_: F.col(c_).cast("decimal(18,2)")  # noqa: E731
    return (
        li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .join(F.broadcast(s), li["l_suppkey"] == s["s_suppkey"])
        .join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
        .join(o, li["l_orderkey"] == o["o_orderkey"])
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("int").alias("o_year"),
        )
        .agg(
            F.sum(d("l_extendedprice") * (F.lit(1) - d("l_discount")))
            .cast("double")
            .alias("profit"),
            F.count("*").alias("n_lineitems"),
        )
    )


@register(
    "tpch_semi_join_customers",
    """
SELECT c.c_custkey, c.c_name
FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)
""",
)
def q_tpch_semi_join_customers(spark, sf_dir):
    c = _read(spark, sf_dir, "customer")
    o = _read(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 300000)
    return c.join(o, c["c_custkey"] == o["o_custkey"], "left_semi").select(
        "c_custkey", "c_name"
    )


@register(
    "tpch_anti_join_customers",
    """
SELECT c.c_custkey, c.c_mktsegment
FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
""",
)
def q_tpch_anti_join_customers(spark, sf_dir):
    c = _read(spark, sf_dir, "customer")
    o = _read(spark, sf_dir, "orders")
    return c.join(o, c["c_custkey"] == o["o_custkey"], "left_anti").select(
        "c_custkey", "c_mktsegment"
    )


@register(
    "tpch_topk_orders_per_segment",
    """
SELECT c_mktsegment, o_orderkey,
       CAST(o_totalprice AS DOUBLE) AS o_totalprice, CAST(rnk AS BIGINT) AS rnk
FROM (
  SELECT c.c_mktsegment, o.o_orderkey, o.o_totalprice,
         ROW_NUMBER() OVER (PARTITION BY c.c_mktsegment
                            ORDER BY o.o_totalprice DESC, o.o_orderkey) AS rnk
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
) t WHERE rnk <= 5
""",
)
def q_tpch_topk_orders_per_segment(spark, sf_dir):
    o = _read(spark, sf_dir, "orders")
    c = _read(spark, sf_dir, "customer")
    w = W.partitionBy("c_mktsegment").orderBy(F.desc("o_totalprice"), "o_orderkey")
    return (
        o.join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .select("c_mktsegment", "o_orderkey", F.col("o_totalprice").cast("double"))
        .withColumn("rnk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rnk") <= 5)
    )


@register(
    "tpch_running_total",
    """
SELECT o_custkey, o_orderkey,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
         PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_total
FROM orders
""",
)
def q_tpch_running_total(spark, sf_dir):
    o = _read(spark, sf_dir, "orders")
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .over(w)
        .cast("double")
        .alias("running_total"),
    )


# ------------------------------ events table -------------------------------


@register(
    "events_latest_per_user",
    """
SELECT user_id, event_id, event_type, CAST(epoch_us(ts) AS BIGINT) AS ts_us
FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
) t WHERE rn = 1
""",
)
def q_events_latest_per_user(spark, sf_dir):
    e = _read(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        e.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_id", "event_type", F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"))
    )


@register(
    "events_sessionize",
    """
SELECT user_id,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(SUM(is_new) AS BIGINT) AS n_sessions
FROM (
  SELECT user_id,
         CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER
                (PARTITION BY user_id ORDER BY ts, event_id) > 1800000000
              OR LAG(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
              THEN 1 ELSE 0 END AS is_new
  FROM events
) t GROUP BY user_id
""",
)
def q_events_sessionize(spark, sf_dir):
    e = _read(spark, sf_dir, "events").withColumn("us", F.unix_micros(F.col("ts").cast("timestamp")))
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.col("us") - F.lag("us").over(w)
    return (
        e.withColumn(
            "is_new",
            F.when(gap.isNull() | (gap > 1_800_000_000), 1).otherwise(0),
        )
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.sum("is_new").cast("bigint").alias("n_sessions"),
        )
    )


@register(
    "events_tumbling_hourly",
    """
SELECT CAST(epoch_us(date_trunc('hour', ts)) AS BIGINT) AS hour_us,
       event_type,
       CAST(count(*) AS BIGINT) AS n,
       CAST(SUM(CAST(floor(CAST(value AS DOUBLE) * 1e6 + 0.5) AS BIGINT))
            AS DOUBLE) / 1e6 AS total_value
FROM events GROUP BY 1, 2
""",
)
def q_events_tumbling_hourly(spark, sf_dir):
    """Float rule: per-value IEEE quantization to micro-units + exact
    BIGINT sum + one final division — double→DECIMAL casts round
    differently between engines at the 6th-decimal boundary (HALF_UP on
    the decimal string vs binary), so DECIMAL(18,6) is NOT a safe
    cross-engine recipe for arbitrary doubles."""
    e = _read(spark, sf_dir, "events")
    return (
        e.groupBy(
            F.unix_micros(F.date_trunc("hour", F.col("ts").cast("timestamp"))).alias("hour_us"), "event_type"
        )
        .agg(
            F.count("*").alias("n"),
            (
                F.sum(
                    F.floor(
                        F.col("value").cast("double") * F.lit(1e6) + F.lit(0.5)
                    ).cast("bigint")
                ).cast("double")
                / F.lit(1e6)
            ).alias("total_value"),
        )
    )


@register(
    "events_error_band_join",
    """
SELECT a.user_id, a.event_id AS error_id, b.event_id AS near_id, b.event_type AS near_type
FROM events a JOIN events b
  ON a.user_id = b.user_id
 AND a.event_type = 'error' AND b.event_id <> a.event_id
 AND epoch_us(b.ts) BETWEEN epoch_us(a.ts) - 60000000 AND epoch_us(a.ts) + 60000000
""",
)
def q_events_error_band_join(spark, sf_dir):
    e = _read(spark, sf_dir, "events").withColumn("us", F.unix_micros(F.col("ts").cast("timestamp")))
    a = e.filter(F.col("event_type") == "error").alias("a")
    b = e.alias("b")
    return a.join(
        b,
        (F.col("a.user_id") == F.col("b.user_id"))
        & (F.col("b.event_id") != F.col("a.event_id"))
        & (F.col("b.us") >= F.col("a.us") - 60_000_000)
        & (F.col("b.us") <= F.col("a.us") + 60_000_000),
    ).select(
        F.col("a.user_id").alias("user_id"),
        F.col("a.event_id").alias("error_id"),
        F.col("b.event_id").alias("near_id"),
        F.col("b.event_type").alias("near_type"),
    )


# ------------------- training-data pipeline operators ----------------------
# First-class at 100 TB: dedup (exact / Jaccard / MinHash-LSH), document
# quality + language scoring, fingerprinting, embedding similarity search.


@register(
    "dedup_exact",
    """
SELECT md5(text) AS text_hash,
       CAST(count(*) AS BIGINT) AS n_dups,
       CAST(min(doc_id) AS BIGINT) AS keeper_doc_id
FROM documents GROUP BY md5(text) HAVING count(*) > 1
""",
)
def q_dedup_exact(spark, sf_dir):
    d = _read(spark, sf_dir, "documents")
    return (
        d.select("doc_id", F.md5(F.col("text").cast("binary")).alias("text_hash"))
        .groupBy("text_hash")
        .agg(
            F.count("*").alias("n_dups"),
            F.min("doc_id").cast("bigint").alias("keeper_doc_id"),
        )
        .filter(F.col("n_dups") > 1)
    )


@register(
    "dedup_jaccard",
    _SHINGLES_CTE
    + """,
ds AS (SELECT DISTINCT doc_id, shingle FROM shingles),
sizes AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n FROM ds GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, CAST(count(*) AS BIGINT) AS n_inter
  FROM ds a JOIN ds b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT i.doc_a, i.doc_b, i.n_inter,
       sa.n + sb.n - i.n_inter AS n_union,
       round(CAST(i.n_inter AS DOUBLE) / (sa.n + sb.n - i.n_inter), 6) AS jaccard
FROM inter i
JOIN sizes sa ON i.doc_a = sa.doc_id
JOIN sizes sb ON i.doc_b = sb.doc_id
WHERE CAST(i.n_inter AS DOUBLE) / (sa.n + sb.n - i.n_inter) >= 0.5
""",
)
def q_dedup_jaccard(spark, sf_dir):
    # r6 opt (guide §2.4): the distinct shingle frame fans out to THREE
    # consumers (both self-join sides + the per-doc size agg) and
    # Catalyst does not dedupe identical logical subtrees — the plan
    # re-ran the whole tokenize→shingle pipeline 4× (4 parquet scans in
    # the before plan). One localCheckpoint makes it run once.
    ds = shingles(spark, sf_dir).distinct().localCheckpoint()
    sizes = ds.groupBy("doc_id").agg(F.count("*").alias("n"))
    a = ds.alias("a")
    # r6 opt (guide §3.1): pick the join strategy deliberately — the
    # planner broadcast-hashed this self-join (the checkpointed frame
    # LOOKS small), but the shingle key repeats ~94× per value, so the
    # probe side pays ~128M hash lookups into a 2.6M-entry relation.
    # Sort-merge emits the matched blocks by merging sorted runs:
    # A/B'd warm at sf1.0, BHJ 20.5 s vs SMJ 8.8 s for the
    # intersection. Same rows either way.
    b = ds.hint("merge").alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count("*").alias("n_inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb"))
    jac = F.col("n_inter").cast("double") / (
        F.col("na") + F.col("nb") - F.col("n_inter")
    )
    return (
        inter.join(F.broadcast(sa), "doc_a")
        .join(F.broadcast(sb), "doc_b")
        .withColumn("n_union", F.col("na") + F.col("nb") - F.col("n_inter"))
        .filter(jac >= 0.5)
        .select(
            "doc_a",
            "doc_b",
            "n_inter",
            "n_union",
            F.round(
                F.col("n_inter").cast("double") / F.col("n_union"), 6
            ).alias("jaccard"),
        )
    )


def _minhash_sig_exprs_sql() -> str:
    return ", ".join(
        f"min(md5('{s}|' || shingle)) AS h{s}" for s in range(MINHASH_SEEDS)
    )


@register(
    "dedup_minhash_pairs",
    _SHINGLES_CTE
    + f""",
sigs AS (
  SELECT doc_id, {_minhash_sig_exprs_sql()}
  FROM shingles GROUP BY doc_id
),
bands AS (
  SELECT doc_id, unnest([md5(h0 || h1 || h2 || h3), md5(h4 || h5 || h6 || h7)]) AS band_hash,
         unnest([0, 1]) AS band_id
  FROM sigs
)
SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
FROM bands a JOIN bands b
  ON a.band_hash = b.band_hash AND a.band_id = b.band_id AND a.doc_id < b.doc_id
""",
)
def q_dedup_minhash_pairs(spark, sf_dir):
    """MinHash-LSH candidate pairs: the scale path for near-dup detection.

    Signature = MINHASH_SEEDS min-hashes over trigram shingles; banded
    into 2 bands of 4 → equi-join on band hash only (no all-pairs).
    md5 is used as the hash family so Spark and DuckDB agree bit-for-bit
    (min over hex strings = lexicographic in both engines).

    Skew at scale: a hot band bucket (boilerplate pages sharing one
    signature) makes this self-join quadratic IN THAT BUCKET. The
    engine twin (stages/canonical.py lsh_candidate_pairs) caps+salts
    hot buckets (max_bucket) — a deliberate recall trade the oracle
    contract can't make. This contract query instead relies on Spark
    AQE skew-join splitting (spark.sql.adaptive.enabled +
    adaptive.skewJoin.enabled, on by default in session.get_spark),
    which rewrites oversized shuffle partitions at runtime WITHOUT
    changing the pair set — oracle parity preserved, stragglers bounded.
    """
    return _minhash_pairs_from(shingles(spark, sf_dir))


def _md5_sig_cols(sh: DataFrame) -> DataFrame:
    """(doc_id, shingle) → (doc_id, h0..h{S-1}): ONE definition of the
    cross-engine md5 minhash family (the Spark twin of
    _minhash_sig_exprs_sql — min over hex strings is lexicographic in
    both engines). dedup_minhash_pairs and the epoch-dedup sig_fn both
    build on this so the two can never drift apart."""
    return sh.groupBy("doc_id").agg(
        *[
            F.min(
                F.md5(F.concat(F.lit(f"{s}|"), F.col("shingle")).cast("binary"))
            ).alias(f"h{s}")
            for s in range(MINHASH_SEEDS)
        ]
    )


def _minhash_pairs_from(sh: DataFrame) -> DataFrame:
    """(doc_id, shingle) → (doc_a, doc_b) LSH candidate pairs; split
    out so composite queries reuse one materialized shingle frame."""
    sigs = _md5_sig_cols(sh)
    bands = sigs.select(
        "doc_id",
        F.explode(
            F.array(
                F.struct(
                    F.md5(F.concat("h0", "h1", "h2", "h3").cast("binary")).alias(
                        "band_hash"
                    ),
                    F.lit(0).alias("band_id"),
                ),
                F.struct(
                    F.md5(F.concat("h4", "h5", "h6", "h7").cast("binary")).alias(
                        "band_hash"
                    ),
                    F.lit(1).alias("band_id"),
                ),
            )
        ).alias("b"),
    ).select("doc_id", "b.band_hash", "b.band_id")
    # r6 opt (guide §2.4): both self-join sides consumed the band frame
    # and Catalyst does not dedupe the fan-out — the whole
    # tokenize→shingle→minhash-signature pipeline ran twice (one full
    # pass per side in the before plan). Materialize once.
    bands = bands.localCheckpoint()
    a, b = bands.alias("a"), bands.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )


@register(
    "doc_quality_scores",
    _TOKS_CTE
    + """
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_tokens,
       CAST(count(DISTINCT token) AS BIGINT) AS n_distinct,
       round(CAST(count(DISTINCT token) AS DOUBLE) / count(*), 6) AS ttr,
       round(CAST(SUM(len(token)) AS DOUBLE) / count(*), 6) AS avg_token_len,
       CAST(max(len(token)) AS BIGINT) AS max_token_len
FROM toks GROUP BY doc_id
""",
)
def q_doc_quality_scores(spark, sf_dir):
    # r6 opt (guide §2.4): every statistic is a function of ONE row's
    # token multiset — derive it intra-row from filter(split(text))
    # instead of exploding all tokens and shuffling them back into
    # per-doc groups (the before plan's countDistinct exchange carried
    # every distinct (doc, token) pair). ZERO exchanges now. Values
    # identical: integer counts/sums are order-free, the two double
    # divisions are the same operations on the same exact integers.
    # the tokens-exist guard is length(trim(text)) > 0 — equivalent to
    # size(_t) > 0 (a doc tokenizes empty iff its text is all spaces)
    # but cheap under filter pushdown: a size(_t) filter below the
    # projection would re-evaluate the whole tokenize chain per row.
    d = _spread(
        _read(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .filter(F.expr("length(trim(text)) > 0")),
        sf_dir,
        "documents",
    )
    return (
        d.select(
            "doc_id",
            F.expr("filter(split(text, ' '), x -> x != '')").alias("_t"),
        )
        .select(
            "doc_id",
            F.size("_t").cast("bigint").alias("n_tokens"),
            F.size(F.array_distinct("_t")).cast("bigint").alias("n_distinct"),
            F.round(
                F.size(F.array_distinct("_t")).cast("double") / F.size("_t"), 6
            ).alias("ttr"),
            F.round(
                F.expr(
                    "aggregate(_t, CAST(0 AS BIGINT), (acc, x) -> acc + length(x))"
                ).cast("double")
                / F.size("_t"),
                6,
            ).alias("avg_token_len"),
            F.expr("array_max(transform(_t, x -> length(x)))")
            .cast("bigint")
            .alias("max_token_len"),
        )
    )


@register(
    "lang_id_stopword",
    _TOKS_CTE
    + f"""
SELECT t.doc_id,
       CAST(SUM(CASE WHEN token IN ({', '.join(repr(s) for s in STOPWORDS)}) THEN 1 ELSE 0 END) AS BIGINT) AS n_stop,
       CAST(count(*) AS BIGINT) AS n_tokens,
       CASE WHEN SUM(CASE WHEN token IN ({', '.join(repr(s) for s in STOPWORDS)}) THEN 1 ELSE 0 END) * 20 >= count(*)
            THEN 'en' ELSE 'other' END AS pred_lang,
       min(d.lang) AS lang
FROM toks t JOIN documents d ON t.doc_id = d.doc_id
GROUP BY t.doc_id
""",
)
def q_lang_id_stopword(spark, sf_dir):
    # r6 opt (guide §2.4): the stopword count is a per-row property and
    # lang already sits on the same documents row — no explode, no
    # shuffle-back, no join. ZERO exchanges (before: explode + join +
    # grouped agg). Integer-only predicate unchanged.
    stop_list = ", ".join(f"'{s}'" for s in STOPWORDS)
    # same trim-guard as doc_quality_scores (cheap pushdown-safe filter)
    d = _spread(
        _read(spark, sf_dir, "documents")
        .select("doc_id", "lang", "text")
        .filter(F.expr("length(trim(text)) > 0")),
        sf_dir,
        "documents",
    )
    return (
        d.select(
            "doc_id",
            "lang",
            F.expr("filter(split(text, ' '), x -> x != '')").alias("_t"),
        )
        .select(
            "doc_id",
            F.expr(f"size(filter(_t, x -> x IN ({stop_list})))")
            .cast("bigint")
            .alias("n_stop"),
            F.size("_t").cast("bigint").alias("n_tokens"),
            "lang",
        )
        .withColumn(
            "pred_lang",
            F.when(F.col("n_stop") * 20 >= F.col("n_tokens"), "en").otherwise(
                "other"
            ),
        )
        .select("doc_id", "n_stop", "n_tokens", "pred_lang", "lang")
    )


@register(
    "doc_fingerprint",
    _SHINGLES_CTE
    + """
SELECT doc_id,
       min(md5(shingle)) AS fingerprint,
       CAST(count(DISTINCT shingle) AS BIGINT) AS n_shingles
FROM shingles GROUP BY doc_id
""",
)
def q_doc_fingerprint(spark, sf_dir):
    """Winnowing-style document fingerprint: min-hash of trigram shingles
    (rolling-hash analog with a cross-engine-stable hash)."""
    # r6 opt (guide §2.4): both aggregates are functions of one row's
    # shingle multiset — compute them intra-row over the same slide
    # expression shingles() uses (no explode, no shuffle-back; ZERO
    # exchanges). array_min over md5 hex strings == F.min (both
    # lexicographic); size(array_distinct) == count(DISTINCT).
    # _sh is empty iff the doc tokenizes empty (any non-empty token
    # yields at least the i=0 concat) — use the cheap trim-guard, and
    # keep the md5 argmin in a codegen'd explode+agg (an intra-row
    # transform(md5) measured far slower interpreted); the exchange
    # carries one partial row per doc.
    per_doc = _spread(
        _read(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .filter(F.expr("length(trim(text)) > 0")),
        sf_dir,
        "documents",
    ).select(
        "doc_id",
        F.expr("filter(split(text, ' '), x -> x != '')").alias("toks"),
    )
    return (
        _slide_shingles(per_doc)
        .groupBy("doc_id")
        .agg(
            F.min(F.md5(F.col("shingle").cast("binary"))).alias("fingerprint"),
            F.countDistinct("shingle").alias("n_shingles"),
        )
    )


@register(
    "token_count_estimate",
    """
SELECT doc_id,
       CAST(len(string_split(text, ' ')) AS BIGINT) AS n_ws_tokens,
       CAST(ceil(length(text) / 4.0) AS BIGINT) AS n_bpe_estimate,
       CAST(length(text) AS BIGINT) AS n_chars
FROM documents
""",
)
def q_token_count_estimate(spark, sf_dir):
    d = _read(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.size(F.split("text", " ")).cast("bigint").alias("n_ws_tokens"),
        F.ceil(F.length("text") / 4.0).cast("bigint").alias("n_bpe_estimate"),
        F.length("text").cast("bigint").alias("n_chars"),
    )


# --------------------- embedding similarity search -------------------------


@register(
    "embed_knn_bruteforce",
    f"""
WITH q AS (
  SELECT vec_id AS qid, unnest(embedding) AS qv,
         unnest(range(len(embedding))) AS pos
  FROM embeddings WHERE vec_id < {KNN_QUERIES}
),
c AS (
  SELECT vec_id AS cid, unnest(embedding) AS cv,
         unnest(range(len(embedding))) AS pos
  FROM embeddings
),
dots AS (
  SELECT q.qid, c.cid,
         SUM(CAST(q.qv AS DOUBLE) * CAST(c.cv AS DOUBLE)) AS dot,
         SUM(CAST(q.qv AS DOUBLE) * CAST(q.qv AS DOUBLE)) AS qq,
         SUM(CAST(c.cv AS DOUBLE) * CAST(c.cv AS DOUBLE)) AS cc
  FROM q JOIN c ON q.pos = c.pos AND q.qid <> c.cid
  GROUP BY q.qid, c.cid
),
ranked AS (
  SELECT qid, cid, round(dot / sqrt(qq * cc), 6) AS cosine,
         ROW_NUMBER() OVER (PARTITION BY qid
                            ORDER BY round(dot / sqrt(qq * cc), 6) DESC, cid) AS rnk
  FROM dots
)
SELECT qid, cid, cosine, CAST(rnk AS BIGINT) AS rnk FROM ranked WHERE rnk <= {KNN_K}
""",
)
def q_embed_knn_bruteforce(spark, sf_dir):
    """Brute-force cosine top-k: the exactness baseline for ANN.

    The query side (vec_id < KNN_QUERIES) is tiny → broadcast; the dot
    product runs JVM-side via zip_with + aggregate (no UDF, stays in
    whole-stage codegen)."""
    e = _embeddings(spark, sf_dir)
    # r6 opt (guide §1.2): the squared norms depend on ONE side each,
    # but were evaluated per PAIR — |Q|·|C| interpreted higher-order
    # aggregates instead of |Q|+|C|. Hoist them onto the input frames;
    # the cosine expression (dot / sqrt(qq·cc)) evaluates the identical
    # double arithmetic per pair, so values are bit-identical.
    norm2 = (
        "aggregate(transform({a}, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),"
        " 0D, (acc, v) -> acc + v)"
    )
    q = e.filter(F.col("vec_id") < KNN_QUERIES).select(
        F.col("vec_id").alias("qid"),
        F.col("embedding").alias("qe"),
        F.expr(norm2.format(a="embedding")).alias("qq"),
    )
    c = e.select(
        F.col("vec_id").alias("cid"),
        F.col("embedding").alias("ce"),
        F.expr(norm2.format(a="embedding")).alias("cc"),
    )
    dot = F.expr(
        "aggregate(zip_with(qe, ce, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),"
        " 0D, (acc, v) -> acc + v)"
    )
    pairs = F.broadcast(q).join(c, F.col("qid") != F.col("cid"))
    scored = pairs.select(
        "qid",
        "cid",
        F.round(dot / F.sqrt(F.col("qq") * F.col("cc")), 6).alias("cosine"),
    )
    w = W.partitionBy("qid").orderBy(F.desc("cosine"), "cid")
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rnk") <= KNN_K)
    )


@register(
    "embed_ivf_knn",
    f"""
WITH v AS (
  SELECT vec_id, unnest(embedding) AS val, unnest(range(len(embedding))) AS pos
  FROM embeddings
),
cent_ids AS (
  SELECT vec_id AS cvid,
         CAST(ROW_NUMBER() OVER (ORDER BY h, vec_id) - 1 AS INT) AS list_id
  FROM (SELECT vec_id, md5(CAST(vec_id AS VARCHAR)) AS h
        FROM embeddings ORDER BY h, vec_id LIMIT {IVF_NLIST}) t
),
cent AS (
  SELECT c.list_id, v.pos, CAST(v.val AS DOUBLE) AS cval
  FROM cent_ids c JOIN v ON v.vec_id = c.cvid
),
sims AS (
  SELECT a.vec_id, c.list_id,
         round(SUM(CAST(a.val AS DOUBLE) * c.cval) /
               sqrt(SUM(CAST(a.val AS DOUBLE) * CAST(a.val AS DOUBLE)) * SUM(c.cval * c.cval)), 6) AS sim
  FROM v a JOIN cent c ON a.pos = c.pos
  GROUP BY a.vec_id, c.list_id
),
assign AS (
  SELECT vec_id, list_id FROM (
    SELECT vec_id, list_id,
           ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY sim DESC, list_id) AS rn
    FROM sims) t
  WHERE rn = 1
),
probes AS (
  SELECT qid, list_id FROM (
    SELECT vec_id AS qid, list_id,
           ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY sim DESC, list_id) AS rn
    FROM sims WHERE vec_id < {KNN_QUERIES}) t
  WHERE rn <= {IVF_NPROBE}
),
cands AS (
  SELECT p.qid, a.vec_id AS cid
  FROM probes p JOIN assign a ON a.list_id = p.list_id
  WHERE a.vec_id <> p.qid
),
dots AS (
  SELECT cd.qid, cd.cid,
         SUM(CAST(qv.val AS DOUBLE) * CAST(cv.val AS DOUBLE)) AS dot,
         SUM(CAST(qv.val AS DOUBLE) * CAST(qv.val AS DOUBLE)) AS qq,
         SUM(CAST(cv.val AS DOUBLE) * CAST(cv.val AS DOUBLE)) AS cc
  FROM cands cd
  JOIN v qv ON qv.vec_id = cd.qid
  JOIN v cv ON cv.vec_id = cd.cid AND cv.pos = qv.pos
  GROUP BY cd.qid, cd.cid
),
ranked AS (
  SELECT qid, cid, round(dot / sqrt(qq * cc), 6) AS cosine,
         ROW_NUMBER() OVER (PARTITION BY qid
                            ORDER BY round(dot / sqrt(qq * cc), 6) DESC, cid) AS rnk
  FROM dots
)
SELECT CAST(qid AS BIGINT) AS qid, CAST(cid AS BIGINT) AS cid, cosine,
       CAST(rnk AS BIGINT) AS rnk
FROM ranked WHERE rnk <= {KNN_K}
""",
)
def q_embed_ivf_knn(spark, sf_dir):
    """IVF ANN end-to-end through the REAL ops.similarity functions:
    deterministic centroid sample (TakeOrderedAndProject) → broadcast
    argmax assignment → probe the nprobe nearest inverted lists →
    exact re-rank inside them — the full index structure value-checked
    against an independent SQL formulation. Contract determinism: the
    centroid order key is md5 (xxhash64 is not in DuckDB) and
    similarities are rounded to 6 before every argmax/rank on both
    engines (same recipe as embed_knn_bruteforce)."""
    from .ops.similarity import ivf_build, ivf_search

    e = _embeddings(spark, sf_dir)
    okey = F.md5(F.col("vec_id").cast("string").cast("binary"))
    cents, assigns = ivf_build(e, nlist=IVF_NLIST, order_key=okey, sim_round=6)
    q = e.filter(F.col("vec_id") < KNN_QUERIES).select("vec_id", "embedding")
    out = ivf_search(
        e, cents, assigns, q, k=KNN_K, nprobe=IVF_NPROBE, sim_round=6
    )
    return out.select(
        F.col("qid").cast("bigint").alias("qid"),
        F.col("cid").cast("bigint").alias("cid"),
        "cosine",
        F.col("rnk").cast("bigint").alias("rnk"),
    )


def _lsh_plane_sql() -> str:
    # deterministic ±1 hyperplane coefficients from md5 parity — identical
    # in both engines (ascii of first hex char of md5("p|d"))
    return (
        "CASE WHEN ascii(substring(md5(CAST(plane AS VARCHAR) || '|' ||"
        " CAST(pos AS VARCHAR)), 1, 1)) % 2 = 0 THEN 1 ELSE -1 END"
    )


# r6 opt (guide §2.3/§1.2): the hyperplane coefficient depends only on
# (plane, pos) — a tiny deterministic matrix. Evaluate the md5 parity
# rule ONCE at plan-build time (hashlib.md5 == both engines' md5) and
# inline the ±1 literals, instead of exploding every vector into
# rows × dims × planes rows and recomputing an md5 on each: the bucket
# of a vector becomes one narrow per-row expression (sequential
# left-to-right aggregate — the same pos order the oracle's unnest
# sums in), and the only exchange left is the final bucket agg.
_LSH_COEF_LEN = 256  # covers any dim ≤ 256 (corpus embeddings are 64-d)


def _lsh_coef_literal(plane: int) -> str:
    import hashlib

    coefs = []
    for pos in range(_LSH_COEF_LEN):
        c = hashlib.md5(f"{plane}|{pos}".encode()).hexdigest()[0]
        coefs.append("1" if ord(c) % 2 == 0 else "-1")
    return f"array({', '.join(coefs)})"


def _lsh_bucket_expr() -> str:
    """BIGINT bucket id of the `embedding` column under the md5-parity
    hyperplane family — the Spark twin of the oracle's proj/bits CTEs."""
    terms = []
    for plane in range(LSH_PLANES):
        p = (
            f"aggregate(transform(embedding, (x, i) -> CAST(x AS DOUBLE)"
            f" * element_at({_lsh_coef_literal(plane)}, i + 1)),"
            " 0D, (acc, v) -> acc + v)"
        )
        terms.append(f"CASE WHEN ({p}) >= 0 THEN {1 << plane} ELSE 0 END")
    return "CAST(" + " + ".join(terms) + " AS BIGINT)"


@register(
    "embed_lsh_buckets",
    f"""
WITH v AS (
  SELECT vec_id, unnest(embedding) AS val, unnest(range(len(embedding))) AS pos
  FROM embeddings
),
proj AS (
  SELECT vec_id, plane,
         SUM(CAST(val AS DOUBLE) * ({_lsh_plane_sql()})) AS p
  FROM v, generate_series(0, {LSH_PLANES - 1}) s(plane)
  GROUP BY vec_id, plane
),
bits AS (
  SELECT vec_id, CAST(SUM(CASE WHEN p >= 0 THEN 1 << CAST(plane AS INT) ELSE 0 END) AS BIGINT) AS bucket
  FROM proj GROUP BY vec_id
)
SELECT bucket, CAST(count(*) AS BIGINT) AS n_vecs,
       CAST(min(vec_id) AS BIGINT) AS min_vec_id
FROM bits GROUP BY bucket
""",
)
def q_embed_lsh_buckets(spark, sf_dir):
    """Random-hyperplane LSH bucketing: the scale path for ANN — bucket
    first, then search within buckets (candidate set ≪ corpus)."""
    e = _embeddings(spark, sf_dir)
    # see _lsh_bucket_expr: plan-time coefficients, no explode, no md5
    bits = e.select("vec_id", F.expr(_lsh_bucket_expr()).alias("bucket"))
    return bits.groupBy("bucket").agg(
        F.count("*").alias("n_vecs"),
        F.min("vec_id").cast("bigint").alias("min_vec_id"),
    )


@register(
    "multimodal_blob_meta",
    """
SELECT doc_id,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       md5(text) AS payload_md5,
       substring(text, 1, 16) AS head_preview
FROM documents
""",
)
def q_multimodal_blob_meta(spark, sf_dir):
    """Opaque-binary plumbing: treat the payload as a blob, compute typed
    metadata JVM-side. The decode/feature-extract step for real
    image/audio payloads lives in easyner_spark.ops.multimodal (Pandas
    UDF over mapInPandas, stubbed — libs not in this container)."""
    d = _read(spark, sf_dir, "documents")
    blob = F.encode(F.col("text"), "utf-8")
    return d.select(
        "doc_id",
        F.octet_length(blob).cast("bigint").alias("n_bytes"),
        F.md5(blob).alias("payload_md5"),
        F.substring("text", 1, 16).alias("head_preview"),
    )


SIMHASH_BITS = 16


@register(
    "dedup_simhash",
    _TOKS_CTE
    + f""",
bitvals AS (
  SELECT doc_id, b.b AS bit,
         SUM(CASE WHEN ascii(substring(md5(token), b.b + 1, 1)) % 2 = 0
                  THEN 1 ELSE -1 END) AS v
  FROM toks, generate_series(0, {SIMHASH_BITS - 1}) b(b)
  GROUP BY doc_id, b.b
),
sigs AS (
  SELECT doc_id,
         CAST(SUM(CASE WHEN v >= 0 THEN 1 << CAST(bit AS INT) ELSE 0 END) AS BIGINT) AS simhash
  FROM bitvals GROUP BY doc_id
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
FROM sigs a JOIN sigs b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= 2
""",
)
def q_dedup_simhash(spark, sf_dir):
    """SimHash near-dup pairs: 16-bit signature from md5-parity token
    hashes; candidate pairs at Hamming distance <= 2. The all-pairs
    join is the CORRECTNESS oracle shape — the scale path buckets by
    simhash bands exactly like dedup_minhash_pairs."""
    t = tokens(spark, sf_dir)
    # r6 opt (guide §2.3/§1.2): the before plan exploded every token ×16
    # bit rows and recomputed md5(token) on EACH — 16 md5 calls per
    # token and a 16×-wider shuffle into the (doc_id, bit) agg. Hoist
    # the md5 to once per token and fold all 16 bit counters into ONE
    # map-side-partial agg keyed by doc_id (±1 integer sums — exact and
    # order-invariant, so the result is bit-identical to the grouped
    # form the oracle still uses).
    h = t.select("doc_id", F.md5(F.col("token").cast("binary")).alias("h"))
    bit_sums = [
        F.sum(
            F.expr(
                f"CASE WHEN ascii(substring(h, {b + 1}, 1)) % 2 = 0"
                " THEN 1 ELSE -1 END"
            )
        ).alias(f"v{b}")
        for b in range(SIMHASH_BITS)
    ]
    sigs = (
        h.groupBy("doc_id")
        .agg(*bit_sums)
        .select(
            "doc_id",
            F.expr(
                "CAST("
                + " + ".join(
                    f"CASE WHEN v{b} >= 0 THEN {1 << b} ELSE 0 END"
                    for b in range(SIMHASH_BITS)
                )
                + " AS BIGINT)"
            ).alias("simhash"),
        )
        # both all-pairs join sides consume sigs — materialize once
        .localCheckpoint()
    )
    a, b = sigs.alias("a"), sigs.alias("b")
    ham = F.expr("bit_count(a.simhash ^ b.simhash)")
    return (
        a.join(b, F.col("a.doc_id") < F.col("b.doc_id"))
        .filter(ham <= 2)
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            ham.cast("bigint").alias("hamming"),
        )
    )


@register(
    "embed_lsh_knn",
    f"""
WITH v AS (
  SELECT vec_id, unnest(embedding) AS val, unnest(range(len(embedding))) AS pos
  FROM embeddings
),
proj AS (
  SELECT vec_id, plane, SUM(CAST(val AS DOUBLE) * ({_lsh_plane_sql()})) AS p
  FROM v, generate_series(0, {LSH_PLANES - 1}) s(plane)
  GROUP BY vec_id, plane
),
buckets AS (
  SELECT vec_id, CAST(SUM(CASE WHEN p >= 0 THEN 1 << CAST(plane AS INT) ELSE 0 END) AS BIGINT) AS bucket
  FROM proj GROUP BY vec_id
),
pairs AS (
  SELECT a.vec_id AS qid, b.vec_id AS cid
  FROM buckets a JOIN buckets b ON a.bucket = b.bucket AND a.vec_id <> b.vec_id
  WHERE a.vec_id < {KNN_QUERIES}
),
dots AS (
  SELECT p.qid, p.cid,
         SUM(CAST(q.val AS DOUBLE) * CAST(c.val AS DOUBLE)) AS dot,
         SUM(CAST(q.val AS DOUBLE) * CAST(q.val AS DOUBLE)) AS qq,
         SUM(CAST(c.val AS DOUBLE) * CAST(c.val AS DOUBLE)) AS cc
  FROM pairs p
  JOIN v q ON q.vec_id = p.qid
  JOIN v c ON c.vec_id = p.cid AND c.pos = q.pos
  GROUP BY p.qid, p.cid
)
SELECT qid, cid, round(dot / sqrt(qq * cc), 6) AS cosine,
       CAST(ROW_NUMBER() OVER (PARTITION BY qid
            ORDER BY round(dot / sqrt(qq * cc), 6) DESC, cid) AS BIGINT) AS rnk
FROM dots
QUALIFY rnk <= {KNN_K}
""",
)
def q_embed_lsh_knn(spark, sf_dir):
    """LSH-bucketed approximate kNN — the scale path for similarity
    search: candidates restricted to the query's hyperplane bucket
    (candidate set ~ corpus/2^planes), exact cosine re-ranking inside
    the bucket. Compare embed_knn_bruteforce for the exact baseline."""
    e = _embeddings(spark, sf_dir)
    # r6 opt: same plan-time-coefficient bucket expression as
    # embed_lsh_buckets (no explode, no per-row md5); the bucket frame
    # feeds both join sides, so materialize it once (guide §2.4).
    buckets = e.select(
        "vec_id", F.expr(_lsh_bucket_expr()).alias("bucket")
    ).localCheckpoint()
    a = buckets.filter(F.col("vec_id") < KNN_QUERIES).select(
        F.col("vec_id").alias("qid"), "bucket"
    )
    b = buckets.select(F.col("vec_id").alias("cid"), "bucket")
    pairs = a.join(b, "bucket").filter(F.col("qid") != F.col("cid")).select("qid", "cid")

    # r6 opt: norms hoisted onto the per-vector frames (one evaluation
    # per vector, not per candidate pair) — same double arithmetic per
    # pair, identical values (see embed_knn_bruteforce).
    norm2 = (
        "aggregate(transform({a}, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),"
        " 0D, (acc, v) -> acc + v)"
    )
    qe = e.select(
        F.col("vec_id").alias("qid"),
        F.col("embedding").alias("qe"),
        F.expr(norm2.format(a="embedding")).alias("qq"),
    )
    ce = e.select(
        F.col("vec_id").alias("cid"),
        F.col("embedding").alias("ce"),
        F.expr(norm2.format(a="embedding")).alias("cc"),
    )
    dot = F.expr(
        "aggregate(zip_with(qe, ce, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),"
        " 0D, (acc, v) -> acc + v)"
    )
    scored = (
        pairs.join(F.broadcast(qe), "qid")
        .join(ce, "cid")
        .select(
            "qid",
            "cid",
            F.round(dot / F.sqrt(F.col("qq") * F.col("cc")), 6).alias("cosine"),
        )
    )
    w = W.partitionBy("qid").orderBy(F.desc("cosine"), "cid")
    return scored.withColumn("rnk", F.row_number().over(w).cast("bigint")).filter(
        F.col("rnk") <= KNN_K
    )


@register(
    "kg_cooccur_pmi",
    _MENTIONS_CTE
    + """,
doc_terms AS (SELECT DISTINCT doc_id, surface FROM mentions),
n_docs AS (SELECT CAST(count(DISTINCT doc_id) AS BIGINT) AS n FROM toks),
term_docs AS (SELECT surface, CAST(count(*) AS BIGINT) AS df FROM doc_terms GROUP BY surface),
pair_docs AS (
  SELECT a.surface AS term_a, b.surface AS term_b, CAST(count(*) AS BIGINT) AS df_ab
  FROM doc_terms a JOIN doc_terms b
    ON a.doc_id = b.doc_id AND a.surface < b.surface
  GROUP BY 1, 2
)
SELECT p.term_a, p.term_b, p.df_ab, ta.df AS df_a, tb.df AS df_b,
       round(ln((CAST(p.df_ab AS DOUBLE) * n.n) / (CAST(ta.df AS DOUBLE) * tb.df)), 6) AS pmi
FROM pair_docs p
JOIN term_docs ta ON p.term_a = ta.surface
JOIN term_docs tb ON p.term_b = tb.surface
CROSS JOIN n_docs n
WHERE p.df_ab >= 3
""",
)
def q_kg_cooccur_pmi(spark, sf_dir):
    """Document-level PMI for co-occurring entity pairs — the scoring
    layer a KG builder puts on top of raw co-occurrence triples."""
    m = mentions(spark, sf_dir)
    # r6 opt (guide §2.4): doc_terms feeds THREE consumers (df agg +
    # both pair-join sides) — materialize the distinct frame once.
    doc_terms = m.select("doc_id", "surface").distinct().localCheckpoint()
    # lazy 1-row aggregate, cross-joined broadcast — the query stays a
    # single Spark job instead of an eager .count() pre-pass
    n_docs = tokens(spark, sf_dir).agg(
        F.countDistinct("doc_id").cast("bigint").alias("_n_docs")
    )
    term_docs = doc_terms.groupBy("surface").agg(F.count("*").alias("df"))
    a, b = doc_terms.alias("a"), doc_terms.alias("b")
    pair_docs = (
        a.join(
            b,
            (F.col("a.doc_id") == F.col("b.doc_id"))
            & (F.col("a.surface") < F.col("b.surface")),
        )
        .groupBy(
            F.col("a.surface").alias("term_a"), F.col("b.surface").alias("term_b")
        )
        .agg(F.count("*").alias("df_ab"))
        .filter(F.col("df_ab") >= 3)
    )
    ta = term_docs.select(F.col("surface").alias("term_a"), F.col("df").alias("df_a"))
    tb = term_docs.select(F.col("surface").alias("term_b"), F.col("df").alias("df_b"))
    return (
        pair_docs.join(F.broadcast(ta), "term_a")
        .join(F.broadcast(tb), "term_b")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "term_a",
            "term_b",
            "df_ab",
            "df_a",
            "df_b",
            F.round(
                F.log(
                    F.col("df_ab").cast("double")
                    * F.col("_n_docs")
                    / (F.col("df_a").cast("double") * F.col("df_b"))
                ),
                6,
            ).alias("pmi"),
        )
    )


# ---------------- real-engine UDF paths, cross-checked vs SQL ---------------
# These run the ACTUAL pipeline UDFs (vectorized gazetteer matcher,
# punkt-style splitter) over the documents table and validate them
# against pure-SQL oracles — the strongest cross-engine check the
# driver gate can express for non-relational operators.


@register(
    "ner_udf_surface_counts",
    _TOKS_CTE
    + f""",
gaz(term, class) AS (VALUES {_sql_values_gaz()})
SELECT token AS surface, min(class) AS class, CAST(count(*) AS BIGINT) AS n
FROM toks JOIN gaz ON token = term
GROUP BY token
""",
)
def q_ner_udf_surface_counts(spark, sf_dir):
    """The engine's vectorized n-gram matcher (textops.match_terms_batch
    inside stages.ner_dict) over the documents text, aggregated to
    per-surface counts. The oracle recomputes the same counts purely in
    SQL via token membership — every GAZ term is single-token and the
    corpus is \\w+-only, so UDF semantics and SQL semantics coincide
    exactly; a mismatch means the Arrow/numpy matcher diverged."""
    from .stages.ner_dict import dict_ner

    docs = _read(spark, sf_dir, "documents").select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.expr(f"CAST(doc_id % {N_BATCHES} AS INT)").alias("batch_id"),
        F.lit(0).alias("sent_idx"),
        F.col("text"),
    )
    m = dict_ner(docs, GAZ)
    return m.groupBy("surface").agg(
        F.min("class").alias("class"), F.count("*").alias("n")
    )


@register(
    "split_udf_passthrough",
    """
SELECT CAST(doc_id AS VARCHAR) AS doc_id, 0 AS sent_idx, text AS sent_text
FROM documents WHERE length(trim(text)) > 0
""",
)
def q_split_udf_passthrough(spark, sf_dir):
    """The engine's sentence-splitter UDF over the documents text. The
    word-soup corpus has no sentence terminators, so the splitter must
    return exactly one sentence per document equal to the input text —
    SQL-checkable identity that still drives the full Arrow UDF path."""
    from .stages.split import split_documents

    docs = _read(spark, sf_dir, "documents").select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.lit(0).alias("batch_id"),
        "text",
    )
    s = split_documents(docs)
    return s.select(
        "doc_id", F.col("sent_idx").cast("int").alias("sent_idx"), F.col("text").alias("sent_text")
    )


@register(
    "dedup_components",
    _SHINGLES_CTE.replace("WITH ", "WITH RECURSIVE ", 1)
    + f""",
sigs AS (
  SELECT doc_id, {_minhash_sig_exprs_sql()}
  FROM shingles GROUP BY doc_id
),
bands AS (
  SELECT doc_id, unnest([md5(h0 || h1 || h2 || h3), md5(h4 || h5 || h6 || h7)]) AS band_hash,
         unnest([0, 1]) AS band_id
  FROM sigs
),
pairs AS (
  SELECT DISTINCT a.doc_id AS src, b.doc_id AS dst
  FROM bands a JOIN bands b
    ON a.band_hash = b.band_hash AND a.band_id = b.band_id AND a.doc_id < b.doc_id
),
edges AS (
  SELECT src AS u, dst AS v FROM pairs
  UNION SELECT dst, src FROM pairs
),
reach(node, label) AS (
  SELECT u, u FROM edges
  UNION
  SELECT e.v, r.label FROM reach r JOIN edges e ON e.u = r.node
)
SELECT node AS doc_id, CAST(min(label) AS BIGINT) AS component
FROM reach GROUP BY node
""",
)
def q_dedup_components(spark, sf_dir):
    """Near-duplicate document CLUSTERS: connected components (the
    engine's iterative min-label-propagation, stages/canonical.py) over
    the MinHash-LSH candidate pair graph. The DuckDB oracle computes
    the same components via a recursive-CTE reachability closure — the
    distributed iterative algorithm is thus value-checked against an
    independent sequential formulation."""
    from .stages.canonical import connected_components

    pairs = QUERIES["dedup_minhash_pairs"](spark, sf_dir).select(
        F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
    )
    comp = connected_components(pairs)
    return comp.select(
        F.col("node").alias("doc_id"), F.col("component").cast("bigint").alias("component")
    )


@register(
    "dedup_embedding_cosine",
    f"""
WITH v AS (
  SELECT vec_id, unnest(embedding) AS val, unnest(range(len(embedding))) AS pos
  FROM embeddings
),
proj AS (
  SELECT vec_id, plane, SUM(CAST(val AS DOUBLE) * ({_lsh_plane_sql()})) AS p
  FROM v, generate_series(0, {LSH_PLANES - 1}) s(plane)
  GROUP BY vec_id, plane
),
buckets AS (
  SELECT vec_id, CAST(SUM(CASE WHEN p >= 0 THEN 1 << CAST(plane AS INT) ELSE 0 END) AS BIGINT) AS bucket
  FROM proj GROUP BY vec_id
),
pairs AS (
  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b
  FROM buckets a JOIN buckets b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
),
dots AS (
  SELECT p.vec_a, p.vec_b,
         SUM(CAST(q.val AS DOUBLE) * CAST(c.val AS DOUBLE)) AS dot,
         SUM(CAST(q.val AS DOUBLE) * CAST(q.val AS DOUBLE)) AS qq,
         SUM(CAST(c.val AS DOUBLE) * CAST(c.val AS DOUBLE)) AS cc
  FROM pairs p
  JOIN v q ON q.vec_id = p.vec_a
  JOIN v c ON c.vec_id = p.vec_b AND c.pos = q.pos
  GROUP BY p.vec_a, p.vec_b
)
SELECT vec_a, vec_b, round(dot / sqrt(qq * cc), 6) AS cosine
FROM dots WHERE dot / sqrt(qq * cc) >= 0.93
""",
)
def q_dedup_embedding_cosine(spark, sf_dir):
    """Embedding-cosine near-duplicate pairs — the semantic-dedup scale
    path: LSH-bucket blocking (candidates share a hyperplane bucket)
    then exact cosine >= threshold inside the bucket. Complements the
    lexical dedup family (exact / Jaccard / MinHash / SimHash)."""
    e = _embeddings(spark, sf_dir)
    v = e.select("vec_id", F.posexplode("embedding").alias("pos", "val"))
    planes = F.explode(F.sequence(F.lit(0), F.lit(LSH_PLANES - 1))).alias("plane")
    coef = F.expr(
        "CASE WHEN ascii(substring(md5(CAST(plane AS STRING) || '|' ||"
        " CAST(pos AS STRING)), 1, 1)) % 2 = 0 THEN 1 ELSE -1 END"
    )
    proj = (
        v.select("vec_id", "pos", "val", planes)
        .groupBy("vec_id", "plane")
        .agg(F.sum(F.col("val").cast("double") * coef).alias("p"))
    )
    buckets = proj.groupBy("vec_id").agg(
        F.sum(F.expr("CASE WHEN p >= 0 THEN shiftleft(1, plane) ELSE 0 END"))
        .cast("bigint")
        .alias("bucket")
    )
    a = buckets.select(F.col("vec_id").alias("vec_a"), "bucket")
    b = buckets.select(F.col("vec_id").alias("vec_b"), "bucket")
    pairs = a.join(b, "bucket").filter(F.col("vec_a") < F.col("vec_b")).select(
        "vec_a", "vec_b"
    )
    qe = e.select(F.col("vec_id").alias("vec_a"), F.col("embedding").alias("qe"))
    ce = e.select(F.col("vec_id").alias("vec_b"), F.col("embedding").alias("ce"))
    dot = F.expr(
        "aggregate(zip_with(qe, ce, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),"
        " 0D, (acc, v) -> acc + v)"
    )
    qq = F.expr(
        "aggregate(transform(qe, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 0D, (acc, v) -> acc + v)"
    )
    cc = F.expr(
        "aggregate(transform(ce, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 0D, (acc, v) -> acc + v)"
    )
    cos = dot / F.sqrt(qq * cc)
    return (
        pairs.join(qe, "vec_a")
        .join(ce, "vec_b")
        .withColumn("_c", cos)
        .filter(F.col("_c") >= 0.93)
        .select("vec_a", "vec_b", F.round("_c", 6).alias("cosine"))
    )


@register(
    "tpch_rollup_revenue",
    """
SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
       COALESCE(l_linestatus, 'ALL') AS linestatus,
       CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS BIGINT) AS grp,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
       CAST(count(*) AS BIGINT) AS n
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
""",
)
def q_tpch_rollup_revenue(spark, sf_dir):
    """Hierarchical ROLLUP aggregate with GROUPING ids — the grouping-
    sets surface (no reference counterpart; part of the general
    relational surface a replacement engine must carry)."""
    li = _read(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("revenue"),
            F.count("*").alias("n"),
            F.grouping_id().cast("bigint").alias("grp"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "grp",
            "revenue",
            "n",
        )
    )


@register(
    "events_type_pivot",
    """
SELECT user_id,
       CAST(COUNT(*) FILTER (WHERE event_type = 'click') AS BIGINT) AS n_click,
       CAST(COUNT(*) FILTER (WHERE event_type = 'view') AS BIGINT) AS n_view,
       CAST(COUNT(*) FILTER (WHERE event_type = 'purchase') AS BIGINT) AS n_purchase,
       CAST(COUNT(*) FILTER (WHERE event_type = 'error') AS BIGINT) AS n_error,
       CAST(COUNT(*) FILTER (WHERE event_type = 'signup') AS BIGINT) AS n_signup
FROM events GROUP BY user_id
""",
)
def q_events_type_pivot(spark, sf_dir):
    """Pivot event types into per-user columns (Spark .pivot with an
    explicit value list = one pass, no second distinct-scan job)."""
    e = _read(spark, sf_dir, "events")
    types = ["click", "view", "purchase", "error", "signup"]
    out = (
        e.groupBy("user_id")
        .pivot("event_type", types)
        .count()
        .na.fill(0, types)
    )
    for t in types:
        out = out.withColumnRenamed(t, f"n_{t}").withColumn(
            f"n_{t}", F.col(f"n_{t}").cast("bigint")
        )
    return out


# ---------------------------------------------------------------------------
# round 2: driver-gated coverage for the remaining real engine paths —
# multi-token n-gram NER, the J3 conflict sweep, F8 separator merge,
# S9 span re-basing, A7 band-join P/R/F1.
#
# Corpus facts these oracles rely on (asserted in tests): documents.text
# is lowercase \w+ tokens joined by SINGLE spaces, no leading/trailing
# space — so the char offset of token i is the cumulative sum of
# length+1 over preceding tokens, and an n-gram surface slice equals the
# space-joined token sequence.
# ---------------------------------------------------------------------------

# multi-token gazetteer: bigrams, a hyphenated form (normalizes to
# "sort merge" — N1's token-level normalization, textops.normalize_term),
# an UPPERCASE form (case-insensitive matching, ner_spacy.py:41), two
# trigrams, and a unigram that overlaps the bigrams (PhraseMatcher emits
# ALL overlapping matches, ner_spacy.py:144-155).
NGRAM_GAZ: dict[str, str] = {
    "hash": "op",
    "hash join": "alg",
    "join order": "alg",
    "sort-merge": "alg",
    "MERGE JOIN": "alg",
    "the hash join": "tri",
    "table scan filter": "tri",
}


def _ngram_items() -> list[tuple[str, int, str]]:
    from .textops import normalize_term

    return sorted(
        (normalize_term(t), normalize_term(t).count(" ") + 1, c)
        for t, c in NGRAM_GAZ.items()
    )


# doc-level char-offset tokens + 1..3-gram candidates (shared by the
# n-gram NER / conflict-sweep / eval oracles)
_CTOKS_CTE = """
WITH toks0 AS (
  SELECT doc_id, unnest(lst) AS token, unnest(range(len(lst))) AS p
  FROM (SELECT doc_id, string_split(text, ' ') AS lst FROM documents) t
),
ctoks AS (
  SELECT doc_id, CAST(p AS INT) AS pos, token,
         CAST(COALESCE(SUM(length(token) + 1) OVER (
           PARTITION BY doc_id ORDER BY p
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS INT) AS cpos
  FROM toks0 WHERE token <> ''
),
grams AS (
  SELECT doc_id, pos, cpos,
         token AS g1,
         token || ' ' || LEAD(token, 1) OVER w AS g2,
         token || ' ' || LEAD(token, 1) OVER w || ' ' || LEAD(token, 2) OVER w AS g3
  FROM ctoks WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
)
"""


@register(
    "ner_udf_ngram_mentions",
    _CTOKS_CTE
    + f""",
gaz(term, n, class) AS (VALUES {", ".join(f"('{t}', {n}, '{c}')" for t, n, c in _ngram_items())}),
m AS (
  SELECT g.doc_id, g.cpos, z.term, z.class
  FROM grams g JOIN gaz z ON z.n = 1 AND g.g1 = z.term
  UNION ALL
  SELECT g.doc_id, g.cpos, z.term, z.class
  FROM grams g JOIN gaz z ON z.n = 2 AND g.g2 = z.term
  UNION ALL
  SELECT g.doc_id, g.cpos, z.term, z.class
  FROM grams g JOIN gaz z ON z.n = 3 AND g.g3 = z.term
)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(ROW_NUMBER() OVER (
         PARTITION BY doc_id ORDER BY cpos, cpos + length(term) - 1, class
       ) - 1 AS INT) AS mention_idx,
       term AS surface,
       cpos AS m_begin,
       CAST(cpos + length(term) - 1 AS INT) AS m_end,
       class
FROM m
""",
)
def q_ner_udf_ngram_mentions(spark, sf_dir):
    """The REAL vectorized n-gram gazetteer matcher
    (textops.match_terms_batch via stages.ner_dict) over multi-token /
    hyphenated / mixed-case terms, full-row checked: every (begin,
    end INCLUSIVE, surface, class, mention_idx) must equal the DuckDB
    token-ngram join. This is the path most likely to silently diverge
    (numpy shift alignment, NUL-blob offsets, normalization) —
    reference semantics: spaCy PhraseMatcher(attr="LOWER"),
    ner_spacy.py:41-54,144-159."""
    from .stages.ner_dict import dict_ner

    docs = _read(spark, sf_dir, "documents").select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        F.lit(0).alias("batch_id"),
        F.lit(0).alias("sent_idx"),
        "text",
    )
    m = dict_ner(docs, NGRAM_GAZ)
    return m.select(
        "doc_id",
        F.col("mention_idx").cast("int").alias("mention_idx"),
        "surface",
        F.col("begin").alias("m_begin"),
        F.col("end").alias("m_end"),
        "class",
    )


# J3 conflict-sweep gazetteer, chosen so every sweep outcome is
# closed-form (see q_merge_conflicts_resolved): A="slow hash" (9 chars)
# B="hash batch" (10 chars) overlap exactly when the trigram
# "slow hash batch" occurs; both first tokens are 4 chars so the second
# token always sits at begin+5.
CONFLICT_GAZ: dict[str, str] = {
    "slow": "adj",
    "hash": "op",
    "batch": "op",
    "slow hash": "alg",
    "hash batch": "alg",
}


@register(
    "merge_conflicts_resolved",
    _CTOKS_CTE
    + """,
ga AS (SELECT doc_id, cpos AS b FROM grams WHERE g2 = 'slow hash'),
gb AS (SELECT doc_id, cpos AS b FROM grams WHERE g2 = 'hash batch'),
a_surv AS (
  SELECT * FROM ga a
  WHERE NOT EXISTS (SELECT 1 FROM gb WHERE gb.doc_id = a.doc_id AND gb.b = a.b + 5)
),
u AS (
  SELECT doc_id, cpos AS b, token FROM ctoks
  WHERE token IN ('slow', 'hash', 'batch')
),
surv AS (
  SELECT doc_id, b AS m_begin, CAST(b + 9 AS INT) AS m_end,
         'hash batch' AS surface, 'alg' AS class
  FROM gb
  UNION ALL
  SELECT doc_id, b, CAST(b + 8 AS INT), 'slow hash', 'alg' FROM a_surv
  UNION ALL
  SELECT u.doc_id, u.b, CAST(u.b + length(u.token) - 1 AS INT), u.token,
         CASE u.token WHEN 'slow' THEN 'adj' ELSE 'op' END
  FROM u
  WHERE (u.token = 'slow' AND NOT EXISTS (
           SELECT 1 FROM a_surv s WHERE s.doc_id = u.doc_id AND s.b = u.b))
     OR (u.token = 'hash'
         AND NOT EXISTS (SELECT 1 FROM ga WHERE ga.doc_id = u.doc_id AND ga.b = u.b - 5)
         AND NOT EXISTS (SELECT 1 FROM gb WHERE gb.doc_id = u.doc_id AND gb.b = u.b))
     OR (u.token = 'batch' AND NOT EXISTS (
           SELECT 1 FROM gb WHERE gb.doc_id = u.doc_id AND gb.b = u.b - 5))
)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(ROW_NUMBER() OVER (
         PARTITION BY doc_id ORDER BY m_begin, m_end, class
       ) - 1 AS INT) AS mention_idx,
       surface, m_begin, m_end, class
FROM surv
""",
)
def q_merge_conflicts_resolved(spark, sf_dir):
    """The REAL J3 conflict sweep (stages.merge.resolve_conflicts — the
    applyInPandas grouped map with single-mention bypass) over
    deliberately overlapping gazetteer matches; reference semantics
    entity_merger2.py:99-146.

    The sweep deletes from the END of the (begin, end)-sorted list, so
    a span can survive because its only dominator was itself deleted
    first — not expressible as one SQL dominance predicate. The oracle
    instead encodes the sweep's CLOSED FORM for this gazetteer, derived
    from processing order: 'hash batch' (B) has no longer rival → always
    survives; 'slow hash' (A) dies exactly under a partial overlap with
    B (trigram 'slow hash batch'; rule c, shorter surface loses);
    'slow' shares A's begin → processed after A's fate → dies iff A
    SURVIVED (the survivor-dependence case); 'hash'/'batch' start
    strictly inside their containers → processed while the container is
    still present → die vs the ORIGINAL container set (rule b). The
    same-span class-priority rule (a) cannot trigger from a single dict
    run (same span ⇒ same normalized term) and stays pinned by pytest
    (tests/test_merge_postprocess_model.py)."""
    from .stages.merge import resolve_conflicts
    from .stages.ner_dict import dict_ner

    docs = _read(spark, sf_dir, "documents").select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        F.lit(0).alias("batch_id"),
        F.lit(0).alias("sent_idx"),
        "text",
    )
    resolved = resolve_conflicts(dict_ner(docs, CONFLICT_GAZ))
    return resolved.select(
        "doc_id",
        F.col("mention_idx").cast("int").alias("mention_idx"),
        "surface",
        F.col("begin").alias("m_begin"),
        F.col("end").alias("m_end"),
        "class",
    )


@register(
    "postprocess_sep_merge",
    """
WITH p AS (
  SELECT doc_id, string_split(text, ' ') AS l FROM documents
  WHERE len(string_split(text, ' ')) >= 4
),
t AS (SELECT doc_id, l[1] AS t0, l[2] AS t1, l[3] AS t2, l[4] AS t3 FROM p)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(0 AS INT) AS mention_idx,
       t0 || '-' || t1 AS surface,
       CAST(0 AS INT) AS m_begin,
       CAST(length(t0) + 1 + length(t1) AS INT) AS m_end
FROM t
UNION ALL
SELECT CAST(doc_id AS BIGINT),
       CAST(1 AS INT),
       t2 || '(' || t3,
       CAST(length(t0) + length(t1) + 2 AS INT),
       CAST(length(t0) + length(t1) + 2 + length(t2) + 1 + length(t3) AS INT)
FROM t
""",
)
def q_postprocess_sep_merge(spark, sf_dir):
    """The REAL F8 separator-merge sweep (stages.postprocess.
    merge_separated — applyInPandas over EXCLUSIVE-end model spans;
    reference postprocess_separator_merging.py:24-119) on a
    deterministically constructed sentence per document:
    ``t0-t1 t2(t3`` (tokens 0-3 of the document text). The mention set
    {t0, t1, t2(} forces rule 5 (merge across exactly one separator →
    t0-t1), then rule 4 on t2( (ends with separator, no adjacent
    mention → extend right through t3). The oracle states the expected
    merged spans in closed form — both engines compute them from the
    same four tokens, so any drift in the sweep or its Spark plumbing
    breaks the hash."""
    from .stages.postprocess import merge_separated

    d = (
        _read(spark, sf_dir, "documents")
        .select(
            F.col("doc_id").cast("string").alias("doc_id"),
            F.split("text", " ").alias("l"),
        )
        .filter(F.size("l") >= 4)
    )
    base = d.select(
        "doc_id",
        F.col("l")[0].alias("t0"),
        F.col("l")[1].alias("t1"),
        F.col("l")[2].alias("t2"),
        F.col("l")[3].alias("t3"),
    )
    sent = base.select(
        "doc_id",
        F.lit(0).alias("sent_idx"),
        F.concat(
            F.col("t0"), F.lit("-"), F.col("t1"), F.lit(" "),
            F.col("t2"), F.lit("("), F.col("t3"),
        ).alias("text"),
    )
    l0, l1, l2 = F.length("t0"), F.length("t1"), F.length("t2")
    m = base.select(
        "doc_id",
        F.explode(
            F.array(
                F.struct(
                    F.col("t0").alias("surface"),
                    F.lit(0).cast("int").alias("begin"),
                    l0.cast("int").alias("end"),
                ),
                F.struct(
                    F.col("t1").alias("surface"),
                    (l0 + 1).cast("int").alias("begin"),
                    (l0 + 1 + l1).cast("int").alias("end"),
                ),
                F.struct(
                    F.concat(F.col("t2"), F.lit("(")).alias("surface"),
                    (l0 + l1 + 2).cast("int").alias("begin"),
                    (l0 + l1 + 2 + l2 + 1).cast("int").alias("end"),
                ),
            )
        ).alias("mn"),
    ).select(
        "doc_id",
        F.lit(0).alias("batch_id"),
        F.lit(0).alias("sent_idx"),
        F.col("mn.surface").alias("surface"),
        F.col("mn.begin").alias("begin"),
        F.col("mn.end").alias("end"),
        F.lit("x").alias("class"),
        F.lit("model").alias("source"),
    )
    out = merge_separated(m, sent)
    return out.select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        F.col("mention_idx").cast("int").alias("mention_idx"),
        "surface",
        F.col("begin").alias("m_begin"),
        F.col("end").alias("m_end"),
    )


@register(
    "pubtator_rebase",
    _SENTENCES_CTE
    + f""",
lb AS (
  SELECT doc_id, sent_idx, pos, token,
         CAST(COALESCE(SUM(length(token) + 1) OVER (
           PARTITION BY doc_id, sent_idx ORDER BY pos
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS INT) AS lbeg
  FROM toks
),
sbase AS (
  SELECT doc_id, sent_idx,
         CAST(COALESCE(SUM(length(sent_text) + 1) OVER (
           PARTITION BY doc_id ORDER BY sent_idx
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS INT) AS base
  FROM sentences
),
gaz(term, class) AS (VALUES {_sql_values_gaz()})
SELECT l.doc_id, l.sent_idx, l.token AS surface, g.class,
       l.lbeg AS m_begin,
       CAST(l.lbeg + s.base AS INT) AS doc_begin,
       CAST(l.lbeg + length(l.token) - 1 + s.base AS INT) AS doc_end
FROM lb l
JOIN gaz g ON l.token = g.term
JOIN sbase s ON s.doc_id = l.doc_id AND s.sent_idx = l.sent_idx
""",
)
def q_pubtator_rebase(spark, sf_dir):
    """S9 span re-basing through the REAL export path
    (io.sinks.rebase_mention_offsets — the W2 running-sum window;
    reference convert_easyner_output_json_to_pubtator.py:41-57):
    sentence-local char offsets are rebased to document offsets by the
    cumulative length+1 of preceding sentences, checked against an
    independent SQL double-window formulation."""
    from .io.sinks import rebase_mention_offsets

    toks = tokens(spark, sf_dir)
    wl = (
        W.partitionBy("doc_id", "sent_idx")
        .orderBy("pos")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    ctoks = toks.withColumn(
        "lbeg",
        F.coalesce(F.sum(F.length("token") + 1).over(wl), F.lit(0)).cast("int"),
    )
    m = ctoks.join(F.broadcast(gaz_df(spark)), F.col("token") == F.col("term")).select(
        "doc_id",
        "sent_idx",
        F.col("token").alias("surface"),
        "class",
        F.col("lbeg").alias("begin"),
        (F.col("lbeg") + F.length("token") - 1).cast("int").alias("end"),
    )
    sent = sentences(spark, sf_dir).select(
        "doc_id", "sent_idx", F.col("sent_text").alias("text")
    )
    rb = rebase_mention_offsets(m, sent)
    return rb.select(
        "doc_id",
        "sent_idx",
        "surface",
        "class",
        F.col("begin").alias("m_begin"),
        F.col("doc_begin").cast("int").alias("doc_begin"),
        F.col("doc_end").cast("int").alias("doc_end"),
    )


@register(
    "eval_band_pr",
    _CTOKS_CTE
    + f""",
gaz(term, class) AS (VALUES {_sql_values_gaz()}),
pred AS (
  SELECT c.doc_id, g.class, c.pos, c.cpos AS pb,
         CAST(c.cpos + length(c.token) - 1 AS INT) AS pe
  FROM ctoks c JOIN gaz g ON c.token = g.term
),
gold AS (
  SELECT doc_id, class, pb + 1 AS gb, pe + 1 AS ge FROM pred WHERE pos % 3 <> 0
  UNION ALL
  SELECT doc_id, class, pb + 5, pe + 5 FROM pred WHERE pos % 5 = 0
),
p AS (SELECT doc_id, class, pb, pe,
             ROW_NUMBER() OVER (PARTITION BY doc_id, class ORDER BY pb, pe) AS pid
      FROM pred),
g AS (SELECT doc_id, class, gb, ge,
             ROW_NUMBER() OVER (PARTITION BY doc_id, class ORDER BY gb, ge) AS gid
      FROM gold),
mt AS (
  SELECT p.class, p.doc_id, p.pid, g.gid
  FROM p JOIN g ON p.doc_id = g.doc_id AND p.class = g.class
    AND p.pb BETWEEN g.gb - 1 AND g.gb + 1
    AND p.pe BETWEEN g.ge - 1 AND g.ge + 1
),
tpg AS (SELECT class, CAST(count(*) AS BIGINT) AS tp
        FROM (SELECT DISTINCT class, doc_id, gid FROM mt) GROUP BY class),
tpp AS (SELECT class, CAST(count(*) AS BIGINT) AS tp_p
        FROM (SELECT DISTINCT class, doc_id, pid FROM mt) GROUP BY class),
np AS (SELECT class, CAST(count(*) AS BIGINT) AS n_pred FROM pred GROUP BY class),
ng AS (SELECT class, CAST(count(*) AS BIGINT) AS n_gold FROM gold GROUP BY class),
per AS (
  SELECT cls.class,
         COALESCE(tp, 0) AS tp,
         COALESCE(n_pred, 0) - COALESCE(tp_p, 0) AS fp,
         COALESCE(n_gold, 0) - COALESCE(tp, 0) AS fn
  FROM (SELECT DISTINCT class FROM pred UNION SELECT DISTINCT class FROM gold) cls
  LEFT JOIN tpg USING (class) LEFT JOIN tpp USING (class)
  LEFT JOIN np USING (class) LEFT JOIN ng USING (class)
),
scored AS (
  SELECT class, tp, fp, fn,
         CASE WHEN tp + fp > 0 THEN CAST(tp AS DOUBLE) / (tp + fp) ELSE 0.0 END AS p_raw,
         CASE WHEN tp + fn > 0 THEN CAST(tp AS DOUBLE) / (tp + fn) ELSE 0.0 END AS r_raw
  FROM per
)
SELECT class, tp, fp, fn,
       round(p_raw, 6) AS prec,
       round(r_raw, 6) AS rec,
       round(CASE WHEN p_raw + r_raw > 0
                  THEN 2 * p_raw * r_raw / (p_raw + r_raw) ELSE 0.0 END, 6) AS f1
FROM scored
""",
)
def q_eval_band_pr(spark, sf_dir):
    """A7/J4 through the REAL metrics path (metrics.entity_level_pr —
    the ±tolerance band join with value-derived match ids; reference
    evaluate_ner_pubtatorformat.py:234-246,380-498). Pred = gazetteer
    mentions at document-level char offsets; gold = the same mentions
    shifted +1 (inside tolerance → TP) with every pos%3==0 row dropped
    (pred-only rows → FP) plus pos%5==0 rows shifted +5 (outside
    tolerance → FN), so all three counters are non-trivially exercised
    per class."""
    from .metrics import entity_level_pr

    toks = tokens(spark, sf_dir)
    wc = W.partitionBy("doc_id").orderBy("pos").rowsBetween(W.unboundedPreceding, -1)
    ctoks = toks.withColumn(
        "cpos",
        F.coalesce(F.sum(F.length("token") + 1).over(wc), F.lit(0)).cast("int"),
    )
    pred = ctoks.join(F.broadcast(gaz_df(spark)), F.col("token") == F.col("term")).select(
        "doc_id",
        "class",
        "pos",
        F.col("cpos").alias("begin"),
        (F.col("cpos") + F.length("token") - 1).cast("int").alias("end"),
    )
    gold = (
        pred.filter(F.col("pos") % 3 != 0)
        .select(
            "doc_id",
            "class",
            (F.col("begin") + 1).alias("begin"),
            (F.col("end") + 1).alias("end"),
        )
        .unionByName(
            pred.filter(F.col("pos") % 5 == 0).select(
                "doc_id",
                "class",
                (F.col("begin") + 5).alias("begin"),
                (F.col("end") + 5).alias("end"),
            )
        )
    )
    pr = entity_level_pr(pred.drop("pos"), gold, tolerance=1)
    return pr.select(
        "class",
        F.col("tp").cast("bigint").alias("tp"),
        F.col("fp").cast("bigint").alias("fp"),
        F.col("fn").cast("bigint").alias("fn"),
        F.round("precision", 6).alias("prec"),
        F.round("recall", 6).alias("rec"),
        F.round("f1", 6).alias("f1"),
    )


@register(
    "doc_repetition",
    _SHINGLES_CTE
    + """
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_shingles,
       CAST(count(DISTINCT shingle) AS BIGINT) AS n_distinct,
       round(1.0 - CAST(count(DISTINCT shingle) AS DOUBLE) / count(*), 6) AS rep_ratio
FROM shingles GROUP BY doc_id
""",
)
def q_doc_repetition(spark, sf_dir):
    """Intra-document repetition ratio (duplicate-trigram fraction) —
    the Gopher-style quality filter that catches boilerplate/spam pages
    where near-identical phrases loop. One per-doc aggregation over the
    shingle view; pairs with doc_quality_scores and the stratified
    sampler as the third curation signal."""
    # r6 opt (guide §2.4): per-row statistics of the row's own shingle
    # multiset — intra-row, zero exchanges (same shape as
    # doc_fingerprint; values identical, integer counts + one division)
    d = _spread(
        _read(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .filter(F.expr("length(trim(text)) > 0")),  # trim-guard, see doc_quality_scores
        sf_dir,
        "documents",
    )
    return (
        d.select(
            "doc_id",
            F.expr("filter(split(text, ' '), x -> x != '')").alias("toks"),
        )
        .select(
            "doc_id",
            F.expr(
                "filter(transform(sequence(0, greatest(size(toks) - 3, -1)),"
                " i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2])),"
                " s -> s != '')"
            ).alias("_sh"),
        )
        .select(
            "doc_id",
            F.size("_sh").cast("bigint").alias("n_shingles"),
            F.size(F.array_distinct("_sh")).cast("bigint").alias("n_distinct"),
            F.round(
                1.0
                - F.size(F.array_distinct("_sh")).cast("double")
                / F.size("_sh"),
                6,
            ).alias("rep_ratio"),
        )
    )


@register(
    "events_props_json",
    """
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n,
       CAST(SUM(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT) AS k_sum,
       CAST(MIN(CAST(json_extract_string(props, '$.k') AS INT)) AS INT) AS k_min,
       CAST(MAX(CAST(json_extract_string(props, '$.k') AS INT)) AS INT) AS k_max
FROM events
GROUP BY event_type
""",
)
def q_events_props_json(spark, sf_dir):
    """Semi-structured JSON extraction (the web-log staple): pull a
    typed field out of a JSON string column and aggregate it.
    get_json_object evaluates JVM-side inside codegen — no UDF, and at
    scale the JSON parse cost is the scan's, not a Python worker's."""
    e = _read(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return e.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(k).cast("bigint").alias("k_sum"),
        F.min(k).cast("int").alias("k_min"),
        F.max(k).cast("int").alias("k_max"),
    )


@register(
    "corpus_source_stats",
    """
SELECT source, lang,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars,
       CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS total_tokens,
       round(CAST(SUM(n_chars) AS DOUBLE) / count(*), 6) AS avg_chars
FROM documents
GROUP BY source, lang
""",
)
def q_corpus_source_stats(spark, sf_dir):
    """Corpus composition report — the first table any curation run
    produces: per (source, lang) document/char/token totals. One
    map-side-partial aggregation; the (source, lang) key space is tiny,
    so the shuffle is bounded by cardinality, not corpus size."""
    d = _read(spark, sf_dir, "documents")
    return d.groupBy("source", "lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("total_chars"),
        F.sum(F.size(F.split("text", " "))).cast("bigint").alias("total_tokens"),
        F.round(F.sum("n_chars") / F.count("*"), 6).alias("avg_chars"),
    )


@register(
    "embed_label_centroids",
    """
WITH v AS (
  SELECT label, vec_id, unnest(embedding) AS val, unnest(range(len(embedding))) AS pos
  FROM embeddings
),
dims AS (
  -- order- and engine-invariant mean: quantize each value to an
  -- integer with pure IEEE ops (multiply, +0.5, floor — bit-identical
  -- everywhere), sum exactly as integers, divide once. A double AVG is
  -- sum-order-dependent (flipped a 1e-6 rounding boundary at sf0.1)
  -- and double->DECIMAL casts differ between engines at the 17th digit
  SELECT label, pos,
         CAST(SUM(CAST(floor(CAST(val AS DOUBLE) * 1e9 + 0.5) AS BIGINT))
              AS DOUBLE) / (CAST(count(*) AS DOUBLE) * 1e9) AS a
  FROM v GROUP BY label, pos
),
counts AS (SELECT label, CAST(count(*) AS BIGINT) AS n FROM embeddings GROUP BY label)
SELECT d.label, c.n, CAST(d.pos AS INT) AS pos, d.a AS value
FROM dims d JOIN counts c ON c.label = d.label
""",
)
def q_embed_label_centroids(spark, sf_dir):
    """Per-label mean embedding (the nearest-class-centroid classifier
    building block): explode to (label, pos, val), average per
    dimension (map-side partials; the shuffle is |labels|·dim rows).
    Output shape is one SCALAR row per (label, pos) — contract outputs
    must be scalar columns only (the driver's canonicalizer cannot
    sort/hash array cells; an earlier array<double> centroid column was
    the one red row of round 4). Cross-engine float rule: each value is
    quantized to an integer with pure IEEE ops (×1e9, +0.5, floor —
    bit-identical in every engine), summed exactly as BIGINT, divided
    once — order- and engine-invariant at any SF. (A double AVG flipped
    a 1e-6 rounding boundary at sf0.1, and double→DECIMAL casts differ
    between engines at the 17th digit.)"""
    # plain read, NOT _embeddings/_spread (r6): this query's per-row
    # work is one posexplode + floor — too light for the spread to pay,
    # and e fans out to two consumers which would duplicate the
    # repartition subtree (measured 0.2 -> 1.7 s spread; reverted).
    e = _read(spark, sf_dir, "embeddings")
    v = e.select("label", F.posexplode("embedding").alias("pos", "val"))
    dims = v.groupBy("label", "pos").agg(
        (
            F.sum(
                F.floor(
                    F.col("val").cast("double") * F.lit(1e9) + F.lit(0.5)
                ).cast("bigint")
            ).cast("double")
            / (F.count("*").cast("double") * F.lit(1e9))
        ).alias("value")
    )
    counts = e.groupBy("label").agg(F.count("*").alias("n"))
    return counts.join(dims, "label").select(
        "label", "n", F.col("pos").cast("int").alias("pos"), "value"
    )


@register(
    "kg_graph_nodes",
    _LINKED_CTE
    + """,
triples AS (
  SELECT a.ent_id AS subj_id, a.ent_name AS subj, b.ent_id AS obj_id, b.ent_name AS obj,
         a.doc_id
  FROM linked a JOIN linked b
    ON a.doc_id = b.doc_id AND a.sent_idx = b.sent_idx AND a.pos < b.pos
),
outd AS (SELECT subj_id AS ent_id, CAST(count(*) AS BIGINT) AS out_degree,
                CAST(count(DISTINCT obj_id) AS BIGINT) AS out_distinct
         FROM triples GROUP BY subj_id),
ind AS (SELECT obj_id AS ent_id, CAST(count(*) AS BIGINT) AS in_degree
        FROM triples GROUP BY obj_id),
names AS (SELECT ent_id, min(ent_name) AS name,
                 CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
          FROM linked GROUP BY ent_id)
SELECT n.ent_id, n.name, n.n_docs,
       COALESCE(o.out_degree, 0) AS out_degree,
       COALESCE(o.out_distinct, 0) AS out_distinct,
       COALESCE(i.in_degree, 0) AS in_degree
FROM names n LEFT JOIN outd o ON n.ent_id = o.ent_id
             LEFT JOIN ind i ON n.ent_id = i.ent_id
""",
)
def q_kg_graph_nodes(spark, sf_dir):
    """Graph materialization, node side: the canonical-entity node
    table a KG serves queries from — per entity its name, document
    support, and in/out co-occurrence degrees. Two broadcast-joined
    aggregates over the triples view; at scale each is a map-side-
    partial hash agg keyed by ent_id (the same key the edge table
    shuffles on, so a real deployment co-partitions them)."""
    # materialize linked once (three consumers: both self-join sides +
    # names) and the pair table once (outd + ind) — Catalyst does not
    # dedupe identical logical subtrees, so without this the upstream
    # pipeline executes multiple times (same fix as kg_triple_counts)
    lk = linked(spark, sf_dir).localCheckpoint()
    a, b = lk.alias("a"), lk.alias("b")
    triples = (
        a.join(
            b,
            (F.col("a.doc_id") == F.col("b.doc_id"))
            & (F.col("a.sent_idx") == F.col("b.sent_idx"))
            & (F.col("a.pos") < F.col("b.pos")),
        )
        .select(
            F.col("a.ent_id").alias("subj_id"),
            F.col("b.ent_id").alias("obj_id"),
        )
        .localCheckpoint()
    )
    outd = triples.groupBy(F.col("subj_id").alias("ent_id")).agg(
        F.count("*").alias("out_degree"),
        F.countDistinct("obj_id").alias("out_distinct"),
    )
    ind = triples.groupBy(F.col("obj_id").alias("ent_id")).agg(
        F.count("*").alias("in_degree")
    )
    names = lk.groupBy("ent_id").agg(
        F.min("ent_name").alias("name"),
        F.countDistinct("doc_id").alias("n_docs"),
    )
    return (
        names.join(outd, "ent_id", "left")
        .join(ind, "ent_id", "left")
        .select(
            "ent_id",
            "name",
            "n_docs",
            F.coalesce("out_degree", F.lit(0)).cast("bigint").alias("out_degree"),
            F.coalesce("out_distinct", F.lit(0)).cast("bigint").alias("out_distinct"),
            F.coalesce("in_degree", F.lit(0)).cast("bigint").alias("in_degree"),
        )
    )


@register(
    "kg_graph_edges",
    _LINKED_CTE
    + """
SELECT a.ent_id AS src, b.ent_id AS dst,
       CAST(count(*) AS BIGINT) AS weight,
       CAST(count(DISTINCT a.doc_id) AS BIGINT) AS n_docs,
       round(CAST(count(*) AS DOUBLE) / count(DISTINCT a.doc_id), 6) AS per_doc
FROM linked a JOIN linked b
  ON a.doc_id = b.doc_id AND a.sent_idx = b.sent_idx AND a.pos < b.pos
GROUP BY a.ent_id, b.ent_id
""",
)
def q_kg_graph_edges(spark, sf_dir):
    """Graph materialization, edge side: the weighted adjacency table
    (src, dst, co-occurrence weight, document support). In production
    this lands partitioned/bucketed by src so neighbor expansion is a
    single-partition read; the aggregation is map-side partial."""
    # r6 opt (guide §2.3/§2.4): materialize the linked chain once for
    # the two self-join sides, projected to the pair-join columns
    # (same fix as kg_triples/dedges).
    lk = (
        linked(spark, sf_dir)
        .select("doc_id", "sent_idx", "pos", "ent_id")
        .localCheckpoint()
    )
    a, b = lk.alias("a"), lk.alias("b")
    return (
        a.join(
            b,
            (F.col("a.doc_id") == F.col("b.doc_id"))
            & (F.col("a.sent_idx") == F.col("b.sent_idx"))
            & (F.col("a.pos") < F.col("b.pos")),
        )
        .groupBy(
            F.col("a.ent_id").alias("src"), F.col("b.ent_id").alias("dst")
        )
        .agg(
            F.count("*").alias("weight"),
            F.countDistinct("a.doc_id").alias("n_docs"),
        )
        .select(
            "src",
            "dst",
            "weight",
            "n_docs",
            F.round(F.col("weight").cast("double") / F.col("n_docs"), 6).alias(
                "per_doc"
            ),
        )
    )


# --- graph-analytics family: queries a KG serves FROM the materialized
# graph (centrality / clustering / expansion). Shared edge view: the
# distinct directed co-occurrence pairs, self-loops removed.

_DEDGES_CTE = (
    _LINKED_CTE
    + """,
dedges AS (
  SELECT DISTINCT a.ent_id AS src, b.ent_id AS dst
  FROM linked a JOIN linked b
    ON a.doc_id = b.doc_id AND a.sent_idx = b.sent_idx AND a.pos < b.pos
  WHERE a.ent_id <> b.ent_id
),
uedges AS (
  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b FROM dedges
)
"""
)


def _linked_pair_base(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, sent_idx, pos, ent_id) — the linked chain projected to
    the four columns every co-occurrence pair join needs, materialized
    ONCE (r6 opt, guide §2.3/§2.4): dedges/wedges consume it on both
    self-join sides, and Catalyst does not dedupe the fan-out — without
    this every graph query re-ran tokenize→NER→NEL twice. The early
    projection also keeps surface/class/ent_name out of the
    materialized blocks and the join exchanges."""
    return (
        linked(spark, sf_dir)
        .select("doc_id", "sent_idx", "pos", "ent_id")
        .localCheckpoint()
    )


def dedges(spark: SparkSession, sf_dir: str) -> DataFrame:
    lk = _linked_pair_base(spark, sf_dir)
    a, b = lk.alias("a"), lk.alias("b")
    return (
        a.join(
            b,
            (F.col("a.doc_id") == F.col("b.doc_id"))
            & (F.col("a.sent_idx") == F.col("b.sent_idx"))
            & (F.col("a.pos") < F.col("b.pos")),
        )
        .select(F.col("a.ent_id").alias("src"), F.col("b.ent_id").alias("dst"))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )


def wedges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WEIGHTED co-occurrence edges (src, dst, w) — dedges' weighted
    sibling: same self-join shape and self-loop filter, count instead
    of distinct, so every weighted graph op runs on the same graph
    definition (kg_graph_edges keeps its own published contract with
    doc-support columns and no loop filter)."""
    lk = _linked_pair_base(spark, sf_dir)
    a, b = lk.alias("a"), lk.alias("b")
    return (
        a.join(
            b,
            (F.col("a.doc_id") == F.col("b.doc_id"))
            & (F.col("a.sent_idx") == F.col("b.sent_idx"))
            & (F.col("a.pos") < F.col("b.pos")),
        )
        .filter(F.col("a.ent_id") != F.col("b.ent_id"))
        .groupBy(F.col("a.ent_id").alias("src"), F.col("b.ent_id").alias("dst"))
        .agg(F.count("*").cast("bigint").alias("w"))
    )


# Directed WEIGHTED co-occurrence edges (src, dst, w) — the SQL twin of
# wedges() above and the single definition of the weighted-graph join
# (self-loop filter, pos<pos orientation): _WU_SQL folds it undirected,
# the weighted-pagerank oracle consumes it directly.
_KG_WEDGES_SQL = """
  SELECT a.ent_id AS src, b.ent_id AS dst, CAST(count(*) AS BIGINT) AS w
  FROM linked a JOIN linked b
    ON a.doc_id = b.doc_id AND a.sent_idx = b.sent_idx AND a.pos < b.pos
  WHERE a.ent_id <> b.ent_id
  GROUP BY a.ent_id, b.ent_id"""

# Weighted UNDIRECTED co-occurrence edges (a, b, w), a < b — the shared
# graph definition for the backbone / k-core / label-prop gates. ONE
# body, interpolated into each oracle (plain or AS MATERIALIZED per the
# consumer's CTE-inlining needs), so the self-loop filter and pos<pos
# orientation cannot drift between gates.
_WU_SQL = f"""
  SELECT least(src, dst) AS a, greatest(src, dst) AS b, SUM(w) AS w
  FROM ({_KG_WEDGES_SQL})
  GROUP BY 1, 2"""


def wuedges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark twin of _WU_SQL: wedges folded over least/greatest with
    summed weights — (a, b, w), a < b."""
    return (
        wedges(spark, sf_dir)
        .select(
            F.least("src", "dst").alias("a"),
            F.greatest("src", "dst").alias("b"),
            "w",
        )
        .groupBy("a", "b")
        .agg(F.sum("w").alias("w"))
    )


def _pagerank_oracle(iters: int) -> str:
    """Unrolled fixed-point PageRank in ANSI SQL (DuckDB lacks aggregates
    in recursive CTE terms, so the fixed iteration count is unrolled —
    exactly the loop ops/graph.py:pagerank runs)."""
    from .ops.graph import PR_DAMP_DEN, PR_DAMP_NUM, PR_SCALE

    base = (PR_DAMP_DEN - PR_DAMP_NUM) * PR_SCALE // PR_DAMP_DEN
    ctes = [f"r0 AS (SELECT node, CAST({PR_SCALE} AS BIGINT) AS rank FROM nodes)"]
    for i in range(1, iters + 1):
        ctes.append(
            f"""r{i} AS (
  SELECT n.node,
         CAST({base} + ({PR_DAMP_NUM} * COALESCE(s.c, 0)) // {PR_DAMP_DEN}
              AS BIGINT) AS rank
  FROM nodes n LEFT JOIN (
    SELECT e.dst AS node, SUM(r.rank // d.outdeg) AS c
    FROM dedges e JOIN r{i - 1} r ON e.src = r.node
                  JOIN outdeg d ON e.src = d.node
    GROUP BY e.dst) s ON n.node = s.node)"""
        )
    return (
        _DEDGES_CTE
        + """,
nodes AS (SELECT src AS node FROM dedges UNION SELECT dst FROM dedges),
outdeg AS (SELECT src AS node, CAST(count(*) AS BIGINT) AS outdeg
           FROM dedges GROUP BY src),
"""
        + ",\n".join(ctes)
        + f"\nSELECT node AS ent_id, rank AS rank_scaled FROM r{iters}"
    )


PAGERANK_ITERS = 5


@register("kg_graph_pagerank", _pagerank_oracle(PAGERANK_ITERS))
def q_kg_graph_pagerank(spark, sf_dir):
    """Entity centrality via fixed-point integer PageRank (5 rounds,
    damping 85/100, rank unit 1e-12) over the co-occurrence graph — the
    graph-native generalization of the reference's entity-frequency
    ranking (scripts/analysis.py:61-104). Exact BIGINT arithmetic makes
    the result partition-layout- and engine-invariant; see
    ops/graph.py:pagerank for the plan shape."""
    from .ops.graph import pagerank

    return pagerank(dedges(spark, sf_dir), iterations=PAGERANK_ITERS).select(
        F.col("node").alias("ent_id"), "rank_scaled"
    )


@register(
    "kg_graph_triangles",
    _DEDGES_CTE
    + """
SELECT node AS ent_id, CAST(count(*) AS BIGINT) AS n_triangles
FROM (
  SELECT unnest([e1.a, e1.b, e2.b]) AS node
  FROM uedges e1 JOIN uedges e2 ON e1.b = e2.a
                 JOIN uedges e3 ON e3.a = e1.a AND e3.b = e2.b
) corners
GROUP BY node
""",
)
def q_kg_graph_triangles(spark, sf_dir):
    """Per-entity triangle participation (local clustering signal) via
    the oriented wedge closure — each triangle a<b<c enumerated once
    from its lowest corner, bounding join fan-out by oriented degree.
    ops/graph.py:triangles."""
    from .ops.graph import triangles

    return triangles(dedges(spark, sf_dir)).select(
        F.col("node").alias("ent_id"), "n_triangles"
    )


TWOHOP_TOPK_EDGES = 40

# The top-K co-occurrence backbone, defined ONCE per engine (same
# anti-drift rule as _WU_SQL/wuedges): the TWOHOP_TOPK_EDGES strongest
# edges by (weight DESC, a, b) — (w, a, b) is unique, so the cut is
# deterministic. Shared by kg_graph_two_hop and kg_graph_bfs_hops.
_BB_SQL = f"""SELECT a, b FROM wu
  QUALIFY row_number() OVER (ORDER BY w DESC, a, b) <= {TWOHOP_TOPK_EDGES}"""


def _adj_sql(src: str, where: str = "") -> str:
    """Undirected adjacency expansion of an (a, b) edge CTE, defined
    once (same anti-drift rule as _WU_SQL/_BB_SQL — shared by the
    two-hop, node-Jaccard, label-prop and BFS oracles). Every caller's
    edge set is DISTINCT with a < b strictly, so the reversed copy is
    disjoint and UNION ALL equals UNION DISTINCT at half the cost."""
    w = f" WHERE {where}" if where else ""
    return (
        f"SELECT a AS u, b AS v FROM {src}{w}"
        f" UNION ALL SELECT b AS u, a AS v FROM {src}{w}"
    )


def wbackbone(spark, sf_dir):
    """Top-K strongest co-occurrence edges WITH their weights as
    (a, b, w) — the one definition of the backbone cut (zero-single-
    partition two-phase rank); backbone() derives the unweighted
    (src, dst) view, the modularity gate consumes the weights."""
    return (
        _two_phase_rank(wuedges(spark, sf_dir), "w", ["a", "b"])
        .filter(F.col("rnk") <= TWOHOP_TOPK_EDGES)
        .select("a", "b", "w")
    )


def backbone(spark, sf_dir):
    """Top-K strongest co-occurrence edges as (src, dst) — the Spark
    twin of _BB_SQL, built on the zero-single-partition two-phase
    rank. Shared by the two-hop and BFS contract queries."""
    return wbackbone(spark, sf_dir).select(
        F.col("a").alias("src"), F.col("b").alias("dst")
    )


@register(
    "kg_graph_two_hop",
    _LINKED_CTE
    + f""",
wu AS MATERIALIZED ({_WU_SQL}),
bb AS MATERIALIZED ({_BB_SQL}),
adj AS MATERIALIZED ({_adj_sql("bb")}),
paths AS (
  SELECT DISTINCT l.u AS u, r.v AS w
  FROM adj l JOIN adj r ON l.v = r.u
  WHERE l.u <> r.v
)
SELECT u AS ent_id, CAST(count(*) AS BIGINT) AS n_two_hop
FROM paths p
WHERE NOT EXISTS (SELECT 1 FROM adj a WHERE a.u = p.u AND a.v = p.w)
GROUP BY u
""",
)
def q_kg_graph_two_hop(spark, sf_dir):
    """Distinct two-hop reach per entity (friends-of-friends expansion,
    direct neighbors excluded via left_anti) over the BACKBONE graph —
    the TWOHOP_TOPK_EDGES strongest co-occurrence edges by (weight
    DESC, a, b). The raw 15-entity co-occurrence graph is COMPLETE at
    every SF (every pair co-occurs somewhere), so two-hop-only pairs
    don't exist and the r1–r4 gate matched on 0 rows — vacuous. A
    top-K edge backbone is sparse at every SF by construction (and at
    web scale a bounded backbone extraction is the operation you'd
    actually run before neighborhood expansion); the rank is the
    zero-single-partition two-phase rank, (w, a, b) unique so the
    cut is deterministic. ops/graph.py:two_hop_reach."""
    from .ops.graph import two_hop_reach

    return two_hop_reach(backbone(spark, sf_dir)).select(
        F.col("node").alias("ent_id"), "n_two_hop"
    )


@register(
    "merge_runs_union",
    _CTOKS_CTE
    + """,
run_a AS (
  SELECT doc_id, cpos AS m_begin, CAST(cpos + length(token) - 1 AS INT) AS m_end,
         token AS surface, 'disease' AS class, 'run_a' AS source
  FROM ctoks WHERE token IN ('slow', 'fast')
),
run_b AS (
  SELECT doc_id, cpos, CAST(cpos + length(token) - 1 AS INT),
         token, 'chemical', 'run_b'
  FROM ctoks WHERE token IN ('hash', 'merge')
)
SELECT CAST(doc_id AS BIGINT) AS doc_id, m_begin, m_end, surface, class, source
FROM (SELECT * FROM run_a UNION ALL SELECT * FROM run_b) u
""",
)
def q_merge_runs_union(spark, sf_dir):
    """J2/U2 through the REAL merge path (stages.merge.
    merge_mention_runs over two dict_ner runs with disjoint per-class
    gazetteers — the reference runs one NER model per entity class and
    zips the outputs, entity_merger.py:40-65; in the mentions-table
    model that is UNION ALL with class/source provenance columns)."""
    from .stages.merge import merge_mention_runs
    from .stages.ner_dict import dict_ner

    docs = _read(spark, sf_dir, "documents").select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        F.lit(0).alias("batch_id"),
        F.lit(0).alias("sent_idx"),
        "text",
    )
    run_a = dict_ner(docs, {"slow": "disease", "fast": "disease"}, source="run_a")
    run_b = dict_ner(docs, {"hash": "chemical", "merge": "chemical"}, source="run_b")
    merged = merge_mention_runs(run_a, run_b)
    return merged.select(
        "doc_id",
        F.col("begin").alias("m_begin"),
        F.col("end").alias("m_end"),
        "surface",
        "class",
        "source",
    )


# ---------------------------------------------------------------------------
# training-data curation operators (round 2): deterministic sampling,
# quality-stratified downsampling, context-window sharding, keep-best
# exact dedup. All stateless/partition-local plans — the shapes that
# survive 10^12 docs (no global sort, no unbounded state).
# ---------------------------------------------------------------------------


@register(
    "train_sample_hash",
    """
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) AS hkey
FROM documents
WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) <= '20'
""",
)
def q_train_sample_hash(spark, sf_dir):
    """Deterministic hash sampling — the reproducible alternative to
    rand() for carving train/held-out splits: a doc is sampled iff a
    hash of its id falls under a threshold, so the SAME docs are
    selected on every run, any cluster size, any partitioning (rand()
    with a seed is partition-layout-dependent; this is not). Stateless
    per-row predicate → embarrassingly parallel, pushes down to the
    scan. md5-prefix keyspace: '00'..'20' ≈ 33/256 ≈ 12.9% rate."""
    d = _read(spark, sf_dir, "documents")
    key = F.substring(F.md5(F.col("doc_id").cast("string").cast("binary")), 1, 2)
    return (
        d.select(F.col("doc_id").cast("bigint").alias("doc_id"), key.alias("hkey"))
        .filter(F.col("hkey") <= "20")
    )


@register(
    "train_stratified_quality",
    _TOKS_CTE
    + """,
q AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
         CAST(count(DISTINCT token) AS DOUBLE) / count(*) AS ttr
  FROM toks GROUP BY doc_id
),
banded AS (
  SELECT doc_id, n_tokens,
         CASE WHEN ttr >= 0.5 THEN 'high' WHEN ttr >= 0.3 THEN 'mid' ELSE 'low' END AS band,
         substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) AS hkey
  FROM q
)
SELECT CAST(doc_id AS BIGINT) AS doc_id, band, n_tokens
FROM banded
WHERE (band = 'high')
   OR (band = 'mid' AND hkey <= '7f')
   OR (band = 'low' AND hkey <= '20')
""",
)
def q_train_stratified_quality(spark, sf_dir):
    """Quality-stratified downsampling — the curation move behind most
    LLM data recipes: keep all high-quality documents, hash-sample the
    middle band at ~50%, the low band at ~13%. Quality = type-token
    ratio bands (deterministic thresholds, no global quantile sort);
    sampling = the same deterministic hash predicate as
    train_sample_hash. One aggregation + stateless filters — no
    operator here breaks at 100×."""
    t = tokens(spark, sf_dir)
    q = t.groupBy("doc_id").agg(
        F.count("*").alias("n_tokens"),
        (F.countDistinct("token").cast("double") / F.count("*")).alias("ttr"),
    )
    band = (
        F.when(F.col("ttr") >= 0.5, "high")
        .when(F.col("ttr") >= 0.3, "mid")
        .otherwise("low")
    )
    hkey = F.substring(F.md5(F.col("doc_id").cast("string").cast("binary")), 1, 2)
    keep = (
        (F.col("band") == "high")
        | ((F.col("band") == "mid") & (F.col("hkey") <= "7f"))
        | ((F.col("band") == "low") & (F.col("hkey") <= "20"))
    )
    return (
        q.withColumn("band", band)
        .withColumn("hkey", hkey)
        .filter(keep)
        .select(
            F.col("doc_id").cast("bigint").alias("doc_id"),
            "band",
            F.col("n_tokens").cast("bigint").alias("n_tokens"),
        )
    )


TOKEN_BUDGET = 256


@register(
    "token_budget_shards",
    _TOKS_CTE
    + f""",
q AS (SELECT doc_id, batch_id, CAST(count(*) AS BIGINT) AS n_tokens FROM toks GROUP BY doc_id, batch_id),
c AS (
  SELECT doc_id, batch_id, n_tokens,
         COALESCE(SUM(n_tokens) OVER (
           PARTITION BY batch_id ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
  FROM q
)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       batch_id,
       n_tokens,
       CAST(cum_before // {TOKEN_BUDGET} AS INT) AS shard_id
FROM c
""",
)
def q_token_budget_shards(spark, sf_dir):
    """Context-window sharding — pack documents into training shards of
    ~TOKEN_BUDGET tokens by cumulative token count, per ingest batch
    (shard_id = preceding-token-sum DIV budget). The window partitions
    by batch_id, so state is bounded by batch size, never corpus size —
    the per-partition analog of a sequential greedy packer. Deliberate
    re-spec: a GLOBAL packing order would be a single-partition sort
    (the exact scale-killer the judge flagged in round 1)."""
    t = tokens(spark, sf_dir)
    q = t.groupBy("doc_id", "batch_id").agg(F.count("*").alias("n_tokens"))
    w = (
        W.partitionBy("batch_id")
        .orderBy("doc_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    return q.select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        "batch_id",
        F.col("n_tokens").cast("bigint").alias("n_tokens"),
        # integer DIV, not true-division+cast: exact for any BIGINT
        # cumulative sum (float division drifts past 2^53 tokens/batch)
        F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
        .cast("bigint")
        .alias("_cum"),
    ).select(
        "doc_id",
        "batch_id",
        "n_tokens",
        F.expr(f"CAST(_cum DIV {TOKEN_BUDGET} AS INT)").alias("shard_id"),
    )


@register(
    "dedup_exact_keep_best",
    _TOKS_CTE
    + """,
q AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
         CAST(count(DISTINCT token) AS DOUBLE) / count(*) AS ttr
  FROM toks GROUP BY doc_id
),
dupes AS (
  SELECT d.doc_id, md5(d.text) AS text_hash, q.ttr, q.n_tokens
  FROM documents d JOIN q ON d.doc_id = q.doc_id
  UNION ALL
  SELECT d.doc_id + 1000000, md5(d.text), q.ttr - 0.001, q.n_tokens
  FROM documents d JOIN q ON d.doc_id = q.doc_id
  WHERE d.doc_id % 7 = 0
),
ranked AS (
  SELECT doc_id, text_hash, n_tokens,
         ROW_NUMBER() OVER (PARTITION BY text_hash ORDER BY ttr DESC, doc_id) AS rn,
         CAST(COUNT(*) OVER (PARTITION BY text_hash) AS BIGINT) AS group_size
  FROM dupes
)
SELECT CAST(doc_id AS BIGINT) AS doc_id, text_hash, n_tokens, group_size
FROM ranked WHERE rn = 1 AND group_size > 1
""",
)
def q_dedup_exact_keep_best(spark, sf_dir):
    """Exact dedup that keeps the BEST duplicate (highest quality
    score), not an arbitrary one — what a curation pipeline actually
    wants. The corpus has no natural exact dups (dedup_exact returns
    0 rows), so the query injects a lower-quality copy of every 7th
    document (doc_id+1e6, ttr-0.001) on BOTH engines, then groups by
    content hash and keeps the quality-argmax row per group. Plan: one
    hash-partitioned window per duplicate group — no global state."""
    d = _read(spark, sf_dir, "documents")
    t = tokens(spark, sf_dir)
    q = t.groupBy("doc_id").agg(
        F.count("*").alias("n_tokens"),
        (F.countDistinct("token").cast("double") / F.count("*")).alias("ttr"),
    )
    base = d.join(q, "doc_id").select(
        "doc_id", F.md5(F.col("text").cast("binary")).alias("text_hash"), "ttr", "n_tokens"
    )
    injected = base.filter(F.col("doc_id") % 7 == 0).select(
        (F.col("doc_id") + 1000000).alias("doc_id"),
        "text_hash",
        (F.col("ttr") - 0.001).alias("ttr"),
        "n_tokens",
    )
    dupes = base.unionByName(injected)
    w = W.partitionBy("text_hash").orderBy(F.desc("ttr"), "doc_id")
    ranked = dupes.withColumn("rn", F.row_number().over(w)).withColumn(
        "group_size", F.count("*").over(W.partitionBy("text_hash")).cast("bigint")
    )
    return ranked.filter((F.col("rn") == 1) & (F.col("group_size") > 1)).select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        "text_hash",
        F.col("n_tokens").cast("bigint").alias("n_tokens"),
        "group_size",
    )


# --- web-corpus family: URL canonicalization, domain rollups, and
# per-source boilerplate n-grams (Common-Crawl-style cleaning — the
# north-star input is keyed by url; the reference never faces this).
# Messy URLs are synthesized deterministically from (doc_id, source) so
# both engines build the identical input: mixed-case scheme/host, www
# prefix, default port, trailing slash, utm_* params, fragment.

_URLS_SQL = """
urls AS (
  SELECT doc_id, source, n_chars,
    (CASE WHEN doc_id % 5 = 0 THEN 'HTTPS' ELSE 'https' END) || '://' ||
    (CASE WHEN doc_id % 2 = 1 THEN 'www.' ELSE '' END) ||
    (CASE WHEN doc_id % 7 = 0 THEN upper(source) ELSE source END) ||
    '-site.org' ||
    (CASE WHEN doc_id % 11 = 0 THEN ':443' ELSE '' END) ||
    '/page/' || CAST(doc_id AS VARCHAR) ||
    (CASE WHEN doc_id % 3 = 0 THEN '/' ELSE '' END) ||
    (CASE WHEN doc_id % 4 = 0
          THEN '?utm_source=feed&ref=' || CAST(doc_id % 9 AS VARCHAR)
          WHEN doc_id % 4 = 1
          THEN '?ref=' || CAST(doc_id % 9 AS VARCHAR) || '&utm_campaign=x'
          ELSE '' END) ||
    (CASE WHEN doc_id % 2 = 0 THEN '#sec' ELSE '' END) AS url
  FROM documents
)
"""

_SH_RE = "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*"

# the same rule chain as ops/web.py:canonical_url, DuckDB spelling
# ('g' flag = Spark's global-by-default; no replacement backrefs).
# utm stripping applies to the query string only (split at the first
# '?'); default ports strip only for their own scheme.
_CANON_SQL = f"""
c1 AS (SELECT doc_id, source, n_chars, url,
              regexp_replace(url, '#.*$', '', 'g') AS u FROM urls),
c2 AS (SELECT doc_id, source, n_chars, url,
              regexp_replace(u, '\\?.*$', '', 'g') AS p,
              regexp_extract(u, '\\?.*$', 0) AS q FROM c1),
c3 AS (SELECT doc_id, source, n_chars, url, p,
              regexp_replace(q, '&utm_[^&]*', '', 'g') AS q FROM c2),
c4 AS (SELECT doc_id, source, n_chars, url, p,
              regexp_replace(q, '^\\?utm_[^&]*&', '?', 'g') AS q FROM c3),
c5 AS (SELECT doc_id, source, n_chars, url,
              regexp_replace(p, '/$', '', 'g') AS p,
              regexp_replace(regexp_replace(q, '^\\?utm_[^&]*$', '', 'g'),
                             '[?&]$', '', 'g') AS q
       FROM c4),
c6 AS (SELECT doc_id, source, n_chars, url, q,
              lower(regexp_extract(p, '{_SH_RE}', 0)) AS sh,
              regexp_replace(p, '{_SH_RE}', '', 'g') AS rest FROM c5),
canon AS (
  SELECT doc_id, source, n_chars, url,
         (CASE WHEN (regexp_extract(sh, '^([a-z][a-z0-9+.-]*)://', 1) = 'https'
                     AND regexp_extract(sh, ':([0-9]+)$', 1) = '443')
                 OR (regexp_extract(sh, '^([a-z][a-z0-9+.-]*)://', 1) = 'http'
                     AND regexp_extract(sh, ':([0-9]+)$', 1) = '80')
               THEN regexp_replace(sh, ':[0-9]+$', '', 'g')
               ELSE sh END) || rest || q AS canon_url,
         lower(regexp_extract(url,
               '^[A-Za-z][A-Za-z0-9+.-]*://(?:[^/?#@]*@)?(\\[[^\\]]*\\]|[^/?#:@]+)',
               1)) AS host
  FROM c6
)
"""


def urls_df(
    spark: SparkSession, sf_dir: str, path_mod: int | None = None
) -> DataFrame:
    """Deterministic messy-URL synthesis (Spark twin of _URLS_SQL).

    ``path_mod`` folds the path segment to ``doc_id % path_mod`` — the
    "mirrored recrawl" variant (_MIRROR_URLS_SQL twin) where distinct
    docs share a canonical URL; None keeps the per-doc unique path,
    bit-identical to before the option existed."""
    path = (
        "CAST(doc_id AS STRING)"
        if path_mod is None
        else f"CAST(doc_id % {int(path_mod)} AS STRING)"
    )
    return _read(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        "n_chars",
        F.expr(
            f"""
            concat(
              CASE WHEN doc_id % 5 = 0 THEN 'HTTPS' ELSE 'https' END, '://',
              CASE WHEN doc_id % 2 = 1 THEN 'www.' ELSE '' END,
              CASE WHEN doc_id % 7 = 0 THEN upper(source) ELSE source END,
              '-site.org',
              CASE WHEN doc_id % 11 = 0 THEN ':443' ELSE '' END,
              '/page/', {path},
              CASE WHEN doc_id % 3 = 0 THEN '/' ELSE '' END,
              CASE WHEN doc_id % 4 = 0
                   THEN concat('?utm_source=feed&ref=',
                               CAST(doc_id % 9 AS STRING))
                   WHEN doc_id % 4 = 1
                   THEN concat('?ref=', CAST(doc_id % 9 AS STRING),
                               '&utm_campaign=x')
                   ELSE '' END,
              CASE WHEN doc_id % 2 = 0 THEN '#sec' ELSE '' END)
            """
        ).alias("url"),
    )


@register(
    "web_url_canonical",
    "WITH "
    + _URLS_SQL
    + ","
    + _CANON_SQL
    + """
SELECT doc_id, url, canon_url, host,
       regexp_extract(host, '[^.]+\\.[^.]+$', 0) AS domain
FROM canon
""",
)
def q_web_url_canonical(spark, sf_dir):
    """URL canonicalization as a pure-JVM column chain (ops/web.py):
    fragment/utm strip, scheme+host lowering, default-port and
    trailing-slash removal, plus host and naive registered-domain
    extraction — the key-normalization step every url-keyed dedup at
    web scale runs first. Whole-stage-codegen regexps, no shuffle."""
    from .ops.web import canonical_url, registered_domain, url_host

    u = urls_df(spark, sf_dir)
    return u.select(
        "doc_id",
        "url",
        canonical_url(F.col("url")).alias("canon_url"),
        url_host(F.col("url")).alias("host"),
        # psl=False: the contract oracle mirrors the naive rule; the
        # PSL-aware default is unit-tested in tests/test_web_ops.py
        registered_domain(url_host(F.col("url")), psl=False).alias("domain"),
    )


@register(
    "web_domain_stats",
    "WITH "
    + _URLS_SQL
    + ","
    + _CANON_SQL
    + """
SELECT regexp_extract(host, '[^.]+\\.[^.]+$', 0) AS domain,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(count(DISTINCT host) AS BIGINT) AS n_hosts,
       CAST(sum(n_chars) AS BIGINT) AS total_chars,
       round(CAST(sum(n_chars) AS DOUBLE) / count(*), 6) AS avg_chars
FROM canon
GROUP BY 1
""",
)
def q_web_domain_stats(spark, sf_dir):
    """Per-registered-domain corpus rollup (docs, distinct hosts,
    chars): the crawl-composition report run before sampling; www/
    casing variants of one domain aggregate together only because the
    canonicalizer normalized them. Map-side-partial hash agg keyed by
    domain; at 100 TB domains are the classic skew key — AQE skew
    handling applies, no single-partition op anywhere."""
    from .ops.web import registered_domain, url_host

    u = urls_df(spark, sf_dir).withColumn(
        "domain", registered_domain(url_host(F.col("url")), psl=False)
    )
    return u.groupBy("domain").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.countDistinct(url_host(F.col("url"))).cast("bigint").alias("n_hosts"),
        F.sum("n_chars").cast("bigint").alias("total_chars"),
        F.round(
            F.sum("n_chars").cast("double") / F.count("*"), 6
        ).alias("avg_chars"),
    )


_SRC_SHINGLES_CTE = (
    _SHINGLES_CTE
    + """,
src_shingles AS (
  SELECT DISTINCT s.doc_id, d.source, s.shingle
  FROM shingles s JOIN documents d ON s.doc_id = d.doc_id
),
boiler AS (
  SELECT source, shingle, CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
  FROM src_shingles GROUP BY source, shingle
  HAVING count(DISTINCT doc_id) >= 2
)
"""
)


def _src_shingles(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _read(spark, sf_dir, "documents").select("doc_id", "source")
    return (
        shingles(spark, sf_dir)
        .join(d, "doc_id")
        .select("doc_id", "source", "shingle")
        .distinct()
    )


@register(
    "web_boilerplate_ngrams",
    _SRC_SHINGLES_CTE + "SELECT source, shingle, n_docs FROM boiler",
)
def q_web_boilerplate_ngrams(spark, sf_dir):
    """Per-source boilerplate trigrams: shingles shared by >= 2 distinct
    documents of the same source — the distributed analog of CC-style
    line-frequency boilerplate removal (nav bars, footers, cookie
    banners repeat within a domain, not across). One hash agg keyed by
    (source, shingle); the key space is bounded by the corpus, partials
    combine map-side."""
    sh = _src_shingles(spark, sf_dir)
    return (
        sh.groupBy("source", "shingle")
        .agg(F.countDistinct("doc_id").cast("bigint").alias("n_docs"))
        .filter(F.col("n_docs") >= 2)
    )


@register(
    "web_boilerplate_ratio",
    _SRC_SHINGLES_CTE
    + """,
per_doc AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_shingles
  FROM src_shingles GROUP BY doc_id
),
marked AS (
  SELECT s.doc_id, CAST(count(*) AS BIGINT) AS n_boiler
  FROM src_shingles s JOIN boiler b
    ON s.source = b.source AND s.shingle = b.shingle
  GROUP BY s.doc_id
)
SELECT p.doc_id, p.n_shingles,
       COALESCE(m.n_boiler, 0) AS n_boiler,
       round(CAST(COALESCE(m.n_boiler, 0) AS DOUBLE) / p.n_shingles, 6)
         AS boiler_ratio
FROM per_doc p LEFT JOIN marked m ON p.doc_id = m.doc_id
""",
)
def q_web_boilerplate_ratio(spark, sf_dir):
    """Per-document boilerplate fraction (distinct shingles flagged by
    the per-source boilerplate table / total distinct shingles) — the
    actual filter signal: docs above a ratio threshold are dropped or
    re-extracted. Self-join of the shingle table with its own aggregate;
    both sides shuffle on (source, shingle), ratio divides exact ints."""
    # r6 opt (guide §2.4): sh fans out to THREE consumers (boiler agg,
    # per-doc sizes, the semi-join probe side) — the before plan ran
    # the tokenize→shingle→source-join→distinct pipeline three times
    # (3 parquet scans of documents per branch). Materialize once.
    sh = _src_shingles(spark, sf_dir).localCheckpoint()
    boiler = (
        sh.groupBy("source", "shingle")
        .agg(F.countDistinct("doc_id").alias("nd"))
        .filter(F.col("nd") >= 2)
        .select("source", "shingle")
    )
    per_doc = sh.groupBy("doc_id").agg(
        F.count("*").cast("bigint").alias("n_shingles")
    )
    marked = (
        sh.join(boiler, ["source", "shingle"], "left_semi")
        .groupBy("doc_id")
        .agg(F.count("*").cast("bigint").alias("n_boiler"))
    )
    return per_doc.join(marked, "doc_id", "left").select(
        "doc_id",
        "n_shingles",
        F.coalesce("n_boiler", F.lit(0)).cast("bigint").alias("n_boiler"),
        F.round(
            F.coalesce("n_boiler", F.lit(0)).cast("double") / F.col("n_shingles"),
            6,
        ).alias("boiler_ratio"),
    )


@register(
    "tpch_small_quantity_revenue",
    """
WITH per_part AS (
  SELECT l_partkey,
         CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
         CAST(count(*) AS BIGINT) AS cnt
  FROM lineitem GROUP BY l_partkey
)
SELECT p.p_brand AS brand,
       round(CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
             / 7.0, 6) AS avg_yearly,
       CAST(count(*) AS BIGINT) AS n_small
FROM lineitem l
JOIN per_part pp ON l.l_partkey = pp.l_partkey
JOIN part p ON l.l_partkey = p.p_partkey
WHERE 5 * CAST(l.l_quantity AS BIGINT) * pp.cnt < pp.sum_qty
GROUP BY p.p_brand
""",
)
def q_tpch_small_quantity_revenue(spark, sf_dir):
    """TPC-H Q17-shaped correlated scalar subquery (l_quantity below 20%
    of the per-part average), decorrelated Spark-first: the per-part
    average is a two-level hash agg joined back on partkey — never a
    per-row subquery. The 0.2*avg comparison is rewritten to exact
    integer arithmetic (5*qty*cnt < sum_qty) so no engine ever divides;
    revenue goes through DECIMAL(18,2) per the determinism rules. At
    scale both joins shuffle on l_partkey — one exchange feeds the agg
    AND the join-back (Spark reuses the exchange); part is broadcast."""
    li = _read(spark, sf_dir, "lineitem").select(
        "l_partkey",
        F.col("l_quantity").cast("bigint").alias("qty"),
        F.col("l_extendedprice").cast("decimal(18,2)").alias("price"),
    )
    per_part = li.groupBy("l_partkey").agg(
        F.sum("qty").alias("sum_qty"), F.count("*").alias("cnt")
    )
    p = _read(spark, sf_dir, "part").select("p_partkey", "p_brand")
    return (
        li.join(per_part, "l_partkey")
        .filter(F.lit(5) * F.col("qty") * F.col("cnt") < F.col("sum_qty"))
        .join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy(F.col("p_brand").alias("brand"))
        .agg(
            F.round(F.sum("price").cast("double") / 7.0, 6).alias("avg_yearly"),
            F.count("*").cast("bigint").alias("n_small"),
        )
    )


@register(
    "events_asof_purchase",
    """
WITH clicks AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
),
pmax AS (
  SELECT user_id, ts, max(event_id) AS event_id
  FROM events WHERE event_type = 'purchase' GROUP BY user_id, ts
),
purch AS (
  SELECT p.user_id, p.event_id, p.ts, e.value
  FROM pmax p JOIN events e
    ON e.event_id = p.event_id AND e.event_type = 'purchase'
)
SELECT c.event_id AS click_id,
       c.user_id,
       CAST(epoch_us(c.ts) AS BIGINT) AS click_us,
       COALESCE(p.event_id, -1) AS purchase_id,
       COALESCE(CAST(epoch_us(p.ts) AS BIGINT), -1) AS purchase_us,
       COALESCE(p.value, -1.0) AS purchase_value
FROM clicks c ASOF LEFT JOIN purch p
  ON c.user_id = p.user_id AND c.ts >= p.ts
""",
)
def q_events_asof_purchase(spark, sf_dir):
    """As-of join: every click annotated with the user's latest
    purchase at or before the click (ops/asof.py tag-and-union window
    formulation — one shuffle on user_id, no range explosion). The
    oracle is DuckDB's NATIVE ASOF JOIN, so two independent as-of
    implementations must agree row-for-row."""
    from .ops.asof import asof_join

    ev = _read(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    # deterministic right side: one purchase per (user_id, ts) — max
    # event_id wins; DuckDB's native ASOF makes an ARBITRARY pick on
    # such ties, so cross-engine agreement needs the pre-aggregation
    praw = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "event_id", "ts", "value"
    )
    pmax = praw.groupBy("user_id", "ts").agg(
        F.max("event_id").alias("event_id")
    )
    # join back against PURCHASES only (mirrors the oracle's
    # event_type filter — symmetric even if ids were per-type)
    purch = pmax.join(praw.select("event_id", "value"), "event_id").select(
        "user_id", "event_id", "ts", "value"
    )
    j = asof_join(clicks, purch, on="user_id")
    return j.select(
        F.col("event_id").alias("click_id"),
        "user_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("click_us"),
        F.coalesce("event_id_r", F.lit(-1)).alias("purchase_id"),
        F.coalesce(
            F.unix_micros(F.col("ts_r").cast("timestamp")), F.lit(-1)
        ).alias("purchase_us"),
        F.coalesce("value_r", F.lit(-1.0)).alias("purchase_value"),
    )


@register(
    "events_interval_overlap",
    """
WITH c AS (
  SELECT event_id, user_id,
         (epoch_us(ts) // 1000000) % 1800 AS s
  FROM events WHERE event_type = 'click'
),
cc AS (SELECT event_id, user_id, s, s + 1 + event_id % 40 AS e FROM c),
v AS (
  SELECT event_id, user_id,
         (epoch_us(ts) // 1000000) % 1800 AS s
  FROM events WHERE event_type = 'view'
),
vv AS (SELECT event_id, user_id, s, s + 1 + event_id % 25 AS e FROM v)
SELECT cc.event_id AS click_id, vv.event_id AS view_id, cc.user_id,
       cc.s AS click_s, cc.e AS click_e, vv.s AS view_s, vv.e AS view_e
FROM cc JOIN vv
  ON cc.user_id = vv.user_id AND cc.s <= vv.e AND vv.s <= cc.e
""",
)
def q_events_interval_overlap(spark, sf_dir):
    """Interval-overlap join per user (binned equi-join,
    ops/rangejoin.py — bins of 32s over deterministic event spans)
    against a plain theta-join oracle: the binned rewrite must produce
    EXACTLY the naive join's pair set. Spark alone would plan the raw
    predicate as a nested-loop; the bin explosion turns it into one
    shuffled hash join on (user_id, bin)."""
    from .ops.rangejoin import interval_join

    ev = _read(spark, sf_dir, "events")
    sec = F.expr("unix_micros(cast(ts as timestamp)) div 1000000 % 1800")
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .withColumn("start", sec)
        .select(
            "event_id",
            "user_id",
            "start",
            (F.col("start") + 1 + F.col("event_id") % 40).alias("end"),
        )
    )
    views = (
        ev.filter(F.col("event_type") == "view")
        .withColumn("start", sec)
        .select(
            "event_id",
            "user_id",
            "start",
            (F.col("start") + 1 + F.col("event_id") % 25).alias("end"),
        )
    )
    j = interval_join(clicks, views, on="user_id", bin_width=32)
    return j.select(
        F.col("event_id").alias("click_id"),
        F.col("event_id_r").alias("view_id"),
        "user_id",
        F.col("start").alias("click_s"),
        F.col("end").alias("click_e"),
        F.col("start_r").alias("view_s"),
        F.col("end_r").alias("view_e"),
    )


@register(
    "doc_length_deciles",
    """
WITH ranked AS (
  SELECT source, n_chars,
         CAST(ROW_NUMBER() OVER (PARTITION BY source
                                 ORDER BY n_chars, doc_id) AS BIGINT) AS rn,
         CAST(count(*) OVER (PARTITION BY source) AS BIGINT) AS cnt
  FROM documents
)
SELECT source, CAST(d AS INT) AS decile, n_chars AS value
FROM ranked CROSS JOIN (SELECT unnest(range(1, 10)) AS d) ds
WHERE rn = (d * cnt + 9) // 10
""",
)
def q_doc_length_deciles(spark, sf_dir):
    """Exact per-source length deciles by rank selection (row_number +
    ceil-index pick, pure integer math) — the corpus-profiling report
    run before setting quality-filter thresholds. No percentile UDAF:
    cross-engine percentile semantics differ, rank selection does not.
    The window partitions by source (bounded groups); at web scale the
    same shape runs per domain/language shard — never a global sort."""
    d = _read(spark, sf_dir, "documents")
    ranked = d.select(
        "source",
        "n_chars",
        F.row_number()
        .over(W.partitionBy("source").orderBy("n_chars", "doc_id"))
        .cast("bigint")
        .alias("rn"),
        F.count("*")
        .over(W.partitionBy("source"))
        .cast("bigint")
        .alias("cnt"),
    )
    deciles = ranked.join(
        F.broadcast(
            d.sparkSession.range(1, 10).select(F.col("id").alias("d"))
        ),
        F.col("rn") == F.expr("(d * cnt + 9) div 10"),
    )
    return deciles.select(
        "source",
        F.col("d").cast("int").alias("decile"),
        F.col("n_chars").alias("value"),
    )


@register(
    "events_rollup_cascade",
    """
WITH minute AS (
  SELECT date_trunc('minute', ts) AS b, event_type,
         CAST(count(*) AS BIGINT) AS n,
         CAST(SUM(CAST(floor(CAST(value AS DOUBLE) * 1e6 + 0.5) AS BIGINT))
              AS BIGINT) AS v
  FROM events GROUP BY 1, 2
),
hour AS (
  SELECT date_trunc('hour', b) AS b, event_type,
         CAST(SUM(n) AS BIGINT) AS n, CAST(SUM(v) AS BIGINT) AS v
  FROM minute GROUP BY 1, 2
),
day AS (
  SELECT date_trunc('day', b) AS b, event_type,
         CAST(SUM(n) AS BIGINT) AS n, CAST(SUM(v) AS BIGINT) AS v
  FROM hour GROUP BY 1, 2
)
SELECT lvl, CAST(epoch_us(b) AS BIGINT) AS bucket_us, event_type, n,
       CAST(v AS DOUBLE) / 1e6 AS total_value
FROM (
  SELECT 'minute' AS lvl, * FROM minute
  UNION ALL SELECT 'hour', * FROM hour
  UNION ALL SELECT 'day', * FROM day
) u
""",
)
def q_events_rollup_cascade(spark, sf_dir):
    """Hypertable-style cascading rollup: minute buckets aggregate from
    raw events ONCE, hour aggregates from minute partials, day from
    hour — one scan feeds all three granularities (the continuous-
    aggregate pattern; at scale each level materializes and the next
    reads it instead of raw data). Partial sums are IEEE-quantized
    integers (exact, lossless re-aggregation; a float sum would drift
    between levels, and double→DECIMAL casts disagree between engines
    at the 6th-decimal boundary)."""
    ev = _read(spark, sf_dir, "events").select(
        F.col("ts").cast("timestamp").alias("ts"),
        "event_type",
        F.floor(F.col("value").cast("double") * F.lit(1e6) + F.lit(0.5))
        .cast("bigint")
        .alias("v"),
    )
    # r6 opt (guide §2.4): each level fans out to the next level AND
    # the union output — without materialization the minute agg (and
    # its raw-events scan) executed 3× and the hour agg 2×. The
    # materialized partials are exactly what a continuous aggregate
    # would persist.
    minute = ev.groupBy(
        F.date_trunc("minute", "ts").alias("b"), "event_type"
    ).agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("v").cast("bigint").alias("v"),
    ).localCheckpoint()
    hour = minute.groupBy(
        F.date_trunc("hour", "b").alias("b"), "event_type"
    ).agg(
        F.sum("n").cast("bigint").alias("n"),
        F.sum("v").cast("bigint").alias("v"),
    ).localCheckpoint()
    day = hour.groupBy(
        F.date_trunc("day", "b").alias("b"), "event_type"
    ).agg(
        F.sum("n").cast("bigint").alias("n"),
        F.sum("v").cast("bigint").alias("v"),
    )

    def lvl(df, name):
        return df.select(
            F.lit(name).alias("lvl"),
            F.unix_micros("b").alias("bucket_us"),
            "event_type",
            "n",
            (F.col("v").cast("double") / F.lit(1e6)).alias("total_value"),
        )

    return lvl(minute, "minute").unionByName(lvl(hour, "hour")).unionByName(
        lvl(day, "day")
    )


@register(
    "kg_sql_surface",
    _TOKS_CTE
    + """
SELECT batch_id, token, n, rnk FROM (
  SELECT batch_id, token, CAST(count(*) AS BIGINT) AS n,
         CAST(ROW_NUMBER() OVER (PARTITION BY batch_id
                                 ORDER BY count(*) DESC, token) AS BIGINT)
           AS rnk
  FROM toks GROUP BY batch_id, token
) t WHERE rnk <= 5
""",
)
def q_kg_sql_surface(spark, sf_dir):
    """The SQL entry point: the same engine consumed through
    spark.sql() over a registered view — users of the reference run
    ad-hoc questions, and the Spark-first design means ANSI SQL against
    the stage tables IS the query API (Catalyst plans it identically to
    the DataFrame chain: partitioned window, map-side-partial agg,
    pushed filter)."""
    tokens(spark, sf_dir).createOrReplaceTempView("kg_toks_v")
    return spark.sql(
        """
        SELECT batch_id, token, n, rnk FROM (
          SELECT batch_id, token, CAST(count(*) AS BIGINT) AS n,
                 CAST(ROW_NUMBER() OVER (PARTITION BY batch_id
                                         ORDER BY count(*) DESC, token)
                      AS BIGINT) AS rnk
          FROM kg_toks_v GROUP BY batch_id, token
        ) t WHERE rnk <= 5
        """
    )


@register(
    "doc_rarity_idf",
    _TOKS_CTE
    + """,
vocab AS (
  SELECT token, CAST(count(*) AS BIGINT) AS cnt FROM toks GROUP BY token
),
corpus AS (SELECT CAST(count(*) AS BIGINT) AS total FROM toks)
SELECT t.doc_id,
       CAST(count(*) AS BIGINT) AS n_tokens,
       CAST(SUM(c.total // v.cnt) AS BIGINT) AS rarity_sum,
       CAST(CAST(SUM(c.total // v.cnt) AS DOUBLE)
            / count(*) AS DOUBLE) AS rarity_per_token
FROM toks t JOIN vocab v ON t.token = v.token CROSS JOIN corpus c
GROUP BY t.doc_id
""",
)
def q_doc_rarity_idf(spark, sf_dir):
    """Lexical-rarity quality signal: per document, the sum of inverse
    corpus frequencies (total div cnt — the integer-exact IDF stand-in;
    no log(), whose last-ulp differs between libm implementations).
    Rare-word-dense documents score high, boilerplate scores low — the
    KenLM-perplexity stand-in a curation pipeline thresholds on. Plan:
    tokens join a broadcast vocabulary dimension (|vocab| rows), one
    map-side-partial agg per doc; corpus total is a broadcast 1-row
    aggregate (lazy — no eager extra pass over the tokens table)."""
    t = tokens(spark, sf_dir)
    vocab = t.groupBy("token").agg(F.count("*").alias("cnt"))
    corpus = t.agg(F.count("*").cast("bigint").alias("_total"))
    return (
        t.join(F.broadcast(vocab), "token")
        .crossJoin(F.broadcast(corpus))
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("bigint").alias("n_tokens"),
            F.sum(F.expr("_total div cnt")).cast("bigint").alias("rarity_sum"),
        )
        .select(
            "doc_id",
            "n_tokens",
            "rarity_sum",
            (F.col("rarity_sum").cast("double") / F.col("n_tokens").cast("double"))
            .cast("double")
            .alias("rarity_per_token"),
        )
    )


# ---------------------------------------------------------------------------
# round-3 families: event funnels/retention, language-model counts,
# ranked retrieval, inverted index, graph node similarity,
# benchmark-contamination, column profiling
# ---------------------------------------------------------------------------


@register(
    "events_funnel",
    """
WITH ev AS (
  SELECT user_id, event_type, CAST(epoch_us(ts) AS BIGINT) AS us FROM events
),
v AS (SELECT user_id, min(us) AS t1 FROM ev WHERE event_type = 'view' GROUP BY user_id),
c AS (SELECT ev.user_id, min(us) AS t2
      FROM ev JOIN v ON ev.user_id = v.user_id
      WHERE event_type = 'click' AND us > t1 GROUP BY ev.user_id),
p AS (SELECT ev.user_id, min(us) AS t3
      FROM ev JOIN c ON ev.user_id = c.user_id
      WHERE event_type = 'purchase' AND us > t2 GROUP BY ev.user_id)
SELECT 'view' AS step, CAST((SELECT count(*) FROM v) AS BIGINT) AS n_users
UNION ALL
SELECT 'view>click', CAST((SELECT count(*) FROM c) AS BIGINT)
UNION ALL
SELECT 'view>click>purchase', CAST((SELECT count(*) FROM p) AS BIGINT)
""",
)
def q_events_funnel(spark, sf_dir):
    """Ordered conversion funnel (view → click → purchase): a user
    counts for step k only with a strictly later event than their step
    k-1 entry — the sequential-pattern query every product-analytics
    engine ships. Plan: three user-keyed aggregates chained by equi
    joins (each a hash join + map-side-partial min) — no window over
    the whole event stream, no per-user sort; at web scale every stage
    shuffles once on user_id and AQE handles hot users."""
    e = _read(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
    )
    v = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("us").alias("t1"))
    )
    c = (
        e.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("us") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("us").alias("t2"))
    )
    p = (
        e.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("us") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("us").alias("t3"))
    )

    def one(df, label):
        return df.agg(F.count("*").cast("bigint").alias("n_users")).select(
            F.lit(label).alias("step"), "n_users"
        )

    return (
        one(v, "view")
        .unionByName(one(c, "view>click"))
        .unionByName(one(p, "view>click>purchase"))
    )


@register(
    "events_retention_hourly",
    """
WITH act AS (
  SELECT DISTINCT CAST(epoch_us(date_trunc('hour', ts)) AS BIGINT) AS hour_us,
         user_id
  FROM events
),
ret AS (
  SELECT a.hour_us, CAST(count(*) AS BIGINT) AS n_retained
  FROM act a JOIN act b
    ON a.user_id = b.user_id AND b.hour_us = a.hour_us + 3600000000
  GROUP BY a.hour_us
)
SELECT a.hour_us,
       CAST(count(*) AS BIGINT) AS n_active,
       CAST(COALESCE(min(r.n_retained), 0) AS BIGINT) AS n_retained,
       CAST(COALESCE(min(r.n_retained), 0) * 1000000 // count(*) AS BIGINT)
         AS retention_ppm
FROM act a LEFT JOIN ret r ON a.hour_us = r.hour_us
GROUP BY a.hour_us
""",
)
def q_events_retention_hourly(spark, sf_dir):
    """Hour-over-hour cohort retention: of the users active in hour H,
    how many return in H+1. The (hour, user) distinct set self-joins on
    (user, hour+1) — an equi hash join, never a window over the global
    stream; retention is an exact integer ppm (no float division)."""
    e = _read(spark, sf_dir, "events")
    # r6 opt (guide §2.4): act fans out THREE ways (semi-join probe,
    # shifted build side, the n_active agg) — materialize the distinct
    # (hour, user) frame once instead of scanning events per consumer.
    act = e.select(
        F.unix_micros(F.date_trunc("hour", F.col("ts").cast("timestamp"))).alias(
            "hour_us"
        ),
        "user_id",
    ).distinct().localCheckpoint()
    nxt = act.select(
        (F.col("hour_us") - 3_600_000_000).alias("hour_us"), "user_id"
    )
    ret = (
        act.join(nxt, ["hour_us", "user_id"], "left_semi")
        .groupBy("hour_us")
        .agg(F.count("*").cast("bigint").alias("n_retained"))
    )
    return (
        act.groupBy("hour_us")
        .agg(F.count("*").cast("bigint").alias("n_active"))
        .join(ret, "hour_us", "left")
        .select(
            "hour_us",
            "n_active",
            F.coalesce("n_retained", F.lit(0)).cast("bigint").alias("n_retained"),
            F.expr(
                "CAST(coalesce(n_retained, 0) * 1000000 div n_active AS BIGINT)"
            ).alias("retention_ppm"),
        )
    )


@register(
    "text_bigram_lm",
    _TOKS_CTE
    + """,
big AS (
  SELECT token AS w1,
         lead(token) OVER (PARTITION BY doc_id ORDER BY pos) AS w2
  FROM toks
),
cnt AS (
  SELECT w1, w2, CAST(count(*) AS BIGINT) AS c12
  FROM big WHERE w2 IS NOT NULL GROUP BY w1, w2
),
tot AS (
  SELECT w1, w2, c12, CAST(SUM(c12) OVER (PARTITION BY w1) AS BIGINT) AS c1
  FROM cnt
)
SELECT w1, w2, c12, c1,
       CAST(c12 * 1000000 // c1 AS BIGINT) AS p_ppm
FROM tot WHERE c12 >= 3
""",
)
def q_text_bigram_lm(spark, sf_dir):
    """Bigram language-model counts with exact integer conditional
    probabilities (parts-per-million via BIGINT div — no float, no
    log): the n-gram statistics layer of a data-quality / perplexity
    pipeline. Plan: one doc-partitioned lead window (narrow per-doc
    sort), one map-side-partial bigram agg, then the denominator as a
    groupBy(w1) partial agg + w1-keyed shuffle join — NOT a
    w1-partitioned window, which would sort every head word's distinct
    successors in one task (vocabulary-bounded but a needless
    sort-based skew point; the agg+join is sort-free and map-side
    partial). All hash-partitioned, nothing global. LM construction is
    shared with doc_lm_score via _doc_bigrams_from/_bigram_lm_from."""
    big = _bigram_lm_from(
        _doc_bigrams_narrow(_read(spark, sf_dir, "documents"), sf_dir)
    )
    return big.filter(F.col("c12") >= 3).select(
        "w1",
        "w2",
        "c12",
        "c1",
        F.expr("CAST(c12 * 1000000 div c1 AS BIGINT)").alias("p_ppm"),
    )


def _doc_bigrams_from(t: DataFrame) -> DataFrame:
    """(doc_id, pos, token) → per-occurrence bigrams
    (doc_id, w1, w2). One narrow doc-partitioned lead window."""
    w = W.partitionBy("doc_id").orderBy("pos")
    return (
        t.withColumn("w2", F.lead("token").over(w))
        .filter(F.col("w2").isNotNull())
        .select("doc_id", F.col("token").alias("w1"), "w2")
    )


def _doc_bigrams_narrow(docs: DataFrame, sf_dir: str) -> DataFrame:
    """(doc_id, text) → per-occurrence bigrams (doc_id, w1, w2) with
    ZERO exchange (r6 opt, guide §2.4): a bigram is two ADJACENT
    non-empty tokens of one row's text, so the lead-window formulation
    (_doc_bigrams_from — kept for token-frame callers) paid a doc_id
    exchange + per-doc sort for something derivable intra-row. Same
    rows: filter(split) order == pos order, lead == next array element."""
    return (
        _spread(docs.select("doc_id", "text"), sf_dir, "documents")
        .select(
            "doc_id",
            F.expr("filter(split(text, ' '), x -> x != '')").alias("toks"),
        )
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(sequence(0, greatest(size(toks) - 2, -1)),"
                    " i -> named_struct('w1', toks[i], 'w2', toks[i+1]))"
                )
            ).alias("_b"),
        )
        .filter(F.col("_b.w2").isNotNull())
        .select("doc_id", F.col("_b.w1").alias("w1"), F.col("_b.w2").alias("w2"))
    )


def _bigram_lm_from(bg: DataFrame) -> DataFrame:
    """Bigram occurrences → the LM count table (w1, w2, c12, c1).
    Shared by text_bigram_lm (corpus view) and doc_lm_score (per-doc
    view) so the LM semantics exist exactly once. The c12 aggregate is
    materialized (two consumers: the w1 marginal and the join)."""
    lm = (
        bg.groupBy("w1", "w2")
        .agg(F.count("*").cast("bigint").alias("c12"))
        .localCheckpoint()
    )
    c1 = lm.groupBy("w1").agg(F.sum("c12").cast("bigint").alias("c1"))
    return lm.join(c1, "w1")


BM25_TERMS = ["spark", "hash", "table", "window"]


@register(
    "search_bm25_lite",
    _TOKS_CTE
    + f""",
tf AS (
  SELECT doc_id, token, CAST(count(*) AS BIGINT) AS tf
  FROM toks WHERE token IN ({', '.join(repr(t) for t in BM25_TERMS)})
  GROUP BY doc_id, token
),
df AS (SELECT token, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY token),
nd AS (SELECT CAST(count(DISTINCT doc_id) AS BIGINT) AS n FROM toks)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_terms,
       CAST(SUM(tf.tf * (nd.n // df.df)) AS BIGINT) AS score
FROM tf JOIN df ON tf.token = df.token CROSS JOIN nd
GROUP BY doc_id
ORDER BY score DESC, doc_id
LIMIT 20
""",
)
def q_search_bm25_lite(spark, sf_dir):
    """Ranked retrieval with an integer-exact relevance score: per
    query term tf × (N div df) — the BM25 idf shape with rational
    arithmetic instead of log() (libm last-ulp differs across engines;
    the ranking this produces is idf-monotone). Plan: term-filtered
    scan (predicate pushed to parquet), doc-keyed partial agg,
    broadcast df dimension + lazy 1-row N, and the top-k is
    orderBy().limit() → TakeOrderedAndProject — per-partition top-20
    folded on the driver, never a global sort."""
    t = tokens(spark, sf_dir)
    tf = (
        t.filter(F.col("token").isin(BM25_TERMS))
        .groupBy("doc_id", "token")
        .agg(F.count("*").cast("bigint").alias("tf"))
    )
    df = tf.groupBy("token").agg(F.count("*").cast("bigint").alias("df"))
    nd = t.agg(F.countDistinct("doc_id").cast("bigint").alias("n"))
    return (
        tf.join(F.broadcast(df), "token")
        .crossJoin(F.broadcast(nd))
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("bigint").alias("n_terms"),
            F.sum(F.expr("tf * (n div df)")).cast("bigint").alias("score"),
        )
        .orderBy(F.desc("score"), "doc_id")
        .limit(20)
    )


@register(
    "index_postings_rare",
    _TOKS_CTE
    + """,
dt AS (SELECT DISTINCT token, doc_id FROM toks),
agg AS (
  SELECT token,
         CAST(count(*) AS BIGINT) AS df,
         string_agg(CAST(doc_id AS VARCHAR), ','
                    ORDER BY CAST(doc_id AS VARCHAR)) AS postings
  FROM dt GROUP BY token)
SELECT token, df, postings
FROM agg QUALIFY row_number() OVER (ORDER BY df, token) <= 20
""",
)
def q_index_postings_rare(spark, sf_dir):
    """Inverted-index posting lists for the 20 RAREST terms — bottom-k
    by (df, token), the long-tail index shard a retrieval system
    materializes eagerly (head terms stay as tf tables — an unbounded
    collect per stopword would be the scale-killer, so the bounded-k
    cap is part of the operator's contract). Rank-based rather than an
    absolute df cap so the gate is NON-VACUOUS at every SF: the
    synthetic corpus has no token with df ≤ 20 even at sf0.01, and a
    0-row match checks nothing (r4 row was 0/0). One distinct + one
    token-keyed agg; the bottom-k rank is the zero-single-partition
    two-phase rank (ascending df via the negated key); postings are
    sorted in-group, no global order."""
    t = tokens(spark, sf_dir)
    dt = t.select("token", "doc_id").distinct()
    agg = dt.groupBy("token").agg(
        F.count("*").cast("bigint").alias("df"),
        F.array_join(
            F.array_sort(F.collect_set(F.col("doc_id").cast("string"))), ","
        ).alias("postings"),
    )
    ranked = _two_phase_rank(
        agg.withColumn("_ndf", -F.col("df")), "_ndf", ["token"]
    )
    return ranked.filter(F.col("rnk") <= 20).select("token", "df", "postings")


@register(
    "kg_graph_node_jaccard",
    _DEDGES_CTE
    + f""",
adj AS ({_adj_sql("uedges")}),
deg AS (SELECT u, CAST(count(*) AS BIGINT) AS d FROM adj GROUP BY u),
pairs AS (
  SELECT l.u AS ent_a, r.u AS ent_b, CAST(count(*) AS BIGINT) AS n_common
  FROM adj l JOIN adj r ON l.v = r.v AND l.u < r.u
  GROUP BY l.u, r.u
)
SELECT p.ent_a, p.ent_b, p.n_common, da.d AS deg_a, db.d AS deg_b,
       CAST(p.n_common * 1000000 // (da.d + db.d - p.n_common) AS BIGINT)
         AS jaccard_ppm
FROM pairs p JOIN deg da ON p.ent_a = da.u JOIN deg db ON p.ent_b = db.u
WHERE p.n_common >= 2
""",
)
def q_kg_graph_node_jaccard(spark, sf_dir):
    """Common-neighbor (Jaccard) node similarity over the entity
    graph — the structural link-prediction score (two entities are
    similar if their co-occurrence neighborhoods overlap). Exact
    integer ppm via ops/graph.py:node_jaccard (adjacency self-join on
    the SHARED NEIGHBOR, equi join, two shuffled degree-dimension
    joins — no all-pairs product). The contract runs the exact
    uncapped mode so the oracle replays it; production callers pass
    ``max_neighbor_degree`` to drop super-hub neighbors before the
    deg² expansion (same opt-in policy as triangles/two_hop_reach;
    pinned by tests/test_ops_graph.py)."""
    from easyner_spark.ops.graph import node_jaccard

    return node_jaccard(dedges(spark, sf_dir), min_common=2)


@register(
    "corpus_contamination",
    _SHINGLES_CTE
    + """,
ds AS (SELECT DISTINCT doc_id, shingle FROM shingles),
bench AS (SELECT DISTINCT shingle FROM ds WHERE doc_id % 50 = 0),
train AS (SELECT * FROM ds WHERE doc_id % 50 <> 0),
hits AS (
  SELECT t.doc_id, CAST(count(*) AS BIGINT) AS n_hits
  FROM train t JOIN bench b ON t.shingle = b.shingle
  GROUP BY t.doc_id
)
SELECT t.doc_id,
       CAST(count(*) AS BIGINT) AS n_shingles,
       CAST(COALESCE(min(h.n_hits), 0) AS BIGINT) AS n_hits,
       CAST(COALESCE(min(h.n_hits), 0) * 1000000 // count(*) AS BIGINT)
         AS contam_ppm
FROM train t LEFT JOIN hits h ON t.doc_id = h.doc_id
GROUP BY t.doc_id
""",
)
def q_corpus_contamination(spark, sf_dir):
    """Benchmark-contamination screen: per training document, the
    fraction of its trigram shingles that appear anywhere in the
    held-out set (doc_id % 50 = 0 stands in for the benchmark corpus) —
    the decontamination pass every serious LLM training pipeline runs
    (n-gram collision, not embedding similarity, is the standard).
    Plan: distinct shingles → shingle-keyed semi join against the
    benchmark shingle set (equi join; at 100 TB the benchmark side is
    the small one and broadcasts), one doc-keyed agg. Exact ppm."""
    return _contamination_from(shingles(spark, sf_dir))


def _contamination_from(sh: DataFrame) -> DataFrame:
    """(doc_id, shingle) → (doc_id, n_shingles, n_hits, contam_ppm);
    split out so composite queries reuse one materialized shingle
    frame."""
    sh = sh.distinct().localCheckpoint()
    bench = (
        sh.filter(F.col("doc_id") % 50 == 0).select("shingle").distinct()
    )
    train = sh.filter(F.col("doc_id") % 50 != 0)
    hits = (
        train.join(bench, "shingle", "left_semi")
        .groupBy("doc_id")
        .agg(F.count("*").cast("bigint").alias("n_hits"))
    )
    return (
        train.groupBy("doc_id")
        .agg(F.count("*").cast("bigint").alias("n_shingles"))
        .join(hits, "doc_id", "left")
        .select(
            "doc_id",
            "n_shingles",
            F.coalesce("n_hits", F.lit(0)).cast("bigint").alias("n_hits"),
            F.expr(
                "CAST(coalesce(n_hits, 0) * 1000000 div n_shingles AS BIGINT)"
            ).alias("contam_ppm"),
        )
    )


@register(
    "profile_orders_columns",
    """
WITH o AS (
  SELECT o_orderkey, o_custkey, o_orderstatus,
         CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS price_cents,
         CAST(epoch_us(o_orderdate) AS BIGINT) AS odate_us,
         o_orderpriority
  FROM orders
)
SELECT 'o_orderkey' AS col_name, CAST(count(*) AS BIGINT) AS n_rows,
       CAST(count(*) - count(o_orderkey) AS BIGINT) AS n_nulls,
       CAST(count(DISTINCT o_orderkey) AS BIGINT) AS n_distinct,
       CAST(min(o_orderkey) AS VARCHAR) AS min_s, CAST(max(o_orderkey) AS VARCHAR) AS max_s
FROM o
UNION ALL
SELECT 'o_custkey', count(*), count(*) - count(o_custkey),
       count(DISTINCT o_custkey),
       CAST(min(o_custkey) AS VARCHAR), CAST(max(o_custkey) AS VARCHAR) FROM o
UNION ALL
SELECT 'o_orderstatus', count(*), count(*) - count(o_orderstatus),
       count(DISTINCT o_orderstatus), min(o_orderstatus), max(o_orderstatus) FROM o
UNION ALL
SELECT 'o_totalprice_cents', count(*), count(*) - count(price_cents),
       count(DISTINCT price_cents),
       CAST(min(price_cents) AS VARCHAR), CAST(max(price_cents) AS VARCHAR) FROM o
UNION ALL
SELECT 'o_orderdate_us', count(*), count(*) - count(odate_us),
       count(DISTINCT odate_us),
       CAST(min(odate_us) AS VARCHAR), CAST(max(odate_us) AS VARCHAR) FROM o
UNION ALL
SELECT 'o_orderpriority', count(*), count(*) - count(o_orderpriority),
       count(DISTINCT o_orderpriority), min(o_orderpriority), max(o_orderpriority) FROM o
""",
)
def q_profile_orders_columns(spark, sf_dir):
    """Column-level data profiler (null rate, cardinality, min/max per
    column) — the schema-on-read health check a lakehouse runs before
    admitting a table. ONE scan: all per-column aggregates compute in a
    single map-side-partial pass (doubles quantized to exact cents,
    timestamps to unix micros, so min/max render identically across
    engines); the per-column rows come from unpivoting the 1-row
    aggregate, not from six scans."""
    o = _read(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        F.expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)").alias(
            "price_cents"
        ),
        F.unix_micros(F.col("o_orderdate").cast("timestamp")).alias("odate_us"),
        "o_orderpriority",
    )
    cols = [
        ("o_orderkey", "o_orderkey", "bigint"),
        ("o_custkey", "o_custkey", "bigint"),
        ("o_orderstatus", "o_orderstatus", "string"),
        ("o_totalprice_cents", "price_cents", "bigint"),
        ("o_orderdate_us", "odate_us", "bigint"),
        ("o_orderpriority", "o_orderpriority", "string"),
    ]
    # r6 opt (guide §2.3): SIX count(DISTINCT col) over different
    # columns in one aggregate planned an Expand — every orders row was
    # duplicated 7× and sort-aggregated over a 7-column key (the before
    # plan's Expand + 3 SortAggregates). Instead profile each column
    # from its own grouped-by-value frame: one partial hash agg per
    # column (shuffles only the distinct values), every statistic
    # (n_rows, nulls, cardinality, min/max) derivable from the groups.
    # Same six rows, no Expand, no full-row sort anywhere.
    branches = []
    for label, c, _ in cols:
        g = o.groupBy(F.col(c).alias("_v")).agg(F.count("*").alias("_n"))
        branches.append(
            g.agg(
                F.coalesce(F.sum("_n"), F.lit(0)).cast("bigint").alias("n_rows"),
                F.coalesce(
                    F.sum(F.when(F.col("_v").isNull(), F.col("_n"))), F.lit(0)
                ).cast("bigint").alias("n_nulls"),
                F.count("_v").cast("bigint").alias("n_distinct"),
                F.min("_v").cast("string").alias("min_s"),
                F.max("_v").cast("string").alias("max_s"),
            ).select(
                F.lit(label).alias("col_name"),
                "n_rows",
                "n_nulls",
                "n_distinct",
                "min_s",
                "max_s",
            )
        )
    return functools.reduce(DataFrame.unionByName, branches)


@register(
    "tpch_priority_late_ship",
    """
SELECT o.o_orderpriority,
       CAST(count(*) AS BIGINT) AS n_orders
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
  AND o.o_orderdate < TIMESTAMP '1997-01-01'
  AND EXISTS (
    SELECT 1 FROM lineitem l
    WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate
  )
GROUP BY o.o_orderpriority
""",
)
def q_tpch_priority_late_ship(spark, sf_dir):
    """TPC-H Q4 planning shape (adapted to this star's columns): a
    date-range scan with a correlated EXISTS decorrelated into a LEFT
    SEMI hash join on (orderkey + ship-after-order predicate), then a
    low-cardinality priority rollup. Catalyst pushes the date range to
    the parquet scan and plans the semi join hash-partitioned on
    l_orderkey — the existence probe never materializes matched
    lineitem rows."""
    o = _read(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01")
        & (F.col("o_orderdate") < "1997-01-01")
    )
    l = _read(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    sem = o.join(
        l,
        (F.col("o_orderkey") == F.col("l_orderkey"))
        & (F.col("l_shipdate") > F.col("o_orderdate")),
        "left_semi",
    )
    return sem.groupBy("o_orderpriority").agg(
        F.count("*").cast("bigint").alias("n_orders")
    )


@register(
    "train_corpus_curated",
    _SHINGLES_CTE.replace("WITH ", "WITH RECURSIVE ", 1)
    + f""",
sigs AS (
  SELECT doc_id, {_minhash_sig_exprs_sql()}
  FROM shingles GROUP BY doc_id
),
bands AS (
  SELECT doc_id, unnest([md5(h0 || h1 || h2 || h3), md5(h4 || h5 || h6 || h7)]) AS band_hash,
         unnest([0, 1]) AS band_id
  FROM sigs
),
pairs AS (
  SELECT DISTINCT a.doc_id AS src, b.doc_id AS dst
  FROM bands a JOIN bands b
    ON a.band_hash = b.band_hash AND a.band_id = b.band_id AND a.doc_id < b.doc_id
),
edges AS (
  SELECT src AS u, dst AS v FROM pairs
  UNION SELECT dst, src FROM pairs
),
reach(node, label) AS (
  SELECT u, u FROM edges
  UNION
  SELECT e.v, r.label FROM reach r JOIN edges e ON e.u = r.node
),
comp AS (SELECT node, min(label) AS component FROM reach GROUP BY node),
quality AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
         CAST(count(DISTINCT token) AS BIGINT) AS nd
  FROM toks GROUP BY doc_id
),
ds AS (SELECT DISTINCT doc_id, shingle FROM shingles),
bench AS (SELECT DISTINCT shingle FROM ds WHERE doc_id % 50 = 0),
train AS (SELECT * FROM ds WHERE doc_id % 50 <> 0),
hits AS (
  SELECT t.doc_id, CAST(count(*) AS BIGINT) AS n_hits
  FROM train t JOIN bench b ON t.shingle = b.shingle
  GROUP BY t.doc_id
),
contam AS (
  SELECT t.doc_id,
         CAST(COALESCE(min(h.n_hits), 0) * 1000000 // count(*) AS BIGINT)
           AS contam_ppm
  FROM train t LEFT JOIN hits h ON t.doc_id = h.doc_id
  GROUP BY t.doc_id
)
SELECT q.doc_id, q.n_tokens,
       CAST(q.nd * 1000000 // q.n_tokens AS BIGINT) AS ttr_ppm,
       CAST(COALESCE(c.contam_ppm, 0) AS BIGINT) AS contam_ppm
FROM quality q LEFT JOIN contam c ON q.doc_id = c.doc_id
WHERE q.doc_id % 50 <> 0
  AND NOT EXISTS (SELECT 1 FROM comp m
                  WHERE m.node = q.doc_id AND m.component < q.doc_id)
  AND q.n_tokens >= 20
  AND q.nd * 1000000 // q.n_tokens >= 300000
  AND COALESCE(c.contam_ppm, 0) < 500000
""",
)
def q_train_corpus_curated(spark, sf_dir):
    """The END-TO-END curation gate — the single query a training-data
    pipeline runs to admit documents into a shard: (1) held-out docs
    excluded (doc_id % 50 = 0 is the benchmark stand-in), (2) near-dup
    clusters keep only their canonical (min-id) member — MinHash-LSH
    pairs → connected components, (3) quality floor (≥20 tokens,
    type-token ratio ≥ 0.30 as exact integer ppm), (4) benchmark
    contamination < 50% of shingles. Every sub-signal is itself an
    oracle-gated operator (dedup_components, doc_quality_scores,
    corpus_contamination); this composes them with all-integer
    predicates so the admitted set is engine- and layout-invariant.
    Plan: the component/quality/contamination branches each shuffle on
    doc_id, then broadcast-free equi/anti joins on doc_id — at 100 TB
    every branch is the already-committed stage table. In THIS
    contract query the branches share ONE materialized token frame and
    ONE materialized shingle frame (localCheckpoint — Catalyst does
    not dedupe multi-consumer subtrees), so tokenize/shingle run once,
    not three times."""
    from .stages.canonical import connected_components

    # r6 opt (guide §2.4): the shared 18M-row token frame is gone —
    # the quality statistics are intra-row (same rewrite as
    # doc_quality_scores) and the shingle branch uses the narrow
    # filter(split)→slide path, so only the (much smaller) distinct
    # shingle frame is materialized for its two consumers.
    sh = shingles(spark, sf_dir).localCheckpoint()  # pairs + contamination
    pairs = _minhash_pairs_from(sh).select(
        F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
    )
    comp = connected_components(pairs).select(
        F.col("node").alias("doc_id"), "component"
    )
    dupes = comp.filter(F.col("component") < F.col("doc_id")).select("doc_id")
    quality = (
        _spread(
            _read(spark, sf_dir, "documents")
            .select("doc_id", "text")
            .filter(F.expr("length(trim(text)) > 0")),  # trim-guard
            sf_dir,
            "documents",
        )
        .select(
            "doc_id",
            F.expr("filter(split(text, ' '), x -> x != '')").alias("_t"),
        )
        .select(
            "doc_id",
            F.size("_t").cast("bigint").alias("n_tokens"),
            F.size(F.array_distinct("_t")).cast("bigint").alias("nd"),
        )
    )
    contam = _contamination_from(sh).select("doc_id", "contam_ppm")
    return (
        quality.filter(F.col("doc_id") % 50 != 0)
        .join(dupes, "doc_id", "left_anti")
        .join(contam, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            F.expr("CAST(nd * 1000000 div n_tokens AS BIGINT)").alias("ttr_ppm"),
            F.coalesce("contam_ppm", F.lit(0)).cast("bigint").alias("contam_ppm"),
        )
        .filter(
            (F.col("n_tokens") >= 20)
            & (F.col("ttr_ppm") >= 300_000)
            & (F.col("contam_ppm") < 500_000)
        )
    )


@register(
    "tpch_cust_order_distribution",
    """
SELECT c_count, CAST(count(*) AS BIGINT) AS n_cust
FROM (
  SELECT c.c_custkey, CAST(count(o.o_orderkey) AS BIGINT) AS c_count
  FROM customer c LEFT JOIN orders o
    ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
  GROUP BY c.c_custkey
) t
GROUP BY c_count
""",
)
def q_tpch_cust_order_distribution(spark, sf_dir):
    """TPC-H Q13 planning shape: outer join with a join-side predicate
    (the filter belongs ON the join, not under it — a WHERE would turn
    the left join inner and drop zero-order customers), then a
    two-level count-of-counts histogram. Catalyst plans the left outer
    hash join on custkey and both aggregations map-side partial; the
    zero-order customers ride the NULL-extension, exactly the
    customer-distribution report shape."""
    c = _read(spark, sf_dir, "customer").select("c_custkey")
    o = _read(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", "o_orderpriority"
    )
    per_cust = (
        c.join(
            o,
            (F.col("c_custkey") == F.col("o_custkey"))
            & (F.col("o_orderpriority") != "1-URGENT"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").cast("bigint").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(
        F.count("*").cast("bigint").alias("n_cust")
    )


@register(
    "kg_entity_trend",
    _MENTIONS_CTE
    + """,
per_batch AS (
  SELECT surface, batch_id, CAST(count(*) AS BIGINT) AS n
  FROM mentions GROUP BY surface, batch_id
)
SELECT surface, batch_id, n,
       CAST(COALESCE(n - lag(n) OVER (PARTITION BY surface ORDER BY batch_id),
                     n) AS BIGINT) AS delta,
       CAST(ROW_NUMBER() OVER (PARTITION BY batch_id ORDER BY n DESC, surface)
            AS BIGINT) AS rnk_in_batch
FROM per_batch
""",
)
def q_kg_entity_trend(spark, sf_dir):
    """Trending entities: per (surface, ingest batch) mention counts
    with the batch-over-batch delta (lag window PARTITIONED BY surface
    — per-key state, never global) and the within-batch rank — the
    "what surged this crawl" serving query a KG dashboard runs. Both
    windows are hash-partitioned (by surface / by batch); at web scale
    batch_id is the time slice and the per-batch rank is bounded by
    distinct surfaces per slice."""
    m = mentions(spark, sf_dir)
    per_batch = m.groupBy("surface", "batch_id").agg(
        F.count("*").cast("bigint").alias("n")
    )
    w_lag = W.partitionBy("surface").orderBy("batch_id")
    w_rnk = W.partitionBy("batch_id").orderBy(F.desc("n"), "surface")
    return per_batch.select(
        "surface",
        "batch_id",
        "n",
        F.coalesce(
            F.col("n") - F.lag("n").over(w_lag), F.col("n")
        ).cast("bigint").alias("delta"),
        F.row_number().over(w_rnk).cast("bigint").alias("rnk_in_batch"),
    )


@register(
    "dedup_minhash_verified",
    _SHINGLES_CTE
    + f""",
sigs AS (
  SELECT doc_id, {_minhash_sig_exprs_sql()}
  FROM shingles GROUP BY doc_id
),
bands AS (
  SELECT doc_id, unnest([md5(h0 || h1 || h2 || h3), md5(h4 || h5 || h6 || h7)]) AS band_hash,
         unnest([0, 1]) AS band_id
  FROM sigs
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b
    ON a.band_hash = b.band_hash AND a.band_id = b.band_id AND a.doc_id < b.doc_id
)
SELECT c.doc_a, c.doc_b,
       CAST(((CASE WHEN sa.h0 = sb.h0 THEN 1 ELSE 0 END) +
             (CASE WHEN sa.h1 = sb.h1 THEN 1 ELSE 0 END) +
             (CASE WHEN sa.h2 = sb.h2 THEN 1 ELSE 0 END) +
             (CASE WHEN sa.h3 = sb.h3 THEN 1 ELSE 0 END) +
             (CASE WHEN sa.h4 = sb.h4 THEN 1 ELSE 0 END) +
             (CASE WHEN sa.h5 = sb.h5 THEN 1 ELSE 0 END) +
             (CASE WHEN sa.h6 = sb.h6 THEN 1 ELSE 0 END) +
             (CASE WHEN sa.h7 = sb.h7 THEN 1 ELSE 0 END)) * 1000000 // 8
            AS BIGINT) AS agreement_ppm
FROM cand c JOIN sigs sa ON c.doc_a = sa.doc_id
            JOIN sigs sb ON c.doc_b = sb.doc_id
WHERE ((CASE WHEN sa.h0 = sb.h0 THEN 1 ELSE 0 END) +
       (CASE WHEN sa.h1 = sb.h1 THEN 1 ELSE 0 END) +
       (CASE WHEN sa.h2 = sb.h2 THEN 1 ELSE 0 END) +
       (CASE WHEN sa.h3 = sb.h3 THEN 1 ELSE 0 END) +
       (CASE WHEN sa.h4 = sb.h4 THEN 1 ELSE 0 END) +
       (CASE WHEN sa.h5 = sb.h5 THEN 1 ELSE 0 END) +
       (CASE WHEN sa.h6 = sb.h6 THEN 1 ELSE 0 END) +
       (CASE WHEN sa.h7 = sb.h7 THEN 1 ELSE 0 END)) * 2 >= 8
""",
)
def q_dedup_minhash_verified(spark, sf_dir):
    """The verification step that makes LSH dedup safe to cluster:
    band-collision candidates re-scored by MinHash agreement (exact
    integer ppm over the signature), kept at agreement >= 1/2 — raw
    band collisions chain same-vocabulary pages into mega-components
    when clustered unverified (the defect the pipeline's dedup stage
    and epoch_dedup_pairs guard against; this query is that guard's
    oracle contract). Plan: the candidate equi-join plus two broadcast-
    free hash joins back to the signature table — agreement is a pure
    zip_with fold, no shuffle beyond the joins."""
    # r6 opt (guide §2.4): one materialized shingle frame feeds the
    # candidate pipeline AND the signature agg, and the signature frame
    # is materialized before its two join sides — tokenize+shingle ran
    # 3× before, once now.
    sh = shingles(spark, sf_dir).localCheckpoint()
    pairs = _minhash_pairs_from(sh)
    sigs = (
        sh.groupBy("doc_id")
        .agg(
            F.array(
                *[
                    F.min(
                        F.md5(
                            F.concat(F.lit(f"{s}|"), F.col("shingle")).cast("binary")
                        )
                    )
                    for s in range(MINHASH_SEEDS)
                ]
            ).alias("sig")
        )
        .localCheckpoint()
    )
    sa = sigs.select(F.col("doc_id").alias("doc_a"), F.col("sig").alias("sig_a"))
    sb = sigs.select(F.col("doc_id").alias("doc_b"), F.col("sig").alias("sig_b"))
    agree = F.expr(
        "aggregate(zip_with(sig_a, sig_b, (x, y) -> CAST(x = y AS INT)),"
        " 0, (acc, v) -> acc + v)"
    )
    return (
        pairs.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn("_agree", agree)
        .filter(F.col("_agree") * 2 >= MINHASH_SEEDS)
        .select(
            "doc_a",
            "doc_b",
            F.expr(f"CAST(_agree * 1000000 div {MINHASH_SEEDS} AS BIGINT)").alias(
                "agreement_ppm"
            ),
        )
    )


# --------------------------- round-4 additions ---------------------------


@register(
    "kg_graph_degree_dist",
    _DEDGES_CTE
    + """,
adj AS (SELECT a AS u FROM uedges UNION ALL SELECT b FROM uedges),
deg AS (SELECT u, CAST(count(*) AS BIGINT) AS degree FROM adj GROUP BY u)
SELECT degree, CAST(count(*) AS BIGINT) AS n_nodes
FROM deg GROUP BY degree
""",
)
def q_kg_graph_degree_dist(spark, sf_dir):
    """Degree distribution of the entity co-occurrence graph — the
    health/skew profile read before running any quadratic graph op
    (it is how the hub caps for triangles/two-hop/node-jaccard get
    CHOSEN: pick max_degree at the distribution's tail knee). Two
    map-side-partial aggs, both hash-keyed, nothing global; output is
    bounded by the number of distinct degrees (≤ max degree)."""
    und = (
        dedges(spark, sf_dir)
        .select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .distinct()
        .localCheckpoint()  # both unionAll branches; Catalyst won't dedupe
    )
    deg = (
        und.select(F.col("a").alias("u"))
        .unionAll(und.select(F.col("b").alias("u")))
        .groupBy("u")
        .agg(F.count("*").cast("bigint").alias("degree"))
    )
    return deg.groupBy("degree").agg(
        F.count("*").cast("bigint").alias("n_nodes")
    )


@register(
    "train_mixture_tokens",
    _TOKS_CTE
    + """,
pd AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n FROM toks GROUP BY doc_id),
ds AS (
  SELECT d.source,
         CAST(count(*) AS BIGINT) AS n_docs,
         CAST(SUM(COALESCE(pd.n, 0)) AS BIGINT) AS n_tokens
  FROM documents d LEFT JOIN pd ON d.doc_id = pd.doc_id
  GROUP BY d.source
),
tot AS (SELECT CAST(SUM(n_tokens) AS BIGINT) AS t FROM ds)
SELECT source, n_docs, n_tokens,
       CAST(n_tokens * 1000000 // tot.t AS BIGINT) AS share_ppm
FROM ds CROSS JOIN tot
""",
)
def q_train_mixture_tokens(spark, sf_dir):
    """Data-mixture weights: per-source document and token counts plus
    each source's exact token share (ppm) of the corpus — the table a
    training run samples against when balancing web/books/code/...
    mixtures. Plan: per-doc token counts → doc_id-keyed join with the
    documents dimension → per-source partial agg (localCheckpoint: the
    per-source frame feeds both the total and the final projection),
    then a crossJoin-broadcast of the lazy 1-row total (the
    scalar-count pattern pinned in tests/test_plan_shapes.py). All
    BIGINT; share_ppm is one integer division."""
    tk = tokens(spark, sf_dir).groupBy("doc_id").agg(
        F.count("*").cast("bigint").alias("n")
    )
    d = (
        _read(spark, sf_dir, "documents")
        .select("doc_id", "source")
        .join(tk, "doc_id", "left")
    )
    per_src = (
        d.groupBy("source")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum(F.coalesce("n", F.lit(0))).cast("bigint").alias("n_tokens"),
        )
        .localCheckpoint()  # feeds the 1-row total AND the projection
    )
    tot = per_src.agg(F.sum("n_tokens").cast("bigint").alias("t"))
    return per_src.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_docs",
        "n_tokens",
        F.expr("CAST(n_tokens * 1000000 div t AS BIGINT)").alias("share_ppm"),
    )


@register(
    "dedup_containment",
    _SHINGLES_CTE
    + """,
ds AS (SELECT DISTINCT doc_id, shingle FROM shingles),
sizes AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n FROM ds GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS da, b.doc_id AS db, CAST(count(*) AS BIGINT) AS n_inter
  FROM ds a JOIN ds b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT i.da AS doc_a, i.db AS doc_b, i.n_inter,
       CAST(least(sa.n, sb.n) AS BIGINT) AS n_small,
       CAST(i.n_inter * 1000000 // least(sa.n, sb.n) AS BIGINT) AS cont_ppm
FROM inter i
JOIN sizes sa ON i.da = sa.doc_id
JOIN sizes sb ON i.db = sb.doc_id
WHERE i.n_inter * 1000000 // least(sa.n, sb.n) >= 600000
""",
)
def q_dedup_containment(spark, sf_dir):
    """ASYMMETRIC near-dup: shingle containment of the smaller document
    in the pair (n_inter / min(|A|,|B|), exact integer ppm, ≥60%).
    Catches a short page verbatim-embedded in a long one — quote farms,
    article+comments wrappers — which symmetric Jaccard scores low
    because the union is dominated by the long side. Plan: distinct
    (doc, shingle) → shingle-keyed equi self-join (fan-out bounded by
    shingle df, AQE skew-split; at production scale the same
    MinHash-band blocking as dedup_minhash_pairs runs first and
    stages/canonical.py:containment_filter verifies only the
    candidates — this contract query is its exact whole-corpus twin)
    → pair agg → two size-dimension joins. No all-pairs product."""
    ds = shingles(spark, sf_dir).distinct().localCheckpoint()  # 2 consumers
    sizes = ds.groupBy("doc_id").agg(F.count("*").cast("bigint").alias("n"))
    # sort-merge hint: same reasoning + A/B as dedup_jaccard (§3.1)
    a, b = ds.alias("a"), ds.hint("merge").alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count("*").cast("bigint").alias("n_inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb"))
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            "n_inter",
            F.expr("CAST(least(na, nb) AS BIGINT)").alias("n_small"),
            F.expr(
                "CAST(n_inter * 1000000 div least(na, nb) AS BIGINT)"
            ).alias("cont_ppm"),
        )
        .filter(F.col("cont_ppm") >= 600_000)
    )


@register(
    "doc_lm_score",
    _TOKS_CTE
    + """,
bg AS (
  SELECT doc_id, token AS w1,
         lead(token) OVER (PARTITION BY doc_id ORDER BY pos) AS w2
  FROM toks
),
bg2 AS (SELECT doc_id, w1, w2 FROM bg WHERE w2 IS NOT NULL),
lm AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS c12 FROM bg2 GROUP BY w1, w2),
c1 AS (SELECT w1, CAST(SUM(c12) AS BIGINT) AS c1 FROM lm GROUP BY w1),
p AS (
  SELECT lm.w1, lm.w2, CAST(lm.c12 * 1000000 // c1.c1 AS BIGINT) AS p_ppm
  FROM lm JOIN c1 ON lm.w1 = c1.w1
)
SELECT b.doc_id,
       CAST(count(*) AS BIGINT) AS n_bigrams,
       CAST(SUM(p.p_ppm) // count(*) AS BIGINT) AS lm_score_ppm
FROM bg2 b JOIN p ON b.w1 = p.w1 AND b.w2 = p.w2
GROUP BY b.doc_id
""",
)
def q_doc_lm_score(spark, sf_dir):
    """Model-free perplexity proxy: per document, the mean corpus
    bigram conditional probability (ppm) over its bigram occurrences —
    low scores flag gibberish/boilerplate-shredded text, the quality
    signal a curation gate adds next to length/TTR. Everything integer
    (p_ppm = c12*1e6 div c1; score = sum div count): no log(), no
    float, engine-exact. Plan: one narrow per-doc lead window → the
    doc-bigram frame is materialized ONCE (localCheckpoint) and feeds
    both the LM aggregation and the probability join; the LM and its
    w1 marginal are map-side partial aggs; final agg keys on doc_id.
    LM construction is the SAME _doc_bigrams_from/_bigram_lm_from
    text_bigram_lm uses — the two queries cannot silently diverge."""
    bg = _doc_bigrams_narrow(
        _read(spark, sf_dir, "documents"), sf_dir
    ).localCheckpoint()
    p = _bigram_lm_from(bg).select(
        "w1",
        "w2",
        F.expr("CAST(c12 * 1000000 div c1 AS BIGINT)").alias("p_ppm"),
    )
    return (
        bg.join(p, ["w1", "w2"])
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("bigint").alias("n_bigrams"),
            F.expr("CAST(SUM(p_ppm) div count(*) AS BIGINT)").alias(
                "lm_score_ppm"
            ),
        )
    )


WPAGERANK_ITERS = 3
WPR_SCALE = 10**9  # final per-node rank must fit int64 (products are wide)


def _weighted_pagerank_oracle(
    iters: int,
    scale: int,
    prefix: str | None = None,
    wedges_sql: str = _KG_WEDGES_SQL,
    key_alias: str = "ent_id",
) -> str:
    """Unrolled weighted PageRank in ANSI SQL — the DuckDB replay of
    ops/graph.py:pagerank(weight=...): per edge (rank * w) // wsum,
    same damping rational, same dangling-mass semantics. Parameterized
    on the weighted-edge CTE body (``wedges_sql`` must yield (src,
    dst, w BIGINT)) so the KG co-occurrence contract and the web
    host-link-graph contract replay the SAME recursion over different
    graphs; ``prefix`` supplies upstream CTEs as a complete ``WITH x
    AS (...)`` clause (None → the linked-corpus chain; "" → none, for
    a wedges_sql that reads base tables directly)."""
    from .ops.graph import PR_DAMP_DEN, PR_DAMP_NUM

    base = (PR_DAMP_DEN - PR_DAMP_NUM) * scale // PR_DAMP_DEN
    ctes = [f"r0 AS (SELECT node, CAST({scale} AS BIGINT) AS rank FROM nodes)"]
    for i in range(1, iters + 1):
        ctes.append(
            f"""r{i} AS (
  SELECT n.node,
         CAST({base} + ({PR_DAMP_NUM} * COALESCE(s.c, 0)) // {PR_DAMP_DEN}
              AS BIGINT) AS rank
  FROM nodes n LEFT JOIN (
    -- HUGEINT product mirrors the engine's DECIMAL(38,0) cast-before-
    -- multiply (ops/graph.py): a hub's rank x a large weight must not
    -- overflow on either side of the contract
    SELECT e.dst AS node, SUM((CAST(r.rank AS HUGEINT) * e.w) // d.wsum) AS c
    FROM wedges e JOIN r{i - 1} r ON e.src = r.node
                  JOIN outw d ON e.src = d.node
    GROUP BY e.dst) s ON n.node = s.node)"""
        )
    head = _LINKED_CTE if prefix is None else prefix
    return (
        (head + "," if head else "WITH")
        + f"""
wedges AS ({wedges_sql}
),
nodes AS (SELECT src AS node FROM wedges UNION SELECT dst FROM wedges),
outw AS (SELECT src AS node, CAST(SUM(w) AS BIGINT) AS wsum
         FROM wedges GROUP BY src),
"""
        + ",\n".join(ctes)
        + f"\nSELECT node AS {key_alias}, rank AS rank_scaled FROM r{iters}"
    )


@register(
    "kg_graph_pagerank_weighted",
    _weighted_pagerank_oracle(WPAGERANK_ITERS, WPR_SCALE),
)
def q_kg_graph_pagerank_weighted(spark, sf_dir):
    """WEIGHTED entity centrality: PageRank where each edge carries its
    co-occurrence count, so mass flows proportionally to evidence
    strength instead of uniformly per neighbor — the centrality a KG
    actually serves (a once-co-occurring pair shouldn't pull like a
    thousand-sentence pair). Exact integers throughout ((rank * w) div
    wsum with the product in DECIMAL(38,0)/HUGEINT on the two sides —
    overflow-free even for hub ranks x large weights);
    3 fixed rounds so the DuckDB oracle replays the identical
    recursion. Engine: ops/graph.py:pagerank(weight=...) — same
    localCheckpoint-per-round plan as the uniform variant; the graph is
    the shared wedges() helper (dedges' weighted sibling)."""
    from .ops.graph import pagerank

    return pagerank(
        wedges(spark, sf_dir),
        iterations=WPAGERANK_ITERS,
        scale=WPR_SCALE,
        weight="w",
    ).select(F.col("node").alias("ent_id"), "rank_scaled")


@register(
    "doc_sentence_dup_ratio",
    _SENTENCES_CTE
    + """,
sfreq AS (
  SELECT sent_text, CAST(count(DISTINCT doc_id) AS BIGINT) AS ndocs
  FROM sentences GROUP BY sent_text
)
SELECT s.doc_id,
       CAST(count(*) AS BIGINT) AS n_sents,
       CAST(SUM(CASE WHEN f.ndocs > 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_shared,
       CAST(SUM(CASE WHEN f.ndocs > 1 THEN 1 ELSE 0 END) * 1000000
            // count(*) AS BIGINT) AS shared_ppm
FROM sentences s JOIN sfreq f ON s.sent_text = f.sent_text
GROUP BY s.doc_id
""",
)
def q_doc_sentence_dup_ratio(spark, sf_dir):
    """SENTENCE-level boilerplate signal: per document, the fraction of
    its sentences that appear verbatim in at least one OTHER document —
    the granularity real curation dedups at (page chrome, cookie
    banners, licence blocks repeat across pages whose documents are
    not near-dups). Exact integer ppm. Plan: the sentence frame is
    materialized once (two consumers), the cross-doc frequency is a
    sent_text-keyed partial agg, and the verdict joins back on
    sent_text (boilerplate keys are hot — AQE skew-split; at 100 TB
    the join is against the already-committed sentence stage)."""
    s = sentences(spark, sf_dir).select("doc_id", "sent_text").localCheckpoint()
    freq = s.groupBy("sent_text").agg(
        F.countDistinct("doc_id").cast("bigint").alias("ndocs")
    )
    return (
        s.join(freq, "sent_text")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("bigint").alias("n_sents"),
            F.sum(F.when(F.col("ndocs") > 1, 1).otherwise(0))
            .cast("bigint")
            .alias("n_shared"),
        )
        .select(
            "doc_id",
            "n_sents",
            "n_shared",
            F.expr("CAST(n_shared * 1000000 div n_sents AS BIGINT)").alias(
                "shared_ppm"
            ),
        )
    )


@register(
    "web_url_features",
    "WITH "
    + _URLS_SQL
    + """,
u1 AS (
  SELECT doc_id, url,
         regexp_replace(regexp_replace(url, '^[A-Za-z][A-Za-z0-9+.-]*://', ''),
                        '[?#].*$', '') AS hostpath,
         regexp_extract(url, '\\?[^#]*', 0) AS q
  FROM urls
),
u2 AS (
  SELECT doc_id, url, q,
         regexp_replace(hostpath, '^[^/]*', '') AS path
  FROM u1
)
SELECT doc_id, url,
       CAST(len(list_filter(string_split(path, '/'), x -> x <> ''))
            AS BIGINT) AS path_depth,
       CAST(CASE WHEN q = '' THEN 0
            ELSE len(list_filter(string_split(substr(q, 2), '&'),
                                 x -> x <> '')) END AS BIGINT) AS n_params,
       CAST((length(url) - length(regexp_replace(url, '[0-9]', '', 'g')))
            * 1000000 // length(url) AS BIGINT) AS digit_ppm
FROM u2
""",
)
def q_web_url_features(spark, sf_dir):
    """URL feature extraction for crawl-quality scoring: path depth,
    query-parameter count, digit density (ppm) — the cheap structural
    signals a crawler uses to down-rank calendar/session/faceted spam
    URLs before fetching. Pure JVM regexp/split projection, one narrow
    map stage, no shuffle; every value an exact integer."""
    u = urls_df(spark, sf_dir).select("doc_id", "url")
    return u.selectExpr(
        "doc_id",
        "url",
        # strip scheme → strip query/fragment → strip host → count
        # non-empty path segments
        r"""CAST(size(filter(split(
              regexp_replace(regexp_replace(regexp_replace(url,
                '^[A-Za-z][A-Za-z0-9+.-]*://', ''), '[?#].*$', ''),
                '^[^/]*', ''),
              '/'), x -> x != '')) AS BIGINT) AS path_depth""",
        r"""CAST(CASE WHEN regexp_extract(url, '\\?[^#]*', 0) = '' THEN 0
             ELSE size(filter(split(
                    substr(regexp_extract(url, '\\?[^#]*', 0), 2), '&'),
                  x -> x != '')) END AS BIGINT) AS n_params""",
        r"""CAST((length(url) - length(regexp_replace(url, '[0-9]', '')))
             * 1000000 div length(url) AS BIGINT) AS digit_ppm""",
    )


FRAME_N = 4
FRAME_W = 32


@register(
    "multimodal_frame_sample",
    f"""
WITH frames AS (
  SELECT d.doc_id, s.frame_idx,
         substring(d.text,
                   CAST((s.frame_idx * greatest(length(d.text) - {FRAME_W}, 0))
                        // {FRAME_N - 1} AS BIGINT) + 1,
                   {FRAME_W}) AS fb
  FROM documents d, (SELECT unnest(range({FRAME_N})) AS frame_idx) s
)
SELECT doc_id, CAST(frame_idx AS BIGINT) AS frame_idx,
       CAST(length(fb) AS BIGINT) AS frame_len,
       md5(fb) AS frame_md5
FROM frames
""",
)
def q_multimodal_frame_sample(spark, sf_dir):
    """Deterministic frame sampling over opaque payloads — the
    codec-free video plumbing contract: n evenly-spaced windows per
    payload via ops/multimodal.py:sample_frames (pure JVM explode +
    integer-div offsets; a real build swaps the byte slicer for pyav
    keyframe decode with the identical Spark shape). The payload here
    is the document text encoded as binary; the oracle slices the same
    (pure-ASCII) characters, so frame hashes agree byte-for-byte.
    Narrow map plan, no shuffle."""
    from .ops.multimodal import sample_frames

    d = _read(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("payload_id"),
        F.encode(F.col("text"), "utf-8").alias("payload"),
    )
    frames = sample_frames(
        d, n_frames=FRAME_N, frame_size=FRAME_W
    )
    return frames.select(
        F.col("payload_id").alias("doc_id"),
        F.col("frame_idx").cast("bigint").alias("frame_idx"),
        F.octet_length("frame_bytes").cast("bigint").alias("frame_len"),
        F.md5("frame_bytes").alias("frame_md5"),
    )


EPOCH_BANDS = 4  # pinned on BOTH sides of the contract (engine call below)


def _epoch_band_sql() -> str:
    n_bands = EPOCH_BANDS
    rows = MINHASH_SEEDS // n_bands
    return " OR ".join(
        "("
        + " AND ".join(
            f"a.h{b * rows + r} = b.h{b * rows + r}" for r in range(rows)
        )
        + ")"
        for b in range(n_bands)
    )


@register(
    "dedup_epoch_incremental",
    _SHINGLES_CTE
    + f""",
sigs AS (
  SELECT doc_id, {_minhash_sig_exprs_sql()}
  FROM shingles GROUP BY doc_id
),
cand AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         {" + ".join(f"CAST(a.h{s} = b.h{s} AS INT)" for s in range(MINHASH_SEEDS))} AS agree
  FROM sigs a JOIN sigs b ON a.doc_id < b.doc_id
  WHERE (a.doc_id % 2 = 1 OR b.doc_id % 2 = 1)
    AND ({_epoch_band_sql()})
)
SELECT DISTINCT doc_a, doc_b FROM cand WHERE agree * 2 >= {MINHASH_SEEDS}
""",
)
def q_dedup_epoch_incremental(spark, sf_dir):
    """Oracle gate for the EPOCH-INCREMENTAL dedup service — the join
    shape that keeps web-scale near-dup detection O(epoch), not
    O(corpus²) per ingest (streaming/ingest.py:epoch_dedup_pairs,
    stages/canonical.py:incremental_lsh_candidates).

    Two-epoch fixture from the documents table: epoch A (even doc_id)
    is signatured and COMMITTED through the real signature-stage
    catalog (temp warehouse, epoch-scoped batch ranges, manifest swap);
    epoch B (odd doc_id) then probes the committed corpus through the
    production code path — banding, hot-bucket salting, latest-version
    selection, agreement verification, commit anti-join all exercised.
    The returned pairs are epoch B's increment: new×new plus
    new×corpus, never corpus×corpus (those were emitted when epoch A
    arrived — the discarded first call).

    The oracle is the FULL self-join the incremental path must equal
    when filtered to pairs touching the new epoch: all band-collision
    pairs with ≥1 odd member, verified at the same agreement threshold.
    Cross-engine trick: the signature family is injected via
    ``sig_fn`` — md5-string minhashes (bit-identical in DuckDB) instead
    of production xxhash64; band equality on xxhash64(slice) in the
    engine ⟺ slice equality in SQL. max_bucket is set high so salting
    is the identity at contract scale (salt pins pair SETS regardless —
    skew_bench measures the hot-bucket path)."""
    import shutil
    import tempfile

    from .streaming.ingest import epoch_dedup_pairs

    # _spread: the single-row-group scan would otherwise serialize the
    # per-epoch tokenize+signature chain onto one task (guide §2.5)
    docs = _spread(_read(spark, sf_dir, "documents").select("doc_id", "text"), sf_dir, "documents")

    def sig_fn(epoch_docs: DataFrame) -> DataFrame:
        # shared leaves: the narrow filter(split)→_slide_shingles path
        # (same slide expression as every other shingle consumer) →
        # _md5_sig_cols, so this family and its oracle can never drift
        # apart. r6 opt: intra-row token derivation — no collect_list
        # exchange before the signature agg.
        sigs = _md5_sig_cols(
            _slide_shingles(
                epoch_docs.select(
                    "doc_id",
                    F.expr("filter(split(text, ' '), x -> x != '')").alias(
                        "toks"
                    ),
                )
            )
        )
        return sigs.select(
            "doc_id",
            F.array(*[F.col(f"h{s}") for s in range(MINHASH_SEEDS)]).alias("sig"),
        )

    wh = tempfile.mkdtemp(prefix="dedup_epoch_wh_")
    try:
        common = dict(
            max_bucket=1_000_000_000,
            n_batches=4,
            min_agreement=0.5,
            sig_fn=sig_fn,
            num_bands=EPOCH_BANDS,  # pinned: the oracle unrolls this count
        )
        # epoch A: signature + commit; its (even×even) pairs were this
        # epoch's increment and are deliberately not part of the output
        epoch_dedup_pairs(
            spark, wh, docs.filter(F.col("doc_id") % 2 == 0), **common
        )
        # epoch B: probe the committed corpus — the incremental result
        pairs = epoch_dedup_pairs(
            spark, wh, docs.filter(F.col("doc_id") % 2 == 1), **common
        )
        # epoch_dedup_pairs localCheckpoints (eager) before returning,
        # so the warehouse files are no longer inputs of this frame
        return pairs.select("doc_a", "doc_b")
    finally:
        shutil.rmtree(wh, ignore_errors=True)


@register(
    "events_sliding_window_users",
    """
WITH wins AS (
  SELECT epoch_us(date_trunc('hour', ts)) - o * 3600000000 AS win_start_us,
         event_type, user_id
  FROM events, (SELECT unnest([0, 1]) AS o) s
)
SELECT CAST(win_start_us AS BIGINT) AS win_start_us, event_type,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
       CAST(count(*) AS BIGINT) AS n_events
FROM wins GROUP BY 1, 2
""",
)
def q_events_sliding_window_users(spark, sf_dir):
    """SLIDING (overlapping) event-time windows — the family tumbling
    buckets can't express: distinct users per 2-hour window sliding by
    1 hour, via the built-in ``F.window(ts, "2 hours", "1 hour")``
    (each event lands in exactly 2 windows; Spark's window table-
    function explodes JVM-side inside codegen). The oracle derives the
    same membership arithmetically: window starts = trunc_hour(t) and
    trunc_hour(t) − 1h (epoch-aligned, as Spark aligns). Scale shape:
    2× row fan-out then one partial-agg shuffle keyed by (window,
    type) — the same cost envelope as a tumbling agg, NOT a self-join;
    this is also the exact batch twin of the streaming sliding-window
    shape (readStream + the same F.window + watermark)."""
    e = _read(spark, sf_dir, "events")
    return (
        e.groupBy(
            F.window(F.col("ts").cast("timestamp"), "2 hours", "1 hour").alias("w"),
            "event_type",
        )
        .agg(
            F.countDistinct("user_id").alias("n_users"),
            F.count("*").alias("n_events"),
        )
        .select(
            F.unix_micros("w.start").alias("win_start_us"),
            "event_type",
            "n_users",
            "n_events",
        )
    )


@register(
    "events_hourly_anomaly",
    """
WITH hourly AS (
  SELECT CAST(epoch_us(date_trunc('hour', ts)) AS BIGINT) AS hour_us, event_type,
         CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2
),
win AS (
  SELECT hour_us, event_type, n,
         SUM(n) OVER w AS s,
         SUM(CAST(n AS DECIMAL(38,0)) * n) OVER w AS q,
         COUNT(n) OVER w AS c
  FROM hourly
  WINDOW w AS (PARTITION BY event_type ORDER BY hour_us
               ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING)
)
SELECT hour_us, event_type, n, CAST(s AS BIGINT) AS sum24,
       CAST(CAST(24 * n - s AS DECIMAL(38,0)) * (24 * n - s) >
            4 * (24 * q - CAST(s AS DECIMAL(38,0)) * s) AS INT) AS anomaly
FROM win WHERE c = 24
""",
)
def q_events_hourly_anomaly(spark, sf_dir):
    """ALL-INTEGER trailing-window anomaly detection (ops alerting over
    event streams): flag an hour whose count deviates from its trailing
    24 observed hours by more than 2 sigma — WITHOUT sqrt or floats.
    With S = Σ24 counts, Q = Σ24 counts², the 2σ test
    (n − S/24)² > 4·(Q/24 − (S/24)²) rearranges to the exact integer
    comparison (24n − S)² > 4·(24Q − S²); squares go through
    DECIMAL(38,0) so hub-level hourly counts (10⁹+) cannot overflow
    int64. Scale shape: the window runs over the PRE-AGGREGATED
    (type, hour) frame — |types|·|hours| rows, partitioned by type —
    so the only corpus-sized work is the map-side-partial hourly
    count; the trailing frame never touches raw events."""
    e = _read(spark, sf_dir, "events")
    hourly = e.groupBy(
        F.unix_micros(F.date_trunc("hour", F.col("ts").cast("timestamp"))).alias(
            "hour_us"
        ),
        "event_type",
    ).agg(F.count("*").alias("n"))
    w = W.partitionBy("event_type").orderBy("hour_us").rowsBetween(-24, -1)
    s = F.sum("n").over(w)
    q = F.sum(F.col("n").cast("decimal(38,0)") * F.col("n")).over(w)
    c = F.count("n").over(w)
    dev = F.lit(24) * F.col("n") - F.col("s")
    dev2 = dev.cast("decimal(38,0)") * dev
    rhs = F.lit(4) * (
        F.lit(24) * F.col("q") - F.col("s").cast("decimal(38,0)") * F.col("s")
    )
    return (
        hourly.select(
            "hour_us", "event_type", "n", s.alias("s"), q.alias("q"), c.alias("c")
        )
        .filter(F.col("c") == 24)
        .select(
            "hour_us",
            "event_type",
            "n",
            F.col("s").cast("bigint").alias("sum24"),
            (dev2 > rhs).cast("int").alias("anomaly"),
        )
    )


KCORE_K = 10
KCORE_MIN_W = 5
KCORE_ROUNDS = 8


def _kcore_oracle() -> str:
    """Unrolled bounded k-core peel (DuckDB cannot aggregate inside a
    recursive CTE term, same constraint as _pagerank_oracle): u{i+1} =
    u{i} minus edges touching nodes of degree < k. A round where no
    node is weak leaves u unchanged, so a fixpoint reached before round
    KCORE_ROUNDS survives the remaining unrolled rounds untouched —
    bit-identical to the engine's early exit. Every u{i} is AS
    MATERIALIZED: each round references its predecessor three times,
    and DuckDB's default CTE inlining would otherwise expand the
    upstream linked-subtree 3^rounds times (observed as a too-many-
    open-files parquet-scan explosion)."""
    ctes = [
        f"""wu AS MATERIALIZED ({_WU_SQL}),
u0 AS MATERIALIZED (SELECT a, b FROM wu WHERE w >= {KCORE_MIN_W})"""
    ]
    for i in range(KCORE_ROUNDS):
        ctes.append(
            f"""deg{i} AS MATERIALIZED (
  SELECT n, count(*) AS d FROM (
    SELECT a AS n FROM u{i} UNION ALL SELECT b AS n FROM u{i}) GROUP BY n),
weak{i} AS MATERIALIZED (SELECT n FROM deg{i} WHERE d < {KCORE_K}),
u{i + 1} AS MATERIALIZED (
  SELECT a, b FROM u{i}
  WHERE a NOT IN (SELECT n FROM weak{i})
    AND b NOT IN (SELECT n FROM weak{i}))"""
        )
    return (
        _LINKED_CTE
        + ",\n"
        + ",\n".join(ctes)
        + f"""
SELECT n AS ent_id, CAST(count(*) AS BIGINT) AS core_degree FROM (
  SELECT a AS n FROM u{KCORE_ROUNDS} UNION ALL SELECT b AS n FROM u{KCORE_ROUNDS})
GROUP BY n"""
    )


@register("kg_graph_kcore", _kcore_oracle())
def q_kg_graph_kcore(spark, sf_dir):
    """k-core of the STRONG co-occurrence graph (undirected pair weight
    ≥ KCORE_MIN_W): the canonical dense-region extractor — a node
    survives only if ≥ k strong neighbors survive, so weakly-attached
    entities cascade out where a raw degree cut would keep them.
    Engine: ops/graph.py::k_core — iterative peel, two keyed anti-joins
    + one map-side-partial degree agg per round, localCheckpoint per
    round. The CONTRACT is the BOUNDED {KCORE_ROUNDS}-round peel
    (well-defined at every SF; a fixpoint reached earlier is unchanged
    by the remaining rounds — identical early-exit semantics in engine
    and oracle), so the DuckDB oracle unrolls exactly that depth. At
    web scale the peel depth of real graphs is O(log n); max_iter is
    the honest bound, not a hidden truncation."""
    from .ops.graph import k_core

    strong = wuedges(spark, sf_dir).filter(F.col("w") >= KCORE_MIN_W).select(
        F.col("a").alias("src"), F.col("b").alias("dst")
    )
    return k_core(strong, k=KCORE_K, max_iter=KCORE_ROUNDS).select(
        F.col("node").alias("ent_id"), "core_degree"
    )


LP_ROUNDS = 4
LP_MIN_W = 3


def _lp_ctes(
    extra: str = "",
    adj_src: str = "wu",
    where: str = f"w >= {LP_MIN_W}",
) -> tuple[str, str]:
    """The unrolled label-propagation CTE chain, shared by the
    trajectory contract (kg_graph_label_prop; defaults — byte-
    identical to its registered oracle) and the modularity gate
    (kg_graph_modularity; extra CTEs + backbone adjacency) — ONE
    recursion body, zero drift (same anti-drift rule as _WU_SQL /
    _weighted_pagerank_oracle). Returns (chain_sql,
    final_label_cte_name)."""
    ctes = [
        f"""wu AS MATERIALIZED ({_WU_SQL}),{extra}
adj AS MATERIALIZED ({_adj_sql(adj_src, where)}),
l0 AS MATERIALIZED (SELECT DISTINCT u AS node, u AS label FROM adj)"""
    ]
    for i in range(1, LP_ROUNDS + 1):
        ctes.append(
            f"""c{i} AS MATERIALIZED (
  SELECT a.u, l.label, count(*) AS c
  FROM adj a JOIN l{i - 1} l ON a.v = l.node GROUP BY 1, 2),
l{i} AS MATERIALIZED (
  SELECT u AS node, MIN(label) AS label
  FROM (SELECT u, label, c, MAX(c) OVER (PARTITION BY u) AS mc FROM c{i})
  WHERE c = mc GROUP BY u)"""
        )
    return ",\n".join(ctes), f"l{LP_ROUNDS}"


def _label_prop_oracle() -> str:
    """Unrolled synchronous label propagation (DuckDB cannot aggregate
    inside a recursive CTE term, same constraint as _pagerank_oracle /
    _kcore_oracle): l{i} assigns every node the most frequent label
    among its neighbors' l{i-1} labels, ties -> MIN(label). The argmax
    is a window max + equality filter + GROUP BY MIN — deterministic,
    float-free. Every CTE is AS MATERIALIZED (round-5 rule: DuckDB
    default-inlines CTEs and an unrolled chain explodes exponentially
    otherwise)."""
    ctes, _last = _lp_ctes()
    finals = "\nUNION ALL\n".join(
        f"SELECT CAST({i} AS INT) AS rnd, node AS ent_id, label AS community"
        f" FROM l{i}"
        for i in range(1, LP_ROUNDS + 1)
    )
    return _LINKED_CTE + ",\n" + ctes + "\n" + finals


@register("kg_graph_label_prop", _label_prop_oracle())
def q_kg_graph_label_prop(spark, sf_dir):
    """Community detection over the strong co-occurrence graph
    (undirected pair weight ≥ LP_MIN_W): deterministic synchronous
    label propagation, LP_ROUNDS fixed rounds — the near-linear
    community detector, made cross-engine exact by the synchronous
    update + min-label tie order (no RNG, no vertex ordering, no
    floats; see ops/graph.py::label_propagation for the per-round plan
    shape: one keyed join + one single-pass struct argmax agg,
    localCheckpoint per round). The contract output is the FULL
    trajectory (rnd, ent_id, community) for rounds 1..LP_ROUNDS —
    the dense synthetic graph converges by round 2, so the fixpoint
    alone would under-discriminate; pinning every intermediate round
    checks the argmax/tie dynamics themselves. Scalar columns only,
    per the driver-hasher contract; the snapshots are the rounds'
    already-localCheckpointed frames, so the union recomputes
    nothing."""
    from .ops.graph import label_propagation

    strong = wuedges(spark, sf_dir).filter(F.col("w") >= LP_MIN_W).select(
        F.col("a").alias("src"), F.col("b").alias("dst")
    )
    snaps: list[DataFrame] = []
    label_propagation(strong, iterations=LP_ROUNDS, snapshots=snaps)
    rounds = [
        s.select(
            F.lit(i + 1).cast("int").alias("rnd"),
            F.col("node").alias("ent_id"),
            F.col("label").alias("community"),
        )
        for i, s in enumerate(snaps)
    ]
    return functools.reduce(DataFrame.union, rounds)


# ---------------------------------------------------------------------------
# pending round-6 registrations
# ---------------------------------------------------------------------------
# Window 5 is saturated (see the _DRIVER_WINDOWS round-6 note), so these
# contract pairs are oracle-gated by the LOCAL sweep only this round
# (tests/test_queries_oracle.py::test_pending_r6_queries_match_duckdb)
# and move into the registry + window 6 with a one-line register() call
# next round. Same shape rules as registered queries: scalar columns,
# integer-exact arithmetic, shared graph definition (_WU_SQL/wuedges).

# ONE seed rule for every seeded backbone gate (BFS, personalized
# PageRank): the GATE_N_SEEDS lexicographically smallest backbone
# nodes — deterministic, collation-safe on ASCII ent_ids. Shared
# Spark helper + SQL fragment so the rule cannot drift between gates
# (same anti-drift discipline as _WU_SQL/_BB_SQL/_adj_sql).
GATE_N_SEEDS = 2
BFS_MAX_HOPS = 3

_SEEDS_SQL = f"""
  SELECT node FROM (SELECT a AS node FROM bb UNION SELECT b FROM bb)
  ORDER BY node LIMIT {GATE_N_SEEDS}"""


def backbone_seeds(bb):
    """Spark twin of _SEEDS_SQL over a materialized backbone frame."""
    return (
        bb.select(F.col("src").alias("node"))
        .union(bb.select(F.col("dst").alias("node")))
        .distinct()
        .orderBy("node")
        .limit(GATE_N_SEEDS)
    )


def _bfs_hops_oracle() -> str:
    """Unrolled multi-source BFS over the top-K co-occurrence backbone
    (DuckDB cannot aggregate inside a recursive CTE term, same
    constraint as _pagerank_oracle / _kcore_oracle). Seeds follow the
    shared gate rule (_SEEDS_SQL). A round with an empty frontier adds
    nothing, so the engine's early break is bit-identical to the full
    unroll. Every CTE is AS MATERIALIZED (DuckDB default-inlines CTEs;
    a chain referencing predecessors explodes exponentially)."""
    ctes = [
        f"""wu AS MATERIALIZED ({_WU_SQL}),
bb AS MATERIALIZED ({_BB_SQL}),
adj AS MATERIALIZED ({_adj_sql("bb")}),
f0 AS MATERIALIZED ({_SEEDS_SQL}),
v0 AS MATERIALIZED (SELECT node, CAST(0 AS BIGINT) AS hops FROM f0)"""
    ]
    for h in range(1, BFS_MAX_HOPS + 1):
        ctes.append(
            f"""f{h} AS MATERIALIZED (
  SELECT DISTINCT a.v AS node
  FROM adj a JOIN f{h - 1} f ON a.u = f.node
  WHERE a.v NOT IN (SELECT node FROM v{h - 1})),
v{h} AS MATERIALIZED (
  SELECT node, hops FROM v{h - 1}
  UNION ALL SELECT node, CAST({h} AS BIGINT) AS hops FROM f{h})"""
        )
    return (
        _LINKED_CTE
        + ",\n"
        + ",\n".join(ctes)
        + f"\nSELECT node AS ent_id, hops FROM v{BFS_MAX_HOPS}"
    )


def _q_kg_graph_bfs_hops(spark, sf_dir):
    """Minimum hop distance from the GATE_N_SEEDS lexicographically
    smallest backbone entities to every entity within BFS_MAX_HOPS,
    over the TWOHOP_TOPK_EDGES-strongest-edge backbone (the raw
    15-entity co-occurrence graph is complete, so BFS over it is
    vacuous — every node sits at hops <= 1; the sparse backbone is
    both the discriminating contract and the operation a web-scale
    neighborhood panel actually runs). Frontier expansion engine op:
    ops/graph.py:bfs_hops."""
    from .ops.graph import bfs_hops

    # consumed by the seed pick + the BFS itself -> materialize once
    bb = backbone(spark, sf_dir).localCheckpoint()
    return bfs_hops(bb, backbone_seeds(bb), max_hops=BFS_MAX_HOPS).select(
        F.col("node").alias("ent_id"), "hops"
    )


_CLUSTERING_ORACLE = (
    _LINKED_CTE
    + f""",
wu AS MATERIALIZED ({_WU_SQL}),
bb AS MATERIALIZED ({_BB_SQL}),
tris AS MATERIALIZED (
  SELECT e1.a AS x, e1.b AS y, e2.b AS z
  FROM bb e1 JOIN bb e2 ON e1.b = e2.a
             JOIN bb e3 ON e3.a = e1.a AND e3.b = e2.b),
tcnt AS MATERIALIZED (
  SELECT node, count(*) AS t FROM (
    SELECT x AS node FROM tris
    UNION ALL SELECT y FROM tris
    UNION ALL SELECT z FROM tris) GROUP BY node),
deg AS MATERIALIZED (
  SELECT node, count(*) AS d FROM (
    SELECT a AS node FROM bb UNION ALL SELECT b FROM bb) GROUP BY node)
SELECT d.node AS ent_id, CAST(d.d AS BIGINT) AS degree,
       CAST(COALESCE(t.t, 0) AS BIGINT) AS n_triangles,
       CAST(CASE WHEN d.d >= 2
                 THEN CAST(2 AS HUGEINT) * COALESCE(t.t, 0) * 1000000
                      // (d.d * (d.d - 1))
                 ELSE 0 END AS BIGINT) AS cc_ppm
FROM deg d LEFT JOIN tcnt t ON d.node = t.node
"""
)


def _q_kg_graph_clustering(spark, sf_dir):
    """Per-node local clustering coefficient over the top-K
    co-occurrence backbone (the raw graph is complete at every SF —
    cc would be uniformly 1e6, vacuous; the sparse backbone makes the
    coefficient discriminate). Exact integer ppm: 2·tri·1e6 div
    d·(d−1), DECIMAL(38,0) product in the engine, HUGEINT in the
    oracle — DuckDB's DECIMAL // ROUNDS where Spark's div floors, a
    parity trap; HUGEINT // floors (same fix as the weighted-pagerank
    contrib). Engine op: ops/graph.py::clustering_coefficient."""
    from .ops.graph import clustering_coefficient

    return clustering_coefficient(backbone(spark, sf_dir)).select(
        F.col("node").alias("ent_id"), "degree", "n_triangles", "cc_ppm"
    )


HARMONIC_MAX_HOPS = 3
# Σ 1/d over reachable nodes, exactly: weight d → lcm(1..H)/d, so the
# score is an integer in units of 1/6 (d=1→6, d=2→3, d=3→2 — all exact)
HARMONIC_LCM = 6


def _harmonic_oracle() -> str:
    """Unrolled PER-SEED BFS over the top-K backbone (the (seed, node)
    pair key is the only change vs _bfs_hops_oracle) feeding bounded
    harmonic centrality: Σ lcm/d over nodes at hops 1..H. The pair
    anti-join uses NOT EXISTS (NOT IN is single-column). Every CTE is
    AS MATERIALIZED — DuckDB default-inlines CTEs and the chain
    references predecessors twice per round."""
    ctes = [
        f"""wu AS MATERIALIZED ({_WU_SQL}),
bb AS MATERIALIZED ({_BB_SQL}),
adj AS MATERIALIZED ({_adj_sql("bb")}),
v0 AS MATERIALIZED (
  SELECT node AS seed, node, CAST(0 AS BIGINT) AS hops
  FROM (SELECT a AS node FROM bb UNION SELECT b FROM bb))"""
    ]
    for h in range(1, HARMONIC_MAX_HOPS + 1):
        prev = f"v{h - 1}"
        ctes.append(
            f"""f{h} AS MATERIALIZED (
  SELECT DISTINCT f.seed, a.v AS node
  FROM adj a JOIN {prev} f ON a.u = f.node AND f.hops = {h - 1}
  WHERE NOT EXISTS (SELECT 1 FROM {prev} v
                    WHERE v.seed = f.seed AND v.node = a.v)),
v{h} AS MATERIALIZED (
  SELECT seed, node, hops FROM {prev}
  UNION ALL SELECT seed, node, CAST({h} AS BIGINT) AS hops FROM f{h})"""
        )
    return (
        _LINKED_CTE
        + ",\n"
        + ",\n".join(ctes)
        + f"""
SELECT seed AS ent_id, CAST(count(*) AS BIGINT) AS n_reached,
       CAST(SUM({HARMONIC_LCM} // hops) AS BIGINT) AS harmonic_x{HARMONIC_LCM}
FROM v{HARMONIC_MAX_HOPS} WHERE hops >= 1 GROUP BY seed"""
    )


def _q_kg_graph_harmonic(spark, sf_dir):
    """Bounded harmonic centrality over the top-K co-occurrence
    backbone: per entity, the number of entities within
    HARMONIC_MAX_HOPS hops and Σ 1/d over them — held exact by scaling
    to lcm(1..H) units (6/d is an integer for d ≤ 3), so the score is
    engine- and layout-invariant where a float 1/d sum is not. The raw
    co-occurrence graph is complete at every SF (uniform scores,
    vacuous); the sparse backbone discriminates. Engine op:
    ops/graph.py::hop_distances (all-pairs bounded frontier
    expansion), aggregated with one map-side-partial sum."""
    from .ops.graph import hop_distances

    hd = hop_distances(backbone(spark, sf_dir), max_hops=HARMONIC_MAX_HOPS)
    return (
        hd.filter(F.col("hops") >= 1)
        .groupBy(F.col("seed").alias("ent_id"))
        .agg(
            F.count("*").cast("bigint").alias("n_reached"),
            F.sum(F.expr(f"{HARMONIC_LCM} div hops"))
            .cast("bigint")
            .alias(f"harmonic_x{HARMONIC_LCM}"),
        )
    )


# Per-entity weakest relation: each node's single LEAST-evidence
# incident edge, by (w ASC, a, b) — (w, a, b) unique ⇒ the per-node
# argmin is deterministic. This is the curation panel "which of my
# relations has the least support" (the edges a KG reviewer re-checks
# first). NOTE a CC-over-weak-edges gate was tried and rejected as
# vacuous on this corpus: bottom-K cuts (K=25, K=8) AND the per-node
# argmin union each measured ONE component — the rarest entity is
# everyone's weakest peer, so the weak graph is a hub star; component
# structure cannot discriminate here (dedup_components already gates
# CC on a graph that does fragment).
_WEAKEST_ORACLE = (
    _LINKED_CTE
    + f""",
wu AS MATERIALIZED ({_WU_SQL})
SELECT u AS ent_id, CASE WHEN a = u THEN b ELSE a END AS peer,
       CAST(w AS BIGINT) AS w
FROM (
  SELECT u, a, b, w,
         row_number() OVER (PARTITION BY u ORDER BY w, a, b) AS rn
  FROM (SELECT a AS u, a, b, w FROM wu
        UNION ALL SELECT b, a, b, w FROM wu)
) WHERE rn = 1
"""
)


def _q_kg_entity_weakest_link(spark, sf_dir):
    """Per-entity weakest relation — the minimum-evidence incident
    co-occurrence edge per node ((w, a, b) unique ⇒ deterministic
    argmin), i.e. the relations a KG curator re-checks first. The
    argmin is min(struct(w, a, b)) — lexicographic struct comparison
    equals the (w ASC, a, b) order — as a MAP-SIDE-PARTIAL aggregate
    over the doubled incidence: no per-node group is ever materialized
    (a window row_number would buffer a hub entity's whole incidence
    list in one task at web scale); the oracle keeps the independent
    row_number formulation."""
    wu = wuedges(spark, sf_dir).localCheckpoint()  # two incidence consumers
    incid = wu.select(F.col("a").alias("u"), "a", "b", "w").union(
        wu.select(F.col("b").alias("u"), "a", "b", "w")
    )
    m = F.col("m")
    return (
        incid.groupBy("u")
        .agg(F.min(F.struct("w", "a", "b")).alias("m"))
        .select(
            F.col("u").alias("ent_id"),
            F.when(m["a"] == F.col("u"), m["b"]).otherwise(m["a"]).alias("peer"),
            m["w"].cast("bigint").alias("w"),
        )
    )


# 997 (prime) and char-weighted hosts: the synthetic corpus spreads
# doc_id % 20 UNIFORMLY over hosts, so a round budget over doc counts
# divides exactly (1000*25 % 500 == 0 — every remainder zero and the
# bonus path vacuous); total text length varies per host and a prime
# budget cannot divide it, so the largest-remainder step is exercised.
CRAWL_BUDGET = 997

# Per-host text volume (host, host_chars) — defined ONCE per engine
# (same anti-drift rule as _WU_SQL/_BB_SQL): web_crawl_budget and
# web_host_gini must agree on what "host volume" means, and each
# Spark side must agree with its oracle twin.
_HW_SQL = """
  SELECT source AS host, CAST(SUM(length(text)) AS BIGINT) AS host_chars
  FROM documents GROUP BY source"""


def _host_chars(spark, sf_dir):
    """Spark twin of _HW_SQL: one partial agg per host."""
    return (
        _read(spark, sf_dir, "documents")
        .groupBy(F.col("source").alias("host"))
        .agg(F.sum(F.length("text")).cast("bigint").alias("host_chars"))
    )


_CRAWL_BUDGET_ORACLE = f"""
WITH hw AS ({_HW_SQL}),
tot AS (SELECT CAST(SUM(host_chars) AS BIGINT) AS w FROM hw),
q AS (
  SELECT host, host_chars,
         CAST({CRAWL_BUDGET} * host_chars // t.w AS BIGINT) AS quota_base,
         CAST({CRAWL_BUDGET} * host_chars % t.w AS BIGINT) AS rem
  FROM hw CROSS JOIN tot t),
need AS (SELECT CAST({CRAWL_BUDGET} - SUM(quota_base) AS BIGINT) AS k FROM q),
r AS (SELECT *, row_number() OVER (ORDER BY rem DESC, host) AS rnk FROM q)
SELECT host, host_chars, quota_base,
       CAST(CASE WHEN rnk <= d.k THEN 1 ELSE 0 END AS BIGINT) AS bonus,
       CAST(quota_base + CASE WHEN rnk <= d.k THEN 1 ELSE 0 END
            AS BIGINT) AS quota
FROM r CROSS JOIN need d
"""


def _q_web_crawl_budget(spark, sf_dir):
    """Exact crawl-budget apportionment: allocate CRAWL_BUDGET page
    fetches across hosts proportional to host text volume by Hamilton's
    largest-remainder method — floor quotas plus one bonus fetch to
    the hosts with the largest remainders, ranked by (remainder DESC,
    host) so the allocation is deterministic and Σ quota == budget
    EXACTLY (float proportional shares never sum right; the integer
    method is the one a crawl scheduler can actually dispatch). Scale:
    one partial agg per host, two lazy 1-row scalars crossJoin-
    broadcast, and the bonus rank is the zero-single-partition
    two-phase rank over the (tiny, one-row-per-host) quota frame."""
    # feeds the 1-row total AND q's left side (and through q, the
    # deficit scalar + the rank): checkpoint the scan+agg once; the
    # downstream q/need projections are lazy and cheap on top of it
    # (_two_phase_rank re-checkpoints only the tiny q frame)
    hw = _host_chars(spark, sf_dir).localCheckpoint()
    tot = hw.agg(F.sum("host_chars").cast("bigint").alias("_w"))
    q = (
        hw.crossJoin(F.broadcast(tot))
        .select(
            "host",
            "host_chars",
            F.expr(f"CAST({CRAWL_BUDGET} * host_chars div _w AS BIGINT)").alias(
                "quota_base"
            ),
            F.expr(f"CAST({CRAWL_BUDGET} * host_chars % _w AS BIGINT)").alias(
                "rem"
            ),
        )
    )
    need = q.agg(
        (F.lit(CRAWL_BUDGET) - F.sum("quota_base")).cast("bigint").alias("_k")
    )
    ranked = _two_phase_rank(q, "rem", ["host"])
    return (
        ranked.crossJoin(F.broadcast(need))
        .select(
            "host",
            "host_chars",
            "quota_base",
            F.expr("CAST(CASE WHEN rnk <= _k THEN 1 ELSE 0 END AS BIGINT)").alias(
                "bonus"
            ),
            F.expr(
                "CAST(quota_base + CASE WHEN rnk <= _k THEN 1 ELSE 0 END"
                " AS BIGINT)"
            ).alias("quota"),
        )
    )


# t=2, NOT 1: with t=1 the peel provably converges after one round on
# ANY graph (removing a support-0 edge destroys no triangle, so no
# surviving edge's support changes), which would make the multi-round
# bound vacuous; t=2 actually cascades (dropping a support-1 edge can
# break its neighbors' triangles), so rounds 2-3 of the unroll pin the
# engine's cascade path cross-engine.
TRUSS_T = 2
TRUSS_MAX_ITER = 3


def _truss_oracle() -> str:
    """Unrolled bounded k-truss peel over the top-K backbone: per
    round re-derive per-edge triangle support (oriented closure →
    3-edge explode → count) and keep edges with support >= t; after
    TRUSS_MAX_ITER rounds emit the surviving edges with their final
    in-subgraph support. An engine round with no weak edges breaks
    early; the unroll recomputes an identical edge set, so the bounded
    contract is exact either way. Every CTE AS MATERIALIZED (the
    closure references its edge CTE three times)."""

    def closure(r: int, src: str) -> str:
        return f"""tri{r} AS MATERIALIZED (
  SELECT e1.a AS x, e1.b AS y, e2.b AS z
  FROM {src} e1 JOIN {src} e2 ON e1.b = e2.a
                JOIN {src} e3 ON e3.a = e1.a AND e3.b = e2.b),
te{r} AS MATERIALIZED (
  SELECT x AS a, y AS b FROM tri{r}
  UNION ALL SELECT y, z FROM tri{r}
  UNION ALL SELECT x, z FROM tri{r}),
sup{r} AS MATERIALIZED (
  SELECT a, b, CAST(count(*) AS BIGINT) AS c FROM te{r} GROUP BY a, b)"""

    ctes = [
        f"""wu AS MATERIALIZED ({_WU_SQL}),
e0 AS MATERIALIZED ({_BB_SQL})"""
    ]
    for r in range(1, TRUSS_MAX_ITER + 1):
        ctes.append(closure(r, f"e{r - 1}"))
        ctes.append(
            f"""e{r} AS MATERIALIZED (
  SELECT e.a, e.b FROM e{r - 1} e
  JOIN sup{r} s ON e.a = s.a AND e.b = s.b
  WHERE s.c >= {TRUSS_T})"""
        )
    ctes.append(closure(TRUSS_MAX_ITER + 1, f"e{TRUSS_MAX_ITER}"))
    return (
        _LINKED_CTE
        + ",\n"
        + ",\n".join(ctes)
        + f"""
SELECT e.a AS ent_a, e.b AS ent_b,
       CAST(COALESCE(s.c, 0) AS BIGINT) AS support
FROM e{TRUSS_MAX_ITER} e
LEFT JOIN sup{TRUSS_MAX_ITER + 1} s ON e.a = s.a AND e.b = s.b"""
    )


def _q_kg_graph_truss(spark, sf_dir):
    """Bounded k-truss peel over the top-K backbone: the edge-level
    dense core (every surviving edge sits in >= TRUSS_T triangles of
    the surviving subgraph, support recomputed per round) — stricter
    than k-core, the standard community-core primitive. Bounded at
    TRUSS_MAX_ITER rounds so the DuckDB unroll replays the identical
    peel depth. Engine op: ops/graph.py::k_truss (same localCheckpoint
    peel discipline as k_core)."""
    from .ops.graph import k_truss

    return k_truss(
        backbone(spark, sf_dir), t=TRUSS_T, max_iter=TRUSS_MAX_ITER
    ).select(F.col("a").alias("ent_a"), F.col("b").alias("ent_b"), "support")


_NOVELTY_ORACLE = (
    _SHINGLES_CTE
    + """,
ds AS (SELECT DISTINCT doc_id, shingle FROM shingles),
firsts AS (SELECT shingle, min(doc_id) AS first_doc FROM ds GROUP BY shingle)
SELECT d.doc_id,
       CAST(count(*) AS BIGINT) AS n_shingles,
       CAST(SUM(CASE WHEN f.first_doc = d.doc_id THEN 1 ELSE 0 END)
            AS BIGINT) AS n_novel,
       CAST(SUM(CASE WHEN f.first_doc = d.doc_id THEN 1 ELSE 0 END)
            * 1000000 // count(*) AS BIGINT) AS novelty_ppm
FROM ds d JOIN firsts f ON d.shingle = f.shingle
GROUP BY d.doc_id
"""
)


def _q_doc_novelty(spark, sf_dir):
    """Per-document novelty: the share of a doc's distinct 3-shingles
    whose FIRST corpus occurrence (min doc_id — ingest-order proxy,
    deterministic on the zero-padded ids) is this document. The
    incremental-redundancy signal a curation pipeline uses to
    down-weight late near-echoes without discarding them (dedup kills
    copies; novelty SCORES the long tail of partial overlap). Exact
    integer ppm. Scale: one shingle-keyed join + two map-side-partial
    aggs — the same shuffle class as the MinHash banding; no windows,
    no driver state."""
    ds = shingles(spark, sf_dir).distinct().localCheckpoint()
    firsts = ds.groupBy("shingle").agg(F.min("doc_id").alias("first_doc"))
    novel = F.sum(
        F.when(F.col("first_doc") == F.col("doc_id"), 1).otherwise(0)
    )
    return (
        ds.join(firsts, "shingle")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("bigint").alias("n_shingles"),
            novel.cast("bigint").alias("n_novel"),
            F.expr(
                "CAST(SUM(CASE WHEN first_doc = doc_id THEN 1 ELSE 0 END)"
                " * 1000000 div count(*) AS BIGINT)"
            ).alias("novelty_ppm"),
        )
    )


PPR_ITERS = 4


def _ppr_oracle() -> str:
    """Unrolled personalized PageRank over the SYMMETRIZED top-K
    backbone (the adj expansion doubles as the directed edge set, so
    co-occurrence mass flows both ways — the raw a<b orientation is an
    artifact of canonicalization, not direction). Teleport mass lands
    only on the shared gate seed set (_SEEDS_SQL — the SAME fragment
    the BFS gate interpolates): r0 = scale on seeds / 0 elsewhere; per
    round the
    15% base term is added to seeds only. Same integer recursion as
    _pagerank_oracle otherwise (HUGEINT sums, // floors)."""
    from .ops.graph import PR_DAMP_DEN, PR_DAMP_NUM, PR_SCALE

    base = (PR_DAMP_DEN - PR_DAMP_NUM) * PR_SCALE // PR_DAMP_DEN
    ctes = [
        f"""wu AS MATERIALIZED ({_WU_SQL}),
bb AS MATERIALIZED ({_BB_SQL}),
adj AS MATERIALIZED ({_adj_sql("bb")}),
allnodes AS MATERIALIZED (SELECT DISTINCT u AS node FROM adj),
seeds AS MATERIALIZED ({_SEEDS_SQL}),
nodes AS MATERIALIZED (
  SELECT a.node, CASE WHEN s.node IS NULL THEN 0 ELSE 1 END AS is_seed
  FROM allnodes a LEFT JOIN seeds s ON a.node = s.node),
outdeg AS MATERIALIZED (
  SELECT u AS node, CAST(count(*) AS BIGINT) AS outdeg
  FROM adj GROUP BY u),
r0 AS (SELECT node, CAST(CASE WHEN is_seed = 1 THEN {PR_SCALE} ELSE 0 END
                         AS BIGINT) AS rank
       FROM nodes)"""
    ]
    for i in range(1, PPR_ITERS + 1):
        ctes.append(
            f"""r{i} AS MATERIALIZED (
  SELECT n.node,
         CAST(CASE WHEN n.is_seed = 1 THEN {base} ELSE 0 END
              + ({PR_DAMP_NUM} * COALESCE(s.c, 0)) // {PR_DAMP_DEN}
              AS BIGINT) AS rank
  FROM nodes n LEFT JOIN (
    SELECT e.v AS node, SUM(r.rank // d.outdeg) AS c
    FROM adj e JOIN r{i - 1} r ON e.u = r.node
               JOIN outdeg d ON e.u = d.node
    GROUP BY e.v) s ON n.node = s.node)"""
        )
    return (
        _LINKED_CTE
        + ",\n"
        + ",\n".join(ctes)
        + f"\nSELECT node AS ent_id, rank AS rank_scaled FROM r{PPR_ITERS}"
    )


def _q_kg_graph_ppr(spark, sf_dir):
    """Personalized PageRank from the two lexicographically smallest
    backbone entities — the seed-biased relevance ranking a KG serves
    for "entities related to THIS seed set" panels (uniform PageRank
    answers global importance; PPR answers importance relative to a
    query). Symmetrized backbone (co-occurrence is undirected), exact
    integer recursion, fixed PPR_ITERS rounds so the DuckDB oracle
    replays the identical depth. Engine: ops/graph.py::pagerank(
    restart=seeds) — the restart flag folds into the materialized
    node frame, per-round cost unchanged."""
    from .ops.graph import pagerank

    bb = backbone(spark, sf_dir).localCheckpoint()
    sym = bb.union(
        bb.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    return pagerank(
        sym, iterations=PPR_ITERS, restart=backbone_seeds(bb)
    ).select(
        F.col("node").alias("ent_id"), "rank_scaled"
    )


# Deterministic host-level outlinks: every doc links to three hosts at
# arithmetic offsets from its own (offsets 1, 2+d%6, 3+2·(d%6) — never
# ≡ 0 mod 20, so no self-links; the src<>dst filter is defensive).
# Same synthesis discipline as _URLS_SQL: derived from columns the
# documents table actually carries, identical arithmetic both engines.
_HOST_LINKS_SQL = """
  SELECT src, dst, CAST(count(*) AS BIGINT) AS w FROM (
    SELECT source AS src,
           'src' || CAST((doc_id % 20 + 1) % 20 AS VARCHAR) AS dst
    FROM documents
    UNION ALL
    SELECT source, 'src' || CAST((doc_id % 20 + 2 + doc_id % 6) % 20 AS VARCHAR)
    FROM documents
    UNION ALL
    SELECT source,
           'src' || CAST((doc_id % 20 + 3 + 2 * (doc_id % 6)) % 20 AS VARCHAR)
    FROM documents
  ) WHERE src <> dst GROUP BY src, dst"""


def host_links_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark twin of _HOST_LINKS_SQL — (src, dst, w) weighted host
    link graph; pure-JVM arithmetic projection + explode, one partial
    agg (at crawl scale this is the linkgraph-extraction shuffle:
    billions of page edges collapse to a host×host frame)."""
    # plain read (r6): the 3-way explode is light and the host queries
    # are sub-second — the spread taxed them ~0.3-0.5 s (measured;
    # reverted, same reasoning as the events family).
    d = _read(spark, sf_dir, "documents").select("doc_id", "source")
    return (
        d.select(
            F.col("source").alias("src"),
            F.explode(
                F.array(
                    F.expr("concat('src', CAST((doc_id % 20 + 1) % 20 AS STRING))"),
                    F.expr(
                        "concat('src',"
                        " CAST((doc_id % 20 + 2 + doc_id % 6) % 20 AS STRING))"
                    ),
                    F.expr(
                        "concat('src',"
                        " CAST((doc_id % 20 + 3 + 2 * (doc_id % 6)) % 20 AS STRING))"
                    ),
                )
            ).alias("dst"),
        )
        .filter(F.col("src") != F.col("dst"))
        .groupBy("src", "dst")
        .agg(F.count("*").cast("bigint").alias("w"))
    )


def _q_web_host_linkrank(spark, sf_dir):
    """Host-level link-graph PageRank — the crawl-priority/authority
    ranking a web pipeline runs over its link graph: synthesize the
    deterministic per-doc outlinks, collapse to a weighted host×host
    graph (host_links_df), then the SAME exact-integer weighted
    PageRank recursion as kg_graph_pagerank_weighted (shared engine op
    ops/graph.py::pagerank(weight=), shared unrolled oracle builder —
    one recursion body, two graphs, zero drift). Scale: the per-page
    explode+partial-agg is the only corpus-sized stage; the iteration
    runs on the host graph, orders of magnitude smaller."""
    from .ops.graph import pagerank

    return pagerank(
        host_links_df(spark, sf_dir),
        iterations=WPAGERANK_ITERS,
        scale=WPR_SCALE,
        weight="w",
    ).select(F.col("node").alias("host"), "rank_scaled")


_RECIPROCITY_ORACLE = f"""
WITH links AS MATERIALIZED (
  SELECT src, dst FROM ({_HOST_LINKS_SQL})
),
hosts AS (SELECT src AS host FROM links UNION SELECT dst FROM links),
outc AS (SELECT src AS host, CAST(count(*) AS BIGINT) AS out_links
         FROM links GROUP BY src),
inc AS (SELECT dst AS host, CAST(count(*) AS BIGINT) AS in_links
        FROM links GROUP BY dst),
recip AS (
  SELECT a.src AS host, CAST(count(*) AS BIGINT) AS recip_links
  FROM links a JOIN links b ON a.src = b.dst AND a.dst = b.src
  GROUP BY a.src)
SELECT h.host,
       COALESCE(o.out_links, 0) AS out_links,
       COALESCE(i.in_links, 0) AS in_links,
       COALESCE(r.recip_links, 0) AS recip_links,
       CAST(CASE WHEN COALESCE(o.out_links, 0) > 0
                 THEN COALESCE(r.recip_links, 0) * 1000000
                      // o.out_links
                 ELSE 0 END AS BIGINT) AS reciprocity_ppm
FROM hosts h
LEFT JOIN outc o ON h.host = o.host
LEFT JOIN inc i ON h.host = i.host
LEFT JOIN recip r ON h.host = r.host
"""


def _q_web_host_reciprocity(spark, sf_dir):
    """Per-host link reciprocity over the directed host graph — the
    standard link-spam / partnership signal (mutual-link rings stand
    out as reciprocity → 1, organic authority sites stay low): distinct
    out-links, in-links, reciprocated out-links and the exact ppm
    share of out-links that are reciprocated (integer quantization,
    no float division). One self-join on the (already tiny) host×host
    frame + three partial-agg joins; at crawl scale the per-page
    explode in host_links_df is the only corpus-sized stage."""
    links = host_links_df(spark, sf_dir).select("src", "dst").localCheckpoint()
    hosts = (
        links.select(F.col("src").alias("host"))
        .union(links.select(F.col("dst").alias("host")))
        .distinct()
    )
    outc = links.groupBy(F.col("src").alias("host")).agg(
        F.count("*").cast("bigint").alias("out_links")
    )
    inc = links.groupBy(F.col("dst").alias("host")).agg(
        F.count("*").cast("bigint").alias("in_links")
    )
    rev = links.select(
        F.col("dst").alias("src"), F.col("src").alias("dst")
    )
    recip = (
        links.join(rev, ["src", "dst"])
        .groupBy(F.col("src").alias("host"))
        .agg(F.count("*").cast("bigint").alias("recip_links"))
    )
    return (
        hosts.join(outc, "host", "left")
        .join(inc, "host", "left")
        .join(recip, "host", "left")
        .select(
            "host",
            F.coalesce("out_links", F.lit(0)).cast("bigint").alias("out_links"),
            F.coalesce("in_links", F.lit(0)).cast("bigint").alias("in_links"),
            F.coalesce("recip_links", F.lit(0))
            .cast("bigint")
            .alias("recip_links"),
            F.expr(
                "CAST(CASE WHEN coalesce(out_links, 0) > 0 THEN"
                " coalesce(recip_links, 0) * 1000000 div out_links"
                " ELSE 0 END AS BIGINT)"
            ).alias("reciprocity_ppm"),
        )
    )


HITS_ITERS = 3


def _hits_oracle() -> str:
    """Unrolled weighted HITS over the host link graph — the DuckDB
    replay of ops/graph.py::hits: per half-step Σ w·score across the
    edges, then L1-renormalize to HITS_SCALE units with floor
    division. HUGEINT products and ``//`` (DuckDB's DECIMAL ``//``
    ROUNDS where Spark's div floors — same parity trap as the
    clustering/weighted-pagerank oracles); every CTE AS MATERIALIZED
    (each score frame is referenced by the next half-step's join AND
    its own L1 scalar subquery)."""
    from .ops.graph import HITS_SCALE

    ctes = [
        f"""wedges AS MATERIALIZED ({_HOST_LINKS_SQL}),
nodes AS MATERIALIZED (
  SELECT src AS node FROM wedges UNION SELECT dst FROM wedges),
a0 AS MATERIALIZED (
  SELECT node, CAST({HITS_SCALE} AS HUGEINT) AS score FROM nodes)"""
    ]
    for i in range(1, HITS_ITERS + 1):
        ctes.append(
            f"""hr{i} AS MATERIALIZED (
  SELECT e.src AS node, SUM(CAST(e.w AS HUGEINT) * a.score) AS raw
  FROM wedges e JOIN a{i - 1} a ON e.dst = a.node GROUP BY e.src),
h{i} AS MATERIALIZED (
  SELECT n.node,
         CAST(COALESCE(r.raw, 0) * {HITS_SCALE}
              // (SELECT SUM(raw) FROM hr{i}) AS HUGEINT) AS score
  FROM nodes n LEFT JOIN hr{i} r ON n.node = r.node),
ar{i} AS MATERIALIZED (
  SELECT e.dst AS node, SUM(CAST(e.w AS HUGEINT) * h.score) AS raw
  FROM wedges e JOIN h{i} h ON e.src = h.node GROUP BY e.dst),
a{i} AS MATERIALIZED (
  SELECT n.node,
         CAST(COALESCE(r.raw, 0) * {HITS_SCALE}
              // (SELECT SUM(raw) FROM ar{i}) AS HUGEINT) AS score
  FROM nodes n LEFT JOIN ar{i} r ON n.node = r.node)"""
        )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"""
SELECT h.node AS host, CAST(h.score AS BIGINT) AS hub_scaled,
       CAST(a.score AS BIGINT) AS auth_scaled
FROM h{HITS_ITERS} h JOIN a{HITS_ITERS} a ON h.node = a.node"""
    )


def _q_web_host_hits(spark, sf_dir):
    """Kleinberg hubs-and-authorities over the weighted host link
    graph — the link-analysis dual of web_host_linkrank (PageRank says
    "endorsed"; HITS separates "points at good pages" from "is a good
    page", the distinction a crawl scheduler and a seed-list curator
    each need). Exact integer L1-normalized half-steps (engine op
    ops/graph.py::hits); the per-page explode + partial agg in
    host_links_df is the only corpus-sized stage, the iteration runs
    on the host×host frame."""
    from .ops.graph import hits

    return hits(
        host_links_df(spark, sf_dir), weight="w", iterations=HITS_ITERS
    ).select(F.col("node").alias("host"), "hub_scaled", "auth_scaled")


_TRANSITIONS_ORACLE = """
WITH seq AS (
  SELECT event_type AS src_type,
         LEAD(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS dst_type
  FROM events),
cnt AS (
  SELECT src_type, dst_type, CAST(count(*) AS BIGINT) AS n
  FROM seq WHERE dst_type IS NOT NULL GROUP BY 1, 2)
SELECT src_type, dst_type, n,
       CAST(n * 1000000 // SUM(n) OVER (PARTITION BY src_type) AS BIGINT)
         AS p_ppm
FROM cnt
"""


def _q_events_type_transitions(spark, sf_dir):
    """Per-user event-type transition matrix (first-order Markov
    counts + exact row-ppm shares): lead() over the per-user stream
    ordered by (ts, event_id) — event_id breaks timestamp ties, so
    the order is total and the contract deterministic (same total
    order as events_latest_per_user / events_sessionize). Scale: one
    shuffle by user_id for the lead window (the standard
    sessionization partitioning — user streams fit an executor), a
    map-side-partial count to ~|types|² rows, then a tiny partitioned
    window for the denominators; all integer arithmetic, BIGINT-safe
    (n·1e6 ≤ 9.2e18 for any feasible event count per type pair)."""
    e = _read(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        F.col("event_type").alias("src_type"),
        F.lead("event_type").over(w).alias("dst_type"),
    )
    cnt = (
        seq.filter(F.col("dst_type").isNotNull())
        .groupBy("src_type", "dst_type")
        .agg(F.count("*").cast("bigint").alias("n"))
    )
    return cnt.withColumn(
        "tot", F.sum("n").over(W.partitionBy("src_type"))
    ).select(
        "src_type",
        "dst_type",
        "n",
        F.expr("CAST(n * 1000000 div tot AS BIGINT)").alias("p_ppm"),
    )


_PMI_ORACLE = (
    _LINKED_CTE
    + """,
pres AS (SELECT DISTINCT doc_id, sent_idx, ent_id FROM linked),
ca AS (SELECT ent_id, CAST(count(*) AS BIGINT) AS c FROM pres GROUP BY ent_id),
tot AS (SELECT CAST(count(*) AS BIGINT) AS n_sent
        FROM (SELECT DISTINCT doc_id, sent_idx FROM pres) s),
pairs AS (
  SELECT p.ent_id AS a, q.ent_id AS b, CAST(count(*) AS BIGINT) AS n_ab
  FROM pres p JOIN pres q
    ON p.doc_id = q.doc_id AND p.sent_idx = q.sent_idx
   AND p.ent_id < q.ent_id
  GROUP BY 1, 2)
SELECT a, b, n_ab, caa.c AS c_a, cab.c AS c_b,
       CAST(CAST(n_ab AS HUGEINT) * n_sent * 1000000
            // (CAST(caa.c AS HUGEINT) * cab.c) AS BIGINT) AS lift_ppm
FROM pairs JOIN ca caa ON pairs.a = caa.ent_id
           JOIN ca cab ON pairs.b = cab.ent_id
           CROSS JOIN tot
"""
)


def _q_kg_relation_pmi(spark, sf_dir):
    """Log-free PMI (association lift) per co-occurring entity pair:
    lift_ppm = P(a,b) / (P(a)·P(b)) in exact integer ppm =
    (n_ab·N·1e6) div (c_a·c_b) over sentence-level presence — the
    edge-weighting step that separates real relations from hub noise
    before the co-occurrence graph is consumed (raw counts make every
    frequent entity look related to everything; kg_triple_counts keeps
    raw counts, this contract pins the normalized weight). No log()
    (libm last-ulp drift, the float rule): the monotone transform
    keeps ranking semantics and stays cross-engine exact in
    DECIMAL(38,0) / HUGEINT. Scale: presence frame is distinct
    (doc,sent,ent) — the pair self-join fans out per-sentence entity
    count squared (bounded by sentence length, never corpus²), then a
    partial agg to |V|² pairs max; per-entity counts join broadcast
    (entity dim is the NEL vocabulary — the same broadcast-dim
    assumption the gazetteer join makes); the 1-row sentence total is
    the sanctioned crossJoin-broadcast scalar. Replaces the reference's
    per-dict frequency tables (Aitslab/EasyNER scripts/analysis.py)
    with a statistically normalized edge weight."""
    pres = (
        linked(spark, sf_dir)
        .select("doc_id", "sent_idx", "ent_id")
        .distinct()
        # 4 consumers: both sides of the pair self-join, the per-entity
        # counts, and the sentence total (Catalyst no-CSE rule)
        .localCheckpoint()
    )
    # tiny frame, two consumers (c_a and c_b broadcast sides) — without
    # the checkpoint each side rescans pres and re-runs the agg
    ca = (
        pres.groupBy("ent_id")
        .agg(F.count("*").cast("bigint").alias("c"))
        .localCheckpoint()
    )
    tot = (
        pres.select("doc_id", "sent_idx")
        .distinct()
        .agg(F.count("*").cast("bigint").alias("n_sent"))
    )
    rhs = pres.select("doc_id", "sent_idx", F.col("ent_id").alias("b"))
    pairs = (
        pres.select("doc_id", "sent_idx", F.col("ent_id").alias("a"))
        .join(rhs, ["doc_id", "sent_idx"])
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count("*").cast("bigint").alias("n_ab"))
    )
    return (
        pairs.join(
            F.broadcast(ca.select(F.col("ent_id").alias("a"), F.col("c").alias("c_a"))),
            "a",
        )
        .join(
            F.broadcast(ca.select(F.col("ent_id").alias("b"), F.col("c").alias("c_b"))),
            "b",
        )
        .crossJoin(F.broadcast(tot))
        .select(
            "a",
            "b",
            "n_ab",
            "c_a",
            "c_b",
            F.expr(
                "CAST(CAST(n_ab AS DECIMAL(38,0)) * n_sent * 1000000"
                " div (CAST(c_a AS DECIMAL(38,0)) * c_b) AS BIGINT)"
            ).alias("lift_ppm"),
        )
    )


# Per-doc token-length HISTOGRAM — defined ONCE per engine (same
# anti-drift rule as _WU_SQL/_HW_SQL): doc_length_percentiles and
# doc_length_outliers must agree on what "doc length" means, in both
# Spark and SQL form.
_LEN_HIST_SQL = """
lens AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS len FROM toks GROUP BY doc_id),
hist AS (SELECT len, CAST(count(*) AS BIGINT) AS cnt FROM lens GROUP BY len)"""


def _len_hist(spark, sf_dir):
    """Spark twin of _LEN_HIST_SQL: per-doc token counts partial-agged
    to the corpus-size-independent length histogram, localCheckpointed
    (every consumer fans out at least three ways: both theta sides of
    the cumulative join plus the total)."""
    lens = (
        _doc_tokens(_spread(_read(spark, sf_dir, "documents").select("doc_id", "text"), sf_dir, "documents"))
        .groupBy("doc_id")
        .agg(F.count("*").cast("bigint").alias("len"))
    )
    return (
        lens.groupBy("len")
        .agg(F.count("*").cast("bigint").alias("cnt"))
        .localCheckpoint()
    )


_PCT_ORACLE = (
    _TOKS_CTE
    + ","
    + _LEN_HIST_SQL
    + """,
cum AS (SELECT a.len, CAST(SUM(b.cnt) AS BIGINT) AS cum
        FROM hist a JOIN hist b ON b.len <= a.len GROUP BY a.len),
tot AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n_docs FROM hist),
pcts(pct) AS (VALUES (CAST(50 AS BIGINT)), (90), (99)),
th AS (SELECT pct, n_docs, CAST((pct * n_docs + 99) // 100 AS BIGINT) AS k
       FROM pcts CROSS JOIN tot)
SELECT th.pct, th.n_docs, CAST(MIN(c.len) AS BIGINT) AS value
FROM th JOIN cum c ON c.cum >= th.k
GROUP BY th.pct, th.n_docs
"""
)


def _bucket_prefix_agg(tbl, key, val, agg_fn, out, inclusive=False):
    """Prefix aggregate over a BOUNDED, already-materialized bucket
    table (length histogram, arrival-bucket maxima, ...) without a
    global window: broadcast theta self-join + keyed agg — the
    cumulative counterpart of _two_phase_rank's offset join.
    (_two_phase_rank keeps its own inline copy deliberately: its rank
    and offset consumers share one exchange via ReusedExchange, which
    routing through a checkpointed helper would sever.) LEFT join so
    the first bucket survives (agg over zero rows → NULL; callers
    coalesce if they need a zero). Caller MUST pass a
    localCheckpointed/materialized frame — both join sides consume
    it, and Catalyst does not dedupe the fan-out."""
    rhs = tbl.select(F.col(key).alias("_pk2"), F.col(val).alias("_pv2"))
    cond = (
        (F.col("_pk2") <= F.col(key))
        if inclusive
        else (F.col("_pk2") < F.col(key))
    )
    return (
        tbl.join(F.broadcast(rhs), cond, "left")
        .groupBy(key)
        .agg(agg_fn(F.col("_pv2")).alias(out))
    )


def _q_doc_length_percentiles(spark, sf_dir):
    """Exact corpus length percentiles (P50/P90/P99 of per-doc token
    counts) WITHOUT a global sort: value(p) = min length whose
    cumulative doc count ≥ ceil(p·n/100) — type-1 (lower) quantile,
    the sequence-length budgeting table (max_seq_len / packing-bin
    sizing) a training pipeline reads before tokenizing 100 TB.
    Scale shape: per-doc counts partial-agg to a LENGTH HISTOGRAM
    (|distinct lengths| ≤ max doc length, corpus-size-independent),
    the cumulative sum is the theta self-join over that bounded
    histogram (same zero-single-partition trick as _two_phase_rank —
    never orderBy the corpus), thresholds come from the sanctioned
    1-row total crossJoin, and the final pick is a 3-row broadcast
    theta join + min. approx_percentile would be cheaper but is
    sketch-dependent and cross-engine nondeterministic — this is the
    exact-and-still-distributed version."""
    hist = _len_hist(spark, sf_dir)
    cum = _bucket_prefix_agg(
        hist,
        "len",
        "cnt",
        lambda c: F.sum(c).cast("bigint"),
        "cum",
        inclusive=True,
    )
    tot = hist.agg(F.sum("cnt").cast("bigint").alias("n_docs"))
    th = (
        spark.createDataFrame([(50,), (90,), (99,)], "pct bigint")
        .crossJoin(F.broadcast(tot))
        .select(
            "pct",
            "n_docs",
            F.expr("CAST((pct * n_docs + 99) div 100 AS BIGINT)").alias("k"),
        )
    )
    return (
        cum.join(F.broadcast(th), F.col("cum") >= F.col("k"))
        .groupBy("pct", "n_docs")
        .agg(F.min("len").cast("bigint").alias("value"))
    )


_GINI_ORACLE = f"""
WITH hw AS ({_HW_SQL}),
r AS (SELECT host_chars,
             CAST(RANK() OVER (ORDER BY host_chars DESC, host) AS BIGINT) AS rnk
      FROM hw),
s AS (SELECT CAST(count(*) AS BIGINT) AS n_hosts,
             CAST(SUM(host_chars) AS BIGINT) AS total_chars,
             SUM(CAST(rnk AS HUGEINT) * host_chars) AS sd
      FROM r)
SELECT n_hosts, total_chars,
       CAST(((CAST(n_hosts + 1 AS HUGEINT) * total_chars - 2 * sd) * 1000000)
            // (CAST(n_hosts AS HUGEINT) * total_chars) AS BIGINT) AS gini_ppm
FROM s
"""


def _q_web_host_gini(spark, sf_dir):
    """Source-concentration Gini over per-host text volume, exact
    integer ppm — the mixture-diversity dial crawl/curation monitors
    watch (gini→1: the corpus is one domain wearing a trenchcoat;
    gini→0: uniform source spread). Formula with DESCENDING ranks
    (rank 1 = largest host, (host_chars, host) unique so the order is
    total): G = ((n+1)·W − 2·Σ rnk·w) / (n·W), derived from the
    classic ascending form via i_asc = n+1−rnk; the numerator is
    provably ≥ 0 under desc ranks so floor-div agrees cross-engine.
    Scale: one partial agg per host, the zero-single-partition
    two-phase rank over the host frame, one final 1-row agg — no
    global sort of anything corpus-sized; Σ rnk·w in DECIMAL(38,0) /
    HUGEINT (rnk ≤ n_hosts, w ≤ total chars — int64² territory)."""
    r = _two_phase_rank(_host_chars(spark, sf_dir), "host_chars", ["host"])
    return (
        r.agg(
            F.count("*").cast("bigint").alias("n_hosts"),
            F.sum("host_chars").cast("bigint").alias("total_chars"),
            F.sum(F.expr("CAST(rnk AS DECIMAL(38,0)) * host_chars")).alias("sd"),
        )
        .select(
            "n_hosts",
            "total_chars",
            F.expr(
                "CAST(((CAST(n_hosts + 1 AS DECIMAL(38,0)) * total_chars - 2 * sd)"
                " * 1000000) div (CAST(n_hosts AS DECIMAL(38,0)) * total_chars)"
                " AS BIGINT)"
            ).alias("gini_ppm"),
        )
    )


# Deterministic second labeling for the agreement gate: even-length
# gazetteer terms swap op<->obj (9 of 15 terms — guaranteed
# off-diagonal mass), odd-length keep their class. ONE definition,
# interpolated into both engines.
_GAZB_CASE = (
    "CASE WHEN length(term) % 2 = 0 THEN"
    " CASE class WHEN 'op' THEN 'obj' WHEN 'obj' THEN 'op' ELSE class END"
    " ELSE class END"
)

_KAPPA_ORACLE = (
    _TOKS_CTE
    + f""",
gaz(term, class) AS (VALUES {_sql_values_gaz()}),
lab AS (
  SELECT COALESCE(g.class, 'O') AS la,
         COALESCE({_GAZB_CASE}, 'O') AS lb
  FROM toks t LEFT JOIN gaz g ON t.token = g.term),
m AS (SELECT la, lb, CAST(count(*) AS BIGINT) AS n FROM lab GROUP BY 1, 2),
r AS (SELECT la, CAST(SUM(n) AS BIGINT) AS rn FROM m GROUP BY la),
c AS (SELECT lb, CAST(SUM(n) AS BIGINT) AS cn FROM m GROUP BY lb),
s AS (SELECT SUM(CAST(rn AS HUGEINT) * cn) AS sc
      FROM r JOIN c ON r.la = c.lb),
d AS (SELECT CAST(COALESCE(SUM(n), 0) AS BIGINT) AS ag FROM m WHERE la = lb),
tot AS (SELECT CAST(SUM(n) AS BIGINT) AS nt FROM m)
SELECT nt AS n_tokens, ag AS n_agree,
       CAST((sc * 1000000) // (CAST(nt AS HUGEINT) * nt) AS BIGINT)
         AS chance_ppm,
       CAST(((CAST(nt AS HUGEINT) * ag - sc) * 1000000)
            // (CAST(nt AS HUGEINT) * nt - sc) AS BIGINT) AS kappa_ppm
FROM tot CROSS JOIN d CROSS JOIN s
"""
)


def _q_eval_run_agreement_kappa(spark, sf_dir):
    """Chance-corrected agreement (Cohen's kappa, exact integer ppm)
    between two deterministic NER labelings of the full token stream —
    the eval primitive that raw accuracy fakes on NER corpora: both
    runs label ~all tokens 'O', so percent-agreement is ~1 regardless
    of entity-level quality; kappa subtracts the chance term
    pe = Σ_c row_c·col_c / n². All-integer form (no floats, no
    division until the single final one): kappa_ppm =
    ((n·d − s)·1e6) div (n² − s) with d = Σ diagonal, s = Σ row·col —
    numerators exceed int64 at corpus scale (n²·1e6), so the products
    run in DECIMAL(38,0) / HUGEINT. n·d ≥ s holds by construction here
    (the shared 'O' mass keeps observed agreement above chance), so
    floor/truncation division agrees cross-engine. Run B is the
    even-length op<->obj class swap (_GAZB_CASE, 9/15 terms) — a
    deterministic stand-in for a second model run. Scale: ONE shuffle
    in the whole plan (combined partials of the ≤25-row confusion
    matrix); marginals, diagonal, total and the kappa arithmetic all
    run on that checkpointed tiny frame (crossJoin-broadcast 1-row
    scalars, the sanctioned shape)."""
    tk = tokens(spark, sf_dir).select("token")
    # ONE broadcast join yields both labelings: _cb is a pure function
    # of (term, class), so a second join over the token stream would
    # buy nothing but an extra broadcast exchange
    ga = gaz_df(spark).select(
        F.col("term").alias("_ta"),
        F.col("class").alias("_ca"),
        F.expr(_GAZB_CASE).alias("_cb"),
    )
    m = (
        tk.join(F.broadcast(ga), F.col("token") == F.col("_ta"), "left")
        .groupBy(
            F.coalesce("_ca", F.lit("O")).alias("la"),
            F.coalesce("_cb", F.lit("O")).alias("lb"),
        )
        .agg(F.count("*").cast("bigint").alias("n"))
        # 4 consumers: row marginals, col marginals, diagonal, total
        .localCheckpoint()
    )
    rows_ = m.groupBy("la").agg(F.sum("n").cast("bigint").alias("rn"))
    cols_ = m.groupBy("lb").agg(F.sum("n").cast("bigint").alias("cn"))
    s = (
        rows_.join(cols_, rows_["la"] == cols_["lb"])
        .agg(F.sum(F.expr("CAST(rn AS DECIMAL(38,0)) * cn")).alias("sc"))
    )
    d = m.filter(F.col("la") == F.col("lb")).agg(
        F.coalesce(F.sum("n"), F.lit(0)).cast("bigint").alias("ag")
    )
    tot = m.agg(F.sum("n").cast("bigint").alias("nt"))
    return (
        tot.crossJoin(F.broadcast(d))
        .crossJoin(F.broadcast(s))
        .select(
            F.col("nt").alias("n_tokens"),
            F.col("ag").alias("n_agree"),
            # pe in bounded ppm (≤ 1e6) — raw s is ~n² and would
            # overflow a BIGINT output column past n ≈ 3e9 tokens
            F.expr(
                "CAST((sc * 1000000) div (CAST(nt AS DECIMAL(38,0)) * nt)"
                " AS BIGINT)"
            ).alias("chance_ppm"),
            F.expr(
                "CAST(((CAST(nt AS DECIMAL(38,0)) * ag - sc) * 1000000)"
                " div (CAST(nt AS DECIMAL(38,0)) * nt - sc) AS BIGINT)"
            ).alias("kappa_ppm"),
        )
    )


WM_DELAY_US = 3_600_000_000  # 1 h watermark delay
WM_BUCKETS = 4096
# Deterministic ingest disorder: 7 upload streams, stream k = events
# with event_id % 7 == k, flushed 40·k arrival slots late. The raw
# events table is perfectly in-order (ts monotone in event_id), which
# would make every late count 0 at every SF — a vacuous gate (the
# kg_graph_two_hop lesson); the jitter makes lateness REAL and
# SF-DISCRIMINATING (mean inter-event gap shrinks 43 min → 26 s from
# sf0.001 to sf0.1, so which streams cross the 1 h delay varies by SF).
WM_JITTER = 40

_WM_LATE_ORACLE = f"""
WITH ev AS (
  SELECT event_id,
         CAST(event_id + (event_id % 7) * {WM_JITTER} AS BIGINT) AS akey,
         event_type, CAST(epoch_us(ts) AS BIGINT) AS ts_us
  FROM events),
pm AS (
  SELECT event_type, ts_us,
         MAX(ts_us) OVER (ORDER BY akey, event_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS wm_max
  FROM ev)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(SUM(CASE WHEN wm_max IS NOT NULL
                      AND ts_us < wm_max - {WM_DELAY_US}
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_late,
       CAST(SUM(CASE WHEN wm_max IS NOT NULL
                      AND ts_us < wm_max - {WM_DELAY_US}
                     THEN 1 ELSE 0 END) * 1000000 // count(*) AS BIGINT)
         AS late_ppm
FROM pm GROUP BY event_type
"""


def _q_events_watermark_late(spark, sf_dir):
    """Watermark late-data audit (the batch twin of the streaming
    ingest's 1 h watermark): an event is LATE iff its event time is
    more than WM_DELAY_US behind the max event time of all events
    that arrived before it (arrival order = event_id, the unique
    total order) — exactly the rows `withWatermark("ts", "1 hour")`
    would drop from a streaming aggregation; the audit tells you the
    drop rate per type BEFORE you pick the delay. Arrival order =
    (akey, event_id) with akey = event_id + (event_id % 7)·WM_JITTER
    — the deterministic 7-stream ingest-disorder synthesis (see
    WM_JITTER comment; the raw table is perfectly in-order, which
    would gate nothing). The global running max is the classic
    unpartitioned-window trap; here it is two-phase over ADAPTIVE
    buckets: bkt = akey div ceil(range / WM_BUCKETS) (bucket count
    bounded at 4096 for ANY corpus size — the 1-row max-key scalar
    sets the width), bucket-local running max via a KEYED window,
    cross-bucket prefix max via the broadcast theta join over the
    ≤4096-row bucket-max table (same shape as _two_phase_rank's
    offset join; two-level bucketing extends this to O(√n)-bounded
    partitions if per-bucket rows outgrow a task). All arithmetic in
    BIGINT epoch micros (the ts convention every events contract
    shares — engine-native timestamps never cross the compare
    boundary)."""
    ev = (
        _read(spark, sf_dir, "events")
        .select(
            "event_id",
            F.expr(f"CAST(event_id + (event_id % 7) * {WM_JITTER} AS BIGINT)").alias(
                "akey"
            ),
            "event_type",
            F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
        )
        # 3 consumers: the max-key scalar, the windowed frame, the
        # bucket-max aggregate
        .localCheckpoint()
    )
    width = ev.agg(
        F.expr(f"CAST(max(akey) div {WM_BUCKETS} + 1 AS BIGINT)").alias("_w")
    )
    b = (
        ev.crossJoin(F.broadcast(width))
        .withColumn("bkt", F.expr("CAST(akey div _w AS BIGINT)"))
        # 2 consumers (the keyed window + the bucket-max agg) — without
        # this the width agg job and the crossJoin projection run twice
        .localCheckpoint()
    )
    wloc = (
        W.partitionBy("bkt")
        .orderBy("akey", "event_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    loc = b.withColumn("lmax", F.max("ts_us").over(wloc))
    bm = (
        b.groupBy("bkt")
        .agg(F.max("ts_us").alias("bmax"))
        # consumed by both sides of the prefix theta join
        .localCheckpoint()
    )
    prev = _bucket_prefix_agg(bm, "bkt", "bmax", F.max, "pmax")
    late = F.expr(
        f"CASE WHEN greatest(lmax, pmax) IS NOT NULL"
        f" AND ts_us < greatest(lmax, pmax) - {WM_DELAY_US}"
        f" THEN 1 ELSE 0 END"
    )
    return (
        loc.join(F.broadcast(prev), "bkt")
        .groupBy("event_type")
        .agg(
            F.count("*").cast("bigint").alias("n_events"),
            F.sum(late).cast("bigint").alias("n_late"),
        )
        .select(
            "event_type",
            "n_events",
            "n_late",
            F.expr("CAST(n_late * 1000000 div n_events AS BIGINT)").alias(
                "late_ppm"
            ),
        )
    )


_NEGSAMPLE_ORACLE = (
    _LINKED_CTE
    + f""",
wu AS MATERIALIZED ({_WU_SQL}),
bb AS MATERIALIZED ({_BB_SQL}),
ents AS (SELECT a AS cand FROM bb UNION SELECT b FROM bb),
cands AS (
  SELECT bb.a AS subj, bb.b AS obj, e.cand,
         md5(bb.a || '|' || bb.b || '|' || e.cand) AS h
  FROM bb CROSS JOIN ents e
  WHERE e.cand <> bb.a
    AND NOT EXISTS (SELECT 1 FROM bb t
                    WHERE t.a = least(bb.a, e.cand)
                      AND t.b = greatest(bb.a, e.cand)))
SELECT subj, obj, substr(min(h || '|' || cand), 34) AS neg_obj
FROM cands GROUP BY subj, obj
"""
)


def _q_kg_negative_samples(spark, sf_dir):
    """Deterministic negative sampling for KG-embedding training
    (TransE-style corrupt-object generation): for every strong
    relation (subj, obj) in the backbone KG, emit the corrupted
    object — the hash-first entity cand such that (subj, cand) is NOT
    a backbone edge (filtered negative sampling: candidates that are
    themselves true relations would train the wrong sign) and cand ≠
    subj. "Hash-first" = argmin of md5(subj|obj|cand) — a seedless
    cross-engine stand-in for a uniform draw (no RNG in contracts;
    same md5-family trick as _md5_sig_cols), realized as
    min(h || '|' || cand) + substr so the argmin needs no window.
    Non-vacuity: the raw 15-entity co-occurrence graph is COMPLETE at
    every SF (no negative exists — the kg_graph_two_hop lesson), so
    the gate runs over the sparse top-K backbone (TWOHOP_TOPK_EDGES
    strongest edges) and corrupts within its node vocabulary. Scale: backbone is the
    two-phase-ranked strong-edge cut (bounded), candidates = edges ×
    broadcast node dim with the membership anti-join on the
    canonicalized pair key, then one partial-agg argmin per edge —
    at production scale the node dim becomes a hash-bucketed sample
    and the anti-join key stays identical."""
    bb = backbone(spark, sf_dir).localCheckpoint()  # (src, dst)
    ents = (
        bb.select(F.col("src").alias("cand"))
        .union(bb.select("dst"))
        .distinct()
    )
    cands = (
        bb.crossJoin(F.broadcast(ents))
        .filter(F.col("cand") != F.col("src"))
        .withColumn("_ka", F.least("src", "cand"))
        .withColumn("_kb", F.greatest("src", "cand"))
    )
    valid = cands.join(
        bb.select(
            F.least("src", "dst").alias("_ka"),
            F.greatest("src", "dst").alias("_kb"),
        ),
        ["_ka", "_kb"],
        "left_anti",
    ).withColumn(
        "h",
        F.md5(
            F.concat(
                F.col("src"), F.lit("|"), F.col("dst"), F.lit("|"), F.col("cand")
            ).cast("binary")
        ),
    )
    return (
        valid.groupBy(F.col("src").alias("subj"), F.col("dst").alias("obj"))
        .agg(F.min(F.concat("h", F.lit("|"), "cand")).alias("_m"))
        .select("subj", "obj", F.expr("substring(_m, 34)").alias("neg_obj"))
    )


# outlier iff |len - median| > MAD_K * MAD. K=2, NOT the textbook 3:
# the synthetic doc lengths are bounded 10..100 around median ~55, so
# 3·MAD (≈66) exceeds the maximum possible deviation (≈46) and the
# outlier branch would be VACUOUS at every SF (the two-hop lesson);
# 2·MAD catches the real short-stub tail (~10 docs at sf0.001, ~100 at
# sf0.1) so the gate pins the filtered-sum path with live mass.
MAD_K = 2

_MAD_ORACLE = (
    _TOKS_CTE
    + ","
    + _LEN_HIST_SQL
    + f""",
tot AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n FROM hist),
med AS (SELECT CAST(MIN(len) AS BIGINT) AS m
        FROM (SELECT len, SUM(cnt) OVER (ORDER BY len) AS cum FROM hist) h
             CROSS JOIN tot
        WHERE cum >= (n + 1) // 2),
devh AS (SELECT CAST(abs(len - m) AS BIGINT) AS d, CAST(SUM(cnt) AS BIGINT) AS c
         FROM hist CROSS JOIN med GROUP BY 1),
madq AS (SELECT CAST(MIN(d) AS BIGINT) AS mad
         FROM (SELECT d, SUM(c) OVER (ORDER BY d) AS cum FROM devh) x
              CROSS JOIN tot
         WHERE cum >= (n + 1) // 2),
outl AS (SELECT CAST(COALESCE(SUM(c), 0) AS BIGINT) AS no
         FROM devh CROSS JOIN madq WHERE d > {MAD_K} * mad)
SELECT n AS n_docs, m AS median_len, mad AS mad_len, no AS n_outliers,
       CAST(no * 1000000 // n AS BIGINT) AS outlier_ppm
FROM tot CROSS JOIN med CROSS JOIN madq CROSS JOIN outl
"""
)


def _q_doc_length_outliers(spark, sf_dir):
    """Robust length-outlier screen: median + MAD (median absolute
    deviation) of per-doc token counts, and the count/ppm of docs with
    |len − median| > MAD_K·MAD — the outlier rule curation uses where
    mean/stddev would be dragged by the very tail it is hunting
    (boilerplate stubs, concatenation blobs). Everything exact
    integers: median and MAD are type-1 order statistics (smallest
    value with cumulative count ≥ ceil(n/2)) computed TWICE through
    the shared _bucket_prefix_agg histogram prefix — lengths partial-
    agg to a corpus-size-independent histogram, the deviation
    histogram folds |len − m| over it (1-row median crossJoin), and
    the outlier count is a filtered sum over that tiny frame. No
    global sort anywhere; the corpus is touched exactly once."""
    hist = _len_hist(spark, sf_dir)
    tot = hist.agg(F.sum("cnt").cast("bigint").alias("n"))
    cum = _bucket_prefix_agg(
        hist, "len", "cnt", lambda c: F.sum(c).cast("bigint"), "cum",
        inclusive=True,
    )
    med = (
        cum.crossJoin(F.broadcast(tot))
        .filter(F.expr("cum >= (n + 1) div 2"))
        .agg(F.min("len").cast("bigint").alias("m"))
    )
    devh = (
        hist.crossJoin(F.broadcast(med))
        .groupBy(F.expr("CAST(abs(len - m) AS BIGINT)").alias("d"))
        .agg(F.sum("cnt").cast("bigint").alias("c"))
        # consumers: cum (both theta sides), outlier sum
        .localCheckpoint()
    )
    dcum = _bucket_prefix_agg(
        devh, "d", "c", lambda c: F.sum(c).cast("bigint"), "cum",
        inclusive=True,
    )
    mad = (
        dcum.crossJoin(F.broadcast(tot))
        .filter(F.expr("cum >= (n + 1) div 2"))
        .agg(F.min("d").cast("bigint").alias("mad"))
    )
    outl = (
        devh.crossJoin(F.broadcast(mad))
        .filter(F.expr(f"d > {MAD_K} * mad"))
        .agg(F.coalesce(F.sum("c"), F.lit(0)).cast("bigint").alias("no"))
    )
    return (
        tot.crossJoin(F.broadcast(med))
        .crossJoin(F.broadcast(mad))
        .crossJoin(F.broadcast(outl))
        .select(
            F.col("n").alias("n_docs"),
            F.col("m").alias("median_len"),
            F.col("mad").alias("mad_len"),
            F.col("no").alias("n_outliers"),
            F.expr("CAST(no * 1000000 div n AS BIGINT)").alias("outlier_ppm"),
        )
    )


TOPK_TERMS = 3

_TOPTERMS_ORACLE = (
    _TOKS_CTE
    + f""",
tf AS (SELECT doc_id, token, CAST(count(*) AS BIGINT) AS tf
       FROM toks GROUP BY 1, 2),
dfreq AS (SELECT token, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY token),
nd AS (SELECT CAST(count(DISTINCT doc_id) AS BIGINT) AS n FROM tf),
scored AS (
  SELECT t.doc_id, t.token, t.tf, d.df,
         CAST(CAST(t.tf AS HUGEINT) * (n * 1000000 // d.df) AS BIGINT)
           AS score
  FROM tf t JOIN dfreq d ON t.token = d.token CROSS JOIN nd)
SELECT doc_id, token AS term, tf, df, score, CAST(rn AS BIGINT) AS rnk
FROM (SELECT *, row_number() OVER (PARTITION BY doc_id
                                   ORDER BY score DESC, token) AS rn
      FROM scored) x
WHERE rn <= {TOPK_TERMS}
"""
)


def _q_doc_top_terms(spark, sf_dir):
    """Per-document keyword extraction: the TOPK_TERMS most
    characteristic terms by the log-free TF-IDF analog score =
    tf · (N·1e6 div df) — term frequency weighted by integer-ppm
    rarity (the document-tagging dual of search_bm25_lite's
    query-side scoring; no log() per the float rule, and the monotone
    substitute preserves the per-doc ranking). Deterministic total
    order (score DESC, token). Scale: (doc, term) tf partial agg, a
    token-keyed hash join against the |vocab|-sized df table (NOT
    broadcast — vocabulary outgrows a broadcast at corpus scale), the
    sanctioned 1-row doc-count crossJoin, and a doc_id-PARTITIONED
    window top-k (per-doc groups are doclen-bounded; never a global
    sort). Score bound: tf·N·1e6 must fit int64 — documented-safe to
    ~9e16/max_tf docs; past that the score column itself needs
    DECIMAL."""
    tf = (
        tokens(spark, sf_dir)
        .groupBy("doc_id", "token")
        .agg(F.count("*").cast("bigint").alias("tf"))
        # 3 consumers: df agg, doc-count agg, the scored join
        .localCheckpoint()
    )
    dfreq = tf.groupBy("token").agg(F.count("*").cast("bigint").alias("df"))
    nd = tf.agg(F.countDistinct("doc_id").cast("bigint").alias("n"))
    scored = (
        tf.join(dfreq, "token")
        .crossJoin(F.broadcast(nd))
        .withColumn(
            "score",
            F.expr(
                "CAST(CAST(tf AS DECIMAL(38,0)) * (n * 1000000 div df)"
                " AS BIGINT)"
            ),
        )
    )
    w = W.partitionBy("doc_id").orderBy(F.desc("score"), "token")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= TOPK_TERMS)
        .select(
            "doc_id",
            F.col("token").alias("term"),
            "tf",
            "df",
            "score",
            F.col("rn").cast("bigint").alias("rnk"),
        )
    )


# ---------------------------------------------------------------------------
# pending: bounded SCC over the DIRECTED co-occurrence backbone
# ---------------------------------------------------------------------------
SCC_TOPK_EDGES = 40
SCC_MAX_HOPS = 3

# The directed top-K backbone: the SCC_TOPK_EDGES strongest DIRECTED
# wedges by (w DESC, src, dst) — (w, src, dst) is unique, so the cut is
# deterministic. Deliberately NOT the undirected _BB_SQL fold: SCC is
# about asymmetric reach (pos<pos orientation means "A precedes B in
# sentences"), and folding to a<b would make every component trivially
# mutual. Same anti-drift rule: ONE definition, interpolated into the
# oracle, with dbackbone() as the Spark twin.
_DBB_SQL = f"""SELECT src, dst FROM ({_KG_WEDGES_SQL})
  QUALIFY row_number() OVER (ORDER BY w DESC, src, dst) <= {SCC_TOPK_EDGES}"""


def dbackbone(spark, sf_dir):
    """Top-K strongest directed co-occurrence edges as (src, dst) —
    the Spark twin of _DBB_SQL, built on the zero-single-partition
    two-phase rank (same discipline as backbone())."""
    return (
        _two_phase_rank(wedges(spark, sf_dir), "w", ["src", "dst"])
        .filter(F.col("rnk") <= SCC_TOPK_EDGES)
        .select("src", "dst")
    )


def _scc_oracle() -> str:
    """Unrolled bounded directed reachability + mutual-pair fold (the
    engine's anti-join frontier and this closure-union produce the
    same DISTINCT pair set; DuckDB cannot aggregate inside a recursive
    CTE term, same constraint as _pagerank_oracle / _bfs_hops_oracle).
    Every CTE is AS MATERIALIZED (DuckDB default-inlines CTEs)."""
    ctes = [
        f"""wd AS MATERIALIZED ({_DBB_SQL}),
sccnodes AS MATERIALIZED (SELECT src AS node FROM wd UNION SELECT dst FROM wd),
p0 AS MATERIALIZED (SELECT node AS seed, node FROM sccnodes)"""
    ]
    for h in range(1, SCC_MAX_HOPS + 1):
        ctes.append(
            f"""p{h} AS MATERIALIZED (
  SELECT seed, node FROM p{h - 1}
  UNION
  SELECT f.seed, e.dst AS node
  FROM p{h - 1} f JOIN wd e ON f.node = e.src)"""
        )
    last = f"p{SCC_MAX_HOPS}"
    return (
        _LINKED_CTE
        + ",\n"
        + ",\n".join(ctes)
        + f""",
mutual AS (
  SELECT a.seed AS node, a.node AS peer
  FROM {last} a JOIN {last} b ON a.seed = b.node AND a.node = b.seed),
comp AS (
  SELECT node, min(peer) AS component, CAST(count(*) AS BIGINT) AS scc_size
  FROM mutual GROUP BY node),
oreach AS (
  SELECT seed AS node, CAST(count(*) AS BIGINT) AS out_reach
  FROM {last} WHERE node <> seed GROUP BY seed)
SELECT c.node AS ent_id, c.component, c.scc_size,
       COALESCE(r.out_reach, 0) AS out_reach
FROM comp c LEFT JOIN oreach r ON c.node = r.node
"""
    )


def _q_kg_graph_scc(spark, sf_dir):
    """Bounded strongly-connected components over the directed top-K
    co-occurrence backbone — the cycle detector for directional KG
    relations ("A precedes B" rings vs pure hierarchies), and the
    directed counterpart of dedup_components' undirected CC. Two
    entities share a component iff each reaches the other within
    SCC_MAX_HOPS directed steps; component id = min mutual node
    (deterministic, RNG-free); scc_size / out_reach expose the mutual
    set and bounded reach ball sizes. Engine op
    ops/graph.py::scc_bounded: frontier-expansion reach pairs (one
    keyed join + one pair anti-join per round, localCheckpointed) +
    ONE pair-keyed self-join for mutuality — never an n² node
    cross-join; at web scale runs over a bounded backbone exactly as
    here (the raw graph is complete → vacuous). Scalar columns only,
    per the driver-hasher contract."""
    from .ops.graph import scc_bounded

    return scc_bounded(
        dbackbone(spark, sf_dir), max_hops=SCC_MAX_HOPS
    ).select(
        F.col("node").alias("ent_id"), "component", "scc_size", "out_reach"
    )


# ---------------------------------------------------------------------------
# pending: deterministic training-mixture interleave order + packing
# ---------------------------------------------------------------------------

# ONE definition of the interleave sort key (same anti-drift rule as
# _WU_SQL): the order audit and the packing manifest must agree on the
# global order or the two manifests describe different epochs.
_IH_SQL = """ih AS (
  SELECT doc_id, source,
         md5('interleave:' || CAST(doc_id AS VARCHAR)) AS h
  FROM documents
)"""


def interleave_keys(spark, sf_dir, prefix: str = "interleave:"):
    """(doc_id, source, h, bkt) — Spark twin of _IH_SQL plus the
    2-hex-char prefix bucket (a PREFIX of the sort key, so bucket
    order == key order; the two-phase global-rank/prefix-sum trick
    rides on it). ``prefix`` is the hash salt: ONE seeded-hash key
    recipe serves every deterministic-draw contract (interleave order
    + packing use the default; the per-source sample draws an
    independent stream with 'persrc:')."""
    return (
        _read(spark, sf_dir, "documents")
        .select(
            "doc_id",
            "source",
            F.md5(
                F.concat(
                    F.lit(prefix), F.col("doc_id").cast("string")
                ).cast("binary")
            ).alias("h"),
        )
        .withColumn("bkt", F.substring("h", 1, 2))
    )


def _hash_order_prefix(d, val_col, out="cum_before"):
    """Exclusive prefix SUM of ``val_col`` over the (h, doc_id) hash
    order WITHOUT a global sort — the shared two-phase scaffold behind
    the interleave rank (val = 1: rank = prefix + 1) and the packing
    manifest (val = n_tokens: bin offsets): ≤256 per-bucket totals →
    broadcast exclusive offsets (_bucket_prefix_agg theta join) +
    keyed within-bucket running sum (ROWS UNBOUNDED PRECEDING..1
    PRECEDING). ``d`` must be localCheckpointed by the caller (bucket
    totals + windowed side both consume it — the Catalyst-no-CSE
    rule) and carry (h, bkt, doc_id, val_col)."""
    bsum = (
        d.groupBy("bkt")
        .agg(F.sum(val_col).cast("bigint").alias("cnt"))
        .localCheckpoint()
    )
    off = _bucket_prefix_agg(
        bsum, "bkt", "cnt", lambda c: F.sum(c).cast("bigint"), "off"
    ).select("bkt", F.coalesce("off", F.lit(0)).cast("bigint").alias("off"))
    w = (
        W.partitionBy("bkt")
        .orderBy("h", "doc_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    return (
        d.withColumn("_run", F.coalesce(F.sum(val_col).over(w), F.lit(0)))
        .join(F.broadcast(off), "bkt")
        .withColumn(out, (F.col("off") + F.col("_run")).cast("bigint"))
        .drop("_run", "off")
    )


_INTERLEAVE_ORACLE = f"""
WITH {_IH_SQL},
ipos AS (
  SELECT doc_id, source,
         CAST(row_number() OVER (ORDER BY h, doc_id) AS BIGINT) AS pos
  FROM ih
)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(min(pos) AS BIGINT) AS first_pos,
       CAST(max(pos) AS BIGINT) AS last_pos,
       CAST(sum(pos) AS BIGINT) AS sum_pos,
       CAST(arg_min(doc_id, pos) AS BIGINT) AS first_doc_id
FROM ipos GROUP BY source
"""


def _q_train_interleave_order(spark, sf_dir):
    """Deterministic global training order audit — the shuffle a data
    loader needs reproduced bit-identically on any cluster layout:
    global position = rank of (md5('interleave:'||doc_id), doc_id),
    i.e. a seeded hash shuffle that interleaves sources without RNG
    (rand(seed) is partition-layout-dependent; this is not). Per
    source the contract pins n_docs, first/last/sum of positions and
    the head doc — the mixture-interleaving statistics a curriculum
    monitor reads. Scale shape: NO global sort/window — the rank is
    the two-phase form: 256 hash-prefix buckets (bucket = first 2 hex
    chars, a PREFIX of the sort key, so bucket order == key order),
    per-bucket row_number (hash-partitioned window), bucket offsets
    via the broadcast _bucket_prefix_agg theta join over the ≤256-row
    bucket histogram. Same zero-single-partition discipline as
    _two_phase_rank / doc_length_percentiles."""
    d = (
        interleave_keys(spark, sf_dir)
        .withColumn("one", F.lit(1).cast("bigint"))
        # two consumers (bucket histogram + windowed rank side) — see
        # the Catalyst-no-CSE rule
        .localCheckpoint()
    )
    pos = _hash_order_prefix(d, "one").withColumn(
        "pos", (F.col("cum_before") + 1).cast("bigint")
    )
    return pos.groupBy("source").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.min("pos").cast("bigint").alias("first_pos"),
        F.max("pos").cast("bigint").alias("last_pos"),
        F.sum("pos").cast("bigint").alias("sum_pos"),
        F.min(F.struct("pos", "doc_id"))
        .getField("doc_id")
        .cast("bigint")
        .alias("first_doc_id"),
    )


# ---------------------------------------------------------------------------
# pending: URL-keyed recrawl dedup (keep-best per canonical URL)
# ---------------------------------------------------------------------------

# Mirrored-recrawl URL frame: the SAME synthesis as _URLS_SQL with the
# path folded to doc_id % _MIRROR_MOD, so ~n/_MIRROR_MOD docs collapse
# onto each canonical URL (recrawls/mirrors of one page). Derived
# mechanically from _URLS_SQL — one synthesis rule, two frames, zero
# drift; the anchor assert fails loudly if the base SQL is reworded.
_MIRROR_MOD = 97
_MIRROR_URLS_SQL = _URLS_SQL.replace(
    "'/page/' || CAST(doc_id AS VARCHAR)",
    f"'/page/' || CAST(doc_id % {_MIRROR_MOD} AS VARCHAR)",
)
if _MIRROR_URLS_SQL == _URLS_SQL:  # pragma: no cover - anchor guard
    raise AssertionError("mirror URL derivation lost its _URLS_SQL anchor")

_URL_RECRAWL_ORACLE = (
    "WITH "
    + _MIRROR_URLS_SQL
    + ","
    + _CANON_SQL
    + """,
best AS (
  SELECT canon_url, doc_id, n_chars,
         row_number() OVER (PARTITION BY canon_url
                            ORDER BY n_chars DESC, doc_id) AS rn
  FROM canon),
g AS (
  SELECT canon_url, CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(n_chars) AS BIGINT) AS total_chars
  FROM canon GROUP BY canon_url)
SELECT g.canon_url, g.n_docs, g.total_chars,
       CAST(b.n_chars AS BIGINT) AS kept_chars,
       CAST(b.doc_id AS BIGINT) AS kept_doc_id,
       CAST(g.total_chars - b.n_chars AS BIGINT) AS dup_chars
FROM g JOIN best b ON g.canon_url = b.canon_url AND b.rn = 1
"""
)


def _q_dedup_url_recrawl(spark, sf_dir):
    """URL-keyed recrawl dedup — the first dedup every crawl pipeline
    runs, BEFORE any content hashing: canonicalize (ops/web.py rule
    chain), group by canonical URL, keep the best capture (longest
    text, tie → smallest doc_id) and account the duplicate volume
    dropped. Keep-best is a single map-side-partial struct-max
    (max(n_chars, -doc_id)) folded into the same hash agg that counts
    the group — ONE shuffle total, no window, no self-join (the
    row_number spelling in the oracle is DuckDB-side only). At 100 TB
    canon_url is a skew key (mirrors of one hot page) — plain
    partial-agg + AQE handles it; nothing materializes a per-URL
    capture list."""
    from .ops.web import canonical_url

    u = urls_df(spark, sf_dir, path_mod=_MIRROR_MOD).select(
        "doc_id", "n_chars", canonical_url(F.col("url")).alias("canon_url")
    )
    grp = u.groupBy("canon_url").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("total_chars"),
        F.max(
            F.struct(F.col("n_chars"), (-F.col("doc_id")).alias("neg_id"))
        ).alias("best"),
    )
    return grp.select(
        "canon_url",
        "n_docs",
        "total_chars",
        F.col("best.n_chars").cast("bigint").alias("kept_chars"),
        (-F.col("best.neg_id")).cast("bigint").alias("kept_doc_id"),
        (F.col("total_chars") - F.col("best.n_chars"))
        .cast("bigint")
        .alias("dup_chars"),
    )


# ---------------------------------------------------------------------------
# pending: weighted modularity of the label-prop communities
# ---------------------------------------------------------------------------


def _modularity_oracle() -> str:
    """Per-(round, community) weighted-modularity contributions over
    the label-prop TRAJECTORY — the oracle reuses _lp_ctes() verbatim
    (one recursion body for trajectory + modularity, zero drift) and
    adds per-round in-weight / degree-weight folds. The trajectory,
    not just the fixpoint, is the contract: on this corpus LPA
    converges to ONE community (whose modularity row is the constant
    1e6 — the two-hop vacuity lesson), while the round-1..N sweep pins
    how Q climbs as labels coalesce. All-integer: the per-community
    shifted contribution ((4·W·in_c − d_c² + 4·W²)·1e6) // (4·W²) is
    provably non-negative (d_c ≤ 2W ⇒ d_c² ≤ 4W²), so DuckDB's
    flooring // and Spark's truncating div agree; products ride
    HUGEINT / DECIMAL(38,0) (4·W²·1e6 exceeds int64). Graph: the
    top-K BACKBONE with its weights (sw = wu ⋈ _BB_SQL — reuses the
    registered cut verbatim), not the w≥LP_MIN_W graph the trajectory
    contract uses: the strong graph is near-complete, so LPA on it
    collapses to ≤2 communities by round 1; the sparse backbone keeps
    7→2→1 communities across rounds — a genuinely discriminating
    modularity sweep."""
    ctes, _last = _lp_ctes(
        extra=f"""
mbb AS MATERIALIZED ({_BB_SQL}),
sw AS MATERIALIZED (
  SELECT wu.a, wu.b, wu.w
  FROM wu JOIN mbb ON wu.a = mbb.a AND wu.b = mbb.b),""",
        adj_src="sw",
        where="",
    )
    rounds = []
    for i in range(1, LP_ROUNDS + 1):
        rounds.append(
            f"""minw{i} AS (
  SELECT la.label AS community, CAST(SUM(s.w) AS BIGINT) AS in_w
  FROM sw s JOIN l{i} la ON s.a = la.node
            JOIN l{i} lb ON s.b = lb.node
  WHERE la.label = lb.label GROUP BY la.label),
mcdeg{i} AS (
  SELECT l.label AS community, CAST(count(*) AS BIGINT) AS n_nodes,
         CAST(SUM(d.d) AS BIGINT) AS deg_w
  FROM l{i} l JOIN mdegs d ON l.node = d.node GROUP BY l.label)"""
        )
    finals = "\nUNION ALL\n".join(
        f"""SELECT CAST({i} AS INT) AS rnd, c.community, c.n_nodes,
       COALESCE(i.in_w, 0) AS in_w, c.deg_w,
       CAST((4 * W * COALESCE(i.in_w, 0)
             - CAST(c.deg_w AS HUGEINT) * c.deg_w
             + 4 * W * W) * 1000000 // (4 * W * W) AS BIGINT)
         AS contrib_shift_ppm
FROM mcdeg{i} c LEFT JOIN minw{i} i ON c.community = i.community, wtot"""
        for i in range(1, LP_ROUNDS + 1)
    )
    return (
        _LINKED_CTE
        + ",\n"
        + ctes
        + """,
wtot AS (SELECT CAST(SUM(w) AS HUGEINT) AS W FROM sw),
mdegs AS MATERIALIZED (
  SELECT node, CAST(SUM(w) AS BIGINT) AS d
  FROM (SELECT a AS node, w FROM sw UNION ALL SELECT b AS node, w FROM sw)
  GROUP BY node),
"""
        + ",\n".join(rounds)
        + "\n"
        + finals
    )


def _q_kg_graph_modularity(spark, sf_dir):
    """Weighted-modularity trajectory of the label-prop run — the
    quality metric that tells a KG curator whether detected
    communities are real structure (per round r, the global
    Q_r = Σ_c(contrib_shift_ppm − 1e6)/1e6 is recoverable by exact
    integer sums; watching it climb across rounds is how LPA
    convergence is actually monitored — the fixpoint alone is one
    community on this corpus, i.e. vacuous). Per (rnd, community):
    size, internal edge weight, total degree weight, and the SHIFTED
    contribution ppm (+4W² keeps the numerator non-negative so
    floor-vs-truncate division cannot diverge cross-engine — same
    trick as eval_run_agreement_kappa's n·d ≥ s argument). Graph: the
    WEIGHTED top-K backbone (wbackbone — same cut as two-hop/BFS),
    not the near-complete w≥LP_MIN_W graph: sparse structure keeps
    7→2→1 communities across rounds (see _modularity_oracle). Engine:
    the SAME ops/graph.py::label_propagation op as
    kg_graph_label_prop (per-round checkpointed snapshots), then per
    round two keyed joins of the checkpointed backbone-edge frame
    against the label frame + two partial aggs; W rides the
    sanctioned 1-row broadcast crossJoin and the degree frame is
    materialized once across all rounds. At web scale every stage is
    community/node-keyed — nothing materializes a per-community
    member list."""
    from .ops.graph import label_propagation

    sw = (
        wbackbone(spark, sf_dir)
        # 2 + 2·LP_ROUNDS consumers: LPA edges, degree fold, per-round
        # in-weight joins
        .localCheckpoint()
    )
    snaps: list[DataFrame] = []
    label_propagation(
        sw.select(F.col("a").alias("src"), F.col("b").alias("dst")),
        iterations=LP_ROUNDS,
        snapshots=snaps,
    )
    wtot = sw.agg(F.sum("w").cast("bigint").alias("W"))
    degs = (
        sw.select(F.col("a").alias("node"), "w")
        .union(sw.select(F.col("b").alias("node"), "w"))
        .groupBy("node")
        .agg(F.sum("w").cast("bigint").alias("d"))
        # one materialization serves every round's community fold
        .localCheckpoint()
    )
    per_round: list[DataFrame] = []
    for i, labels in enumerate(snaps):
        la = labels.select(
            F.col("node").alias("a"), F.col("label").alias("la")
        )
        lb = labels.select(
            F.col("node").alias("b"), F.col("label").alias("lb")
        )
        inw = (
            sw.join(la, "a")
            .join(lb, "b")
            .filter(F.col("la") == F.col("lb"))
            .groupBy(F.col("la").alias("community"))
            .agg(F.sum("w").cast("bigint").alias("in_w"))
        )
        cdeg = (
            labels.join(degs, "node")
            .groupBy(F.col("label").alias("community"))
            .agg(
                F.count("*").cast("bigint").alias("n_nodes"),
                F.sum("d").cast("bigint").alias("deg_w"),
            )
        )
        per_round.append(
            cdeg.join(inw, "community", "left")
            .crossJoin(F.broadcast(wtot))
            .select(
                F.lit(i + 1).cast("int").alias("rnd"),
                "community",
                "n_nodes",
                F.coalesce("in_w", F.lit(0)).cast("bigint").alias("in_w"),
                "deg_w",
                F.expr(
                    "CAST((CAST(4 AS DECIMAL(38,0)) * W * coalesce(in_w, 0)"
                    " - CAST(deg_w AS DECIMAL(38,0)) * deg_w"
                    " + CAST(4 AS DECIMAL(38,0)) * W * W) * 1000000"
                    " div (CAST(4 AS DECIMAL(38,0)) * W * W) AS BIGINT)"
                ).alias("contrib_shift_ppm"),
            )
        )
    return functools.reduce(DataFrame.union, per_round)


# ---------------------------------------------------------------------------
# pending: deterministic per-source reservoir sample
# ---------------------------------------------------------------------------

PERSRC_K = 5

_PERSRC_ORACLE = f"""
WITH sh AS (
  SELECT doc_id, source,
         md5('persrc:' || CAST(doc_id AS VARCHAR)) AS h
  FROM documents
),
srk AS (
  SELECT doc_id, source, h,
         CAST(row_number() OVER (PARTITION BY source ORDER BY h, doc_id)
              AS BIGINT) AS rk
  FROM sh
)
SELECT source, rk, CAST(doc_id AS BIGINT) AS doc_id, h AS hkey
FROM srk WHERE rk <= {PERSRC_K}
"""


def _q_train_per_source_sample(spark, sf_dir):
    """Deterministic per-source K-sample — the reproducible reservoir
    every mixture pipeline needs (inspection shards, per-source eval
    holdouts): keep each source's PERSRC_K docs with the smallest
    (md5('persrc:'||doc_id), doc_id) key — a uniform draw that is
    layout- and run-invariant where reservoir-by-RNG is not. Scale
    shape: per-source groups are UNBOUNDED at 100 TB (one hot source
    can be half the corpus), so no single window over a raw source
    partition — phase 1 takes the top-K within each (source,
    hash-prefix-bucket) group (256-way split of every source), phase 2
    re-ranks the ≤256·K survivors per source; any true top-K row is
    top-K in its own bucket, and every row globally ahead of it also
    survives, so phase-2 ranks equal global ranks exactly. Both
    windows are keyed (no single-partition exchange anywhere)."""
    d = interleave_keys(spark, sf_dir, prefix="persrc:")
    w1 = W.partitionBy("source", "bkt").orderBy("h", "doc_id")
    surv = (
        d.withColumn("_r1", F.row_number().over(w1))
        .filter(F.col("_r1") <= PERSRC_K)
        .drop("_r1", "bkt")
    )
    w2 = W.partitionBy("source").orderBy("h", "doc_id")
    return (
        surv.withColumn("rk", F.row_number().over(w2).cast("bigint"))
        .filter(F.col("rk") <= PERSRC_K)
        .select(
            "source",
            "rk",
            F.col("doc_id").cast("bigint").alias("doc_id"),
            F.col("h").alias("hkey"),
        )
    )


# ---------------------------------------------------------------------------
# pending: sequence-packing manifest over the interleave order
# ---------------------------------------------------------------------------

SEQ_BUDGET = 2048

_PACKING_ORACLE = (
    _TOKS_CTE
    + f""",
{_IH_SQL},
ptk AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens
  FROM toks GROUP BY doc_id),
pord AS (
  SELECT i.doc_id, COALESCE(t.n_tokens, 0) AS n_tokens,
         COALESCE(SUM(COALESCE(t.n_tokens, 0)) OVER (
             ORDER BY i.h, i.doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS cum_before
  FROM ih i LEFT JOIN ptk t ON i.doc_id = t.doc_id),
pbin AS (
  SELECT doc_id, n_tokens, cum_before,
         CAST(cum_before // {SEQ_BUDGET} AS BIGINT) AS bin_id
  FROM pord)
SELECT bin_id,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS bin_tokens,
       CAST(min(doc_id) AS BIGINT) AS min_doc_id,
       CAST(min(cum_before) AS BIGINT) AS start_offset
FROM pbin GROUP BY bin_id
"""
)


def _q_train_packing_manifest(spark, sf_dir):
    """Sequence-packing manifest — the bin assignment a training data
    loader materializes before tokenizing: documents stream in the
    deterministic interleave order (_IH_SQL — the SAME key rule as
    train_interleave_order, shared so the two manifests describe one
    epoch) and are packed contiguously into SEQ_BUDGET-token bins; a
    doc belongs to the bin containing its start offset (offset
    packing: deterministic, streaming-friendly, and the bin boundaries
    are pure integer division of the exclusive prefix token sum). Per
    bin: doc count, token mass (>budget iff a doc straddles the
    boundary — expected), smallest doc id in the bin (min_doc_id — an
    id-space anchor, NOT the bin's stream-order head) and start
    offset. Scale shape: the global prefix sum never sorts the corpus
    — _hash_order_prefix: per-bucket token totals (≤256 rows)
    theta-join into exclusive offsets and a keyed within-bucket
    running sum, so everything is hash-partitioned by the key prefix;
    the per-bin fold is one partial agg keyed by bin_id."""
    ik = interleave_keys(spark, sf_dir)
    tk = (
        tokens(spark, sf_dir)
        .groupBy("doc_id")
        .agg(F.count("*").cast("bigint").alias("n_tokens"))
    )
    d = (
        ik.join(tk, "doc_id", "left")
        .select(
            "doc_id",
            "h",
            "bkt",
            F.coalesce("n_tokens", F.lit(0)).cast("bigint").alias("n_tokens"),
        )
        # two consumers: bucket totals + windowed running sum
        .localCheckpoint()
    )
    binned = _hash_order_prefix(d, "n_tokens").withColumn(
        "bin_id", F.expr(f"CAST(cum_before div {SEQ_BUDGET} AS BIGINT)")
    )
    return binned.groupBy("bin_id").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("bin_tokens"),
        F.min("doc_id").cast("bigint").alias("min_doc_id"),
        F.min("cum_before").cast("bigint").alias("start_offset"),
    )


# ---------------------------------------------------------------------------
# pending: audio framing grid over opaque blobs
# ---------------------------------------------------------------------------

# 8 kHz / 8-bit mono interpretation of the synthetic payload: 8 bytes
# per millisecond; the classic 25 ms / 10 ms speech framing grid.
AUDIO_BYTES_PER_MS = 8
AUDIO_WIN_MS = 25
AUDIO_HOP_MS = 10

_AUDIO_FRAMES_ORACLE = f"""
WITH meta AS (
  SELECT doc_id, text,
         CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
         CAST(octet_length(encode(text)) // {AUDIO_BYTES_PER_MS} AS BIGINT)
           AS dur_ms
  FROM documents
),
counted AS (
  SELECT doc_id, text, n_bytes, dur_ms,
         CAST(CASE WHEN dur_ms >= {AUDIO_WIN_MS}
                   THEN (dur_ms - {AUDIO_WIN_MS}) // {AUDIO_HOP_MS} + 1
                   ELSE 0 END AS BIGINT) AS n_frames
  FROM meta
),
frames AS (
  SELECT doc_id, n_bytes, n_frames, text,
         CAST(unnest(range(n_frames)) AS BIGINT) AS fidx
  FROM counted WHERE n_frames > 0
)
SELECT doc_id, n_frames, fidx,
       CAST(fidx * {AUDIO_HOP_MS} AS BIGINT) AS start_ms,
       CAST(fidx * {AUDIO_HOP_MS} * {AUDIO_BYTES_PER_MS} AS BIGINT)
         AS start_byte,
       CAST(ascii(substring(
           text, CAST(fidx * {AUDIO_HOP_MS} * {AUDIO_BYTES_PER_MS} + 1
                      AS INT), 1)) AS BIGINT) AS head_code
FROM frames
"""


def _q_multimodal_audio_frames(spark, sf_dir):
    """Audio framing grid over opaque blobs — the window/hop manifest
    an audio feature extractor (MFCC/VAD/whisper-style chunking)
    materializes BEFORE any decode: interpret each payload as 8 kHz
    8-bit mono ({AUDIO_BYTES_PER_MS} bytes/ms), lay the classic
    25 ms / 10 ms speech frame grid, emit per frame its index, start
    time, byte offset and the first payload byte at that offset (the
    content-addressing step; the corpus payload is ASCII so the char
    read equals the byte read — documented; real binary payloads take
    the same offsets through ops/multimodal.py's mapInPandas decoder,
    which this grid drives). All pure-JVM whole-stage-codegen
    arithmetic + one explode — NO shuffle at all, embarrassingly
    parallel at any scale; frame count per blob is duration-bounded so
    output is linear in total audio length. Sibling of
    multimodal_frame_sample (video keyframes); n_frames arithmetic:
    (dur − win) div hop + 1 for dur ≥ win, else 0 — the exact fencepost
    both engines must agree on (integer, non-negative)."""
    d = _read(spark, sf_dir, "documents")
    blob = F.encode(F.col("text"), "utf-8")
    counted = d.select(
        "doc_id",
        "text",
        F.octet_length(blob).cast("bigint").alias("n_bytes"),
        F.expr(
            f"CAST(octet_length(encode(text, 'utf-8'))"
            f" div {AUDIO_BYTES_PER_MS} AS BIGINT)"
        ).alias("dur_ms"),
    ).withColumn(
        "n_frames",
        F.expr(
            f"CAST(CASE WHEN dur_ms >= {AUDIO_WIN_MS} THEN"
            f" (dur_ms - {AUDIO_WIN_MS}) div {AUDIO_HOP_MS} + 1"
            f" ELSE 0 END AS BIGINT)"
        ),
    )
    frames = counted.filter(F.col("n_frames") > 0).select(
        "doc_id",
        "n_frames",
        "text",
        F.explode(
            F.sequence(F.lit(0).cast("bigint"), F.col("n_frames") - 1)
        ).alias("fidx"),
    )
    return frames.select(
        "doc_id",
        "n_frames",
        F.col("fidx").cast("bigint").alias("fidx"),
        (F.col("fidx") * AUDIO_HOP_MS).cast("bigint").alias("start_ms"),
        (F.col("fidx") * AUDIO_HOP_MS * AUDIO_BYTES_PER_MS)
        .cast("bigint")
        .alias("start_byte"),
        F.expr(
            f"CAST(ascii(substring(text,"
            f" CAST(fidx * {AUDIO_HOP_MS} * {AUDIO_BYTES_PER_MS} + 1"
            f" AS INT), 1)) AS BIGINT)"
        ).alias("head_code"),
    )


# name -> (query fn, oracle sql); registered into QUERIES/ORACLES +
# window 6 next round, alongside the forced kg_graph_two_hop /
# index_postings_rare re-gates.
PENDING_R6: dict = {
    "kg_graph_bfs_hops": (_q_kg_graph_bfs_hops, _bfs_hops_oracle()),
    "kg_graph_clustering": (_q_kg_graph_clustering, _CLUSTERING_ORACLE),
    "events_type_transitions": (_q_events_type_transitions, _TRANSITIONS_ORACLE),
    "kg_graph_harmonic": (_q_kg_graph_harmonic, _harmonic_oracle()),
    "web_host_hits": (_q_web_host_hits, _hits_oracle()),
    "kg_graph_ppr": (_q_kg_graph_ppr, _ppr_oracle()),
    "web_host_reciprocity": (_q_web_host_reciprocity, _RECIPROCITY_ORACLE),
    "kg_entity_weakest_link": (_q_kg_entity_weakest_link, _WEAKEST_ORACLE),
    "doc_novelty": (_q_doc_novelty, _NOVELTY_ORACLE),
    "kg_graph_truss": (_q_kg_graph_truss, _truss_oracle()),
    "web_crawl_budget": (_q_web_crawl_budget, _CRAWL_BUDGET_ORACLE),
    "kg_relation_pmi": (_q_kg_relation_pmi, _PMI_ORACLE),
    "eval_run_agreement_kappa": (_q_eval_run_agreement_kappa, _KAPPA_ORACLE),
    "events_watermark_late": (_q_events_watermark_late, _WM_LATE_ORACLE),
    "kg_negative_samples": (_q_kg_negative_samples, _NEGSAMPLE_ORACLE),
    "doc_length_outliers": (_q_doc_length_outliers, _MAD_ORACLE),
    "doc_top_terms": (_q_doc_top_terms, _TOPTERMS_ORACLE),
    "doc_length_percentiles": (_q_doc_length_percentiles, _PCT_ORACLE),
    "web_host_gini": (_q_web_host_gini, _GINI_ORACLE),
    "web_host_linkrank": (
        _q_web_host_linkrank,
        _weighted_pagerank_oracle(
            WPAGERANK_ITERS,
            WPR_SCALE,
            prefix="",  # _HOST_LINKS_SQL reads documents directly
            wedges_sql=_HOST_LINKS_SQL,
            key_alias="host",
        ),
    ),
    "kg_graph_scc": (_q_kg_graph_scc, _scc_oracle()),
    "train_interleave_order": (
        _q_train_interleave_order,
        _INTERLEAVE_ORACLE,
    ),
    "dedup_url_recrawl": (_q_dedup_url_recrawl, _URL_RECRAWL_ORACLE),
    "kg_graph_modularity": (_q_kg_graph_modularity, _modularity_oracle()),
    "train_per_source_sample": (
        _q_train_per_source_sample,
        _PERSRC_ORACLE,
    ),
    "train_packing_manifest": (
        _q_train_packing_manifest,
        _PACKING_ORACLE,
    ),
    "multimodal_audio_frames": (
        _q_multimodal_audio_frames,
        _AUDIO_FRAMES_ORACLE,
    ),
}


# ---------------------------------------------------------------------------
# driver-gate ordering
# ---------------------------------------------------------------------------
# The round driver checks the FIRST 50 registry entries against their
# DuckDB oracles (list(QUERIES)[:50], insertion order). Rounds 1-3
# always presented the same first 50, so the 36 entries registered
# later never received a driver correctness row (round-3 verdict #1).
# Since round 4 the window ROTATES: _DRIVER_WINDOWS records each
# round's 50 (history kept so the union invariant is testable — every
# registered query must have a driver row no older than ceil(N/50)
# rounds, the tightest freshness any schedule can guarantee at 50
# rows/round (two windows while N <= 100; LRU rotation achieves the
# bound for any N); enforced by
# tests/test_queries_oracle.py::test_driver_window_union_invariant,
# plus _MUST_REGATE below for semantics-changed queries whose old
# rows gate outputs that no longer exist).
# The local sweep covers all entries cell-exact regardless of order;
# this block only chooses WHICH 50 the driver anchors each round.

_DRIVER_WINDOWS: dict[int, list[str]] = {
    4: [
        # never driver-checked before round 4 (36)
        "corpus_source_stats",
        "embed_label_centroids",
        "kg_graph_nodes",
        "kg_graph_edges",
        "kg_graph_pagerank",
        "kg_graph_triangles",
        "kg_graph_two_hop",
        "merge_runs_union",
        "train_sample_hash",
        "train_stratified_quality",
        "token_budget_shards",
        "dedup_exact_keep_best",
        "web_url_canonical",
        "web_domain_stats",
        "web_boilerplate_ngrams",
        "web_boilerplate_ratio",
        "tpch_small_quantity_revenue",
        "events_asof_purchase",
        "events_interval_overlap",
        "doc_length_deciles",
        "events_rollup_cascade",
        "kg_sql_surface",
        "doc_rarity_idf",
        "events_funnel",
        "events_retention_hourly",
        "text_bigram_lm",
        "search_bm25_lite",
        "index_postings_rare",
        "kg_graph_node_jaccard",
        "corpus_contamination",
        "profile_orders_columns",
        "tpch_priority_late_ship",
        "train_corpus_curated",
        "tpch_cust_order_distribution",
        "kg_entity_trend",
        "dedup_minhash_verified",
        # new in round 4
        "kg_graph_degree_dist",
        "train_mixture_tokens",
        "dedup_containment",
        "doc_lm_score",
        "kg_graph_pagerank_weighted",
        "doc_sentence_dup_ratio",
        "web_url_features",
        "multimodal_frame_sample",
        # veteran anchors
        "kg_triple_counts",
        "kg_entity_frequency",
        "kg_id_frequency",
        "dedup_minhash_pairs",
        "dedup_components",
        "eval_band_pr",
    ],
    5: [
        # red in round 4 (array-output reshape) — re-gate first
        "embed_label_centroids",
        # new in round 5 (never had a driver row)
        "dedup_epoch_incremental",
        # rotated out of the r4 window (driver-green r1-r3; their most
        # recent row is two rounds old — the union invariant requires
        # them back under the gate this round): the full KG chain ...
        "kg_tokens",
        "kg_sentences",
        "kg_mentions",
        "kg_linked",
        "kg_new_entities",
        "kg_triples",
        "kg_entity_search",
        "kg_doc_term_freq",
        "kg_batch_counters",
        "kg_cooccur_pmi",
        # ... the TPC-H relational spine ...
        "tpch_pricing_summary",
        "tpch_revenue_by_nation",
        "tpch_profit_by_nation_year",
        "tpch_semi_join_customers",
        "tpch_anti_join_customers",
        "tpch_topk_orders_per_segment",
        "tpch_running_total",
        "tpch_rollup_revenue",
        # ... events/sessionization ...
        "events_latest_per_user",
        "events_sessionize",
        "events_tumbling_hourly",
        "events_error_band_join",
        "events_type_pivot",
        "events_props_json",
        # ... dedup + text-quality families ...
        "dedup_exact",
        "dedup_jaccard",
        "dedup_simhash",
        "dedup_embedding_cosine",
        "doc_quality_scores",
        "lang_id_stopword",
        "doc_fingerprint",
        "doc_repetition",
        "token_count_estimate",
        # ... embeddings/ANN ...
        "embed_knn_bruteforce",
        "embed_ivf_knn",
        "embed_lsh_buckets",
        "embed_lsh_knn",
        # ... NER-UDF / merge / sinks / multimodal ...
        "multimodal_blob_meta",
        "ner_udf_surface_counts",
        "ner_udf_ngram_mentions",
        "split_udf_passthrough",
        "merge_conflicts_resolved",
        "postprocess_sep_merge",
        "pubtator_rebase",
        # new in round 5, batch 2 (sliding windows, integer anomaly,
        # bounded k-core peel)
        "events_sliding_window_users",
        "events_hourly_anomaly",
        "kg_graph_kcore",
        # new in round 5, batch 3 (community detection; takes the slot
        # of veteran anchor kg_triple_counts — green r4, so the union
        # invariant still covers it via the previous window)
        "kg_graph_label_prop",
    ],
    # ROUND 6 NOTE: kg_graph_two_hop and index_postings_rare were
    # de-vacuoused late in round 5 (backbone / bottom-k semantics);
    # their r4 driver rows gated the OLD vacuous outputs, and window 5
    # was already saturated (|w4 ∪ w5| == all 99 registered queries, so
    # no eviction candidate existed). Both should take window-6 slots —
    # that is when the rewritten semantics first meet the driver. Until
    # then they are covered by the local cell-exact sweep at
    # sf0.001/0.01.
    #
    # CAPACITY MATH for the round-6 rotation: registering the
    # PENDING_R6 queries pushes N past 100, where a strict two-window
    # freshness rule is unsatisfiable (the driver grants 50 rows per
    # round, so no schedule can gate N > 100 queries within two
    # rounds). The union-invariant test therefore checks a
    # ceil(N / 50)-round horizon — the information-theoretic bound,
    # achieved by LRU rotation. Window 6 = all PENDING_R6 names (new
    # queries have no prior row) + the two de-vacuoused reruns + LRU
    # veterans from window 4's list; the remaining w4-only veterans
    # rotate in at round 7 inside the 3-round horizon.
}

# Queries whose registered semantics changed AFTER their newest driver
# row (de-vacuoused late in round 5): their old rows gate outputs that
# no longer exist, so their next window appearance is MANDATORY — the
# horizon test alone would count the stale rows as valid evidence. The
# union-invariant test enforces each entry once its round's window is
# authored.
_MUST_REGATE: dict[int, list[str]] = {
    6: ["kg_graph_two_hop", "index_postings_rare"],
}

_DRIVER_ROUND = max(_DRIVER_WINDOWS)
_DRIVER_PRIORITY = _DRIVER_WINDOWS[_DRIVER_ROUND]


def _apply_driver_order() -> None:
    missing = [n for n in _DRIVER_PRIORITY if n not in QUERIES]
    if missing:
        # not assert: stripped under python -O, and a typo'd name must
        # fail loudly, not silently shrink the driver window (ADVICE r4)
        raise ValueError(f"_DRIVER_PRIORITY names unknown queries: {missing}")
    order = _DRIVER_PRIORITY + [n for n in QUERIES if n not in _DRIVER_PRIORITY]
    for reg in (QUERIES, ORACLES):
        snap = dict(reg)
        reg.clear()
        reg.update({n: snap[n] for n in order if n in snap})


_apply_driver_order()
