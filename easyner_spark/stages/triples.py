"""Stage 7 — triple emission: linked mentions (+ sentences) → triples.

Reference analog: scripts/entity_parser.py:19-54 — a sentence
"co-occurs" when it holds ≥2 entities (line 41-42); the reference only
flags it. Here co-occurrence becomes real (subj, pred, obj) triples:
every ordered mention pair within a sentence, plus typed predicates
from pattern rules over the text BETWEEN the two mentions (the
pattern-rule extension mandated by the target contract).

Plan shape: a self-equi-join of mentions on (doc_id, sent_idx) with
``mention_idx < mention_idx`` — Catalyst turns this into one shuffle
on the compound key (or none if mentions are already partitioned by
doc_id); the predicate rules are pure JVM string ops on the sentence
slice, no UDF. Fan-out is quadratic in mentions-per-sentence, which is
bounded (sentences are short); ``max_pairs_per_sentence`` caps
pathological rows at web scale (degree capping — SURVEY.md §7
"what's hard").
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# ordered pattern rules: first match on the inter-mention gap text wins
PATTERN_RULES: list[tuple[str, str]] = [
    (" can cause ", "causes"),
    (" causes ", "causes"),
    (" caused ", "causes"),
    (" binds to ", "binds_to"),
    (" reduced ", "reduces"),
    (" reduces ", "reduces"),
    (" suppress ", "suppresses"),
    (" interacts with ", "interacts_with"),
    (" mediates entry of ", "mediates_entry_of"),
    (" detected together with ", "detected_with"),
]
DEFAULT_PRED = "co_occurs_with"


def _gap_pred(gap_col):
    expr = F.lit(DEFAULT_PRED)
    for pat, pred in reversed(PATTERN_RULES):
        expr = F.when(gap_col.contains(pat), F.lit(pred)).otherwise(expr)
    return expr


def cooccurrence_triples(
    linked: DataFrame,
    sentences: DataFrame,
    subj_col: str = "ent_name",
    max_mentions_per_sentence: int | None = 32,
) -> DataFrame:
    """→ triples(subj, pred, obj, doc_id, sent_idx, batch_id).

    subj/obj are taken from ``subj_col`` (canonical name by default, so
    triples compare against the reference's surface-level co-occurrence
    entity lists at P/R level). Pairs are ordered by mention position:
    subj is the earlier mention (entity_parser.py builds its entity
    list in sentence order).

    Degree cap: mentions beyond ``max_mentions_per_sentence`` (by
    mention_idx) are dropped BEFORE pairing — a stateless filter that
    bounds fan-out at cap²/2 per sentence without the per-pair
    row_number window (which costs an extra full shuffle+sort of the
    pair set; measured 1.5× slower at 600k docs). Entity-stuffed pages
    at web scale hit the cap; normal sentences never do.
    """
    m = linked.select(
        "doc_id",
        "batch_id",
        "sent_idx",
        "mention_idx",
        F.col(subj_col).alias("ent"),
        "begin",
        "end",
    )
    if max_mentions_per_sentence is not None:
        m = m.filter(F.col("mention_idx") < max_mentions_per_sentence)
    a = m.alias("a")
    b = m.alias("b")
    pairs = a.join(
        b,
        (F.col("a.doc_id") == F.col("b.doc_id"))
        & (F.col("a.sent_idx") == F.col("b.sent_idx"))
        & (F.col("a.mention_idx") < F.col("b.mention_idx")),
    )

    sent = sentences.select(
        F.col("doc_id").alias("s_doc_id"),
        F.col("sent_idx").alias("s_sent_idx"),
        F.col("text").alias("sent_text"),
    )
    # gap text between the two mentions: JVM substring, no UDF
    gap = F.expr(
        "substring(sent_text, a.`end` + 2, greatest(b.begin - a.`end` - 1, 0))"
    )
    return (
        pairs.join(
            sent,
            (F.col("a.doc_id") == F.col("s_doc_id"))
            & (F.col("a.sent_idx") == F.col("s_sent_idx")),
        )
        .select(
            F.col("a.ent").alias("subj"),
            _gap_pred(gap).alias("pred"),
            F.col("b.ent").alias("obj"),
            F.col("a.doc_id").alias("doc_id"),
            F.col("a.sent_idx").alias("sent_idx"),
            F.col("a.batch_id").alias("batch_id"),
        )
    )
