"""P5 — entity search / result inspection, and P6 — error diffing.

Reference analogs:
* P5 — scripts/search.py:30-53: emit a sentence when any query term is
  EXACTLY contained (case-sensitive) in its entity list.
* P6 — scripts/error_detection.py:8-96: align gold/pred IOB2 token
  streams and emit the token spans where the tag sequences differ.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def search_sentences(
    sentences: DataFrame, mentions: DataFrame, terms: list[str]
) -> DataFrame:
    """Sentences whose mention surfaces exactly contain any query term
    (case-sensitive membership — search.py:47-51). Broadcast-semi-join
    shape: terms → filter on the mentions table → semi-join sentences."""
    hits = (
        mentions.filter(F.col("surface").isin(terms))
        .select("doc_id", "sent_idx")
        .distinct()
    )
    return sentences.join(hits, ["doc_id", "sent_idx"], "left_semi")


def tag_diff_spans(
    pred_tags: list[str], gold_tags: list[str]
) -> list[tuple[int, int]]:
    """P6 (pure): [start, end_exclusive) token runs where pred != gold.
    Raises on length mismatch (error_detection.py:24-30 zip contract)."""
    if len(pred_tags) != len(gold_tags):
        raise ValueError("pred/gold token streams misaligned")
    spans = []
    start = None
    for i, (p, g) in enumerate(zip(pred_tags, gold_tags)):
        if p != g:
            if start is None:
                start = i
        elif start is not None:
            spans.append((start, i))
            start = None
    if start is not None:
        spans.append((start, len(pred_tags)))
    return spans
