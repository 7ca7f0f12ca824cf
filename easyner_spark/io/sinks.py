"""Export sinks: PubTator text (S9) and analysis TSV (S8).

Reference analogs:
* S9 — supplementary/experiment_scripts/
  convert_easyner_output_json_to_pubtator.py:34-57,95-130: per article
  emit ``pmid|t|title``, ``pmid|a|abstract`` and one
  ``pmid TAB start TAB end TAB surface TAB class TAB -1`` line per
  mention, with sentence-local offsets RE-BASED to abstract offsets by
  the cumulative ``len(sent)+1`` of preceding sentences. The running
  sum is a window aggregate (W2, SURVEY.md §2.5) — pure JVM.
* S8 — scripts/analysis.py:191-204: pandas ``to_csv(sep='\\t')`` of the
  (small) frequency aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def rebase_mention_offsets(
    mentions: DataFrame, sentences: DataFrame
) -> DataFrame:
    """Sentence-local (begin, end INCLUSIVE) → document-level offsets.

    offset(doc, sent_idx) = sum(length(text)+1) over sentences with
    smaller sent_idx (reference cumulative span logic,
    convert_easyner_output_json_to_pubtator.py:41-57).
    """
    w = (
        Window.partitionBy("doc_id")
        .orderBy("sent_idx")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = sentences.select(
        "doc_id",
        "sent_idx",
        F.coalesce(F.sum(F.length("text") + 1).over(w), F.lit(0)).alias("base"),
    )
    return mentions.join(offsets, ["doc_id", "sent_idx"]).select(
        mentions["*"],
        (F.col("begin") + F.col("base")).alias("doc_begin"),
        (F.col("end") + F.col("base")).alias("doc_end"),
    )


def pubtator_lines(
    documents: DataFrame, sentences: DataFrame, mentions: DataFrame
) -> DataFrame:
    """→ one-column DF of PubTator lines, ordered per document as
    title / abstract / span lines / blank. Distributed end-to-end: the
    document body is rebuilt from sentences with a sort-free array
    aggregation, the span lines via the W2 window; final per-doc block
    assembly is a single groupBy."""
    abstracts = sentences.groupBy("doc_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("sent_idx", "text"))),
                lambda s: s["text"],
            ),
            " ",
        ).alias("abstract")
    )
    rebased = rebase_mention_offsets(mentions, sentences)
    span_lines = rebased.groupBy("doc_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.struct("doc_begin", "doc_end", "surface", "class", "doc_id")
                    )
                ),
                # PubTator uses exclusive ends: inclusive end + 1
                lambda s: F.concat_ws(
                    "\t",
                    s["doc_id"],
                    s["doc_begin"].cast("string"),
                    (s["doc_end"] + 1).cast("string"),
                    s["surface"],
                    s["class"],
                    F.lit("-1"),
                ),
            ),
            "\n",
        ).alias("spans")
    )
    blocks = (
        documents.select("doc_id", "title")
        .join(abstracts, "doc_id", "left")
        .join(span_lines, "doc_id", "left")
        .select(
            "doc_id",
            F.concat_ws(
                "\n",
                F.concat(F.col("doc_id"), F.lit("|t|"), F.coalesce("title", F.lit(""))),
                F.concat(F.col("doc_id"), F.lit("|a|"), F.coalesce("abstract", F.lit(""))),
                F.coalesce("spans", F.lit("")),
            ).alias("block"),
        )
    )
    return blocks.select("doc_id", F.concat(F.col("block"), F.lit("\n")).alias("block"))


def write_pubtator(
    documents: DataFrame, sentences: DataFrame, mentions: DataFrame, path: str
) -> None:
    """Write PubTator blocks as text (one part per partition; coalesce(1)
    for a single file in test mode)."""
    pubtator_lines(documents, sentences, mentions).orderBy("doc_id").select(
        "block"
    ).coalesce(1).write.mode("overwrite").text(path)


def write_tsv(df: DataFrame, path: str) -> None:
    """S8: small aggregate → driver-side TSV (reference uses pandas
    to_csv on the collected aggregate, analysis.py:191-204)."""
    pdf = df.toPandas()
    for c in pdf.columns:
        if pdf[c].map(lambda v: isinstance(v, dict)).any():
            pdf[c] = pdf[c].map(str)
    pdf.to_csv(path, sep="\t", index=False)
