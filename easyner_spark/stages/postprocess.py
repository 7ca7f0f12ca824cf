"""F8 — separator-merge post-processing of model-path mentions.

Reference analog:
supplementary/experiment_scripts/postprocess_separator_merging.py:24-119
— five span-extension rules around the separators ``- ( ) [ ] { }``
applied per sentence to EXCLUSIVE-end spans (the BioBERT path
convention, scripts/ner_biobert.py:192-194):

1. mention starting with a separator merges LEFT into an adjacent
   mention (no gap between spans);
2. otherwise its start extends left through the text until whitespace
   or ``.,:;`` punctuation;
3. mention ending with a separator merges RIGHT into an adjacent
   mention;
4. otherwise its end extends right the same way;
5. two mentions separated by exactly one separator character merge;
finally spans identical-with/contained-in another are removed.

Implemented as one pure sweep (unit-testable) + an ``applyInPandas``
wrapper over (doc_id, sent_idx) groups, mirroring the engine's J3
pattern. Only sentences that contain a separator character near a
mention boundary ever need the sweep — the wrapper prefilters with a
cheap JVM predicate so clean sentences bypass the grouped shuffle.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F

SEPARATORS = "-()[]{}"
_STOP_RE = re.compile(r"[\s.,:;\n]")


def merge_separated_py(
    entities: list[str], spans: list[tuple[int, int]], text: str
) -> tuple[list[str], list[tuple[int, int]]]:
    """Pure re-implementation of the reference's 5-rule sweep.

    ``spans`` use EXCLUSIVE ends. Returns new (entities, spans).
    """
    ents = list(entities)
    sps = [list(s) for s in spans]

    i = len(ents) - 1
    while i >= 0:
        ent = ents[i]
        for sep in SEPARATORS:
            if i < len(ents) and ents[i].startswith(sep):
                if i > 0 and sps[i - 1][1] == sps[i][0]:
                    # rule 1: merge left into adjacent mention
                    ents[i - 1] = ents[i - 1] + ents[i]
                    sps[i - 1] = [sps[i - 1][0], sps[i][1]]
                    if not ents[i].endswith(sep):
                        del ents[i]
                        del sps[i]
                else:
                    # rule 2: extend left through the raw text
                    start = sps[i][0]
                    while start > 0 and not _STOP_RE.match(text[start - 1]):
                        start -= 1
                    ents[i] = text[start : sps[i][1]]
                    sps[i] = [start, sps[i][1]]
            if i < len(ents) and ents[i].endswith(sep):
                if i + 1 < len(ents) and sps[i][1] == sps[i + 1][0]:
                    # rule 3: merge right into adjacent mention
                    ents[i] = ents[i] + ents[i + 1]
                    sps[i] = [sps[i][0], sps[i + 1][1]]
                    del ents[i + 1]
                    del sps[i + 1]
                else:
                    # rule 4: extend right through the raw text
                    end = sps[i][1]
                    while end < len(text) and not _STOP_RE.match(text[end]):
                        end += 1
                    ents[i] = text[sps[i][0] : end]
                    sps[i] = [sps[i][0], end]
            ent = ents[i] if i < len(ents) else ""
        i -= 1

    # rule 5: merge mentions separated by exactly one separator char
    i = len(ents) - 1
    while i >= 1:
        gap_pos = sps[i - 1][1]
        if sps[i][0] - 1 == gap_pos and gap_pos < len(text):
            if text[gap_pos] in SEPARATORS:
                ents[i - 1] = ents[i - 1] + text[gap_pos] + ents[i]
                sps[i - 1] = [sps[i - 1][0], sps[i][1]]
                del ents[i]
                del sps[i]
        i -= 1

    # containment cleanup
    i = len(sps) - 1
    while i > 0:
        for j in range(len(sps)):
            if j != i and sps[i][0] >= sps[j][0] and sps[i][1] <= sps[j][1]:
                del ents[i]
                del sps[i]
                break
        i -= 1
    return ents, [tuple(s) for s in sps]


def merge_separated(mentions: DataFrame, sentences: DataFrame) -> DataFrame:
    """DF wrapper: mentions (exclusive-end model path) + sentences →
    post-processed mentions. Sentences without separators bypass.

    Grouping is per (doc_id, sent_idx, class, source) — the reference
    runs the sweep over one per-class NER output file at a time
    (postprocess_separator_merging.py processes a single model's
    files), so mentions of DIFFERENT classes never merge with each
    other and each swept row keeps its own class/source.
    """
    sent = sentences.select("doc_id", "sent_idx", F.col("text").alias("sent_text"))
    m = mentions.join(sent, ["doc_id", "sent_idx"])
    has_sep = F.col("sent_text").rlike(r"[-()\[\]{}]")
    clean = m.filter(~has_sep)
    dirty = m.filter(has_sep)

    schema = (
        "doc_id string, batch_id int, sent_idx int, surface string, "
        "begin int, end int, class string, source string"
    )

    group_keys = ["doc_id", "sent_idx", "class", "source"]

    def sweep(pdf: pd.DataFrame) -> pd.DataFrame:
        out = []
        for _, grp in pdf.groupby(group_keys, sort=False):
            grp = grp.sort_values(["begin", "end"])
            text = grp["sent_text"].iloc[0]
            ents, sps = merge_separated_py(
                grp["surface"].tolist(),
                list(zip(grp["begin"], grp["end"])),
                text,
            )
            base = grp.iloc[0]
            for e, (b, en) in zip(ents, sps):
                out.append(
                    {
                        "doc_id": base["doc_id"],
                        "batch_id": base["batch_id"],
                        "sent_idx": base["sent_idx"],
                        "surface": e,
                        "begin": b,
                        "end": en,
                        "class": base["class"],
                        "source": base["source"],
                    }
                )
        return pd.DataFrame(
            out,
            columns=[
                "doc_id",
                "batch_id",
                "sent_idx",
                "surface",
                "begin",
                "end",
                "class",
                "source",
            ],
        )

    swept = dirty.groupBy(*group_keys).applyInPandas(sweep, schema)
    out = clean.select(
        "doc_id", "batch_id", "sent_idx", "surface", "begin", "end", "class", "source"
    ).unionByName(swept)
    # class/source in the ordering: same-span mentions of different
    # classes would otherwise get nondeterministic indices across runs
    # (merge.resolve_conflicts orders its equivalent window the same way)
    w = Window.partitionBy("doc_id", "sent_idx").orderBy(
        "begin", "end", "class", "source"
    )
    return out.withColumn("mention_idx", F.row_number().over(w) - 1)
