"""Stage 2 — sentence splitting: documents → sentences.

Reference analog: scripts/splitter.py:13-26 (NLTK punkt / spaCy over
the abstract; title kept separate and never split,
scripts/splitter.py:49-67). The reference reloads the spaCy model per
TEXT (splitter.py:20) — the acknowledged ≈1.1K chars/s bottleneck
(BASELINE.md); here the splitter is a stateless regex UDF, vectorized
over Arrow batches, and the per-doc sentence list is flattened with
``posexplode`` so ``sent_idx`` is the within-document position
(reference: enumerate at scripts/ner_main.py:163-170).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

from ..textops import split_sentences


@F.pandas_udf(T.ArrayType(T.StringType()))
def _split_udf(text: pd.Series) -> pd.Series:
    return text.map(lambda t: split_sentences(t) if t else [])


def split_documents(documents: DataFrame) -> DataFrame:
    """documents → sentences(doc_id, batch_id, sent_idx, text).

    ``posexplode`` keeps the splitter's emission order as ``sent_idx``
    without a window/shuffle — order is derived inside the row, so the
    plan stays narrow (no exchange) until the next stage needs one.
    """
    return documents.select(
        "doc_id",
        "batch_id",
        F.posexplode(_split_udf("text")).alias("sent_idx", "text"),
    )
