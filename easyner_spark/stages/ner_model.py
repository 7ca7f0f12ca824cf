"""Stage 3b — transformer NER: sentences → mentions (model path).

Reference analog: scripts/ner_biobert.py — an HF token-classification
pipeline (aggregation_strategy="max", FP16 on GPU) run over sentence
batches of ``sentence_batch_size`` (ner_biobert.py:50-58,161-165), the
model loaded ONCE per worker process (ner_biobert.py:62-66). Span
convention on this path is EXCLUSIVE end straight from the HF pipeline
(ner_biobert.py:192-194) and surfaces are lowercased by the uncased
tokenizer (comment scripts/ner_main.py:120).

Spark shape: ``mapInPandas`` — the executor-side generator initializes
the model lazily as a module-level singleton (the Spark analog of the
reference's Pool initializer) and consumes whole Arrow batches, sized
via spark.sql.execution.arrow.maxRecordsPerBatch ≈ the reference's
sentence_batch_size. GPU clusters set spark.task.resource.gpu.amount;
device placement stays executor-local inside the UDF.

transformers/torch are NOT in this container, so the model factory is
gated behind an import-try; tests run the deterministic fake tagger,
which exercises every piece of real plumbing (schema, batch iteration,
span convention, lowercasing) except the matrix multiply.
"""

from __future__ import annotations

import hashlib
import re
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F

# (word, start, end_exclusive, class, score) per sentence
TaggerFn = Callable[[list[str]], list[list[tuple[str, int, int, str, float]]]]

_MODEL_CACHE: dict[str, TaggerFn] = {}


def _hf_tagger(model_name: str, batch_size: int, fp16: bool) -> TaggerFn:
    """Real HF pipeline factory (unavailable in this image — import-gated).

    Mirrors ner_biobert.py:22-58: token-classification pipeline with
    aggregation_strategy='max'; FP16 when a GPU is visible.
    """
    from transformers import pipeline  # noqa: F401  (import-try gate)
    import torch

    device = 0 if torch.cuda.is_available() else -1
    pipe = pipeline(
        "token-classification",
        model=model_name,
        aggregation_strategy="max",
        device=device,
        torch_dtype=torch.float16 if (fp16 and device >= 0) else None,
    )
    return wrap_hf_pipeline(pipe, batch_size)


def wrap_hf_pipeline(pipe, batch_size: int) -> TaggerFn:
    """Adapt a ready HF token-classification pipeline object to the
    TaggerFn contract (also used by the real-inference smoke test,
    which builds a tiny local pipeline without any network fetch)."""

    def tag(sentences: list[str]):
        outs = pipe(sentences, batch_size=batch_size)
        if sentences and isinstance(outs, dict):
            outs = [outs]
        return [
            [
                (o["word"], int(o["start"]), int(o["end"]), o["entity_group"], float(o["score"]))
                for o in out
            ]
            for out in outs
        ]

    return tag


_FAKE_TOKEN_RE = re.compile(r"[A-Za-z][A-Za-z0-9-]{3,}")


def fake_tagger(sentences: list[str]) -> list[list[tuple[str, int, int, str, float]]]:
    """Deterministic stand-in: tags tokens whose md5 parity selects them,
    classes round-robin by hash — stable across runs/partitions, so the
    plumbing (batching, spans, ordering) is fully testable without
    model weights. Emits EXCLUSIVE-end spans and lowercased surfaces,
    exactly like the uncased HF path it stands in for.
    """
    classes = ["gene", "disease", "chemical"]
    out = []
    for s in sentences:
        ents = []
        for m in _FAKE_TOKEN_RE.finditer(s):
            h = hashlib.md5(m.group(0).lower().encode()).digest()
            if h[0] % 3 == 0:  # deterministic 1/3 selection
                cls = classes[h[1] % len(classes)]
                score = 0.5 + (h[2] / 512)  # 0.5..~1.0, deterministic
                ents.append((m.group(0).lower(), m.start(), m.end(), cls, score))
        out.append(ents)
    return out


def get_tagger(model_name: str, batch_size: int = 500, fp16: bool = True) -> TaggerFn:
    """Per-process lazy singleton (reference: worker initializer pattern,
    ner_biobert.py:62-66). ``model_name='fake'`` → deterministic stub."""
    key = f"{model_name}|{batch_size}|{fp16}"
    if key not in _MODEL_CACHE:
        if model_name == "fake":
            _MODEL_CACHE[key] = fake_tagger
        else:
            try:
                _MODEL_CACHE[key] = _hf_tagger(model_name, batch_size, fp16)
            except ImportError as e:  # transformers/torch not installed
                raise NotImplementedError(
                    "transformers/torch are not available in this image; "
                    "use model_name='fake' for plumbing tests or install "
                    "the HF stack on the cluster"
                ) from e
    return _MODEL_CACHE[key]


def transformer_ner(
    sentences: DataFrame,
    model_name: str = "fake",
    sentence_batch_size: int = 500,
    fp16: bool = True,
    min_score: float = 0.0,
    normalize_spans: bool = True,
    tagger: TaggerFn | None = None,
) -> DataFrame:
    """sentences → mentions(doc_id, batch_id, sent_idx, mention_idx,
    surface, begin, end, class, source='model', score).

    ``normalize_spans=True`` converts the model path's exclusive ends
    to the mentions-table INCLUSIVE convention (end - 1) so downstream
    stages see one convention (SURVEY.md §1.2 span-duality note).

    ``tagger``: explicit tagger callable, cloudpickled to executors
    (custom models / test fixtures); the default resolves
    ``model_name`` via the per-worker lazy singleton cache.
    """

    def infer(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        tag = tagger if tagger is not None else get_tagger(
            model_name, sentence_batch_size, fp16
        )
        for pdf in batches:
            sents = pdf["text"].fillna("").tolist()
            tagged = tag(sents)
            rows = []
            for (_, row), ents in zip(pdf.iterrows(), tagged):
                for k, (word, start, end, cls, score) in enumerate(ents):
                    if score < min_score:
                        continue
                    rows.append(
                        {
                            "doc_id": row["doc_id"],
                            "batch_id": row["batch_id"],
                            "sent_idx": row["sent_idx"],
                            "mention_idx": k,
                            "surface": word,
                            "begin": start,
                            "end": end - 1 if normalize_spans else end,
                            "class": cls,
                            "source": "model",
                            "score": score,
                        }
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id",
                    "batch_id",
                    "sent_idx",
                    "mention_idx",
                    "surface",
                    "begin",
                    "end",
                    "class",
                    "source",
                    "score",
                ],
            )

    schema = (
        "doc_id string, batch_id int, sent_idx int, mention_idx int, "
        "surface string, begin int, end int, class string, source string, "
        "score double"
    )
    return sentences.select("doc_id", "batch_id", "sent_idx", "text").mapInPandas(
        infer, schema
    )
