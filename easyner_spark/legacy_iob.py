"""Legacy IOB-label utilities (ONNX NER path compatibility).

Reference analogs:
* F7 — WordPiece de-tokenization: subword pieces labeled 'X' merge
  into the preceding word (scripts/entity_parser.py:4-16).
* N5/F6 — co-occurrence extraction from (label, word) streams with the
  reference's normalization quirks: ' - '→'-', ' , '→',' inside
  entities, and the detokenizer punctuation fixes on the sentence text
  (scripts/entity_parser.py:19-54).

These pure functions exist for parity with the reference's legacy
ONNX path (scripts/ner_inference.py); the modern engine path emits
span-based mentions instead (stages/ner_dict.py, stages/ner_model.py).
Kept driver-side / test-harness — never in the distributed hot path.
"""

from __future__ import annotations

_PUNCT_FIXES = [
    (" .", "."),
    (" ,", ","),
    (" - ", "-"),
    ("( ", "("),
    (" )", ")"),
    (" :", ":"),
    (" ;", ";"),
    (" !", "!"),
    (" ?", "?"),
]


def detokenize(token_label_pairs: list[tuple[str, str]]) -> list[tuple[str, str]]:
    """F7: merge 'X'-labeled WordPiece pieces (``##foo``) into the
    preceding word; returns (label, word) pairs."""
    words: list[str] = []
    labels: list[str] = []
    for token, label in token_label_pairs:
        if "X" in label and words:
            words[-1] = words[-1] + token[2:]
        else:
            words.append(token)
            labels.append(label)
    return list(zip(labels, words))


def co_occurrence_from_iob(label_word_pairs: list[tuple[str, str]]) -> dict:
    """N5: build the entity list from B/I/O labels; a sentence
    'co-occurs' when it holds >= 2 entities; sentence text is
    re-assembled with the reference's punctuation fixes."""
    entities: list[str] = []
    current = ""
    inside = False
    for label, word in label_word_pairs:
        if "B" in label:
            current = current + word
            inside = True
        elif inside:
            if "I" in label:
                current = current + " " + word
            elif "O" in label:
                inside = False
                current = current.replace(" - ", "-").replace(" , ", ",")
                entities.append(current)
                current = ""
    text = " ".join(w for _, w in label_word_pairs)
    for a, b in _PUNCT_FIXES:
        text = text.replace(a, b)
    return {
        "hasCoOccurrence": len(entities) >= 2,
        "entities": entities,
        "text": text,
    }
