"""Unit tests for the deterministic text leaf functions."""

import pytest
from hypothesis import given, settings, strategies as st

from easyner_spark.textops import (
    GazetteerIndex,
    extract_html,
    match_terms,
    match_terms_batch,
    normalize_text,
    split_sentences,
    tokenize,
)


def test_normalize_squashes_whitespace():
    assert normalize_text("  a\n\nb\t c\n") == "a b c"


def test_extract_html_deterministic_and_clean():
    html = (
        b"<html><head><title>T &amp; U</title><style>p{}</style></head>"
        b"<body><h1>T</h1><p>Hello world.</p><p>Second para.</p>"
        b"<script>var x=1;</script></body></html>"
    )
    t1 = extract_html(html)
    t2 = extract_html(html)
    assert t1 == t2
    title, text = t1
    assert title == "T & U"
    assert "var x" not in text and "<" not in text
    assert "Hello world." in text and "Second para." in text


def test_split_sentences_basic():
    s = split_sentences("First one. Second one! Third? Last")
    assert s == ["First one.", "Second one!", "Third?", "Last"]


def test_split_sentences_abbrev_and_initials():
    text = "Dr. Chen et al. reported results, e.g. fever. A second sentence."
    s = split_sentences(text)
    assert s == ["Dr. Chen et al. reported results, e.g. fever.", "A second sentence."]


def test_split_sentences_decimals_not_split():
    assert split_sentences("Dose was 2.5 mg daily. Next.") == [
        "Dose was 2.5 mg daily.",
        "Next.",
    ]


GAZ = [
    ("coronavirus", "species"),
    ("novel coronavirus", "species"),
    ("SARS-CoV-2", "species"),
    ("mast cells", "cell"),
]


def test_match_terms_overlapping_and_spans():
    idx = GazetteerIndex.build(GAZ)
    sent = "The novel coronavirus binds SARS-CoV-2 in mast cells."
    got = match_terms(sent, idx)
    surfaces = [(g[0], g[1], g[2]) for g in got]
    # both 'novel coronavirus' and the nested 'coronavirus' must be emitted
    assert ("novel coronavirus", 4, 20) in surfaces
    assert ("coronavirus", 10, 20) in surfaces
    assert ("SARS-CoV-2", 28, 37) in surfaces
    assert ("mast cells", 42, 51) in surfaces
    # spans are inclusive: surface == slice check
    for surf, b, e in surfaces:
        assert sent[b : e + 1] == surf


def test_match_case_insensitive_token_boundary():
    idx = GazetteerIndex.build(GAZ)
    assert match_terms("CORONAVIRUS rules", idx)[0][0] == "CORONAVIRUS"
    # no sub-token matches
    assert match_terms("acoronavirus rules", idx) == []


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.text(
            alphabet=" .!?-'aAbB12coronavirusmastcellsé",
            min_size=0,
            max_size=60,
        ),
        min_size=0,
        max_size=8,
    )
)
def test_batch_matcher_parity_with_single(sents):
    """The vectorized batch matcher must equal the sequential matcher."""
    idx = GazetteerIndex.build(GAZ)
    batch = match_terms_batch(sents, idx)
    single = [match_terms(s, idx) for s in sents]
    assert batch == single


def test_tokenize_offsets():
    toks = tokenize("ab  cd-ef")
    assert toks == [("ab", 0, 2), ("cd", 4, 6), ("ef", 7, 9)]
