"""Source loaders (S1/S3/S5/S6), entity search (P5), error diff (P6),
legacy IOB utilities (F6/F7/N5)."""

import os

import pytest
from pyspark.sql import functions as F

from easyner_spark.legacy_iob import co_occurrence_from_iob, detokenize
from easyner_spark.ops.search import search_sentences, tag_diff_spans
from easyner_spark.sources.loaders import (
    batch_json_scan,
    cord_csv_loader,
    freetext_loader,
    pubmed_efetch_source,
)


def test_cord_loader_precedence_and_subset(spark, tmp_path):
    csv = tmp_path / "metadata.csv"
    csv.write_text(
        "cord_uid,doi,pmcid,pubmed_id,mag_id,who_covidence_id,arxiv_id,title,abstract\n"
        "UID1,10.1/x,,,,,,T one,A one\n"
        ",10.2/y,,,,,,T two,A two\n"
        "UID3,,,,,,,T three,\n"          # empty abstract → dropped
        ",,,,,,,T four,A four\n"          # no ids → sha256(title)
    )
    docs = cord_csv_loader(spark, str(csv)).collect()
    by_title = {r["title"]: r["doc_id"] for r in docs}
    assert by_title["T one"] == "UID1"          # cord_uid wins
    assert by_title["T two"] == "10.2/y"        # doi fallback
    assert "T three" not in by_title            # dropped
    assert len(by_title["T four"]) == 64        # sha256 fallback
    # subset semi-filter (case-insensitive uid)
    subset = spark.createDataFrame([("uid1",)], "uid string")
    only = cord_csv_loader(spark, str(csv), subset_uids=subset).collect()
    assert [r["title"] for r in only] == ["T one"]


def test_freetext_loader(spark, tmp_path):
    (tmp_path / "a_first.txt").write_text("line one\n  line two  \n")
    (tmp_path / "b_second.txt").write_text("only line\n")
    docs = {r["doc_id"]: r for r in freetext_loader(spark, str(tmp_path / "*.txt")).collect()}
    assert docs["doc_0"]["title"] == "a_first"
    assert docs["doc_0"]["text"] == "line one line two"  # stripped + joined
    assert docs["doc_1"]["title"] == "b_second"


def test_batch_json_scan_and_range(spark, tmp_path):
    for i in range(4):
        (tmp_path / f"corpus-split-{i}.json").write_text(
            '{"doc_id": "d%d", "text": "t%d"}\n' % (i, i)
        )
    df = batch_json_scan(spark, str(tmp_path))
    assert sorted(r["batch_id"] for r in df.collect()) == [0, 1, 2, 3]
    ranged = batch_json_scan(spark, str(tmp_path), batch_range=(1, 2))
    assert sorted(r["batch_id"] for r in ranged.collect()) == [1, 2]


def test_efetch_is_gated():
    with pytest.raises(NotImplementedError):
        pubmed_efetch_source()


def test_search_sentences_case_sensitive(spark):
    sents = spark.createDataFrame(
        [("d1", 0, "has ACE2"), ("d1", 1, "has ace2 lowercase"), ("d2", 0, "none")],
        "doc_id string, sent_idx int, text string",
    )
    mentions = spark.createDataFrame(
        [("d1", 0, "ACE2"), ("d1", 1, "ace2")],
        "doc_id string, sent_idx int, surface string",
    )
    hits = search_sentences(sents, mentions, ["ACE2"]).collect()
    assert [(r["doc_id"], r["sent_idx"]) for r in hits] == [("d1", 0)]


def test_tag_diff_spans():
    assert tag_diff_spans(["O", "B", "I", "O"], ["O", "B", "O", "O"]) == [(2, 3)]
    assert tag_diff_spans(["B", "B"], ["O", "O"]) == [(0, 2)]
    assert tag_diff_spans(["O"], ["O"]) == []
    with pytest.raises(ValueError):
        tag_diff_spans(["O"], ["O", "O"])


def test_detokenize_wordpiece_merge():
    pairs = [("Auto", "B"), ("##phagy", "X"), ("is", "O")]
    assert detokenize(pairs) == [("B", "Autophagy"), ("O", "is")]


def test_co_occurrence_from_iob():
    pairs = [
        ("B", "ACE2"), ("O", "binds"), ("B", "spike"), ("I", "protein"), ("O", "."),
    ]
    out = co_occurrence_from_iob(pairs)
    assert out["hasCoOccurrence"] is True
    assert out["entities"] == ["ACE2", "spike protein"]
    assert out["text"] == "ACE2 binds spike protein."
