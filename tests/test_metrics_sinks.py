"""Entity-level P/R (band join, J4/A7), IOB2 metrics (A8), and the
PubTator / TSV export sinks (S8/S9)."""

import glob

import pytest
from pyspark.sql import functions as F

from easyner_spark.metrics import entity_level_pr, iob2_report, iob2_spans, pr_summary
from easyner_spark.io.sinks import rebase_mention_offsets, write_pubtator, write_tsv

MENTION_SCHEMA = "doc_id string, sent_idx int, begin int, end int, class string, surface string"


def test_entity_level_pr_with_tolerance(spark):
    gold = spark.createDataFrame(
        [
            ("d1", 0, 10, 20, "gene", "g1"),
            ("d1", 0, 30, 40, "gene", "g2"),
            ("d2", 0, 5, 9, "chemical", "c1"),
        ],
        MENTION_SCHEMA,
    )
    pred = spark.createDataFrame(
        [
            ("d1", 0, 11, 21, "gene", "g1"),   # off by 1 → TP under ±1
            ("d1", 0, 60, 70, "gene", "gx"),   # FP
            ("d2", 0, 5, 9, "chemical", "c1"),  # exact TP
        ],
        MENTION_SCHEMA,
    )
    per_class = {r["class"]: r for r in entity_level_pr(pred, gold).collect()}
    assert per_class["gene"]["tp"] == 1
    assert per_class["gene"]["fp"] == 1
    assert per_class["gene"]["fn"] == 1
    assert per_class["chemical"]["tp"] == 1 and per_class["chemical"]["fp"] == 0
    s = pr_summary(entity_level_pr(pred, gold))
    assert s["micro"]["precision"] == pytest.approx(2 / 3)
    assert s["micro"]["recall"] == pytest.approx(2 / 3)
    # tolerance 0: the off-by-one match disappears
    strict = {r["class"]: r for r in entity_level_pr(pred, gold, tolerance=0).collect()}
    assert strict["gene"]["tp"] == 0


def test_iob2_spans_and_report():
    tags = ["O", "B-gene", "I-gene", "O", "B-chem"]
    assert iob2_spans(tags) == {(1, 3, "gene"), (4, 5, "chem")}
    rep = iob2_report([tags], [tags])
    assert rep["micro"]["f1"] == 1.0
    rep2 = iob2_report([["O", "B-gene", "O", "O", "O"]], [tags])
    assert rep2["gene"]["precision"] == 0.0  # wrong span boundary
    with pytest.raises(ValueError):
        iob2_report([["O"]], [["O", "O"]])


def test_rebase_offsets_roundtrip(spark):
    # two sentences; mention in the second must land on the same surface
    # in the reconstructed abstract
    sents = spark.createDataFrame(
        [("d1", 0, "First sentence here."), ("d1", 1, "ACE2 binds here.")],
        "doc_id string, sent_idx int, text string",
    )
    mentions = spark.createDataFrame(
        [("d1", 1, 0, 3, "gene", "ACE2")], MENTION_SCHEMA
    )
    out = rebase_mention_offsets(mentions, sents).first()
    abstract = "First sentence here. ACE2 binds here."
    assert abstract[out["doc_begin"] : out["doc_end"] + 1] == "ACE2"


def test_pubtator_export(spark, tmp_path):
    docs = spark.createDataFrame(
        [("d1", "Title One"), ("d2", "Title Two")], "doc_id string, title string"
    )
    sents = spark.createDataFrame(
        [
            ("d1", 0, "First sentence here."),
            ("d1", 1, "ACE2 binds here."),
            ("d2", 0, "Nothing found."),
        ],
        "doc_id string, sent_idx int, text string",
    )
    mentions = spark.createDataFrame(
        [("d1", 1, 0, 3, "gene", "ACE2")], MENTION_SCHEMA
    )
    out = str(tmp_path / "pubtator")
    write_pubtator(docs, sents, mentions, out)
    text = "".join(open(f).read() for f in sorted(glob.glob(out + "/part-*")))
    assert "d1|t|Title One" in text
    assert "d1|a|First sentence here. ACE2 binds here." in text
    assert "d1\t21\t25\tACE2\tgene\t-1" in text  # exclusive end, rebased
    assert "d2|t|Title Two" in text


def test_tsv_sink(spark, tmp_path):
    df = spark.createDataFrame([("a", 2), ("b", 1)], "k string, n int")
    p = str(tmp_path / "out.tsv")
    write_tsv(df.orderBy(F.desc("n")), p)
    lines = open(p).read().strip().split("\n")
    assert lines[0] == "k\tn" and lines[1] == "a\t2"
