"""PubTator parse (F10) + class harmonization (F9) + export↔parse
round-trip through the engine's own sink."""

import glob

from easyner_spark.io.pubtator import (
    harmonize_class,
    harmonize_mentions,
    parse_pubtator,
    pubtator_to_mentions_df,
)
from easyner_spark.io.sinks import write_pubtator
from easyner_spark.metrics import entity_level_pr


def test_harmonize_class_map():
    assert harmonize_class("molecule") == "chemical"
    assert harmonize_class("GeneOrGeneProduct") == "gene"
    assert harmonize_class("OrganismTaxon") == "species"
    assert harmonize_class("CellLine") == "cell"
    assert harmonize_class("Disease") == "disease"  # passthrough, lowered


def test_harmonize_mentions_df(spark):
    m = spark.createDataFrame(
        [("d1", "protein"), ("d1", "ChemicalEntity"), ("d1", "disease")],
        "doc_id string, class string",
    )
    got = sorted(r["class"] for r in harmonize_mentions(m).collect())
    assert got == ["chemical", "disease", "gene"]


def test_parse_pubtator_basic():
    text = (
        "123|t|A title\n"
        "123|a|An abstract with ACE2 inside.\n"
        "123\t17\t21\tACE2\tprotein\t-1\n"
        "\n"
        "456|t|Second\n"
        "456|a|Empty annotations.\n"
    )
    docs, ms = parse_pubtator(text)
    assert docs["123"]["title"] == "A title"
    assert docs["456"]["abstract"] == "Empty annotations."
    assert ms == [
        {"doc_id": "123", "begin": 17, "end": 21, "surface": "ACE2", "class": "gene"}
    ]
    # exclusive-end slice hits the surface
    assert docs["123"]["abstract"][17:21] == "ACE2"


def test_export_parse_roundtrip(spark, tmp_path):
    docs = spark.createDataFrame([("d1", "Title")], "doc_id string, title string")
    sents = spark.createDataFrame(
        [("d1", 0, "First bit."), ("d1", 1, "ACE2 binds.")],
        "doc_id string, sent_idx int, text string",
    )
    mentions = spark.createDataFrame(
        [("d1", 1, 0, 3, "gene", "ACE2")],
        "doc_id string, sent_idx int, begin int, end int, class string, surface string",
    )
    out = str(tmp_path / "pt")
    write_pubtator(docs, sents, mentions, out)
    text = "".join(open(f).read() for f in sorted(glob.glob(out + "/part-*")))
    parsed_docs, parsed_ms = parse_pubtator(text)
    assert parsed_docs["d1"]["abstract"] == "First bit. ACE2 binds."
    assert parsed_ms[0]["surface"] == "ACE2" and parsed_ms[0]["class"] == "gene"
    # parsed gold vs original mentions through the evaluation band join:
    # doc-level offsets differ from sentence-local ones, so compare via
    # the re-parsed DF against itself (self P/R == 1.0 sanity)
    gold = pubtator_to_mentions_df(spark, text)
    pr = {r["class"]: r for r in entity_level_pr(gold, gold).collect()}
    assert pr["gene"]["precision"] == 1.0 and pr["gene"]["recall"] == 1.0
