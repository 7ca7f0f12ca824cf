"""PubTator format: parser (F10) + entity-class harmonization (F9).

Reference analogs:
* F10 — supplementary/experiment_scripts/
  evaluate_ner_pubtatorformat.py:107-171 (via the ``pubtator`` lib, not
  in this image — parsed directly here: ``pmid|t|title``,
  ``pmid|a|abstract`` and TAB-separated span lines).
* F9 — the class remapping at :125-157 (molecule/ChemicalEntity →
  chemical, cellline/cell_line/CellLine/cell_type → cell,
  protein/GeneOrGeneProduct → gene, organism/OrganismTaxon → species,
  DiseaseOrPhenotypicFeature → disease), lowercased.

The parser is a test-harness/loader utility (driver-side files); the
harmonizer also ships as a Spark column expression for mentions tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

CLASS_HARMONIZATION: dict[str, str] = {
    "molecule": "chemical",
    "chemicalentity": "chemical",
    "cellline": "cell",
    "cell_line": "cell",
    "cell_type": "cell",
    "protein": "gene",
    "geneorgeneproduct": "gene",
    "organism": "species",
    "organismtaxon": "species",
    "diseaseorphenotypicfeature": "disease",
}


def harmonize_class(name: str) -> str:
    """F9 (pure): canonical lowercase entity class."""
    low = name.lower()
    return CLASS_HARMONIZATION.get(low, low)


def harmonize_class_col(col) -> "F.Column":
    """F9 as a JVM when()-chain over a mentions ``class`` column."""
    low = F.lower(col)
    expr = low
    for src, dst in CLASS_HARMONIZATION.items():
        expr = F.when(low == src, F.lit(dst)).otherwise(expr)
    return expr


def harmonize_mentions(mentions: DataFrame, class_col: str = "class") -> DataFrame:
    return mentions.withColumn(class_col, harmonize_class_col(F.col(class_col)))


def parse_pubtator(text: str) -> tuple[dict[str, dict], list[dict]]:
    """F10 (pure): PubTator text → (documents, mentions).

    documents: {doc_id: {"title": ..., "abstract": ...}}
    mentions:  [{doc_id, begin, end, surface, class}] with EXCLUSIVE
    ends (PubTator convention) and harmonized classes.
    """
    documents: dict[str, dict] = {}
    mentions: list[dict] = []
    for line in text.splitlines():
        if not line.strip():
            continue
        if "|t|" in line and "\t" not in line.split("|t|")[0]:
            doc_id, title = line.split("|t|", 1)
            documents.setdefault(doc_id, {})["title"] = title
        elif "|a|" in line and "\t" not in line.split("|a|")[0]:
            doc_id, abstract = line.split("|a|", 1)
            documents.setdefault(doc_id, {})["abstract"] = abstract
        elif "\t" in line:
            parts = line.split("\t")
            if len(parts) >= 5:
                doc_id, start, end, surface, cls = parts[:5]
                mentions.append(
                    {
                        "doc_id": doc_id,
                        "begin": int(start),
                        "end": int(end),
                        "surface": surface,
                        "class": harmonize_class(cls),
                    }
                )
    return documents, mentions


def pubtator_to_mentions_df(spark, text: str) -> DataFrame:
    """Parsed PubTator mentions as a Spark DF (gold table for
    metrics.entity_level_pr); ends converted to the mentions-table
    INCLUSIVE convention."""
    _, ms = parse_pubtator(text)
    rows = [
        (m["doc_id"], m["begin"], m["end"] - 1, m["surface"], m["class"])
        for m in ms
    ]
    return spark.createDataFrame(
        rows, "doc_id string, begin int, end int, surface string, class string"
    )
