"""PII screening ops (ops/curation.py) — crafted-string coverage.

The driver corpus is PII-free word soup, so these operators are pinned
here rather than via a trivially-zero oracle query.
"""

import pytest
from pyspark.sql import functions as F

from easyner_spark.ops.curation import pii_counts, screen_documents, scrub_pii


def _counts(spark, text):
    row = (
        spark.createDataFrame([(text,)], "text string")
        .select(*pii_counts(F.col("text")))
        .collect()[0]
    )
    return row.asDict()


def test_email_and_ip_counts(spark):
    c = _counts(spark, "mail a.user+tag@sub.example.co.uk or 10.0.0.1 now")
    assert c["email_n"] == 1 and c["ipv4_n"] == 1
    assert c["pii_total"] == 2


def test_ssn_and_phone_counts(spark):
    c = _counts(spark, "ssn 123-45-6789 phone +1 (555) 123-4567 end")
    assert c["ssn_n"] == 1
    assert c["phone_n"] >= 1
    assert c["pii_total"] >= 2


def test_clean_text_counts_zero(spark):
    c = _counts(spark, "the fast table scan joins a window batch")
    assert c == {"email_n": 0, "ipv4_n": 0, "ssn_n": 0, "phone_n": 0, "pii_total": 0}


def test_scrub_replaces_with_typed_placeholders(spark):
    df = spark.createDataFrame(
        [("contact bob@example.com from 192.168.1.1 please",)], "text string"
    )
    out = df.select(scrub_pii(F.col("text")).alias("s")).collect()[0]["s"]
    assert "[EMAIL]" in out and "[IPV4]" in out
    assert "bob@example.com" not in out and "192.168.1.1" not in out
    assert out.startswith("contact ") and out.endswith(" please")


def test_screen_documents_projection(spark):
    docs = spark.createDataFrame(
        [
            (1, "clean words only"),
            (2, "write to eve@mail.org today"),
        ],
        "doc_id int, text string",
    )
    got = {r["doc_id"]: r.asDict() for r in screen_documents(docs).collect()}
    assert got[1]["pii_total"] == 0
    assert got[1]["text_scrubbed"] == "clean words only"  # untouched when clean
    assert got[2]["pii_total"] == 1
    assert "[EMAIL]" in got[2]["text_scrubbed"]


def test_screen_is_pure_jvm_no_python_no_shuffle(spark):
    """The screen must stay a narrow whole-stage-codegen projection —
    no Python eval, no exchange."""
    docs = spark.createDataFrame([(1, "x")], "doc_id int, text string")
    plan = screen_documents(docs)._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    assert "EvalPython" not in plan
    assert "Exchange" not in plan
