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


@pytest.mark.parametrize(
    "text",
    [
        "the budget was 10 000 000 kronor last year",
        "population 12.345.678 at the census",
        "pi is 3.1415926 and e is 2.7182818",
        "the war years 1914-1918 and 1939-1945",
        "serial 12345-678-9012 is inside a longer run 9912345-678-9012x",
    ],
)
def test_numeric_prose_is_not_a_phone(spark, text):
    """Spaced/dotted thousands, decimals, year ranges and mid-number
    runs must not be redacted as phones (ADVICE r3: the old separated
    form matched multi-digit-lead spaced/dotted groups)."""
    c = _counts(spark, text)
    assert c["phone_n"] == 0, text
    scrubbed = (
        spark.createDataFrame([(text,)], "text string")
        .select(scrub_pii(F.col("text")).alias("s"))
        .collect()[0]["s"]
    )
    assert "[PHONE]" not in scrubbed, scrubbed


@pytest.mark.parametrize(
    "text",
    [
        "call 555-123-4567 today",
        "call (555) 123-4567 today",
        "call (555)123-4567 today",
        "call +1 (555) 123.4567 today",
        "call +46701234567 today",
        "call (+46)-123-4567 today",
        "call 555 123 4567 today",
        "call 555.123.4567 today",
    ],
)
def test_real_phone_shapes_still_match(spark, text):
    assert _counts(spark, text)["phone_n"] >= 1, text


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
