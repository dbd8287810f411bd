"""Unit tests for PII detection/redaction edge cases the oracle pair
(synthetic-PII corpus) doesn't isolate: pattern boundaries, overlap
precedence, clean-text passthrough."""

from pyspark.sql import Row, functions as F

from activedata_etl_spark.ext import pii as PII


def _one(spark, text: str) -> Row:
    df = spark.createDataFrame([(text,)], "text string")
    return PII.redact_table(df, "text").collect()[0]


def test_counts_and_redaction_basic(spark):
    r = _one(spark, "mail a@b.io or 555-123-4567, ssn 078-05-1120, ip 10.0.0.1")
    assert (r["pii_email"], r["pii_phone"], r["pii_ssn"], r["pii_ipv4"]) == (1, 1, 1, 1)
    assert r["pii_total"] == 4
    assert r["text_redacted"] == "mail <EMAIL> or <PHONE>, ssn <SSN>, ip <IPV4>"


def test_clean_text_untouched(spark):
    r = _one(spark, "no pii here just words and numbers 12 3.14")
    assert r["pii_total"] == 0
    assert r["text_redacted"] == "no pii here just words and numbers 12 3.14"


def test_ssn_phone_no_cross_match(spark):
    # 3-2-4 (SSN) and 3-3-4 (phone) digit shapes must not match each other
    r = _one(spark, "ssn 078-05-1120 only")
    assert (r["pii_ssn"], r["pii_phone"]) == (1, 0)
    r = _one(spark, "phone 555-123-4567 only")
    assert (r["pii_ssn"], r["pii_phone"]) == (0, 1)


def test_dotted_phone_not_counted_as_ip(spark):
    # trailing \b in the IPv4 pattern cannot land inside a digit run,
    # so a dotted phone never yields a partial IP match
    r = _one(spark, "call 555.123.4567 now")
    assert (r["pii_phone"], r["pii_ipv4"]) == (1, 0)
    assert r["text_redacted"] == "call <PHONE> now"


def test_word_boundaries(spark):
    # digits embedded in longer runs are not SSNs/phones/IPs
    r = _one(spark, "id 1078-05-11209 and version 10.0.0.1234567")
    assert (r["pii_ssn"], r["pii_phone"], r["pii_ipv4"]) == (0, 0, 0)


def test_email_with_dotted_parts_counts_once(spark):
    # digits/dots/hyphens in local+domain parts stay one email, not an IP
    r = _one(spark, "user.1%x@host-2.example.com mailed")
    assert (r["pii_email"], r["pii_ipv4"]) == (1, 0)
    assert r["text_redacted"] == "<EMAIL> mailed"


def test_ip_host_email_falls_back_to_ip(spark):
    # an @-address with a bare-IP host is NOT an email (no letter TLD);
    # the IP inside still gets redacted
    r = _one(spark, "root@10.0.0.1 mailed")
    assert (r["pii_email"], r["pii_ipv4"]) == (0, 1)
    assert r["text_redacted"] == "root@<IPV4> mailed"


def test_redact_table_preserves_input_columns(spark):
    df = spark.createDataFrame([(1, "a@b.io",)], "id int, text string")
    out = PII.redact_table(df, "text")
    assert out.columns[:2] == ["id", "text"]
    assert out.filter(F.col("pii_email") == 1).count() == 1
