"""PII redaction + repetition quality signals (functions/text.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from fess_ds_s3_spark.functions import text as T


def _one(spark, text, col):
    df = spark.createDataFrame([(text,)], "t string")
    return df.select(col.alias("v")).first()["v"]


class TestRedact:
    def test_email(self, spark):
        out = _one(spark, "mail me at jane.doe+x@sub.example.co.uk now",
                   T.redact_pii("t"))
        assert out == "mail me at <EMAIL> now"

    def test_ipv4(self, spark):
        out = _one(spark, "host 10.0.255.7 and 192.168.1.1.", T.redact_pii("t"))
        assert out == "host <IP> and <IP>."

    def test_phone_variants(self, spark):
        out = _one(spark, "call +1 (555) 123-4567 or 08001234567",
                   T.redact_pii("t"))
        assert out == "call <PHONE> or <PHONE>"

    def test_short_digit_runs_kept(self, spark):
        # fewer than 8 chars first-to-last digit: not phone-shaped
        out = _one(spark, "room 4217 on floor 12", T.redact_pii("t"))
        assert out == "room 4217 on floor 12"

    def test_email_digits_not_phone_matched(self, spark):
        out = _one(spark, "x 12345678@example.com y", T.redact_pii("t"))
        assert out == "x <EMAIL> y"

    def test_clean_text_unchanged(self, spark):
        s = "no personal data in this sentence"
        assert _one(spark, s, T.redact_pii("t")) == s

    def test_counts_sequential(self, spark):
        c = T.pii_counts("t")
        df = spark.createDataFrame(
            [("a@b.io c@d.io 10.1.1.1 +1 555 000 1111",)], "t string")
        row = df.select(c["email"].alias("e"), c["ipv4"].alias("i"),
                        c["phone"].alias("p")).first()
        assert (row["e"], row["i"], row["p"]) == (2, 1, 1)


class TestRepetition:
    def test_dup_line_frac(self, spark):
        text = "nav bar\ncontent one\nnav bar\ncontent two\n\n  \nnav bar"
        # 5 non-blank lines, 3 distinct → 2 dup → 0.4
        assert _one(spark, text, T.dup_line_frac("t")) == 0.4

    def test_dup_line_frac_no_lines(self, spark):
        assert _one(spark, "   \n  \n", T.dup_line_frac("t")) == 0.0

    def test_dup_line_frac_all_unique(self, spark):
        assert _one(spark, "a\nb\nc", T.dup_line_frac("t")) == 0.0

    def test_top_bigram_frac_stuffed(self, spark):
        # "buy now" ×3 of 6 bigram slots (w1..w7) → 3/6
        text = "buy now buy now buy now again"
        assert _one(spark, text, T.top_bigram_frac("t")) == 0.5

    def test_top_bigram_frac_natural(self, spark):
        text = "one two three four five"
        assert _one(spark, text, T.top_bigram_frac("t")) == 0.25

    def test_top_bigram_frac_short(self, spark):
        assert _one(spark, "word", T.top_bigram_frac("t")) == 0.0
        assert _one(spark, "", T.top_bigram_frac("t")) == 0.0

    def test_degenerate_repeat(self, spark):
        assert _one(spark, "spam spam spam spam",
                    T.top_bigram_frac("t")) == 1.0
