"""redact_pii operator edge cases (the declared query's oracle covers the
bulk path; these pin boundary behavior)."""

from __future__ import annotations

from land_registry_data_ingestion_spark.operators.textops import redact_pii


def _one(spark, text: str):
    df = spark.createDataFrame([(1, text)], ["doc_id", "text"])
    return redact_pii(df).collect()[0]


def test_email_and_phone_both_scrubbed(spark):
    row = _one(spark, "mail a.b+c@ex-ample.co.uk or call +44 7700 900123 now")
    assert row["text_redacted"] == "mail <EMAIL> or call <PHONE> now"
    assert row["n_emails"] == 1 and row["n_phones"] == 1


def test_clean_text_untouched(spark):
    row = _one(spark, "no personal data here 123")
    assert row["text_redacted"] == "no personal data here 123"
    assert row["n_emails"] == 0 and row["n_phones"] == 0


def test_email_digits_not_counted_as_phone(spark):
    # the local part's digits must not survive into the phone pass
    row = _one(spark, "reach me: user+447700900123@example.com")
    assert row["text_redacted"] == "reach me: <EMAIL>"
    assert row["n_phones"] == 0


def test_multiple_matches_all_replaced(spark):
    row = _one(spark, "a@b.io c@d.io +12 3456789 +98 7654321")
    assert row["n_emails"] == 2 and row["n_phones"] == 2
    assert "<EMAIL> <EMAIL>" in row["text_redacted"]
    assert row["text_redacted"].count("<PHONE>") == 2
