"""PII scrubbing (operators/pii.py): masking, counts, idempotence,
precision on look-alikes, invariant that `text` is never mutated."""

from __future__ import annotations

import pyspark.sql.functions as F

from dere_spark.operators.pii import pii_counts, redact_pii, scrub_documents


def _scrub_one(spark, s: str):
    df = spark.createDataFrame([(s,)], "text string")
    return df.select(
        redact_pii(F.col("text")).alias("r"), pii_counts(F.col("text")).alias("c")
    ).first()


def test_masks_all_three_kinds(spark):
    r = _scrub_one(
        spark,
        "mail jane.doe+spam@sub.example.co.uk or call (555) 123-4567, "
        "server at 192.168.0.254 answers",
    )
    assert r.r == (
        "mail <EMAIL> or call <PHONE>, server at <IP> answers"
    )
    assert (r.c.n_emails, r.c.n_ips, r.c.n_phones) == (1, 1, 1)


def test_idempotent(spark):
    once = _scrub_one(spark, "a@b.com at 10.0.0.1 +44 555-123-9999").r
    df = spark.createDataFrame([(once,)], "text string")
    again = df.select(redact_pii(F.col("text")).alias("r")).first().r
    assert once == again
    assert once == "<EMAIL> at <IP> <PHONE>"


def test_conservative_on_lookalikes(spark):
    # version strings, decimals, years, @handles without TLD, out-of-range
    # octets must all survive untouched
    s = "v1.2.3.4000 of pkg@local costs 3.14 in 2024; build 300.1.1.1 ok"
    r = _scrub_one(spark, s)
    assert r.r == s
    assert (r.c.n_emails, r.c.n_ips, r.c.n_phones) == (0, 0, 0)


def test_scrub_documents_keeps_text_byte_identical(spark):
    docs = spark.createDataFrame(
        [("d1", "write to a@b.org now"), ("d2", "clean")],
        "doc_id string, text string",
    )
    out = scrub_documents(docs)
    rows = {r.doc_id: r for r in out.collect()}
    assert rows["d1"].text == "write to a@b.org now"  # untouched
    assert rows["d1"].scrubbed == "write to <EMAIL> now"
    assert rows["d1"].n_emails == 1
    assert rows["d2"].scrubbed == "clean"
    assert (rows["d2"].n_emails, rows["d2"].n_ips, rows["d2"].n_phones) == (0, 0, 0)


def test_map_side_only_no_exchange(spark):
    docs = spark.createDataFrame([("d", "x")], "doc_id string, text string")
    plan = scrub_documents(docs)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_digit_adjacent_runs_not_bitten(spark):
    # a 13-digit order id contains a phone-shaped substring; the digit
    # lookarounds must keep the pattern from destroying it
    s = "order id 9555-123-456789 ok, ref 555-123-4567890"
    r = _scrub_one(spark, s)
    assert r.r == s
    assert r.c.n_phones == 0


def test_counts_agree_with_redaction_order(spark):
    # an IP's trailing octets must not be double-reported as a phone:
    # counts evaluate each pattern on the earlier-masked text, exactly
    # what redact_pii replaces
    s = "server 10.0.0.255 123-4567 up"
    r = _scrub_one(spark, s)
    assert r.r == "server <IP> 123-4567 up"
    assert (r.c.n_emails, r.c.n_ips, r.c.n_phones) == (0, 1, 0)


def test_hyphenated_serials_untouched_but_phone_after_number_matches(spark):
    # 4-group hyphenated serial: no partial bite anywhere
    s = "ref 555-123-4567-8901 shipped"
    r = _scrub_one(spark, s)
    assert r.r == s and r.c.n_phones == 0
    # a phone that merely FOLLOWS a number still redacts
    r2 = _scrub_one(spark, "port 1 +44 555-123-9999 open")
    assert r2.r == "port 1 <PHONE> open" and r2.c.n_phones == 1


def test_null_text_scrubs_to_empty_with_zero_counts(spark):
    docs = spark.createDataFrame(
        [("d", None)], "doc_id string, text string"
    )
    row = scrub_documents(docs).first()
    assert row.scrubbed == ""
    assert (row.n_emails, row.n_ips, row.n_phones) == (0, 0, 0)
