"""PII scan / redact semantics on constructed corpora."""

from __future__ import annotations

import pytest

from stockpulse_batch_realtime_etl_spark.operators import pii


def doc(i, text, lang="en", source="s"):
    return (i, text, lang, source, len(text))


@pytest.fixture(scope="module")
def docs(make_docs):
    return make_docs(
        [
            doc(1, "contact me at alice.smith+news@corp-mail.co for details"),
            doc(2, "server 192.168.1.254 and backup 10.0.0.7 are down"),
            doc(3, "call 555-867-5309 or fax 555-111-2222 today"),
            doc(4, "ssn on file 123-45-6789 do not share"),
            doc(5, "nothing sensitive here just words"),
            doc(6, "mixed: bob@x.io from 8.8.8.8 dialed 555-000-1234"),
        ]
    )


def test_scan_counts_by_kind(docs):
    rows = {r.doc_id: r for r in pii.pii_scan(docs).collect()}
    assert (rows[1].n_email, rows[1].n_ipv4, rows[1].n_ssn, rows[1].n_phone) == (1, 0, 0, 0)
    assert rows[2].n_ipv4 == 2
    assert rows[3].n_phone == 2 and rows[3].n_ssn == 0
    assert rows[4].n_ssn == 1 and rows[4].n_phone == 0
    assert rows[5].n_pii == 0 and not rows[5].has_pii
    assert (rows[6].n_email, rows[6].n_ipv4, rows[6].n_phone) == (1, 1, 1)
    assert rows[6].n_pii == 3 and rows[6].has_pii


def test_phone_and_ssn_shapes_disjoint(make_docs):
    # 3-3-4 is a phone, 3-2-4 is an SSN; neither regex matches the other's shape
    d = make_docs([doc(1, "p 555-123-4567 s 555-12-4567")])
    r = pii.pii_scan(d).collect()[0]
    assert (r.n_phone, r.n_ssn) == (1, 1)


def test_redact_replaces_every_span(docs):
    red = pii.pii_redact(docs)
    rows = {r.doc_id: r for r in red.collect()}
    for i in (1, 2, 3, 4, 6):
        assert rows[i].n_placeholders == rows[i].n_redactions > 0
    assert rows[5].n_redactions == 0
    # redacting PII-free text is the identity
    import hashlib

    assert rows[5].redacted_md5 == hashlib.md5(
        b"nothing sensitive here just words"
    ).hexdigest()


def test_redacted_text_is_clean(docs, spark):
    from pyspark.sql import functions as F

    red = docs.select("doc_id", pii.redact(F.col("text")).alias("t"))
    rescan = pii.pii_scan(red.withColumnRenamed("t", "text").withColumn("source", F.lit("s")))
    assert rescan.filter(F.col("has_pii")).count() == 0


def test_injection_targets_and_determinism(make_docs):
    base = make_docs([doc(i, "plain words only") for i in range(1, 16)])
    out = {r.doc_id: r for r in pii.pii_scan(pii.inject_synthetic_pii(base)).collect()}
    assert out[5].n_email == 1 and out[10].n_email == 1
    assert out[7].n_ipv4 == 1 and out[14].n_ipv4 == 1
    assert out[11].n_phone == 1
    assert out[13].n_ssn == 1
    assert out[1].n_pii == 0 and out[3].n_pii == 0
