"""Crafted-data tests for the scrub operators (span dedup, contamination,
PII redaction). The public fixture contains no PII and only incidental span
collisions, so these tests inject known structure and check the operators
against independent pure-Python oracles.
"""

import re

import pytest


@pytest.fixture(scope="module")
def scrub_sf_dir(spark, tmp_path_factory):
    """documents table with known span/contamination/PII structure.

    - docs 0 and 1 share the 6-word run "one two three four five six"
      (two shared 5-gram spans each); doc 2 shares nothing.
    - docs 0 and 29 seed the contamination benchmark (doc_id % 29 == 0)
      with their first 8 words; doc 3 repeats doc 29's seed verbatim.
    - doc 4 carries an email, two IPv4s, and a phone number; doc 29's
      "555.123.4567" must NOT count (dots only — pattern needs [-. ]
      BETWEEN groups, which it has, so it DOES match; asserted below
      via the Python oracle, not hand-listed).
    """
    d = tmp_path_factory.mktemp("scrubsf")
    bench8 = "alpha bravo charlie delta echo foxtrot golf hotel"
    rows = [
        (0, "one two three four five six unique0 tail0"),
        (1, "prefix1 one two three four five six tail1"),
        (2, "nothing shared here at all wholly distinct words"),
        (3, f"leading filler {bench8} trailing filler words"),
        (
            4,
            "contact a.b+c@example.co.uk or 10.0.0.1 and 255.255.255.255 "
            "call 415-555-2671 now",
        ),
        (29, f"{bench8} then 555.123.4567 appears as digits"),
    ]
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(
        str(d / "documents.parquet")
    )
    return str(d), {i: t for i, t in rows}


def test_span_dedup_counts_cross_doc_spans_only(spark, scrub_sf_dir):
    from colbert_spark.operators.scrub import SPAN_N, span_dedup

    sf_dir, texts = scrub_sf_dir
    got = {r["doc_id"]: r.asDict() for r in span_dedup(spark, sf_dir).collect()}

    # independent oracle: exact string 5-grams over the engine tokenizer's
    # pure-Python twin (PII strings fragment into many alnum tokens)
    from colbert_spark.functions.tokenizer import py_tokenize

    grams = {
        i: [
            " ".join(ws[j : j + SPAN_N])
            for ws in [py_tokenize(t)]
            for j in range(len(ws) - SPAN_N + 1)
        ]
        for i, t in texts.items()
    }
    owners = {}
    for i, gs in grams.items():
        for g in gs:
            owners.setdefault(g, set()).add(i)
    for i, gs in grams.items():
        n_dup = sum(1 for g in gs if len(owners[g]) >= 2)
        assert got[i]["n_spans"] == len(gs)
        assert got[i]["n_dup_spans"] == n_dup, f"doc {i}"
    assert got[0]["n_dup_spans"] == 2  # the shared 6-word run = two 5-grams
    assert got[2]["n_dup_spans"] == 0


def test_contamination_flags_benchmark_ngram_carriers(spark, scrub_sf_dir):
    from colbert_spark.operators.scrub import contamination_ngram

    sf_dir, _ = scrub_sf_dir
    got = {r["doc_id"]: r.asDict() for r in contamination_ngram(spark, sf_dir).collect()}
    # docs 0 and 29 seed the benchmark (doc_id % 29 == 0) and contain their
    # own prefixes; doc 3 repeats doc 29's seed verbatim
    assert got[0]["contaminated"] and got[0]["n_hits"] == 1
    assert got[29]["contaminated"] and got[29]["n_hits"] == 1
    assert got[3]["contaminated"] and got[3]["n_hits"] == 1
    for clean in (1, 2, 4):
        assert not got[clean]["contaminated"], f"doc {clean}"


def test_pii_scrub_matches_python_re(spark, scrub_sf_dir):
    """Redaction counts and fingerprint input must match Python `re` exactly
    (same pattern source; Java and Python regex agree on this subset)."""
    import hashlib

    from colbert_spark.operators.scrub import (
        PII_EMAIL,
        PII_IPV4,
        PII_PHONE,
        pii_scrub,
    )

    sf_dir, texts = scrub_sf_dir
    got = {r["doc_id"]: r.asDict() for r in pii_scrub(spark, sf_dir).collect()}
    for i, t in texts.items():
        exp_counts = (
            len(re.findall(PII_EMAIL, t)),
            len(re.findall(PII_IPV4, t)),
            len(re.findall(PII_PHONE, t)),
        )
        clean = re.sub(PII_EMAIL, "<EMAIL>", t)
        clean = re.sub(PII_IPV4, "<IP>", clean)
        clean = re.sub(PII_PHONE, "<PHONE>", clean)
        row = got[i]
        assert (row["n_emails"], row["n_ipv4"], row["n_phones"]) == exp_counts, i
        assert row["clean_fp"] == hashlib.md5(clean.encode()).hexdigest(), i
    # the crafted rows actually exercise every pattern
    assert got[4]["n_emails"] == 1 and got[4]["n_ipv4"] == 2 and got[4]["n_phones"] == 1
    assert got[29]["n_phones"] == 1  # dotted phone form matches [-. ]
