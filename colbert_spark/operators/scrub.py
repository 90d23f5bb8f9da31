"""Corpus-scrubbing operators for training-data pipelines: cross-document
span deduplication, benchmark-contamination detection, and PII redaction.

These are the three scrub passes every web-scale LM data pipeline runs
between raw crawl and training shards (the driver's beyond-reference
mandate, SURVEY.md §2.9; the reference's own pipeline assumes a pre-cleaned
corpus — proj_utils/dureader_utils.py:7-27 reads already-curated TSV).

Scale notes (100 TB):
- ``span_dedup`` shuffles *64-bit span hashes*, not span strings — the
  exchange payload per posting is (hash, doc_id) = 16 bytes. Two shuffles,
  both partial-aggregated map-side. An xxhash64 collision could merge two
  distinct spans; at 10^12 spans the expected number of colliding pairs is
  ~(10^12)^2 / 2^65 ≈ 0.03 — the standard trade (Lee et al., "Deduplicating
  Training Data Makes Language Models Better" uses the same hashed-span
  relaxation of suffix-array matching).
- ``contamination_ngram`` broadcasts the benchmark n-gram set (eval suites
  are KB-MB, never corpus-sized) so the scan is a map-side semi-join: zero
  shuffle of corpus data, only the per-doc hit counts aggregate.
- ``pii_scrub`` is a pure map-side pass — three JVM regexps per row inside
  whole-stage codegen, no exchange at all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from colbert_spark.functions.tokenizer import duckdb_tokens_sql, tokens_col
from colbert_spark.sources.tables import load_table

_TOK = duckdb_tokens_sql("text")

SPAN_N = 5  # span-dedup shingle width (words)
CONTAM_N = 8  # contamination n-gram width (words)
CONTAM_MOD = 29  # doc_id % CONTAM_MOD == 0 docs seed the synthetic benchmark

# PII patterns written in the common subset of Java regex (Spark) and RE2
# (DuckDB): no backreferences, no lookaround.
PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IPV4 = r"\b(?:\d{1,3}\.){3}\d{1,3}\b"
PII_PHONE = r"\b\d{3}[-. ]\d{3}[-. ]\d{4}\b"


def _grams(toks, n: int):
    """array<string> of word n-grams of ``toks`` (empty when len < n).

    The when-guard matters: Spark's ``sequence(1, size-n+1)`` DESCENDS when
    size < n instead of returning an empty range.
    """
    seq = F.sequence(F.lit(1), F.size(toks) - (n - 1))
    grams = F.transform(seq, lambda i: F.array_join(F.slice(toks, i, n), " "))
    return F.when(F.size(toks) >= n, grams).otherwise(
        F.array().cast("array<string>")
    )


def span_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc count of word 5-gram spans that also occur in ANOTHER doc.

    The doc-level signal behind substring-level dedup: a doc whose spans are
    mostly shared is boilerplate/near-copy even when no single full-text
    hash matches. Output: (doc_id, n_spans, n_dup_spans, dup_frac).

    Plan: explode spans → hash → ONE groupBy(hash) with countDistinct(doc)
    partial-aggregated map-side → semi-join positions against the
    cross-doc-duplicated hashes → per-doc count. No driver materialization.
    """
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", tokens_col("text").alias("toks")
    )
    spans = docs.select(
        "doc_id", F.explode(_grams(F.col("toks"), SPAN_N)).alias("g")
    ).select("doc_id", F.xxhash64("g").alias("h"))
    dup_h = (
        spans.groupBy("h")
        .agg(F.countDistinct("doc_id").alias("nd"))
        .filter(F.col("nd") >= 2)
        .select("h")
    )
    per_doc = (
        spans.join(dup_h, "h", "left_semi")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_dup_spans"))
    )
    base = docs.select(
        "doc_id",
        F.greatest(F.size("toks") - (SPAN_N - 1), F.lit(0))
        .cast("long")
        .alias("n_spans"),
    )
    return (
        base.join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            "n_spans",
            F.coalesce("n_dup_spans", F.lit(0)).cast("long").alias("n_dup_spans"),
            F.when(
                F.col("n_spans") > 0,
                F.round(F.coalesce("n_dup_spans", F.lit(0)) / F.col("n_spans"), 6),
            )
            .otherwise(0.0)
            .alias("dup_frac"),
        )
        .orderBy("doc_id")
    )


def contamination_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flag docs containing any benchmark 8-gram (eval-set decontamination).

    The synthetic "benchmark" is the first 8-gram of every doc with
    doc_id % 29 == 0 — a deterministic stand-in for a real eval suite's
    n-gram inventory. Output: (doc_id, n_hits, contaminated).

    Plan: the benchmark table is tiny by construction, so it is broadcast
    and the corpus-side match is a map-side semi-join inside the scan
    stage; only (doc_id, n_hits) ever shuffles.
    """
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", tokens_col("text").alias("toks")
    )
    bench = (
        docs.filter((F.col("doc_id") % CONTAM_MOD == 0) & (F.size("toks") >= CONTAM_N))
        .select(F.array_join(F.slice("toks", 1, CONTAM_N), " ").alias("g"))
        .distinct()
    )
    grams = docs.select(
        "doc_id", F.explode(_grams(F.col("toks"), CONTAM_N)).alias("g")
    )
    hits = (
        grams.join(F.broadcast(bench), "g")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_hits"))
    )
    return (
        docs.select("doc_id")
        .join(hits, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_hits", F.lit(0)).cast("long").alias("n_hits"),
            (F.coalesce("n_hits", F.lit(0)) > 0).alias("contaminated"),
        )
        .orderBy("doc_id")
    )


def pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count and redact emails / IPv4s / phone numbers per document.

    Output: (doc_id, n_emails, n_ipv4, n_phones, clean_fp) where clean_fp
    is md5 of the text with each PII span replaced by a typed placeholder —
    the fingerprint downstream dedup should key on. Pure JVM regexps in
    whole-stage codegen; zero shuffle (the orderBy is presentation-only).
    """
    docs = load_table(spark, sf_dir, "documents")
    clean = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(F.col("text"), F.lit(PII_EMAIL), F.lit("<EMAIL>")),
            F.lit(PII_IPV4),
            F.lit("<IP>"),
        ),
        F.lit(PII_PHONE),
        F.lit("<PHONE>"),
    )
    return docs.select(
        "doc_id",
        F.regexp_count(F.col("text"), F.lit(PII_EMAIL)).cast("long").alias("n_emails"),
        F.regexp_count(F.col("text"), F.lit(PII_IPV4)).cast("long").alias("n_ipv4"),
        F.regexp_count(F.col("text"), F.lit(PII_PHONE)).cast("long").alias("n_phones"),
        F.md5(clean).alias("clean_fp"),
    ).orderBy("doc_id")


QUERIES = {
    "span_dedup": span_dedup,
    "contamination_ngram": contamination_ngram,
    "pii_scrub": pii_scrub,
}

# DuckDB groups by the span STRING where Spark groups by xxhash64(span);
# they agree unless a 64-bit collision merges two distinct spans (odds
# ~1e-11 at sf0.01 — see module docstring).
ORACLES = {
    "span_dedup": f"""
        WITH t AS (SELECT doc_id, {_TOK} AS toks FROM documents),
        g AS (
          SELECT doc_id,
                 unnest(list_transform(
                   generate_series(1, greatest(len(toks) - {SPAN_N - 1}, 0)),
                   i -> array_to_string(toks[i:i+{SPAN_N - 1}], ' '))) AS g
          FROM t),
        dup AS (
          SELECT g FROM g GROUP BY g HAVING count(DISTINCT doc_id) >= 2),
        per_doc AS (
          SELECT doc_id, count(*) AS n_dup_spans
          FROM g SEMI JOIN dup USING (g) GROUP BY doc_id)
        SELECT t.doc_id,
               greatest(len(toks) - {SPAN_N - 1}, 0)::BIGINT AS n_spans,
               coalesce(p.n_dup_spans, 0)::BIGINT AS n_dup_spans,
               CASE WHEN len(toks) > {SPAN_N - 1}
                    THEN round(coalesce(p.n_dup_spans, 0)
                               / (len(toks) - {SPAN_N - 1})::DOUBLE, 6)
                    ELSE 0.0 END AS dup_frac
        FROM t LEFT JOIN per_doc p USING (doc_id)
        ORDER BY doc_id
    """,
    "contamination_ngram": f"""
        WITH t AS (SELECT doc_id, {_TOK} AS toks FROM documents),
        bench AS (
          SELECT DISTINCT array_to_string(toks[1:{CONTAM_N}], ' ') AS g
          FROM t WHERE doc_id % {CONTAM_MOD} = 0 AND len(toks) >= {CONTAM_N}),
        g AS (
          SELECT doc_id,
                 unnest(list_transform(
                   generate_series(1, greatest(len(toks) - {CONTAM_N - 1}, 0)),
                   i -> array_to_string(toks[i:i+{CONTAM_N - 1}], ' '))) AS g
          FROM t),
        hits AS (
          SELECT doc_id, count(*) AS n_hits
          FROM g JOIN bench USING (g) GROUP BY doc_id)
        SELECT t.doc_id, coalesce(h.n_hits, 0)::BIGINT AS n_hits,
               coalesce(h.n_hits, 0) > 0 AS contaminated
        FROM t LEFT JOIN hits h USING (doc_id)
        ORDER BY doc_id
    """,
    "pii_scrub": f"""
        SELECT doc_id,
               len(regexp_extract_all(text, '{PII_EMAIL}'))::BIGINT AS n_emails,
               len(regexp_extract_all(text, '{PII_IPV4}'))::BIGINT AS n_ipv4,
               len(regexp_extract_all(text, '{PII_PHONE}'))::BIGINT AS n_phones,
               md5(regexp_replace(regexp_replace(regexp_replace(text,
                     '{PII_EMAIL}', '<EMAIL>', 'g'),
                     '{PII_IPV4}', '<IP>', 'g'),
                     '{PII_PHONE}', '<PHONE>', 'g')) AS clean_fp
        FROM documents ORDER BY doc_id
    """,
}
