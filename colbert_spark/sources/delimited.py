"""Delimited-text and JSON-lines corpus ingestion — the reference's actual
first step (``proj_utils/dureader_utils.py:7-27``: tab-separated passage
collection files, text in column index 2) re-expressed as Spark file sources.

Both readers return the engine's canonical corpus projection
(url, text, lang); downstream (`index.build.build_index`) is format-agnostic.
At scale these are plain distributed scans: `spark.read.csv` / `spark.read
.json` split files across executors, push column pruning into the parse, and
never touch the driver.

The committed fixtures under `fixtures/` are tiny deterministic exports of
the synthetic corpus (see `tools/gen_fixtures.py`), so the ingestion path has
a stable, reviewable input in both engines (Spark here, DuckDB `read_csv` /
`read_json` in the oracle).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

FIXTURE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "fixtures")
TSV_FIXTURE = os.path.abspath(os.path.join(FIXTURE_DIR, "corpus.tsv"))
JSONL_FIXTURE = os.path.abspath(os.path.join(FIXTURE_DIR, "corpus.jsonl"))

# the reference's passage-collection row: (pid, title, text) tab-separated,
# no header (dureader_utils.py:24 takes slot [2])
TSV_SCHEMA = "pid long, title string, text string"


def read_corpus_tsv(spark: SparkSession, path: str) -> DataFrame:
    """Tab-separated passage collection → canonical (url, text, lang).

    Mirrors the reference's `csv_reader(part-0i, '\\t')` + column-2 extract;
    pid becomes a synthetic stable url (the engine's doc identity is the
    dense rank over url, so any unique string key works)."""
    raw = spark.read.csv(path, sep="\t", schema=TSV_SCHEMA, header=False)
    return raw.select(
        F.concat(F.lit("tsv://corpus/"), F.col("pid")).alias("url"),
        "text",
        F.lit("und").alias("lang"),
    )


def read_corpus_jsonl(spark: SparkSession, path: str) -> DataFrame:
    """JSON-lines corpus → canonical (url, text, lang). Schema pinned (no
    inference scan — a second full pass over 100 TB just to guess types)."""
    raw = spark.read.schema("url string, text string, lang string").json(path)
    return raw.select("url", "text", "lang")


def tsv_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-gated probe: ingest the committed TSV fixture and compute the
    per-row token projection (proves parse + downstream composition)."""
    from colbert_spark.functions.tokenizer import tokens_col

    df = read_corpus_tsv(spark, TSV_FIXTURE)
    return df.select(
        "url",
        F.length("text").cast("long").alias("n_chars"),
        F.size(tokens_col("text")).cast("long").alias("n_tokens"),
    ).orderBy("url")


def json_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-gated probe: ingest the committed JSONL fixture."""
    from colbert_spark.functions.tokenizer import tokens_col

    df = read_corpus_jsonl(spark, JSONL_FIXTURE)
    return df.select(
        "url",
        "lang",
        F.length("text").cast("long").alias("n_chars"),
        F.size(tokens_col("text")).cast("long").alias("n_tokens"),
    ).orderBy("url")


def _tok_sql(col: str) -> str:
    from colbert_spark.functions.tokenizer import duckdb_tokens_sql

    return duckdb_tokens_sql(col)


def _oracles() -> dict[str, str]:
    return {
        "tsv_ingest": f"""
            SELECT 'tsv://corpus/' || pid AS url,
                   length(text)::BIGINT AS n_chars,
                   len({_tok_sql('text')})::BIGINT AS n_tokens
            FROM read_csv('{TSV_FIXTURE}', delim='\t', header=false,
                          columns={{'pid': 'BIGINT', 'title': 'VARCHAR', 'text': 'VARCHAR'}})
            ORDER BY url
        """,
        "json_ingest": f"""
            SELECT url, lang,
                   length(text)::BIGINT AS n_chars,
                   len({_tok_sql('text')})::BIGINT AS n_tokens
            FROM read_json('{JSONL_FIXTURE}',
                           columns={{'url': 'VARCHAR', 'text': 'VARCHAR', 'lang': 'VARCHAR'}},
                           format='newline_delimited')
            ORDER BY url
        """,
    }


ORACLES = _oracles()

QUERIES = {
    "tsv_ingest": tsv_ingest,
    "json_ingest": json_ingest,
}
