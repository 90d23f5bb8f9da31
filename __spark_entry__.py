"""Driver contract for the spark-graft builder (PySpark target).

`entry(spark)` runs the flagship BM25 top-k over the sf0.001 documents table.
`queries()` / `oracle_sql()` expose every implemented operator from
SURVEY.md §2 with DuckDB-checkable SQL oracles (see colbert_spark/operators/).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: BM25 top-k retrieval over the documents corpus."""
    from colbert_spark.operators.fts_documents import fts_bm25_topk

    return fts_bm25_topk(spark, SF0001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from colbert_spark.operators import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from colbert_spark.operators import ORACLES

    return dict(ORACLES)
