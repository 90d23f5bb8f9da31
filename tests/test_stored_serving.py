"""Index-only serving proof: the stored-field entries' physical plans must
not scan the source documents table — sort attributes and facet values come
from the docs sink, the match set from segments."""

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_stored_sort_plan_reads_no_source_table(spark):
    from colbert_spark.operators.fts_documents import fts_stored_sort

    plan = _plan(fts_stored_sort(spark, SF))
    assert "documents.parquet" not in plan
    assert "docs" in plan  # the index sink IS scanned


def test_facets_index_plan_reads_no_source_table(spark):
    from colbert_spark.operators.fts_documents import fts_facets_index

    plan = _plan(fts_facets_index(spark, SF))
    assert "documents.parquet" not in plan
