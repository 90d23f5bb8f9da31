from colbert_spark.query.bm25 import bm25_topk_dataframe  # noqa: F401
