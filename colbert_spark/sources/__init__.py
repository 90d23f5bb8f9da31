from colbert_spark.sources.synth import synth_queries, synth_web_pages  # noqa: F401
from colbert_spark.sources.tables import load_table, register_views  # noqa: F401
