from colbert_spark.index.codec import vb_decode, vb_encode  # noqa: F401
