from colbert_spark.functions.tokenizer import (  # noqa: F401
    DUCKDB_TOKEN_REGEX,
    JAVA_TOKEN_REGEX,
    PY_TOKEN_REGEX,
    duckdb_tokens_sql,
    py_tokenize,
    tokens_col,
)
