"""Operator registry: every implemented query/operator from SURVEY.md §2,
each paired with an ANSI-SQL oracle DuckDB can run on the same tables.

`QUERIES[name]` is a callable (spark, sf_dir) -> DataFrame;
`ORACLES[name]` is the equivalent SQL (omitted for non-SQL-expressible ops,
which get the driver's weaker rows-only check).
"""

from __future__ import annotations

from colbert_spark.operators import (
    curation,
    dedup,
    events,
    fts_documents,
    hybrid,
    multimodal,
    relational,
    scrub,
    similarity,
    textops,
)

from colbert_spark import streaming as _streaming
from colbert_spark.sources import delimited as _delimited

_MODULES = [
    fts_documents,
    hybrid,
    relational,
    dedup,
    textops,
    similarity,
    events,
    multimodal,
    curation,
    scrub,
    _streaming,
    _delimited,
]

QUERIES = {}
ORACLES = {}
for _m in _MODULES:
    QUERIES.update(_m.QUERIES)
    ORACLES.update(getattr(_m, "ORACLES", {}))
