"""Configurable analysis chain: token FILTERS applied after the tokenizer
grammar, as an index-level property (Lucene's analyzer-per-index contract —
the reference fixes one analyzer at model load, ``colbert/modeling/
tokenizers.py:12``; classical engines make it a build parameter).

One filter ships: the Harman "S-stemmer" (Donna Harman, "How Effective Is
Suffixing?", JASIS 42(1), 1991) — three ordered suffix rules:

  1. ``*ies`` → ``*y``   unless the word ends ``eies`` / ``aies``
  2. ``*es``  → ``*e``   unless the word ends ``aes`` / ``ees`` / ``oes``
  3. ``*s``   → drop s   unless the word ends ``us`` / ``ss``

Dispatch is on the longest matching ending, and an exception leaves the
word UNCHANGED (no fall-through to a shorter rule): ``toes`` → ``toes``.
Rule 3 additionally requires length > 2 (the Lucene
EnglishMinimalStemFilter guard) so degenerate grammar tokens like ``s``
never stem to the empty term.

Like the tokenizer grammar it is defined once with THREE engine spellings
that agree by construction (same rules, same order):

  * Python  — ``py_s_stem`` (driver-side query resolution, pure-Python oracle)
  * Spark   — ``stem_terms_col`` (JVM higher-order transform, codegen'd;
              zero Python in the build or query hot path)
  * DuckDB  — ``duckdb_stem_sql`` (list_transform CASE, the gate oracle)

`stats.json` records the build's analyzer; every query path re-applies it to
query tokens, so index and query text always see one analysis chain.
"""

from __future__ import annotations

ANALYZERS = ("s_stem",)


def py_s_stem(term: str) -> str:
    """Pure-Python S-stemmer — the oracle's (and serving path's) spelling.

    Dispatch is on the LONGEST matching ending first; an exception leaves
    the word unchanged (it does not fall through to a shorter rule) — the
    published if/elif structure, so ``toes`` stays ``toes``."""
    if term.endswith("ies"):
        if not term.endswith(("eies", "aies")):
            return term[:-3] + "y"
        return term
    if term.endswith("es"):
        if not term.endswith(("aes", "ees", "oes")):
            return term[:-1]
        return term
    if len(term) > 2 and term.endswith("s") and not term.endswith(("us", "ss")):
        return term[:-1]
    return term


def py_analyze(tokens: list[str], analyzer: str | None) -> list[str]:
    """Apply the named filter chain to a token list (None = identity)."""
    if analyzer is None:
        return tokens
    if analyzer == "s_stem":
        return [py_s_stem(t) for t in tokens]
    raise ValueError(f"unknown analyzer: {analyzer!r} (known: {ANALYZERS})")


# one CASE fragment per token variable; legal Spark SQL AND DuckDB SQL (LIKE,
# substring, length, || concatenation are common dialect)
_S_STEM_CASE = """CASE
  WHEN {t} LIKE '%ies' THEN
    CASE WHEN {t} NOT LIKE '%eies' AND {t} NOT LIKE '%aies'
      THEN substring({t}, 1, length({t}) - 3) || 'y' ELSE {t} END
  WHEN {t} LIKE '%es' THEN
    CASE WHEN {t} NOT LIKE '%aes' AND {t} NOT LIKE '%ees' AND {t} NOT LIKE '%oes'
      THEN substring({t}, 1, length({t}) - 1) ELSE {t} END
  WHEN length({t}) > 2 AND {t} LIKE '%s' AND {t} NOT LIKE '%us' AND {t} NOT LIKE '%ss'
    THEN substring({t}, 1, length({t}) - 1)
  ELSE {t}
END"""


def stem_terms_col(terms_col_name: str):
    """Spark Column: array<string> → S-stemmed array<string>, as a pure JVM
    higher-order ``transform`` (whole-stage codegen; no UDF)."""
    from pyspark.sql import functions as F

    return F.expr(
        f"transform({terms_col_name}, t -> {_S_STEM_CASE.format(t='t')})"
    )


def analyze_terms_col(terms_col_name: str, analyzer: str | None):
    """Spark Column applying the named filter chain to an array column."""
    from pyspark.sql import functions as F

    if analyzer is None:
        return F.col(terms_col_name)
    if analyzer == "s_stem":
        return stem_terms_col(terms_col_name)
    raise ValueError(f"unknown analyzer: {analyzer!r} (known: {ANALYZERS})")


def duckdb_stem_sql(list_expr: str) -> str:
    """DuckDB SQL fragment: S-stem every element of a list expression."""
    return f"list_transform({list_expr}, t -> {_S_STEM_CASE.format(t='t')})"
