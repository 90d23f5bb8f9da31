"""Deterministic tokenizer shared by the Spark engine, the pure-Python oracle,
and the DuckDB SQL oracle.

The reference tokenizes with a BERT wordpiece tokenizer and masks punctuation
out of scoring (reference ``colbert/modeling/tokenizers.py:16-17,32-63``:
``ignore_words = zhon.hanzi.punctuation + string.punctuation``; CJK text is
effectively character-granular under the Chinese BERT vocab). Our classical-IR
analog keeps those *semantics* — lowercase, punctuation never scores, CJK
characters are single terms, latin/digit runs are terms — but defines them as
ONE regular expression so that three engines produce byte-identical terms by
construction (the ``input_hint`` invariant):

  * Spark:  ``regexp_extract_all(lower(text), JAVA_TOKEN_REGEX, 0)``
            (JVM-side, whole-stage codegen — NO Python in the hot path)
  * Python: ``re.findall(PY_TOKEN_REGEX, text.lower())``  (the oracle)
  * DuckDB: ``regexp_extract_all(lower(text), DUCKDB_TOKEN_REGEX)``

Token grammar: a term is either a maximal run of ``[a-z0-9]`` or a single CJK
ideograph (U+4E00..U+9FFF). Everything else (punctuation, other scripts,
whitespace) is a separator and never scores — mirroring the reference's
ignore-set.
"""

from __future__ import annotations

import re

# One grammar, three concrete spellings (regex-engine escape syntax differs).
PY_TOKEN_REGEX = "[a-z0-9]+|[一-鿿]"
JAVA_TOKEN_REGEX = "[a-z0-9]+|[\\u4e00-\\u9fff]"  # java.util.regex escapes
DUCKDB_TOKEN_REGEX = r"[a-z0-9]+|[\x{4e00}-\x{9fff}]"  # RE2 escapes

_TOKEN_RE = re.compile(PY_TOKEN_REGEX)

# html → text extraction grammar, likewise engine-portable: drop
# script/style elements wholesale, strip all remaining tags. The tokenizer
# regex then treats any leftover entities/whitespace as separators, so
# tokenize(extract(html)) == tokenize(text) for well-formed pages.
PY_SCRIPT_STYLE_RE = "(?s)<(script|style)[^>]*>.*?</\\1>"
PY_TAG_RE = "<[^>]*>"
JAVA_SCRIPT_STYLE_RE = "(?s)<(script|style)[^>]*>.*?</\\1>"
JAVA_TAG_RE = "<[^>]*>"

_SCRIPT_STYLE_RE = re.compile(PY_SCRIPT_STYLE_RE)
_TAG_RE = re.compile(PY_TAG_RE)


def py_tokenize(text: str) -> list[str]:
    """Pure-Python tokenizer — the oracle's (and tests') source of truth."""
    if not text:
        return []
    return _TOKEN_RE.findall(text.lower())


def py_html_to_text(html: bytes | str) -> str:
    """Deterministic html→text: decode utf-8, drop script/style, strip tags."""
    if isinstance(html, (bytes, bytearray)):
        html = bytes(html).decode("utf-8", errors="replace")
    no_scripts = _SCRIPT_STYLE_RE.sub(" ", html)
    return _TAG_RE.sub(" ", no_scripts)


def tokens_col(col_name="text"):
    """Spark Column of array<string> terms — pure JVM expressions, codegen'd.

    Equivalent to ``py_tokenize`` by construction (same regex grammar).
    Accepts a column name or a Column expression.
    """
    from pyspark.sql import Column
    from pyspark.sql import functions as F

    c = col_name if isinstance(col_name, Column) else F.col(col_name)
    return F.regexp_extract_all(F.lower(c), F.lit(JAVA_TOKEN_REGEX), 0)


def html_text_col(col_name: str = "html"):
    """Spark Column: html binary → extracted text string (JVM-side regexes)."""
    from pyspark.sql import functions as F

    decoded = F.decode(F.col(col_name), "UTF-8")
    no_scripts = F.regexp_replace(decoded, JAVA_SCRIPT_STYLE_RE, " ")
    return F.regexp_replace(no_scripts, JAVA_TAG_RE, " ")


def duckdb_tokens_sql(expr: str = "text") -> str:
    """DuckDB SQL fragment producing the identical array<string> of terms."""
    return f"regexp_extract_all(lower({expr}), '{DUCKDB_TOKEN_REGEX}')"
