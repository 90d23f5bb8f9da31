"""Local replica of the driver's correctness gate.

For every key in `__spark_entry__.queries()`, runs the Spark query and the
DuckDB `oracle_sql()` side-by-side at sf0.01 and compares row count, schema
(column names, sorted), and a value hash (columns sorted by name, rows sorted
by all columns, values canonicalised). Prints one line per key and exits
non-zero if any entry mismatches.

Usage: python tools/check_contract.py [--sf-dir /root/testdata/sf0.01] [keys...]
"""

from __future__ import annotations

import argparse
import hashlib
import math
import os
import sys

import duckdb

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _canon(v):
    if v is None:
        return "\0"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.10g}"
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon(x) for x in v) + "]"
    return str(v)


def value_hash(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    canon_rows = sorted(
        "|".join(_canon(r[i]) for i in order) for r in rows
    )
    h = hashlib.sha256()
    for r in canon_rows:
        h.update(r.encode("utf8"))
        h.update(b"\n")
    return h.hexdigest()


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("keys", nargs="*")
    args = ap.parse_args()

    import __spark_entry__ as entry
    from colbert_spark.session import get_spark

    qs = entry.queries()
    oracles = entry.oracle_sql()
    keys = args.keys or sorted(qs)

    spark = get_spark()
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(args.sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')"
            )

    failures = []
    for k in keys:
        try:
            sdf = qs[k](spark, args.sf_dir)
            s_cols = list(sdf.columns)
            s_rows = [tuple(r) for r in sdf.collect()]
            if k not in oracles:
                print(f"{k}: rows-only ({len(s_rows)} rows, no oracle)")
                continue
            o = con.execute(oracles[k])
            o_cols = [d[0] for d in o.description]
            o_rows = o.fetchall()
            rows_ok = len(s_rows) == len(o_rows)
            schema_ok = sorted(s_cols) == sorted(o_cols)
            hash_ok = (
                schema_ok
                and value_hash(s_cols, s_rows) == value_hash(o_cols, o_rows)
            )
            ok = rows_ok and schema_ok and hash_ok
            status = "PASS" if ok else "FAIL"
            detail = ""
            if not rows_ok:
                detail += f" rows {len(s_rows)}!={len(o_rows)}"
            if not schema_ok:
                detail += f" schema {sorted(s_cols)}!={sorted(o_cols)}"
            elif not hash_ok:
                detail += " hash"
            print(f"{k}: {status}{detail} ({len(s_rows)} rows)")
            if not ok:
                failures.append(k)
        except Exception as exc:  # noqa: BLE001
            print(f"{k}: ERROR {type(exc).__name__}: {exc}")
            failures.append(k)

    print(f"\n{len(keys) - len(failures)}/{len(keys)} pass")
    if failures:
        print("failed:", ", ".join(failures))
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
