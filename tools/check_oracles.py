#!/usr/bin/env python
"""Self-check of the driver contract: run every ``queries()`` entry
that has an ``oracle_sql()`` twin at sf0.01 and compare row count,
column names, and an order-insensitive value hash (columns sorted by
name, rows sorted, values stringified) — a local mirror of the
driver's CORRECTNESS gate.

Usage: python tools/check_oracles.py [query ...]
"""

from __future__ import annotations

import hashlib
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def _canon(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, float):
        return f"{v:.6f}"
    if isinstance(v, bool):
        return str(v).lower()
    return str(v)


def value_hash(cols: list[str], rows: list[tuple]) -> str:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    canon_rows = sorted("|".join(_canon(r[i]) for i in order) for r in rows)
    return hashlib.md5("\n".join(canon_rows).encode()).hexdigest()


def main() -> None:
    import duckdb

    import __spark_entry__ as entry
    from smartglass_ocr_spark.session import get_spark

    wanted = sys.argv[1:]
    qs, oracles = entry.queries(), entry.oracle_sql()
    unknown = [w for w in wanted if w not in oracles]
    if unknown:
        known = ", ".join(sorted(oracles))
        sys.exit(f"unknown query name(s) {unknown}; oracle-backed queries: {known}")
    spark = get_spark("oracle-check", cpus=8, shuffle_partitions=16)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    failures = []
    try:
        for name, sql in oracles.items():
            if wanted and name not in wanted:
                continue
            sdf = qs[name](spark, SF_DIR)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
            rel = con.sql(sql)
            dcols = rel.columns
            drows = rel.fetchall()
            ok_n = len(srows) == len(drows)
            ok_c = sorted(scols) == sorted(dcols)
            ok_h = ok_c and value_hash(scols, srows) == value_hash(dcols, drows)
            status = "OK" if (ok_n and ok_c and ok_h) else "FAIL"
            print(
                f"{status:4} {name}: rows {len(srows)}/{len(drows)} "
                f"cols={'=' if ok_c else scols} hash={'=' if ok_h else 'MISMATCH'}"
            )
            if status != "OK":
                failures.append(name)
    finally:
        spark.stop()
    if failures:
        print("FAILURES:", failures)
        sys.exit(1)
    print("all oracles green")


if __name__ == "__main__":
    main()
