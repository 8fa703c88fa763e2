#!/usr/bin/env python
"""Local twin of the driver's correctness gate: run every
``__spark_entry__.queries()`` entry on Spark and its
``oracle_sql()`` twin on DuckDB at sf0.01, compare row count, column
names, and an order-insensitive value hash.

Usage: python tools/check_contract.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import sys

import duckdb
import pandas as pd


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # stable stringification: floats to repr with limited precision,
    # None/NaN to a sentinel
    def cell(v):
        if v is None or (isinstance(v, float) and pd.isna(v)):
            return "∅"
        if isinstance(v, float):
            return format(v, ".10g")
        return str(v)

    out = df.apply(lambda col: col.map(cell))
    return out.sort_values(by=list(out.columns)).reset_index(drop=True)


def value_hash(df: pd.DataFrame) -> str:
    h = hashlib.md5()
    for row in normalize(df).itertuples(index=False):
        h.update(("|".join(row) + "\n").encode())
    return h.hexdigest()


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    sys.path.insert(0, ".")
    import __spark_entry__ as entrymod
    from smartglass_ocr_spark.session import get_spark

    spark = get_spark("contract-check", cpus=8, shuffle_partitions=16)
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: spark error: {e}")
            continue
        if name not in oracles:
            print(f"ok?   {name}: rows={len(sdf)} (no oracle; rows-only check)")
            if len(sdf) == 0:
                failures.append(name)
                print(f"FAIL  {name}: empty result")
            continue
        try:
            odf = con.sql(oracles[name]).df()
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: duckdb error: {e}")
            continue
        problems = []
        if len(sdf) != len(odf):
            problems.append(f"rows {len(sdf)} != {len(odf)}")
        if sorted(sdf.columns) != sorted(odf.columns):
            problems.append(f"cols {sorted(sdf.columns)} != {sorted(odf.columns)}")
        if not problems and value_hash(sdf) != value_hash(odf):
            a, b = normalize(sdf), normalize(odf)
            diff = a.compare(b) if a.shape == b.shape else None
            problems.append(
                f"value hash mismatch; first diffs:\n{diff.head(5) if diff is not None else '(shape)'}"
            )
        if problems:
            failures.append(name)
            print(f"FAIL  {name}: " + "; ".join(problems))
        else:
            print(f"OK    {name}: rows={len(sdf)}")
    spark.stop()
    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
