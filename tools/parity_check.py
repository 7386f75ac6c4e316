"""Local stand-in for the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` on
DuckDB at the given sf dir, compares row count, column names, and an
order-insensitive value hash (columns sorted by name, rows sorted).

Usage: python tools/parity_check.py [sf_dir] [name ...]
"""

from __future__ import annotations

import hashlib
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def norm_hash(df: pd.DataFrame) -> str:
    cols = sorted(df.columns)
    d = df[cols].copy()
    for c in cols:
        if d[c].dtype == "float64" or d[c].dtype == "float32":
            d[c] = d[c].astype("float64").round(9)
    rows = sorted(
        tuple(str(v) for v in row) for row in d.itertuples(index=False, name=None)
    )
    h = hashlib.sha256()
    for r in rows:
        h.update("\x1f".join(r).encode())
        h.update(b"\x1e")
    return h.hexdigest()


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entrymod
    from aiotcvectordb_spark.session import get_spark

    spark = get_spark("parity")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    unknown = only - set(qs)
    if unknown:
        print(f"error: unknown query name(s): {sorted(unknown)}", file=sys.stderr)
        return 2
    failures = []
    ran = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        ran += 1
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            print(f"FAIL {name}: spark error: {e}")
            failures.append(name)
            continue
        took = time.time() - t0
        if name not in oracles:
            status = "ROWS-ONLY" if len(sdf) >= 0 else "EMPTY"
            print(f"ok   {name}: {status} rows={len(sdf)} ({took:.1f}s)")
            continue
        try:
            odf = con.sql(oracles[name]).df()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            failures.append(name)
            continue
        problems = []
        if len(sdf) != len(odf):
            problems.append(f"rows {len(sdf)} vs {len(odf)}")
        if sorted(sdf.columns) != sorted(odf.columns):
            problems.append(f"cols {sorted(sdf.columns)} vs {sorted(odf.columns)}")
        if not problems and norm_hash(sdf) != norm_hash(odf):
            problems.append("value-hash mismatch")
            merged = sdf.sort_values(sorted(sdf.columns)).reset_index(drop=True)
            omerged = odf.sort_values(sorted(odf.columns)).reset_index(drop=True)
            for i in range(min(len(merged), len(omerged))):
                if tuple(map(str, merged.iloc[i])) != tuple(map(str, omerged.iloc[i])):
                    problems.append(
                        f"first diff row {i}: spark={dict(merged.iloc[i])} oracle={dict(omerged.iloc[i])}"
                    )
                    break
        if problems:
            print(f"FAIL {name}: {'; '.join(problems)} ({took:.1f}s)")
            failures.append(name)
        else:
            print(f"ok   {name}: MATCH rows={len(sdf)} ({took:.1f}s)")
    skipped = len(qs) - ran
    suffix = f" ({skipped} skipped)" if skipped else ""
    print(f"\n{ran - len(failures)}/{ran} pass{suffix}")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
