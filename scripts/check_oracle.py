"""Replicate the driver's correctness gate locally.

Runs every __spark_entry__.queries() entry via Spark AND its oracle_sql()
via DuckDB on the same parquet tables, then compares row count, column
names, and an order-insensitive value hash (columns sorted by name, rows
sorted, floats normalized).

Usage: python scripts/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import sys
import time

import duckdb

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entry_mod  # noqa: E402
from fel_spark.session import get_spark  # noqa: E402
from fel_spark.sources.testdata import TABLES  # noqa: E402


def norm_cell(v) -> str:
    import datetime
    import decimal
    import math

    if v is None:
        return "NULL"
    if isinstance(v, decimal.Decimal):
        # Deliberately NOT normalized to int/float: DuckDB HUGEINT/DECIMAL
        # crosses Arrow as decimal128 -> Decimal, which the driver's hash
        # renders differently from Spark's int. Rendering it distinctly here
        # makes such an oracle FAIL locally exactly as it fails at the
        # driver (the conv_integrity r3/r4 class; see VERDICT r4 #1).
        return f"DEC:{v}"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.6g}"
    if isinstance(v, datetime.datetime):
        return v.isoformat(sep=" ")
    if isinstance(v, datetime.date):
        return v.isoformat()
    return str(v)


def table_hash(cols: list[str], rows: list[tuple]) -> str:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted(
        "\x1f".join(norm_cell(r[i]) for i in order) for r in rows
    )
    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\n")
    return h.hexdigest()[:16]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark(app_name="check_oracle")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    n_fail = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            df = fn(spark, sf_dir)
            cols = df.columns
            rows = [tuple(r) for r in df.collect()]
        except Exception as ex:  # noqa: BLE001
            print(f"FAIL {name}: spark error: {type(ex).__name__}: {str(ex)[:200]}")
            n_fail += 1
            continue
        sql = oracles.get(name)
        if sql is None:
            print(f"ok?  {name}: rows-only ({len(rows)} rows, {time.time()-t0:.1f}s)")
            if len(rows) == 0:
                print(f"     WARNING {name}: 0 rows")
            continue
        try:
            rel = con.sql(sql)
            # Fetch through Arrow, NOT fetchall(): the driver compares via
            # Arrow, where DuckDB HUGEINT surfaces as decimal128 -> Decimal
            # while fetchall() silently coerces to plain int. Arrow fetch +
            # the Decimal-distinct norm_cell reproduces the driver's
            # behavior for that divergence class locally.
            atbl = rel.arrow()
            ocols = list(atbl.column_names)
            ocol_lists = [atbl.column(c).to_pylist() for c in ocols]
            orows = list(zip(*ocol_lists)) if ocols and atbl.num_rows else []
        except Exception as ex:  # noqa: BLE001
            print(f"FAIL {name}: duckdb error: {type(ex).__name__}: {str(ex)[:200]}")
            n_fail += 1
            continue
        problems = []
        if sorted(cols) != sorted(ocols):
            problems.append(f"schema {sorted(cols)} vs {sorted(ocols)}")
        if len(rows) != len(orows):
            problems.append(f"rowcount {len(rows)} vs {len(orows)}")
        if not problems:
            hs, ho = table_hash(cols, rows), table_hash(ocols, orows)
            if hs != ho:
                problems.append(f"valuehash {hs} vs {ho}")
                # show a sample diff
                order_s = sorted(range(len(cols)), key=lambda i: cols[i])
                order_o = sorted(range(len(ocols)), key=lambda i: ocols[i])
                set_s = {tuple(norm_cell(r[i]) for i in order_s) for r in rows}
                set_o = {tuple(norm_cell(r[i]) for i in order_o) for r in orows}
                only_s = list(set_s - set_o)[:3]
                only_o = list(set_o - set_s)[:3]
                print(f"     spark-only: {only_s}")
                print(f"     duck-only : {only_o}")
        if problems:
            print(f"FAIL {name}: {'; '.join(problems)}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(rows)} rows, {time.time()-t0:.1f}s)")
    spark.stop()
    print("FAILURES:", n_fail)
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
