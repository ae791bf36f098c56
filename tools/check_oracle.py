"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry on Spark at sf0.01 and the matching
``oracle_sql()`` on DuckDB over the same parquet tables; compares
row count, sorted column names, and order-insensitive values (exact
string compare after canonicalization, plus a float-tolerant fallback
so we can see WHICH kind of mismatch occurred).

Usage: python tools/check_oracle.py [query_name ...]
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("ORACLE_SF_DIR", "/root/testdata/sf0.01")


def canon_cell(v):
    if v is None:
        return "\0NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return repr(v)
    if isinstance(v, bool):
        return str(v).lower()
    return str(v)


def canon_rows(cols, rows):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted("\x1f".join(canon_cell(r[i]) for i in idx) for r in rows)


def loose_equal(a, b):
    if len(a) != len(b):
        return False
    # sort by canonical string form: raw tuples may mix None with
    # non-None values, which Python's default tuple sort rejects
    def key(r):
        return tuple(canon_cell(x) for x in r)
    for ra, rb in zip(sorted(a, key=key), sorted(b, key=key)):
        if len(ra) != len(rb):
            return False
        for x, y in zip(ra, rb):
            if isinstance(x, float) and isinstance(y, float):
                if not (math.isclose(x, y, rel_tol=1e-9, abs_tol=1e-12)
                        or (math.isnan(x) and math.isnan(y))):
                    return False
            elif canon_cell(x) != canon_cell(y):
                return False
    return True


def main():
    import duckdb

    import __spark_entry__ as e
    from slowly_changing_dimensions_data_engineering_spark.session import get_spark

    spark = get_spark("oracle-check", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "8")))
    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem events "
              "documents embeddings").split():
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")

    qs, oracles = e.queries(), e.oracle_sql()
    only = set(sys.argv[1:])
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, SF_DIR)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as ex:
            print(f"FAIL  {name}: spark error: {ex}")
            failures += 1
            continue
        if name not in oracles:
            print(f"rows  {name}: {len(srows)} rows (no oracle — rows-only check)")
            continue
        try:
            ddf = con.sql(oracles[name])
            dcols = ddf.columns
            drows = ddf.fetchall()
        except Exception as ex:
            print(f"FAIL  {name}: duckdb error: {ex}")
            failures += 1
            continue
        dt_s = time.time() - t0
        if sorted(scols) != sorted(dcols):
            print(f"FAIL  {name}: columns {sorted(scols)} != {sorted(dcols)}")
            failures += 1
            continue
        if len(srows) != len(drows):
            print(f"FAIL  {name}: rowcount {len(srows)} != {len(drows)}")
            failures += 1
            continue
        sc, dc = canon_rows(scols, srows), canon_rows(dcols, drows)
        if sc == dc:
            print(f"OK    {name}: {len(srows)} rows exact-match  ({dt_s:.1f}s)")
        else:
            sidx = [scols.index(c) for c in sorted(scols)]
            didx = [dcols.index(c) for c in sorted(dcols)]
            sl = [tuple(r[i] for i in sidx) for r in srows]
            dl = [tuple(r[i] for i in didx) for r in drows]
            if loose_equal(sl, dl):
                diffs = [(x, y) for x, y in zip(sc, dc) if x != y][:2]
                print(f"WARN  {name}: float-tolerant match only; e.g. {diffs}")
            else:
                bad = [(x, y) for x, y in zip(sc, dc) if x != y][:3]
                print(f"FAIL  {name}: value mismatch; first diffs: {bad}")
                failures += 1
    print("DONE", "failures:", failures)
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
