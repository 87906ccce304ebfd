"""Local simulator of the driver's correctness harness.

Runs each __spark_entry__.queries() callable and its oracle_sql() DuckDB
twin on the same sf dir, compares row count, column names, and an
order-insensitive value comparison (sorted rows, floats to 1e-9 or exact
string equality). Usage:  python tools/check_harness.py [sf_dir]
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def norm_cell(x):
    if isinstance(x, float):
        return round(x, 9)
    if hasattr(x, "item"):
        return norm_cell(x.item())
    return x


def rows_key(rows):
    return sorted(tuple(norm_cell(c) for c in r) for r in rows)


def compare(name, srows, scols, drows, dcols):
    if len(srows) != len(drows):
        return f"ROWCOUNT spark={len(srows)} duck={len(drows)}"
    if [c.lower() for c in scols] != [c.lower() for c in dcols]:
        return f"SCHEMA spark={scols} duck={dcols}"
    a, b = rows_key(srows), rows_key(drows)
    for i, (ra, rb) in enumerate(zip(a, b)):
        for ca, cb in zip(ra, rb):
            if isinstance(ca, float) or isinstance(cb, float):
                fa = float(ca) if ca is not None else math.nan
                fb = float(cb) if cb is not None else math.nan
                if not (
                    (math.isnan(fa) and math.isnan(fb))
                    or math.isclose(fa, fb, rel_tol=1e-9, abs_tol=1e-9)
                ):
                    return f"VALUE row{i}: {ra} != {rb}"
            elif ca != cb:
                return f"VALUE row{i}: {ra} != {rb}"
    return None


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    import __spark_entry__ as entrymod
    from indexer_spark.session import get_spark

    spark = get_spark(cores=8, shuffle_partitions=8, driver_memory="6g")

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        try:
            sdf = fn(spark, sf_dir)
            srows = [tuple(r) for r in sdf.collect()]
            scols = sdf.columns
        except Exception as e:
            print(f"[FAIL] {name}: spark error: {type(e).__name__}: {str(e)[:200]}")
            failures += 1
            continue
        if name not in oracles:
            print(f"[rows-only] {name}: {len(srows)} rows, cols={scols}")
            continue
        try:
            res = con.sql(oracles[name])
            drows = res.fetchall()
            dcols = [d[0] for d in res.description]
        except Exception as e:
            print(f"[FAIL] {name}: duckdb error: {str(e)[:200]}")
            failures += 1
            continue
        err = compare(name, srows, scols, drows, dcols)
        if err:
            print(f"[FAIL] {name}: {err}")
            failures += 1
        else:
            print(f"[OK]   {name}: {len(srows)} rows match")

    print()
    print("entry() smoke:")
    try:
        edf = entrymod.entry(spark)
        rows = edf.collect()
        print(f"[OK]   entry: {len(rows)} rows, schema={edf.schema.simpleString()}")
        for r in rows[:3]:
            print("   ", r)
    except Exception as e:
        import traceback

        traceback.print_exc()
        failures += 1
    print(f"\n{failures} failures")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
