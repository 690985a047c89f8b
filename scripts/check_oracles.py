"""Mirror of the driver's correctness gate: run every queries() entry on
Spark AND its oracle_sql() on DuckDB over the same parquet, compare
row-count + column names + order-insensitive values. Usage:
    PYTHONPATH=/root/repo python scripts/check_oracles.py [sf_dir] [name ...]
"""
import sys

import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm_cell(v):
    import datetime
    import math

    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.9g}"
    if isinstance(v, datetime.datetime):
        return v.isoformat()
    return str(v)


def norm_rows(cols, rows):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(norm_cell(r[i]) for i in idx) for r in rows)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    from crawlee_spark.plans.queries import ORACLES, QUERIES
    from crawlee_spark.session import get_spark

    spark = get_spark("oracle_check", master="local[8]", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    results = {}
    for name, fn in QUERIES.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = sdf.collect()
        except Exception as e:
            results[name] = f"SPARK-ERROR: {str(e).splitlines()[0][:160]}"
            print(name, "->", results[name], flush=True)
            continue
        if name not in ORACLES:
            results[name] = f"rows-only ({len(srows)} rows)"
            print(name, "->", results[name], flush=True)
            continue
        try:
            res = con.execute(ORACLES[name])
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception as e:
            results[name] = f"ORACLE-ERROR: {str(e).splitlines()[0][:160]}"
            print(name, "->", results[name], flush=True)
            continue
        if sorted(scols) != sorted(ocols):
            results[name] = f"SCHEMA-MISMATCH spark={sorted(scols)} oracle={sorted(ocols)}"
        elif len(srows) != len(orows):
            results[name] = f"COUNT-MISMATCH spark={len(srows)} oracle={len(orows)}"
        else:
            a = norm_rows(scols, [[r[c] for c in scols] for r in srows])
            b = norm_rows(ocols, orows)
            if a != b:
                diff = next((i, x, y) for i, (x, y) in enumerate(zip(a, b)) if x != y)
                results[name] = f"VALUE-MISMATCH at {diff[0]}: spark={diff[1]} oracle={diff[2]}"
            else:
                results[name] = f"OK ({len(srows)} rows)"
        print(name, "->", results[name], flush=True)

    bad = {k: v for k, v in results.items() if not (v.startswith("OK") or v.startswith("rows-only"))}
    print("\nSUMMARY:", len(results) - len(bad), "ok /", len(results))
    for k, v in bad.items():
        print("  FAIL", k, "->", v)
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
