"""Local replica of the driver's queries() vs oracle_sql() compare.

Runs each Spark query and its DuckDB oracle on the same sf dir, compares
row count, column names, and order-insensitive values (sorted rows,
columns sorted by name). Usage:
    python tests/oracle_check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys

import duckdb


def canon(rows, cols):
    """Canonical sorted representation for order-insensitive compare.

    STRICT on purpose (round-1 driver lesson): no rounding and no ±0.0
    normalization here — the driver's value-hash is exact, so queries
    must canonicalize their own output (round in the projection, `+ 0.0`
    after trig rounds, cast window sums to BIGINT in the oracle). A
    harness that rounds masks exactly the mismatches the driver flags
    (r1: q05 hugeint-vs-bigint, q09 -0.0-vs-0.0)."""
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in idx:
            v = r[i]
            if isinstance(v, float) and math.isnan(v):
                v = "NaN"
            else:
                v = repr(v)
            vals.append(v)
        out.append("|".join(vals))
    out.sort()
    return out


def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as e
    from featurewiz_spark import get_spark

    spark = get_spark("oracle_check")
    con = duckdb.connect()
    for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'"
        )

    qs = e.queries()
    oracles = e.oracle_sql()
    n_pass = n_fail = n_rowsonly = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf)
            srows = sdf.collect()
            scols = sdf.columns
        except Exception as ex:
            print(f"FAIL  {name}: spark error: {ex}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"ROWS  {name}: {len(srows)} rows (no oracle)")
            n_rowsonly += 1
            continue
        try:
            ores = con.sql(oracles[name])
            orows = ores.fetchall()
            ocols = [d[0] for d in ores.description]
        except Exception as ex:
            print(f"FAIL  {name}: duckdb error: {ex}")
            n_fail += 1
            continue
        if len(srows) != len(orows):
            print(f"FAIL  {name}: rowcount spark={len(srows)} duckdb={len(orows)}")
            n_fail += 1
            continue
        if sorted(scols) != sorted(ocols):
            print(f"FAIL  {name}: cols spark={sorted(scols)} duckdb={sorted(ocols)}")
            n_fail += 1
            continue
        sc = canon([tuple(r) for r in srows], scols)
        oc = canon(orows, ocols)
        if sc == oc:
            print(f"PASS  {name}: {len(srows)} rows")
            n_pass += 1
        else:
            diff = [(a, b) for a, b in zip(sc, oc) if a != b][:3]
            print(f"FAIL  {name}: value mismatch; first diffs: {diff}")
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_rowsonly} rows-only")
    spark.stop()
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
