"""Local replica of the driver's correctness gate: run every
queries() entry on Spark and its oracle_sql() on DuckDB over the same
parquet tables, compare row count + column names + order-insensitive
values.

Usage: python tools/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys

sys.path.insert(0, "/root/repo")

import duckdb
import pandas as pd


def normalise(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif str(df[c].dtype).startswith("float"):
            df[c] = df[c].round(6)
        # unify int widths
        elif str(df[c].dtype).startswith(("int", "uint")):
            df[c] = df[c].astype("int64")
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def compare(name: str, spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame) -> list[str]:
    problems = []
    if sorted(spark_pdf.columns) != sorted(duck_pdf.columns):
        problems.append(
            f"columns differ: spark={sorted(spark_pdf.columns)} duck={sorted(duck_pdf.columns)}"
        )
        return problems
    if len(spark_pdf) != len(duck_pdf):
        problems.append(f"row count: spark={len(spark_pdf)} duck={len(duck_pdf)}")
    a, b = normalise(spark_pdf), normalise(duck_pdf)
    if len(a) == len(b):
        for c in a.columns:
            av, bv = a[c], b[c]
            if str(av.dtype).startswith("float"):
                bad = [
                    i
                    for i, (x, y) in enumerate(zip(av, bv))
                    if not (
                        (pd.isna(x) and pd.isna(y))
                        or (not pd.isna(x) and not pd.isna(y) and math.isclose(x, y, abs_tol=2e-6))
                    )
                ]
            else:
                bad = [i for i, (x, y) in enumerate(zip(av.astype(str), bv.astype(str))) if x != y]
            if bad:
                i = bad[0]
                problems.append(
                    f"col {c}: {len(bad)} mismatches, first at row {i}: spark={a[c][i]!r} duck={b[c][i]!r}"
                )
    return problems


def main() -> None:
    import __spark_entry__ as entrymod
    from entityframe_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    spark = get_spark(app_name="oracle-check", cores=8)
    con = duckdb.connect()
    for t in entrymod.SF_TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            spark_pdf = fn(spark, sf_dir).toPandas()
        except Exception as exc:
            print(f"[FAIL] {name}: spark error: {exc}", flush=True)
            failures += 1
            continue
        if name not in oracles:
            print(f"[rows-only] {name}: {len(spark_pdf)} rows", flush=True)
            continue
        try:
            duck_pdf = con.sql(oracles[name]).df()
        except Exception as exc:
            print(f"[FAIL] {name}: duckdb error: {str(exc)[:300]}", flush=True)
            failures += 1
            continue
        problems = compare(name, spark_pdf, duck_pdf)
        if problems:
            failures += 1
            print(f"[FAIL] {name}: " + "; ".join(problems), flush=True)
        else:
            print(f"[OK]   {name}: {len(spark_pdf)} rows match", flush=True)
    print(f"done, {failures} failures", flush=True)
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
