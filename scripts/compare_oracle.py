"""Local replica of the driver's correctness gate: run every registered
query through Spark AND its DuckDB oracle SQL, compare row count + sorted
column names + canonicalized values. Usage:

    python scripts/compare_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ocr_automation_system_spark.oracle.twin import render_sql  # noqa: E402
from ocr_automation_system_spark.queries import _CORPUS_ROWS, REGISTRY  # noqa: E402
from ocr_automation_system_spark.session import build_session  # noqa: E402
from ocr_automation_system_spark.sources.catalog import TABLE_NAMES  # noqa: E402


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1).copy()
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            df[c] = s.astype("datetime64[us]").astype(str)
        elif pd.api.types.is_float_dtype(s):
            df[c] = s.astype(np.float64)
        elif pd.api.types.is_bool_dtype(s):
            df[c] = s.astype(bool)
        elif pd.api.types.is_integer_dtype(s):
            df[c] = s.astype(np.int64)
        else:
            df[c] = s.astype(str)
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


def duck_for(sf_dir: str) -> "duckdb.DuckDBPyConnection":
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{os.path.join(sf_dir, t)}.parquet'"
        )
    return con


def run_compare(spark, con, sf_dir: str, only=None) -> list:
    """The driver-gate replica as a callable: run every registered query
    through Spark AND its rendered DuckDB twin, return the list of failing
    query names (empty = all green). Shared by the CLI below and
    tests/test_entry_contract.py's full-registry sweep so a late-added
    query can never ship without a comparator pass."""
    failures = []
    for name, (fn, sql) in REGISTRY.items():
        if only and name not in only:
            continue
        try:
            sp = fn(spark, sf_dir).toPandas()
        except Exception as exc:
            print(f"FAIL  {name}: spark error: {exc}")
            failures.append(name)
            continue
        if sql is None:
            print(f"ok?   {name}: rows-only ({len(sp)} rows)")
            continue
        try:
            n = _CORPUS_ROWS.get(os.path.basename(sf_dir.rstrip("/")), 400)
            du = con.execute(render_sql(sql, n)).df()
        except Exception as exc:
            print(f"FAIL  {name}: duckdb error: {exc}")
            failures.append(name)
            continue
        if len(sp) != len(du):
            print(f"FAIL  {name}: rowcount spark={len(sp)} duckdb={len(du)}")
            failures.append(name)
            continue
        if sorted(sp.columns) != sorted(du.columns):
            print(f"FAIL  {name}: columns spark={sorted(sp.columns)} duckdb={sorted(du.columns)}")
            failures.append(name)
            continue
        a, b = canon(sp), canon(du)
        if a.equals(b):
            print(f"OK    {name} ({len(sp)} rows)")
        else:
            neq = (a != b) & ~(a.isna() & b.isna())
            bad_cols = [c for c in a.columns if neq[c].any()]
            print(f"FAIL  {name}: value mismatch in {bad_cols}")
            for c in bad_cols[:3]:
                idx = neq[c].idxmax()
                print(f"      {c}[{idx}]: spark={a[c][idx]!r} duckdb={b[c][idx]!r}")
            failures.append(name)
    return failures


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])
    spark = build_session("compare_oracle")
    failures = run_compare(spark, duck_for(sf_dir), sf_dir, only)
    print(f"\n{len(failures)} failures: {failures}" if failures else "\nALL OK")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
