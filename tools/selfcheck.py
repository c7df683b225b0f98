#!/usr/bin/env python
"""Driver-contract self-check: runs every ``__ray_entry__.queries()`` entry
at the given sf dir, runs the matching ``oracle_sql()`` in DuckDB over the
same parquet tables, and compares row count, column names, and value hashes
(columns sorted by name, rows sorted by all columns — mirroring the
driver's CORRECTNESS gate). Entries without an oracle get a rows-only
check. Exits non-zero if any SQL-checked entry mismatches.

Usage: python tools/selfcheck.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import os
import sys
import time
import traceback

import duckdb
import pandas as pd
import pyarrow as pa

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def to_pandas(result) -> pd.DataFrame:
    if isinstance(result, pd.DataFrame):
        return result
    if isinstance(result, pa.Table):
        return result.to_pandas()
    return result.to_pandas()  # ray Dataset


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif pd.api.types.is_float_dtype(df[c]):
            # integral floats (DuckDB HUGEINT→float64) compare as ints
            v = df[c].to_numpy()
            if len(v) and (v == v.astype("int64")).all():
                df[c] = v.astype("int64")
        elif pd.api.types.is_integer_dtype(df[c]):
            # masked Int64 with NA cannot astype int64 — mirror DuckDB's
            # rendering of NULL-able int results (float64 + NaN)
            if df[c].isna().any():
                df[c] = df[c].astype("float64")
            else:
                df[c] = df[c].astype("int64")
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def value_hash(df: pd.DataFrame) -> str:
    return hashlib.sha256(
        df.to_csv(index=False, float_format="%.9g").encode()
    ).hexdigest()[:16]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import ray

    if not ray.is_initialized():
        ray.init(
            address="local", num_cpus=16, include_dashboard=False,
            log_to_driver=False,
        )
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __ray_entry__ as e

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs, oracles = e.queries(), e.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            mine = canon(to_pandas(fn(sf_dir)))
        except Exception:
            print(f"FAIL  {name}: query raised\n{traceback.format_exc()}")
            failures.append(name)
            continue
        dt = time.time() - t0
        if name not in oracles:
            print(f"rows  {name}: {len(mine)} rows ({dt:.1f}s, no oracle)")
            continue
        try:
            oracle = canon(con.execute(oracles[name]).fetchdf())
        except Exception:
            print(f"FAIL  {name}: oracle raised\n{traceback.format_exc()}")
            failures.append(name)
            continue
        problems = []
        if len(mine) != len(oracle):
            problems.append(f"rows {len(mine)} != {len(oracle)}")
        if list(mine.columns) != list(oracle.columns):
            problems.append(f"cols {list(mine.columns)} != {list(oracle.columns)}")
        if not problems and value_hash(mine) != value_hash(oracle):
            diff = mine.compare(oracle) if mine.shape == oracle.shape else None
            problems.append(
                f"value hash mismatch"
                + (f"; first diffs:\n{diff.head(5)}" if diff is not None and len(diff) else "")
            )
        if problems:
            print(f"FAIL  {name}: {'; '.join(problems)} ({dt:.1f}s)")
            failures.append(name)
        else:
            print(f"ok    {name}: {len(mine)} rows ({dt:.1f}s)")
    if failures:
        print(f"\n{len(failures)} FAILURES: {failures}")
        return 1
    print("\nall checks passed")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
