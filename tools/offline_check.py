#!/usr/bin/env python
"""Offline (no-Ray) oracle pre-check.

Runs ``__ray_entry__.queries()`` entries against a single-process
FakeDataset shim (``_read`` monkeypatched to plain pyarrow parquet reads)
and compares with ``oracle_sql()`` in DuckDB using the same
canon/value-hash rules as ``tools/selfcheck.py``. This lets new oracles be
validated while the box is reserved for an exclusive benchmark run — the
shim executes the REAL query/operator code (map_batches kernels, tagged
unions, partitioned group maps) in-process, it only replaces Ray's
executor. It is a pre-check, not the gate: ``tools/selfcheck.py`` under a
real Ray session remains authoritative.

Usage: taskset -c 16-31 python tools/offline_check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
from types import SimpleNamespace

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.selfcheck import TABLES, canon, to_pandas, value_hash  # noqa: E402

DEFAULT_BATCH = 1024  # small so multi-batch (partial/final) paths are real


def _as_format(t: pa.Table, fmt: str):
    return t.to_pandas() if fmt == "pandas" else t


def _from_result(r) -> pa.Table:
    if isinstance(r, pd.DataFrame):
        return pa.Table.from_pandas(r, preserve_index=False)
    return r


class FakeGroupBy:
    def __init__(self, table: pa.Table, key: str):
        self.table, self.key = table, key

    def _groups(self):
        df_keys = self.table.select([self.key]).to_pandas()[self.key]
        for v in pd.unique(df_keys):
            mask = (df_keys == v).to_numpy()
            yield self.table.filter(pa.array(mask))

    def map_groups(self, fn, batch_format="default", **kw):
        outs = [
            _from_result(fn(_as_format(g, batch_format))) for g in self._groups()
        ]
        outs = [o for o in outs if o.num_rows]
        return FakeDS(
            pa.concat_tables(outs, promote_options="default")
            if outs
            else self.table.schema.empty_table()
        )

    def aggregate(self, *aggs):
        assert len(aggs) == 1, "shim supports one aggregate"
        agg = aggs[0]
        cls = type(agg).__name__
        df = self.table.to_pandas()
        val_cols = [c for c in df.columns if c != self.key]
        if cls == "Sum":
            assert len(val_cols) == 1
            out = df.groupby(self.key, sort=False, as_index=False)[val_cols[0]].sum()
        elif cls == "Count":
            out = df.groupby(self.key, sort=False, as_index=False).size()
            out.columns = [self.key, "count()"]
        else:
            raise NotImplementedError(cls)
        alias = getattr(agg, "name", None) or getattr(agg, "_rs_name", None)
        if alias and alias != out.columns[-1]:
            out = out.rename(columns={out.columns[-1]: alias})
        return FakeDS(pa.Table.from_pandas(out, preserve_index=False))


class FakeDS:
    """The minimal slice of ray.data.Dataset the repo's queries use."""

    def __init__(self, table: pa.Table):
        self.table = table

    # -- transforms -------------------------------------------------
    def map_batches(self, fn, batch_format="default", batch_size=None, **kw):
        if isinstance(fn, type):
            fn = fn()
        size = batch_size or DEFAULT_BATCH
        outs = []
        for off in range(0, max(self.table.num_rows, 1), size):
            chunk = self.table.slice(off, size)
            r = _from_result(fn(_as_format(chunk, batch_format)))
            if r.num_rows:
                outs.append(r)
        return FakeDS(
            pa.concat_tables(outs, promote_options="default")
            if outs
            else self.table.schema.empty_table()
        )

    def filter(self, fn=None, expr=None, **kw):
        df = self.table.to_pandas()
        return FakeDS(
            pa.Table.from_pandas(df[df.apply(fn, axis=1)], preserve_index=False)
        )

    def select_columns(self, cols):
        return FakeDS(self.table.select(list(cols)))

    def union(self, other):
        return FakeDS(
            pa.concat_tables([self.table, other.table], promote_options="default")
        )

    def groupby(self, key):
        return FakeGroupBy(self.table, key)

    def sort(self, key, descending=False):
        keys = [key] if isinstance(key, str) else list(key)
        desc = (
            [descending] * len(keys) if isinstance(descending, bool) else list(descending)
        )
        df = self.table.to_pandas().sort_values(
            keys, ascending=[not d for d in desc], kind="mergesort"
        )
        return FakeDS(pa.Table.from_pandas(df, preserve_index=False))

    def limit(self, n):
        return FakeDS(self.table.slice(0, n))

    # -- introspection / consumption -------------------------------
    def schema(self):
        return SimpleNamespace(base_schema=self.table.schema)

    def count(self):
        return self.table.num_rows

    def materialize(self):
        return self

    def to_pandas(self):
        return self.table.to_pandas()

    def take_all(self):
        return self.table.to_pylist()

    def iter_batches(self, batch_format="pyarrow", batch_size=None, **kw):
        size = batch_size or DEFAULT_BATCH
        for off in range(0, self.table.num_rows, size):
            yield _as_format(self.table.slice(off, size), batch_format)


def fake_read(sf_dir: str, table: str, columns=None):
    return FakeDS(pq.read_table(os.path.join(sf_dir, f"{table}.parquet"), columns=columns))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __ray_entry__ as e

    e._read = fake_read

    con = duckdb.connect()
    con.execute("SET threads=8")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs, oracles = e.queries(), e.oracle_sql()
    failures, skips = [], []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        if name not in oracles:
            continue
        try:
            mine = canon(to_pandas(_from_result_or_ds(fn(sf_dir))))
        except Exception as ex:  # unsupported API in the shim → skip
            skips.append((name, f"{type(ex).__name__}: {ex}"))
            continue
        oracle = canon(con.execute(oracles[name]).df())
        rows = len(mine) == len(oracle)
        schema = list(mine.columns) == list(oracle.columns)
        hash_ok = rows and schema and value_hash(mine) == value_hash(oracle)
        status = "OK " if (rows and schema and hash_ok) else "FAIL"
        print(
            f"{status} {name}: rows {len(mine)}/{len(oracle)}"
            f" schema={'=' if schema else f'{list(mine.columns)} vs {list(oracle.columns)}'}"
            f" hash={'=' if hash_ok else '!'}"
        )
        if status == "FAIL":
            failures.append(name)
            if rows and schema:
                diff = (mine != oracle) & ~(mine.isna() & oracle.isna())
                bad = diff.any(axis=1)
                print("  first diffs (mine | oracle):")
                print(pd.concat([mine[bad].head(3), oracle[bad].head(3)], axis=1))
    for name, why in skips:
        print(f"SKIP {name}: {why}")
    print(f"\n{len(failures)} failures, {len(skips)} skips")
    return 1 if failures else 0


def _from_result_or_ds(r):
    return r


if __name__ == "__main__":
    sys.exit(main())
