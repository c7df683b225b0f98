"""Relational operators Ray Data lacks, built as compositions (SURVEY.md
§2 "custom operators"): as-of join, range join, top-k per group, exact
per-group quantiles.

Common shape: ONE coarse hash shuffle that co-locates every row of a
`by`-key group in one partition (the documented partitioning assumption),
then a fully vectorized per-partition kernel — pandas `merge_asof`,
numpy `searchsorted` interval counting, sort+head, sorted-index quantile
lookup. Two-input operators tag sides and union BEFORE the shuffle, so
the exchange happens once, not per side; sides are split back in Arrow
(not pandas) so null-padded int64 columns never degrade to float64.

Skew note: a hot `by` key serializes into one task. For keys known to be
hot, salt upstream (split the key, merge partials) — these operators keep
the contract simple and exact instead.
"""

from __future__ import annotations

from typing import Callable, Sequence

import numpy as np
import pandas as pd

from raydf.joins import default_partitions, partitioned_group_map


def _two_sided_partition_map(
    left,
    right,
    by: Sequence[str],
    part_fn: Callable[[pd.DataFrame, pd.DataFrame], pd.DataFrame],
    *,
    num_partitions: int | None = None,
    out_schema_fn: Callable | None = None,
    salt: int | None = None,
    salt_col: str | None = None,
):
    """Tag sides → align schemas with typed nulls → union → ONE hash
    shuffle on ``by`` → ``part_fn(left_rows, right_rows)`` per partition.

    Schema alignment uses each side's own Arrow types; a column present on
    both sides stays per-side (each side's tag only fills ITS columns, and
    the kernel re-selects per side), so same-named columns like ``ts`` on
    both inputs are fine.

    ``salt=S`` (opt-in, for hot ``by`` keys): LEFT rows additionally carry
    ``__salt = splitmix64(left[salt_col]) % S`` and RIGHT rows are
    replicated once per salt value, with the shuffle keyed on
    ``by + [__salt]`` — a hot key's left rows fan out over S tasks while
    every shard still sees the key's full right side. Exact for
    left-row-shaped kernels (each left row is processed exactly once);
    kernels that aggregate RIGHT rows per group must group on
    ``by + ['__salt']`` (``__salt`` is exposed in both frames). Right-side
    data volume for the salted keys is ×S — size S to the straggler, not
    the cluster."""
    import pyarrow as pa
    import pyarrow.compute as pc

    by = list(by)
    salted = bool(salt and salt > 1)
    if salted:
        assert salt_col is not None, "salt requires salt_col (an int64 LEFT column)"
    P = num_partitions if num_partitions is not None else default_partitions()
    from raydf.joins import arrow_schema

    from raydf.joins import _widen_type, widen_offsets

    ls = arrow_schema(left)
    rs = arrow_schema(right)
    lcols, rcols = list(ls.names), list(rs.names)
    # widened (large_*) varlen types end-to-end: the union rides a
    # sort-based exchange whose reduce concatenates one partition into a
    # single table — 32-bit offsets cap that at 2 GiB (joins.widen_offsets)
    types = {n: _widen_type(rs.field(n).type) for n in rcols}
    types.update({n: _widen_type(ls.field(n).type) for n in lcols})
    all_cols = lcols + [c for c in rcols if c not in lcols]
    out_schema = out_schema_fn(ls, rs) if out_schema_fn is not None else None
    if salted:
        lcols = lcols + ["__salt"]
        rcols = rcols + ["__salt"]

    def tag(side: int, cols: frozenset):
        def f(t: pa.Table) -> pa.Table:
            from raydf.canonicalize import _mix_mod

            keys = t.select(by).to_pandas()
            h = pd.util.hash_pandas_object(keys, index=False).to_numpy()
            n = len(t)
            out = {}
            for c in all_cols:
                out[c] = t[c].cast(types[c]) if c in cols else pa.nulls(n, types[c])
            out["__side"] = pa.array(np.full(n, side, np.int8), pa.int8())
            if not salted:
                out["__p"] = pa.array(
                    (h % np.uint64(P)).astype(np.int64), pa.int64()
                )
                return pa.table(out)
            if side == 0:
                sv = t[salt_col].to_numpy(zero_copy_only=False).astype(np.int64)
                out["__salt"] = pa.array(_mix_mod(sv, salt), pa.int64())
                out["__p"] = pa.array(
                    ((h + np.uint64(0x9E3779B9) * out["__salt"].to_numpy().astype(np.uint64))
                     % np.uint64(P)).astype(np.int64),
                    pa.int64(),
                )
                return pa.table(out)
            # right: replicate once per salt shard
            tabs = []
            for j in range(salt):
                rep = dict(out)
                rep["__salt"] = pa.array(np.full(n, j, np.int64), pa.int64())
                rep["__p"] = pa.array(
                    ((h + np.uint64(0x9E3779B9) * np.uint64(j))
                     % np.uint64(P)).astype(np.int64),
                    pa.int64(),
                )
                tabs.append(pa.table(rep))
            return pa.concat_tables(tabs)

        return f

    u = left.map_batches(tag(0, frozenset(lcols)), batch_format="pyarrow").union(
        right.map_batches(tag(1, frozenset(rcols)), batch_format="pyarrow")
    )

    def run(t: pa.Table) -> pa.Table:
        from raydf.joins import to_pandas_exact

        # exact int decode: a side's own columns can carry genuine nulls
        # (e.g. chained outer-join outputs) — plain to_pandas would turn
        # those into float64 and corrupt full-range ids above 2^53
        l = to_pandas_exact(t.filter(pc.equal(t["__side"], 0)).select(lcols))
        r = to_pandas_exact(t.filter(pc.equal(t["__side"], 1)).select(rcols))
        # a pinned out_schema keeps every partition's block schema identical:
        # pandas degrades unmatched int64 join columns to float64+NaN in SOME
        # partitions only, and Arrow won't concat int64 blocks with float64
        # ones — from_pandas(schema=...) restores null-safe int64
        return widen_offsets(pa.Table.from_pandas(
            part_fn(l, r), schema=out_schema, preserve_index=False
        ))

    return u.groupby("__p").map_groups(run, batch_format="pyarrow")


def asof_join(
    left,
    right,
    *,
    by: Sequence[str],
    on: str,
    direction: str = "backward",
    tolerance=None,
    suffix: str = "_right",
    num_partitions: int | None = None,
):
    """As-of join: for each left row, the nearest right row of the same
    ``by`` keys with ``on`` ≤ (backward) / ≥ (forward) the left's ``on``.
    Left rows with no match keep typed nulls. ``on`` must exist on both
    sides under the same name (numeric or timestamp); right-side columns
    that collide with left names get ``suffix``.

    Among right rows tied on (by, on) the surviving payload is whichever
    sorts last — inherently ambiguous; downstream should consume
    tie-invariant derivations (deltas, counts) if such ties occur."""
    by = list(by)

    def part(l: pd.DataFrame, r: pd.DataFrame) -> pd.DataFrame:
        from raydf.joins import lift_ints_nullable

        l = l.sort_values(on, kind="mergesort")
        # right PAYLOAD int columns ride as pandas nullable ints so a
        # left row with no as-of match gets <NA>, not a float64 column
        # that corrupts ids above 2^53; match keys stay numpy for
        # merge_asof's ordered-key requirement
        r = lift_ints_nullable(
            r.sort_values(on, kind="mergesort"), skip=[on] + by
        )
        return pd.merge_asof(
            l, r, on=on, by=by, direction=direction,
            tolerance=tolerance, suffixes=("", suffix),
        )

    def out_schema(ls, rs):
        import pyarrow as pa

        keep = set(by) | {on}
        fields = list(ls)
        lnames = set(ls.names)
        for f in rs:
            if f.name in keep:
                continue
            name = f.name + suffix if f.name in lnames else f.name
            fields.append(pa.field(name, f.type))
        return pa.schema(fields)

    return _two_sided_partition_map(
        left, right, by, part,
        num_partitions=num_partitions, out_schema_fn=out_schema,
    )


def range_join_count(
    left,
    right,
    *,
    by: Sequence[str],
    on: str,
    lo: int,
    hi: int,
    alias: str = "n_in_range",
    num_partitions: int | None = None,
    salt: int | None = None,
):
    """Interval-count range join: for each left row, the number of right
    rows of the same ``by`` keys with ``on_right`` in
    ``[on_left + lo, on_left + hi)`` (``hi`` exclusive). ``on`` must be
    int64 on both sides (epoch micros etc.).

    Per partition: factorize ``by`` to dense group ids, encode
    ``group * span + offset`` as a single sortable int64, then two
    ``np.searchsorted`` calls answer every left row at once — no per-row
    work, no left×right blowup. The encoding bounds
    ``groups_per_partition × (value_span + |lo| + |hi|)`` to int64 range
    — asserted, and far from tight at practical partition widths.

    ``salt=S``: exact hot-key path — left rows of a key spread over S
    shards by ``splitmix64(on) % S`` and the key's right rows replicate to
    each shard, so a power-law key (one viral user's events) becomes S
    parallel tasks instead of one straggler. Counting is per LEFT row, so
    salting changes nothing but the partitioning (equivalence-tested)."""
    by = list(by)
    salted = bool(salt and salt > 1)
    by_eff = by + (["__salt"] if salted else [])

    def part(l: pd.DataFrame, r: pd.DataFrame) -> pd.DataFrame:
        # group on by+salt: hash collisions mod P can co-locate two salt
        # shards of one key, and the key's right rows arrive once PER
        # shard — merging shards would double-count them
        out = l.drop(columns=["__salt"]) if salted else l.copy()
        if len(l) == 0:
            out[alias] = np.array([], np.int64)
            return out
        if len(r) == 0:
            out[alias] = np.zeros(len(l), np.int64)
            return out
        keys = pd.concat([l[by_eff], r[by_eff]], ignore_index=True)
        uniq = keys.drop_duplicates().reset_index(drop=True)
        uniq["__g"] = np.arange(len(uniq), dtype=np.int64)
        lg = l[by_eff].merge(uniq, on=by_eff, how="left")["__g"].to_numpy(np.int64)
        rg = r[by_eff].merge(uniq, on=by_eff, how="left")["__g"].to_numpy(np.int64)
        lt = l[on].to_numpy(np.int64)
        rt = r[on].to_numpy(np.int64)
        tmin = min(lt.min() + lo, rt.min())
        span = max(lt.max() + hi, rt.max()) - tmin + 2
        assert len(uniq) * span < 2**62, "composite key overflow — shrink partition"
        rk = np.sort(rg * span + (rt - tmin))
        lo_k = lg * span + np.clip(lt + lo - tmin, 0, span - 1)
        hi_k = lg * span + np.clip(lt + hi - tmin, 0, span - 1)
        out[alias] = (
            np.searchsorted(rk, hi_k, side="left")
            - np.searchsorted(rk, lo_k, side="left")
        ).astype(np.int64)
        return out

    def out_schema(ls, rs):
        import pyarrow as pa

        return pa.schema(list(ls) + [pa.field(alias, pa.int64())])

    return _two_sided_partition_map(
        left, right, by, part,
        num_partitions=num_partitions, out_schema_fn=out_schema,
        salt=salt, salt_col=on if salted else None,
    )


def topk_per_group(
    ds,
    keys: Sequence[str],
    order_col: str,
    k: int,
    *,
    ascending: bool = False,
    tie_cols: Sequence[str] = (),
    num_partitions: int | None = None,
):
    """Top-k rows per group — partial/final: each block keeps its local
    top-k per key first (the combiner: ≤ k rows per key per block ever
    enter the shuffle), then one hash-partitioned final top-k.
    ``tie_cols`` (ascending) make the selection deterministic under
    ``order_col`` ties."""
    keys = list(keys)
    sort_cols = [order_col] + list(tie_cols)
    asc = [ascending] + [True] * len(tie_cols)

    def local(df: pd.DataFrame) -> pd.DataFrame:
        return (
            df.sort_values(sort_cols, ascending=asc, kind="mergesort")
            .groupby(keys, sort=False)
            .head(k)
        )

    pre = ds.map_batches(local, batch_format="pandas")
    return partitioned_group_map(pre, keys, local, num_partitions=num_partitions)


def global_topk(
    ds,
    order_col: str,
    k: int,
    *,
    ascending: bool = False,
    tie_cols: Sequence[str] = (),
):
    """Global top-k WITHOUT a global sort: each block keeps its local
    top-k (only k rows per block ever leave a worker), then the driver
    merges the k-row partials — ≤ k × blocks rows total, constant in the
    input size. Same shape as ann.cosine_topk's reduce. ``tie_cols``
    (ascending) break ``order_col`` ties deterministically."""
    import ray.data as rd

    sort_cols = [order_col] + list(tie_cols)
    asc = [ascending] + [True] * len(tie_cols)

    def local(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(sort_cols, ascending=asc, kind="mergesort").head(k)

    partials = ds.map_batches(local, batch_format="pandas").to_pandas()
    merged = (
        partials.sort_values(sort_cols, ascending=asc, kind="mergesort")
        .head(k)
        .reset_index(drop=True)
    )
    return rd.from_pandas(merged)


def quantile_per_group(
    ds,
    keys: Sequence[str],
    col: str,
    qs: Sequence[float],
    *,
    num_partitions: int | None = None,
):
    """Exact per-group quantiles, 'lower' interpolation: the value at
    sorted index ``floor(q·(n-1))`` — deterministic on integer inputs and
    directly SQL-expressible (ROW_NUMBER = FLOOR(q*(n-1))+1), unlike
    interpolating definitions whose last-ulp arithmetic differs by engine.

    Exact quantiles admit no combiner — full group values co-locate (the
    one shuffle). At engine scale substitute a mergeable sketch
    (t-digest / KLL) when approximation is acceptable; this operator is
    the exact contract. Kernel is whole-partition vectorized: one sort,
    group boundaries by cumsum, one fancy-index gather per quantile."""
    keys = list(keys)
    qs = list(qs)

    def part(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(keys + [col], kind="mergesort").reset_index(drop=True)
        sizes = df.groupby(keys, sort=False).size().to_numpy()
        starts = np.concatenate([[0], np.cumsum(sizes)[:-1]]).astype(np.int64)
        vals = df[col].to_numpy()
        res = df[keys].iloc[starts].reset_index(drop=True)
        for q in qs:
            idx = starts + np.floor(q * (sizes - 1)).astype(np.int64)
            res[f"p{int(round(q * 100))}"] = vals[idx]
        return res

    return partitioned_group_map(ds, keys, part, num_partitions=num_partitions)


def anti_join_keys(big_ds, keys_ds, on: Sequence[str], *, num_partitions: int | None = None):
    """Distributed anti join: rows of ``big_ds`` whose ``on`` keys do NOT
    appear in ``keys_ds`` — tagged-union shuffle + per-partition vectorized
    isin-mask, no driver key collection (the scale path; for known-small
    key sets :func:`raydf.joins.broadcast_semi_filter` avoids the shuffle)."""
    on = list(on)

    def part(l: pd.DataFrame, r: pd.DataFrame) -> pd.DataFrame:
        if len(r) == 0 or len(l) == 0:
            return l
        merged = l.merge(r[on].drop_duplicates().assign(__hit=1), on=on, how="left")
        return merged.loc[merged["__hit"].isna(), l.columns.tolist()]

    return _two_sided_partition_map(
        big_ds, keys_ds.select_columns(on), on, part,
        num_partitions=num_partitions, out_schema_fn=lambda ls, rs: ls,
    )


def full_outer_join(left, right, on: Sequence[str], *, num_partitions: int | None = None):
    """Distributed FULL OUTER join on equal-named key columns: one
    tagged-union hash shuffle on ``on`` + a per-partition pandas outer
    merge — the chained-join-safe shape (see
    :func:`raydf.joins.partitioned_lookup_join`), completing the join
    family (inner/left lookup, semi/anti, as-of, range). Non-key columns
    from the missing side come back as NULLS (the pinned Arrow schema
    keeps int64 columns nullable-int64, not float64+NaN)."""
    import pyarrow as pa

    on = list(on)

    def part(l: pd.DataFrame, r: pd.DataFrame) -> pd.DataFrame:
        from raydf.joins import lift_ints_nullable

        # outer-merge misses null-pad the absent side — lift ints to
        # pandas nullable so misses are <NA>, not a float64 degradation
        # that corrupts full-range ids above 2^53 (keys never null: a
        # key always comes from whichever side has the row)
        return lift_ints_nullable(l, skip=on).merge(
            lift_ints_nullable(r, skip=on), on=on, how="outer"
        )

    def out_schema(ls, rs):
        fields = list(ls)
        have = set(ls.names)
        for f in rs:
            if f.name not in have:
                fields.append(f)
        return pa.schema(fields)

    return _two_sided_partition_map(
        left, right, on, part,
        num_partitions=num_partitions, out_schema_fn=out_schema,
    )
