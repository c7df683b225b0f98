"""Generic distributed join / dedup / anti-join helpers over ray.data.Datasets.

Strategy (SURVEY.md §4 "Join strategy"):

* **broadcast join** — when one side is known-small (rule-constant matches,
  dimension tables): ``ray.put`` the small side once, pandas-merge inside
  ``map_batches`` on the big side. No shuffle.
* **hash shuffle join** — both sides large: ``Dataset.join`` (Ray's
  hash-partitioned join).
* **distinct** — per-batch local dedup (combiner) first, then a
  ``groupby(keys).map_groups(head(1))`` shuffle over the much smaller
  partials — the partial/final pattern that keeps the all-to-all exchange
  proportional to the number of *distinct* keys, not input rows.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pandas as pd
import ray

BROADCAST_ROW_LIMIT = 2_000_000  # above this, broadcasting a side is a smell


def arrow_schema(ds) -> "pa.Schema":
    """``ds.schema()`` as a real ``pa.Schema`` regardless of block type:
    datasets built from pandas blocks report a PandasBlockSchema (names +
    numpy dtypes, no ``.field``), which crashed every helper that assumed
    arrow schemas."""
    import pyarrow as pa

    s = ds.schema().base_schema
    if isinstance(s, pa.Schema):
        return s

    def _t(t):
        # object dtype (pandas text columns) has no numpy→arrow mapping —
        # pa.from_numpy_dtype raises ArrowNotImplementedError on it; in a
        # pandas block an object column is a string column
        if t == np.dtype("O"):
            return pa.string()
        return pa.from_numpy_dtype(t)

    return pa.schema([pa.field(n, _t(t)) for n, t in zip(s.names, s.types)])


_NP_TO_NULLABLE = {
    "int64": "Int64", "int32": "Int32", "int16": "Int16", "int8": "Int8",
    "uint64": "UInt64", "uint32": "UInt32", "uint16": "UInt16", "uint8": "UInt8",
}


def nullable_int_dtype(pa_type) -> str | None:
    """Pandas nullable (masked) dtype name for an Arrow integer type, or
    None for non-integer types."""
    import pyarrow as pa

    if pa.types.is_integer(pa_type):
        return _NP_TO_NULLABLE.get(str(pa_type))
    return None


def lift_ints_nullable(df: pd.DataFrame, *, skip: Sequence[str] = ()) -> pd.DataFrame:
    """Cast plain numpy integer columns to pandas NULLABLE ints in place.
    A pandas merge whose misses null-pad an int64 column degrades it to
    float64, silently corrupting values above 2^53 (verified off-by-57 at
    2^62); nullable ints keep misses as <NA> and the Arrow rebuild exact."""
    for c in df.columns:
        if c in skip:
            continue
        dt = df[c].dtype
        if getattr(dt, "kind", None) in ("i", "u"):
            nm = _NP_TO_NULLABLE.get(str(dt))
            if nm:
                df[c] = df[c].astype(nm)
    return df


def to_pandas_exact(t) -> pd.DataFrame:
    """Arrow → pandas with EXACT integers: int columns carrying nulls
    decode as pandas nullable Int64/… (plain ``.to_pandas()`` gives
    float64 — silent id corruption above 2^53); null-free int columns
    come back as plain numpy ints so numpy kernels are unaffected."""
    import pyarrow as pa

    mapper = {
        pa.int64(): pd.Int64Dtype(), pa.int32(): pd.Int32Dtype(),
        pa.int16(): pd.Int16Dtype(), pa.int8(): pd.Int8Dtype(),
        pa.uint64(): pd.UInt64Dtype(), pa.uint32(): pd.UInt32Dtype(),
    }
    df = t.to_pandas(types_mapper=mapper.get)
    for c in df.columns:
        dt = df[c].dtype
        if hasattr(dt, "numpy_dtype") and not df[c].isna().any():
            df[c] = df[c].to_numpy(dt.numpy_dtype)
    return df


def default_partitions(floor: int = 32) -> int:
    """Partition count for coarse hash-partitioned group maps: scales with
    the cluster CPU count (each partition is ONE in-memory pandas frame per
    task — a fixed 32 risks per-task OOM when a big corpus lands on a big
    cluster, and starves parallelism there too)."""
    try:
        if ray.is_initialized():
            return max(floor, 2 * int(ray.cluster_resources().get("CPU", 0)))
    except Exception:
        pass
    return floor


PARTITION_TARGET_BYTES = 128 << 20  # ~128 MB of input per partition frame


def partitions_for_bytes(est_bytes: int | None, *, floor: int | None = None) -> int:
    """Partition count for text-carrying exchanges, from an input byte
    estimate: the CPU-scaled default keeps cores busy on small inputs,
    and the byte term caps each partition's in-memory pandas frame at
    ~PARTITION_TARGET_BYTES — a CPU-only count lets per-task frames grow
    linearly with corpus size (per-task OOM at web scale). Sizing rule
    (documented in BASELINE.md): est = uncompressed input bytes the
    exchange ships (for parquet text columns ≈ 4× on-disk bytes);
    partitions = max(2×CPU, est / 128 MB)."""
    base = floor if floor is not None else default_partitions()
    if not est_bytes:
        return base
    import math

    return max(base, math.ceil(est_bytes / PARTITION_TARGET_BYTES))


HOT_TOP_PER_BLOCK = 16


def hot_values(ds, cols: Sequence[str], *, P: int,
               min_hot: int = 100_000) -> tuple[dict, int]:
    """Approximate per-column heavy hitters over int64 ``cols`` of ``ds``:
    one slim streaming pass emits each block's top-``HOT_TOP_PER_BLOCK``
    value counts plus the block's row count; the driver merges them and
    calls a value HOT when its merged count exceeds
    ``max(min_hot, total_rows // P)`` — the share that would fill one
    exchange partition on its own.

    Returns ``(hot, total_rows)`` with ``hot[col]`` a SORTED int64 array.
    Approximate by design: a value is missed only if it never ranks in any
    block's top-K — impossible for anything near the one-partition share
    unless blocks are adversarially sorted — and a miss degrades a
    consumer's partition balance, never correctness (callers use hot sets
    purely to route rows around value-keyed exchanges)."""
    import pyarrow as pa

    cols = list(cols)

    def partials(t: "pa.Table") -> "pa.Table":
        ci_out, v_out, n_out = [], [], []
        for ci, c in enumerate(cols):
            arr = t[c].to_numpy(zero_copy_only=False).astype(np.int64)
            v, n = np.unique(arr, return_counts=True)
            if len(v) > HOT_TOP_PER_BLOCK:
                top = np.argpartition(n, -HOT_TOP_PER_BLOCK)[-HOT_TOP_PER_BLOCK:]
                v, n = v[top], n[top]
            ci_out.append(np.full(len(v), ci, np.int64))
            v_out.append(v)
            n_out.append(n.astype(np.int64))
        # sentinel row carrying the block's row count (col index -1)
        ci_out.append(np.array([-1], np.int64))
        v_out.append(np.array([0], np.int64))
        n_out.append(np.array([len(t)], np.int64))
        return pa.table(
            {
                "c": pa.array(np.concatenate(ci_out), pa.int64()),
                "v": pa.array(np.concatenate(v_out), pa.int64()),
                "n": pa.array(np.concatenate(n_out), pa.int64()),
            }
        )

    p = ds.map_batches(partials, batch_format="pyarrow").to_pandas()
    total = int(p.loc[p["c"] == -1, "n"].sum())
    thresh = max(min_hot, total // max(P, 1))
    agg = p[p["c"] >= 0].groupby(["c", "v"])["n"].sum()
    hot: dict = {}
    lvl0 = agg.index.get_level_values(0) if len(agg) else []
    for ci, c in enumerate(cols):
        if len(agg) and ci in lvl0:
            s = agg.loc[ci]
            hot[c] = np.sort(s[s >= thresh].index.to_numpy(np.int64))
        else:
            hot[c] = np.empty(0, np.int64)
    return hot, total


def _widen_type(t):
    """32-bit-offset varlen arrow type → its 64-bit (large_*) form."""
    import pyarrow as pa

    if pa.types.is_string(t):
        return pa.large_string()
    if pa.types.is_binary(t):
        return pa.large_binary()
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return pa.large_list(_widen_type(t.value_type))
    return t


def widen_offsets(t):
    """Cast string/binary/list columns to their large_* (64-bit offset)
    forms. Every table entering a sort-based exchange (``groupby`` /
    ``sort`` — Ray's sort reduce concatenates one partition's blocks into
    ONE arrow table via merge_sorted_blocks → concat_and_sort) must be
    widened: 32-bit offsets cap a partition's varlen payload at 2 GiB and
    the overflow is a hard ArrowInvalid, reached exactly when partitions
    are at their biggest (low CPU count × large input — the 12M-file
    4-CPU scaling leg). Widening makes partition size a memory-sizing
    question instead of a correctness cliff; per-column cost is an O(n)
    offset upcast, no data copy beyond the offsets.

    Also strips schema METADATA: ``pa.Table.from_pandas`` attaches a
    ``b'pandas'`` metadata blob that makes ``pa.Schema`` UNHASHABLE
    (``hash(schema)`` → "unhashable type: 'dict'"), which defeats Ray's
    schema-deduplication fast path (transform_pyarrow.unify_schemas's
    ``len(set(schemas)) == 1`` early exit) on every bundle of every
    downstream exchange — a silent per-bundle unify cost plus a warning
    per reduce task. Nothing in this engine reads the pandas metadata."""
    import pyarrow as pa

    if t.schema.metadata:
        t = t.replace_schema_metadata(None)
    schema = t.schema
    widened = pa.schema(
        [pa.field(f.name, _widen_type(f.type), f.nullable) for f in schema]
    )
    if widened.equals(schema):
        return t
    return t.cast(widened)


def group_out_arrow(df: pd.DataFrame):
    """Pandas group-fn output → arrow block. Group maps that emit PANDAS
    blocks poison every DOWNSTREAM sort-based exchange: Ray's sort reduce
    normalizes each partition's blocks to the MOST PREVALENT block type
    (``Dataset.sort`` passes batch_format="default" → no target), so a crowd
    of empty pandas blocks (empty blocks skip later map UDFs, keeping their
    stale type) flips whole partitions through pandas — null-padded int64
    degrades to float64 and silently corrupts full-range ids above 2^53
    (observed nondeterministically: canonical_mapping_distributed_ds left
    ~334 empty pandas blocks that corrupted remap_triples_joined). Emitting
    arrow here keeps every block stream single-typed. Falls back to the
    pandas frame only if arrow can't infer the columns."""
    import pyarrow as pa

    if not isinstance(df, pd.DataFrame):
        return widen_offsets(df) if hasattr(df, "schema") else df
    try:
        return widen_offsets(pa.Table.from_pandas(df, preserve_index=False))
    except Exception:
        return df


def distinct(ds, cols: Sequence[str], *, pre_dedup: bool = True, num_partitions: int = 32):
    """Distinct rows by ``cols`` (keeps first row per key, arbitrary order).

    Hash-partitioned dedup: per-block combiner ``drop_duplicates`` first,
    then a shuffle on a single derived partition id (``hash(cols) % P``)
    and ONE vectorized ``drop_duplicates`` per partition-group. Python is
    invoked P times total — NOT once per distinct key, which is what a
    naive ``groupby(cols).map_groups(head(1))`` costs (one interpreter
    call per group; catastrophic when keys are plentiful)."""
    cols = list(cols)
    P = num_partitions

    def pre(t):
        # arrow-in: a batch_format="pandas" stage converts EMPTY upstream
        # blocks to pandas before the empty-skip fires — those stale
        # pandas blocks then poison downstream sort reduces (the
        # group_out_arrow pathology, minted one stage earlier)
        import pyarrow as pa

        df = t.to_pandas()
        if pre_dedup:
            df = df.drop_duplicates(subset=cols)
        h = pd.util.hash_pandas_object(df[cols], index=False).to_numpy()
        df["__p"] = (h % np.uint64(P)).astype(np.int64)
        return widen_offsets(pa.Table.from_pandas(df, preserve_index=False))

    # map_groups consumes ARROW (converting to pandas inside the UDF):
    # with batch_format="pandas" Ray converts EVERY output partition block
    # to pandas BEFORE noticing an empty one has no groups to call the UDF
    # on — those empty pandas blocks then skip all later map UDFs and flip
    # downstream sort reduces through pandas (see group_out_arrow)
    return (
        ds.map_batches(pre, batch_format="pyarrow")
        .groupby("__p")
        .map_groups(
            lambda t: group_out_arrow(
                t.to_pandas().drop_duplicates(subset=cols)
            ),
            batch_format="pyarrow",
        )
        .drop_columns(["__p"])
    )


def distinct_write(ds, cols: Sequence[str], out_dir: str, *,
                   buckets: int | None = None,
                   rows_per_file: int = 500_000,
                   row_group_size: int = 125_000) -> int:
    """``distinct(ds, cols).write_parquet(out_dir)`` without the sort
    exchange: rows stream straight into a hash-bucket staging write (each
    map task appends its local-deduped rows to every bucket it touches —
    no all-to-all barrier), then one finalize task per bucket reads its
    staged files, drops duplicates within the bucket and writes the final
    sliced parquet files. Same staged-bucket pattern as the checkpoint
    dedup write (deduce.FixpointEngine._dedup_and_write, A/B'd 2026-08-19:
    sort shuffle 192.6 s @ 4 CPUs / 77.9 s @ 16 vs staged 100.1 / 23.0 on
    a 122M-row exchange) — the one extra staging write+read is sequential
    disk bandwidth that scales with nodes; the shuffle barrier doesn't.

    Output files are bucket-free and ≤ ``rows_per_file`` rows with
    ``row_group_size`` row groups, so downstream scans get the same task /
    row-group-pushdown granularity the exchange path's reduce files gave.
    Returns the distinct row count."""
    import os
    import shutil

    import pyarrow as pa
    import pyarrow.parquet as pq

    cols = list(cols)
    B = buckets if buckets is not None else default_partitions()
    tmp_dir = out_dir.rstrip("/") + "_staging"
    for d in (out_dir, tmp_dir):
        shutil.rmtree(d, ignore_errors=True)
        os.makedirs(d, exist_ok=True)

    def pre(t):
        # arrow-in/arrow-out (see distinct's pre: empty pandas blocks
        # poison downstream stages)
        df = t.to_pandas()
        df = df.drop_duplicates(subset=cols)
        h = pd.util.hash_pandas_object(df[cols], index=False).to_numpy()
        df["__b"] = (h % np.uint64(B)).astype(np.int32)
        return widen_offsets(pa.Table.from_pandas(df, preserve_index=False))

    ds.map_batches(pre, batch_format="pyarrow").write_parquet(
        tmp_dir, partition_cols=["__b"]
    )

    @ray.remote(num_cpus=1)
    def _finalize(j: int) -> int:
        import glob as _glob

        staged = _glob.glob(os.path.join(tmp_dir, f"__b={j}", "*.parquet"))
        if not staged:
            return 0
        # per-file reads, not pq.read_table(list): the dataset factory
        # would infer a hive `__b` partition field from the path and fail
        # to merge it with any real __b column
        parts = []
        for f in staged:
            tf = pq.ParquetFile(f).read()
            if "__b" in tf.schema.names:
                tf = tf.drop_columns(["__b"])
            parts.append(tf)
        t = pa.concat_tables(parts, promote_options="permissive")
        df = t.to_pandas()
        keep = ~df.duplicated(subset=cols).to_numpy()
        t = t.filter(pa.array(keep))
        if len(t) == 0:
            return 0
        for i in range(0, len(t), rows_per_file):
            pq.write_table(
                t.slice(i, rows_per_file),
                os.path.join(out_dir, f"b{j:04d}-{i // rows_per_file:05d}.parquet"),
                row_group_size=row_group_size,
            )
        return len(t)

    counts = ray.get([_finalize.remote(j) for j in range(B)])
    shutil.rmtree(tmp_dir, ignore_errors=True)
    return int(sum(counts))


def partitioned_group_map(ds, keys: Sequence[str], partition_fn, *, num_partitions: int | None = None):
    """Run ``partition_fn`` once per coarse hash partition of ``keys``.

    The scalable replacement for ``ds.groupby(keys).map_groups(fn)`` when
    the key is fine-grained (one Ray-level Python UDF call *per distinct
    key* — catastrophic at tens of thousands of tiny groups). All rows of
    any key land in the same partition, so ``partition_fn`` sees complete
    groups and does its own in-process (vectorized or pandas-groupby)
    per-key work; Python crosses the Ray boundary only ``num_partitions``
    times. ``num_partitions=None`` → :func:`default_partitions`
    (CPU-scaled: each partition is one in-memory frame per task, so a
    fixed small count risks per-task OOM on large corpora)."""
    keys = list(keys)
    P = num_partitions if num_partitions is not None else default_partitions()

    def pre(t):
        # arrow-in/arrow-out (see distinct's pre): a pandas-format stage
        # converts empty upstream blocks to pandas before the empty-skip,
        # minting the poison blocks group_out_arrow exists to prevent
        import pyarrow as pa

        df = t.to_pandas()
        h = pd.util.hash_pandas_object(df[keys], index=False).to_numpy()
        df["__p"] = (h % np.uint64(P)).astype(np.int64)
        return widen_offsets(pa.Table.from_pandas(df, preserve_index=False))

    # arrow-in map_groups for the same empty-block reason
    return (
        ds.map_batches(pre, batch_format="pyarrow")
        .groupby("__p")
        .map_groups(
            lambda t: group_out_arrow(
                partition_fn(t.to_pandas().drop(columns="__p"))
            ),
            batch_format="pyarrow",
        )
    )


def broadcast_join(big_ds, small_df: pd.DataFrame, on: Sequence[str], *, how: str = "inner"):
    """Join a large Dataset against a small broadcast pandas side."""
    assert len(small_df) <= BROADCAST_ROW_LIMIT, "side too big to broadcast — use hash_join"
    on = list(on)
    ref = ray.put(small_df)

    def _merge(df: pd.DataFrame) -> pd.DataFrame:
        small = ray.get(ref)
        return df.merge(small, on=on, how=how)

    return big_ds.map_batches(_merge, batch_format="pandas")


def hash_join(left, right, on: Sequence[str], *, how: str = "inner", num_partitions: int = 32):
    """Hash-partitioned shuffle join via ``Dataset.join``.

    NOTE: Ray's native join cost grows steeply with num_partitions (A/B at
    1M-file kg_pipeline, 32 CPUs: num_partitions 32 → 269 s end-to-end,
    16 → 148 s) yet small partition counts cap parallelism. For the int64
    bindings cascade prefer :func:`partitioned_merge_join`, whose per-
    partition cost is one pandas merge."""
    return left.join(
        right,
        join_type=how,
        num_partitions=num_partitions,
        on=tuple(on),
        validate_schemas=False,
    )


def partitioned_merge_join(left, right, on: Sequence[str], left_cols: Sequence[str],
                           right_cols: Sequence[str], *, num_partitions: int = 64):
    """Inner equi-join of two int64-column Datasets as ONE coarse shuffle:
    tag side → align schemas → union → hash-partition on the keys →
    in-process pandas merge per partition.

    The portable partitioned hash join: per-partition fixed cost is a
    single vectorized merge, so ``num_partitions`` can exceed CPU count
    without the per-partition overhead that makes Ray's native
    ``Dataset.join`` regress at high partition counts. Column lists are
    passed explicitly so no schema fetch (= partial execution of a lazy
    pipeline) is needed."""
    on = list(on)
    left_cols, right_cols = list(left_cols), list(right_cols)
    lonly = [c for c in left_cols if c not in on]
    ronly = [c for c in right_cols if c not in on]
    overlap = set(lonly) & set(ronly)
    assert not overlap, (
        f"non-key columns {sorted(overlap)} exist on both sides — pandas "
        "merge would suffix them (_x/_y) and the output projection would "
        "KeyError; rename one side first"
    )
    all_cols = on + lonly + ronly
    P = num_partitions

    def tag(side: int, cols: list):
        import pyarrow as pa

        def f(t: pa.Table) -> pa.Table:
            df = t.select(cols).to_pandas()
            h = pd.util.hash_pandas_object(df[on], index=False).to_numpy()
            n = len(df)
            out = {}
            for c in all_cols:
                if c in cols:
                    out[c] = pa.array(df[c].to_numpy(np.int64), pa.int64())
                else:
                    out[c] = pa.nulls(n, pa.int64())
            out["__side"] = pa.array(np.full(n, side, np.int8), pa.int8())
            out["__p"] = pa.array((h % np.uint64(P)).astype(np.int64), pa.int64())
            return pa.table(out)

        return f

    u = left.map_batches(tag(0, left_cols), batch_format="pyarrow").union(
        right.map_batches(tag(1, right_cols), batch_format="pyarrow")
    )

    def merge(t) -> "pa.Table":
        import pyarrow as pa
        import pyarrow.compute as pc

        # filter each side BEFORE to_pandas: within its own rows a side's
        # columns are null-free, so they decode as exact int64 — a pandas
        # conversion of the union would degrade null-padded int64 columns
        # to float64 and corrupt full-range hash ids (> 2^53)
        l = t.filter(pc.equal(t["__side"], 0)).select(on + lonly).to_pandas()
        r = t.filter(pc.equal(t["__side"], 1)).select(on + ronly).to_pandas()
        out = l.merge(r, on=on, how="inner")
        return pa.Table.from_pandas(out[all_cols], preserve_index=False)

    return u.groupby("__p").map_groups(merge, batch_format="pyarrow")


def partitioned_lookup_join(ds, key_col: str, lookup_ds, lookup_key: str,
                            lookup_val: str, new_col: str, *,
                            how: str = "inner", num_partitions: int | None = None):
    """Attach ``lookup_val`` (any dtype) to ``ds`` rows by ``key_col`` as
    ONE union+groupby shuffle with an in-process pandas merge per
    partition. The chained-join-safe alternative to Ray's native
    JoinOperator, whose empty hash partitions emit schema-less blocks
    that crash any downstream native join (Ray 2.49 — the reason
    remap/decode/verify paths all avoid chaining ``Dataset.join``)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    P = num_partitions if num_partitions is not None else default_partitions()
    schema = arrow_schema(ds)
    lschema = arrow_schema(lookup_ds)
    # widened types end-to-end: the union rides a sort-based exchange (see
    # widen_offsets — 32-bit varlen offsets cap a partition at 2 GiB)
    val_type = _widen_type(lschema.field(lookup_val).type)
    fields = [pa.field(f.name, _widen_type(f.type), f.nullable) for f in schema]

    def _p(keys: np.ndarray) -> "pa.Array":
        h = pd.util.hash_array(keys)
        return pa.array((h % np.uint64(P)).astype(np.int64), pa.int64())

    def tag_left(t: pa.Table) -> pa.Table:
        t = widen_offsets(t)
        keys = t[key_col].to_numpy(zero_copy_only=False)
        t = t.append_column("__lv", pa.nulls(len(t), val_type))
        t = t.append_column("__lk", pa.nulls(len(t), pa.int64()))
        t = t.append_column("__side", pa.array(np.zeros(len(t), np.int8)))
        return t.append_column("__p", _p(keys))

    def tag_right(t: pa.Table) -> pa.Table:
        n = len(t)
        keys = t[lookup_key].to_numpy(zero_copy_only=False)
        data = {f.name: pa.nulls(n, f.type) for f in fields}
        data["__lv"] = t[lookup_val].cast(val_type)
        data["__lk"] = t[lookup_key].cast(pa.int64())
        data["__side"] = pa.array(np.ones(n, np.int8))
        data["__p"] = _p(keys)
        return pa.table(data)

    u = ds.map_batches(tag_left, batch_format="pyarrow").union(
        lookup_ds.map_batches(tag_right, batch_format="pyarrow")
    )
    lcols = [f.name for f in fields]

    def merge(t: pa.Table) -> pa.Table:
        right = pc.equal(t["__side"], 1)
        l = to_pandas_exact(t.filter(pc.invert(right)).select(lcols))
        r = (
            to_pandas_exact(t.filter(right).select(["__lk", "__lv"]))
            .drop_duplicates("__lk")
            .rename(columns={"__lk": key_col, "__lv": new_col})
        )
        # integer lookup values ride the merge as pandas NULLABLE ints: a
        # left join's misses would otherwise degrade the column to float64
        # and corrupt full-range ids above 2^53 (ADVICE r03)
        nm = nullable_int_dtype(val_type)
        if nm is not None:
            r[new_col] = r[new_col].astype(nm)
        out = l.merge(r, on=key_col, how=how)
        # build the looked-up column as a NULLABLE arrow array: a left
        # join's misses surface as NaN, which pandas stores as float64 —
        # a plain .cast() to an integer val_type would raise ArrowInvalid
        # ("Float value nan was truncated"); from_pandas maps NaN → null
        # and integral floats back to the lookup's true dtype
        vals = pa.Array.from_pandas(out[new_col], type=val_type)
        base = pa.Table.from_pandas(
            out.drop(columns=[new_col]), preserve_index=False
        ).cast(pa.schema(fields))
        return base.append_column(pa.field(new_col, val_type), vals)

    return u.groupby("__p").map_groups(merge, batch_format="pyarrow")


def broadcast_semi_filter(big_ds, keys_df: pd.DataFrame, on: Sequence[str], *, anti: bool = False):
    """Semi/anti join of a big Dataset against a broadcast key set."""
    assert len(keys_df) <= BROADCAST_ROW_LIMIT
    on = list(on)
    ref = ray.put(keys_df[on].drop_duplicates())

    def _filt(df: pd.DataFrame) -> pd.DataFrame:
        keys = ray.get(ref)
        merged = df.merge(keys.assign(__hit=1), on=on, how="left")
        mask = merged["__hit"].isna() if anti else merged["__hit"].notna()
        return merged.loc[mask, df.columns.tolist()]

    return big_ds.map_batches(_filt, batch_format="pandas")


def cross_join_key(ds, name: str = "__x"):
    """Add a constant key column (explicit cartesian-product join key)."""
    return ds.add_column(name, lambda df: pd.Series(0, index=df.index), batch_format="pandas")
