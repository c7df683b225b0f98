"""Eq-merge entity canonicalization (SURVEY.md O16).

``TripleStatement::Eq(a, b)`` conclusions assert two resources denote the
same entity (reference src/statement.rs:15-16; the engine-side merge is
vestigial in the reference — src/sign.rs:175-180 ``ReplaceId``). Here the
merge is first-class: collected Eq pairs → equivalence classes →
representative = min(term_id) per class → a remap of subj/pred/obj over
the whole triple store, followed by dedup (two triples may collapse into
one) — realized as a broadcast-mapping ``map_batches`` pass, NOT a
shuffle: the mapping only contains *merged* ids (≪ dataset), so hot
representatives cost nothing here; the only shuffle is the downstream
dedup groupby, whose key is the full (s,p,o,sign) hash — already salted
by construction.

Connected components: union-find on the driver while the pair set is
small (the common case — Eq pairs come from entity-link rules, orders of
magnitude fewer than triples); past ``DRIVER_PAIR_LIMIT`` a distributed
min-label-propagation loop (groupby-Min per round, O(diameter) rounds)
computes the same classes without driver memory.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

# Pair sets at or below this run the numpy min-label union-find on the
# driver; above it, the distributed propagation loop. This is a DRIVER
# MEMORY gate, not a style choice: 200M pairs is two int64 columns
# ≈ 3.2 GB on a 128 GiB driver and a few seconds of vectorized
# pointer-jumping — while the distributed loop costs several full
# exchanges per round (measured 2026-08-19: routing a 10M-pair premerge
# to the distributed path at 4 CPUs took >25 min where the driver path
# takes seconds; a 12M-file premerge lands at ~54M distinct pairs, just
# past the previous 50M default, and ate the 4-CPU scaling leg). Size
# to the actual driver: the distributed path exists for the regime that
# genuinely cannot fit one, not as the mid-scale default.
#
# MINIMUM DRIVER MEMORY at the default 200M: the two int64 pair columns
# are 3.2 GB, but canonical_mapping_driver's transients (lexsort indices,
# unique masks, the pointer-jump arrays) peak at ~5-6× that — budget
# ≥ 24 GB of driver headroom, or lower RAYDF_DRIVER_PAIR_LIMIT
# proportionally (e.g. 25M on a 16 GB head node). The *pre-distinct*
# driver read is separately gated to MemAvailable
# (deduce._driver_preread_rows), so an oversized default here degrades to
# the distributed distinct rather than an unbounded read.
DRIVER_PAIR_LIMIT = int(os.environ.get("RAYDF_DRIVER_PAIR_LIMIT", 200_000_000))

# Above this many (node, canon) rows the mapping is no longer broadcast via
# ray.put into remap stages — it stays a Dataset and remaps via the joined
# path (unbounded sameAs growth must not bound the flagship's merge scale
# on driver memory — VERDICT r03 #2). 50M rows ≈ 0.8 GB of two int64
# arrays, one ray.put read zero-copy by every task with an O(log n)
# searchsorted probe per row — far cheaper than the joined path's four
# value-partitioned exchanges at any size that fits the object store.
MAPPING_BROADCAST_LIMIT = int(
    os.environ.get("RAYDF_MAPPING_BROADCAST_LIMIT", 50_000_000)
)


class UnionFind:
    def __init__(self):
        self.parent: dict[int, int] = {}

    def find(self, x: int) -> int:
        p = self.parent.setdefault(x, x)
        while p != x:
            self.parent[x] = p = self.parent.setdefault(p, p)
            x, p = p, self.parent[p]
        return x

    def union(self, a: int, b: int) -> None:
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            # min-id representative → deterministic canonical choice
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            self.parent[hi] = lo

    def mapping(self) -> pd.DataFrame:
        rows = [(x, self.find(x)) for x in list(self.parent)]
        df = pd.DataFrame(rows, columns=["node", "canon"])
        return df[df["node"] != df["canon"]].reset_index(drop=True)


def canonical_mapping_driver(pairs: pd.DataFrame) -> pd.DataFrame:
    """Driver connected components, vectorized: min-label propagation with
    pointer jumping over numpy index arrays — O((V+E) log D) numpy ops
    instead of a Python-dict union-find loop (the loop was ~20-30 s of
    SERIAL driver time at 4M pairs — paid identically at every CPU count,
    i.e. pure Amdahl fixed cost). Node ids are sorted by np.unique, so the
    min label index IS the min term id — same deterministic representative
    as the UnionFind."""
    a = pairs["a"].to_numpy(np.int64)
    b = pairs["b"].to_numpy(np.int64)
    if len(a) == 0:
        return pd.DataFrame({"node": [], "canon": []}).astype(np.int64)
    nodes, inv = np.unique(np.concatenate([a, b]), return_inverse=True)
    ai, bi = inv[: len(a)], inv[len(a) :]
    label = np.arange(len(nodes), dtype=np.int64)
    while True:
        nxt = label.copy()
        np.minimum.at(nxt, ai, label[bi])
        np.minimum.at(nxt, bi, label[ai])
        nxt = nxt[nxt]  # pointer jumping halves chain lengths
        if np.array_equal(nxt, label):
            break
        label = nxt
    canon = nodes[label]
    mask = canon != nodes
    return pd.DataFrame({"node": nodes[mask], "canon": canon[mask]})


def canonical_mapping_distributed_ds(
    edges_ds, *, max_iters: int = 20, num_partitions: int = 8
):
    """Min-label propagation + pointer jumping over Eq edges as Ray Data
    groupby/join rounds. Returns the (node, canon) mapping as a DATASET —
    nothing ever lands on the driver, so downstream consumers (anti-join
    survivor filters, distributed remaps) can stay distributed end-to-end.

    Per round: labels(v) ← min(labels(v), min over neighbours' labels,
    labels(labels(v))) — the pointer-jumping term halves chain lengths, so
    convergence is O(log diameter) shuffle rounds instead of O(diameter).
    Scales to edge sets that don't fit the driver; the monotone label sum
    is the convergence scalar (one cheap aggregate per round).
    """
    from raydf.joins import distinct, partitioned_group_map

    # rule firings re-derive the same Eq every round — distinct first so
    # every propagation round pays for the PAIR SET, not the firing count
    # (identity pairs are dropped at the source by make_eqs_fn, but guard
    # here too: self-loops only add volume)
    # every stage emits ARROW blocks: a zero-row pandas block SKIPS later
    # map UDFs (Ray 2.49), survives to the sort-reduce, and on small
    # inputs flips its most-prevalent block normalization to pandas —
    # degrading null-padded int64 columns to float64 downstream (the
    # remap merge guards raise loudly on exactly this)
    def _nonid(t: pa.Table) -> pa.Table:
        a = t["a"].cast(pa.int64())
        b = t["b"].cast(pa.int64())
        return pa.table({"a": a, "b": b}).filter(pc.not_equal(a, b))

    edges_ds = distinct(
        edges_ds.map_batches(_nonid, batch_format="pyarrow"), ["a", "b"]
    )

    def _sym(t: pa.Table) -> pa.Table:
        a = t["a"].cast(pa.int64())
        b = t["b"].cast(pa.int64())
        return pa.concat_tables(
            [pa.table({"node": a, "nbr": b}), pa.table({"node": b, "nbr": a})]
        )

    sym = edges_ds.map_batches(_sym, batch_format="pyarrow").materialize()

    # min-reduce via the Sort-based partitioned exchange, NOT
    # groupby().aggregate(Min): Ray 2.49's hash-shuffle Aggregate is
    # catastrophically slow at low CPU counts — measured 2026-08-19,
    # 4 CPUs, full-range int64 keys: aggregate(Min) 42.6 s at 1M rows,
    # 202.3 s at 4M (≈50 µs/row, would be ~17 min at 19M) vs 4.9 s for
    # the partitioned_group_map min over 19M rows (~200× at that size)
    def _kmin(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("node", sort=False)["lbl"].min()
        return pd.DataFrame(
            {"node": g.index.to_numpy(np.int64),
             "lbl": g.to_numpy(np.int64)}
        )

    P = max(8, num_partitions)

    labels = partitioned_group_map(
        sym.map_batches(
            lambda t: pa.table(
                {
                    "node": t["node"].cast(pa.int64()),
                    "lbl": pc.min_element_wise(
                        t["node"].cast(pa.int64()), t["nbr"].cast(pa.int64())
                    ),
                }
            ),
            batch_format="pyarrow",
        ),
        ["node"], _kmin, num_partitions=P,
    ).materialize()
    # uniform message schema (key:int64, val:int64, side:int32) lets the
    # lookup be a single groupby-merge — the portable partitioned hash
    # join (no Dataset.join; robust on sparse partitions)
    def _msgs(ds, key: str, val: str, side: int):
        def f(t):
            import pyarrow as pa

            n = len(t)
            return pa.table(
                {
                    "key": t[key].cast(pa.int64()),
                    "val": t[val].cast(pa.int64()),
                    "side": pa.array(np.full(n, side, np.int32), pa.int32()),
                }
            )

        return ds.map_batches(f, batch_format="pyarrow")

    def _lookup_merge(df: pd.DataFrame) -> pd.DataFrame:
        # per key: side=1 rows carry label(key); side=0 rows are the
        # recipients (nodes asking for label(key)) — a vectorized
        # min-groupby + merge over the whole partition's keys at once
        lbls = (
            df.loc[df["side"] == 1, ["key", "val"]]
            .groupby("key", sort=False)["val"].min().rename("lbl")
        )
        if len(lbls) == 0:
            return pd.DataFrame({"node": [], "lbl": []}).astype(np.int64)
        recips = df.loc[df["side"] == 0, ["key", "val"]]
        out = recips.merge(lbls, left_on="key", right_index=True, how="inner")
        return pd.DataFrame(
            {"node": out["val"].to_numpy(np.int64), "lbl": out["lbl"].to_numpy(np.int64)}
        )

    def _exact_label_sum(lbl_ds) -> int:
        """Exact Σ lbl over full-range int64 labels. ``Dataset.sum`` on
        md5-low64 ids overflows C long in the reduce (observed: falls back
        to pickled python objects with a worker traceback per round).
        Split each label into hi/lo 32-bit halves — per-block partials fit
        int64 comfortably — and recombine on the driver with python ints
        (exact, unbounded). Driver traffic: two int64 per block."""
        def part(t: pa.Table) -> pa.Table:
            v = t["lbl"].to_numpy(zero_copy_only=False).astype(np.int64)
            return pa.table(
                {
                    "hi": pa.array([int((v >> 32).sum())], pa.int64()),
                    "lo": pa.array([int((v & 0xFFFFFFFF).sum())], pa.int64()),
                }
            )

        total = 0
        for b in lbl_ds.map_batches(part, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow"
        ):
            total += (int(pc.sum(b["hi"]).as_py() or 0) << 32) + int(
                pc.sum(b["lo"]).as_py() or 0
            )
        return total

    prev_sum = _exact_label_sum(labels)
    for _ in range(max_iters):
        # (1) neighbour propagation: node ← label(nbr): ask at key=nbr
        ask_nbr = _msgs(sym, key="nbr", val="node", side=0)
        # (2) pointer jumping: node ← label(label(node)): ask at key=lbl
        ask_jump = _msgs(labels, key="lbl", val="node", side=0)
        have = _msgs(labels, key="node", val="lbl", side=1)

        # arrow-native int64 cast: a batch_format="pandas" pass here
        # CONVERTS empty blocks to pandas before the empty-skip fires,
        # minting exactly the poison blocks group_out_arrow exists to
        # prevent (observed: 35 empty pandas blocks after 3 rounds)
        updates = partitioned_group_map(
            ask_nbr.union(ask_jump).union(have), ["key"], _lookup_merge,
            num_partitions=P,
        ).map_batches(
            lambda t: pa.table(
                {
                    "node": t["node"].cast(pa.int64()),
                    "lbl": t["lbl"].cast(pa.int64()),
                }
            ),
            batch_format="pyarrow",
        )
        # normalize BOTH union branches to arrow blocks: the exchange's
        # boundary sampler asserts a single uniform block type
        base = labels.select_columns(["node", "lbl"]).map_batches(
            lambda t: t, batch_format="pyarrow"
        )
        # same Sort-based min-reduce as the init (NOT aggregate(Min) — see
        # the measured pathology note above)
        labels = partitioned_group_map(
            base.union(updates), ["node"], _kmin, num_partitions=P,
        ).materialize()
        cur_sum = _exact_label_sum(labels)
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum

    def _finish(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        node = t["node"].cast(pa.int64())
        lbl = t["lbl"].cast(pa.int64())
        mask = pc.not_equal(node, lbl)
        return pa.table(
            {"node": node.filter(mask), "canon": lbl.filter(mask)}
        )

    return labels.map_batches(_finish, batch_format="pyarrow")


def canonical_mapping_distributed(
    edges_ds, *, max_iters: int = 20, num_partitions: int = 8
) -> pd.DataFrame:
    """Driver-frame wrapper over :func:`canonical_mapping_distributed_ds`
    (the mapping itself is ≪ the edge set — only merged nodes appear)."""
    ds = canonical_mapping_distributed_ds(
        edges_ds, max_iters=max_iters, num_partitions=num_partitions
    )
    df = ds.to_pandas()
    if len(df) == 0:
        return pd.DataFrame({"node": [], "canon": []}).astype(np.int64)
    return df.reset_index(drop=True)


def canonical_mapping(eq_ds_or_df) -> pd.DataFrame:
    """Eq pairs → (node → canonical representative) mapping (non-identity rows)."""
    if eq_ds_or_df is None:
        return pd.DataFrame({"node": [], "canon": []}).astype(np.int64)
    if isinstance(eq_ds_or_df, pd.DataFrame):
        return canonical_mapping_driver(eq_ds_or_df)
    n = eq_ds_or_df.count()
    if n == 0:
        return pd.DataFrame({"node": [], "canon": []}).astype(np.int64)
    if n <= DRIVER_PAIR_LIMIT:
        return canonical_mapping_driver(eq_ds_or_df.select_columns(["a", "b"]).to_pandas())
    return canonical_mapping_distributed(eq_ds_or_df.select_columns(["a", "b"]))


def make_remapper(mapping: pd.DataFrame, cols=("subj", "pred", "obj"),
                  flag_col: str | None = None):
    """Vectorized broadcast remap of id columns via sorted-key searchsorted.

    pyarrow-native: only the id columns are replaced; every other column
    (incl. nested list lineage columns) passes through zero-copy. Works on
    both pa.Table and pandas batches. The mapping is ``ray.put`` ONCE and
    read by every task — broadcast, not re-shipped per batch."""
    import ray

    order = np.argsort(mapping["node"].to_numpy(np.int64))
    keys = mapping["node"].to_numpy(np.int64)[order]
    vals = mapping["canon"].to_numpy(np.int64)[order]
    ref = ray.put((keys, vals))
    cols = list(cols)

    def _remap_array(arr: np.ndarray, k: np.ndarray, v: np.ndarray) -> np.ndarray:
        if len(k) == 0:
            return arr
        pos = np.searchsorted(k, arr)
        pos_c = np.clip(pos, 0, len(k) - 1)
        hit = k[pos_c] == arr
        return np.where(hit, v[pos_c], arr)

    def _remap(batch):
        k, v = ray.get(ref)
        changed = None
        if isinstance(batch, pa.Table):
            if flag_col is not None:
                changed = np.zeros(len(batch), dtype=bool)
            for c in cols:
                i = batch.schema.get_field_index(c)
                arr = batch[c].to_numpy(zero_copy_only=False)
                new = _remap_array(arr, k, v)
                if changed is not None:
                    changed |= new != arr
                batch = batch.set_column(
                    i, batch.schema.field(i), pa.array(new, pa.int64())
                )
            if changed is not None:
                batch = batch.append_column(flag_col, pa.array(changed, pa.bool_()))
            return batch
        if flag_col is not None:
            changed = np.zeros(len(batch), dtype=bool)
        for c in cols:
            arr = batch[c].to_numpy(np.int64)
            new = _remap_array(arr, k, v)
            if changed is not None:
                changed |= new != arr
            batch[c] = new
        if changed is not None:
            batch[flag_col] = changed
        return batch

    return _remap


def _pack_list_i64(col: "pa.ChunkedArray") -> "pa.Array":
    """large_list<int64> → large_binary, zero-copy-shaped: byte offsets are
    the list offsets ×8 over the same values buffer. Acero hash joins
    reject list non-key columns but accept large_binary, so lineage rides
    through the join cascade packed (no per-row Python)."""
    import numpy as np
    import pyarrow as pa

    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    offs = arr.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    vals = arr.values.to_numpy(zero_copy_only=False).astype(np.int64)
    # normalize slice windows: offsets may not start at 0
    vals = vals[offs[0] : offs[-1]]
    offs = offs - offs[0]
    null_buf = None
    if arr.null_count:
        null_buf = pa.array(~arr.is_null().to_numpy(zero_copy_only=False)).buffers()[1]
    return pa.LargeBinaryArray.from_buffers(
        pa.large_binary(), len(arr),
        [null_buf, pa.py_buffer((offs * 8).tobytes()), pa.py_buffer(vals.tobytes())],
        null_count=arr.null_count,
    )


def _unpack_list_i64(col: "pa.ChunkedArray") -> "pa.Array":
    """Inverse of :func:`_pack_list_i64` (byte offsets ÷8 over the same
    data buffer reinterpreted as int64)."""
    import numpy as np
    import pyarrow as pa

    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    if len(arr) == 0:
        return pa.array([], pa.large_list(pa.int64()))
    bufs = arr.buffers()
    # account for a possible slice offset on the binary array
    offs_np = np.frombuffer(bufs[1], dtype=np.int64)[
        arr.offset : arr.offset + len(arr) + 1
    ].copy()
    base = offs_np[0]
    vals = np.frombuffer(bufs[2], dtype=np.int64)[base // 8 : offs_np[-1] // 8]
    null_buf = None
    if arr.null_count:
        null_buf = pa.array(~arr.is_null().to_numpy(zero_copy_only=False)).buffers()[1]
    return pa.LargeListArray.from_buffers(
        pa.large_list(pa.int64()), len(arr),
        [null_buf, pa.py_buffer(((offs_np - base) // 8).tobytes())],
        children=[pa.array(vals, pa.int64())],
        null_count=arr.null_count,
    )


def _mix_mod(arr: "np.ndarray", P: int) -> "np.ndarray":
    """splitmix64 finalizer mod P — the partition hash both sides of a
    partitioned lookup must agree on (wraps silently on uint64)."""
    x = arr.astype(np.uint64)
    x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    x = x ^ (x >> np.uint64(31))
    return (x % np.uint64(P)).astype(np.int64)


def _mix64(arr: "np.ndarray", seed: int = 0) -> "np.ndarray":
    """Full-width splitmix64 finalizer (vectorized, wraps on uint64)."""
    x = arr.astype(np.uint64) ^ np.uint64(seed)
    x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return x ^ (x >> np.uint64(31))


_BLOOM_SEED2 = 0xA076_1D64_78BD_642F  # second, independent probe


def build_key_bloom(keys_ds, col: str, *, n_hint: int | None = None):
    """Bitset Bloom filter (k=2 probes, ~16 bits/key → ≈1.5% FP) over an
    int64 key column of a Dataset. Returns ``(words, mask)`` — a uint64
    word array plus the bit-index mask — sized ~2 bytes/key (50M keys →
    128 MB; 1B keys → 2 GB, still one ``ray.put`` read zero-copy by every
    task). Built with ONE streaming pass: each block ships only its
    deduplicated set-bit positions (≤16 B/key) to the driver."""
    n = n_hint if n_hint is not None else keys_ds.count()
    m = 1 << max(16, int(np.ceil(np.log2(max(16 * max(n, 1), 2)))))
    mask = np.uint64(m - 1)
    words = np.zeros(m >> 6, np.uint64)

    def positions(t: "pa.Table") -> "pa.Table":
        k = t[col].to_numpy(zero_copy_only=False).astype(np.int64)
        p = np.unique(
            np.concatenate([_mix64(k) & mask, _mix64(k, _BLOOM_SEED2) & mask])
        ).astype(np.int64)
        return pa.table({"pos": pa.array([p], pa.large_list(pa.int64()))})

    for b in keys_ds.map_batches(positions, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        p = np.asarray(b["pos"].combine_chunks().flatten(), dtype=np.uint64)
        np.bitwise_or.at(
            words, (p >> np.uint64(6)).astype(np.int64),
            np.uint64(1) << (p & np.uint64(63)),
        )
    return words, mask


def bloom_maybe_contains(bloom, keys: "np.ndarray") -> "np.ndarray":
    """Vectorized membership probe — True = key MAY be in the set (≈1.5%
    false positives, zero false negatives)."""
    words, mask = bloom
    k = keys.astype(np.int64)
    h1 = _mix64(k) & mask
    h2 = _mix64(k, _BLOOM_SEED2) & mask
    one = np.uint64(1)
    hit = (words[(h1 >> np.uint64(6)).astype(np.int64)] >> (h1 & np.uint64(63))) & one
    hit &= (words[(h2 >> np.uint64(6)).astype(np.int64)] >> (h2 & np.uint64(63))) & one
    return hit.astype(bool)


def remap_triples_joined(triples_ds, mapping_ds, *, cols=("subj", "pred", "obj", "graph"),
                         num_partitions: int | None = None,
                         flag_col: str | None = None,
                         hot_min: int | None = None):
    """Remap id columns via per-column partitioned hash lookups — the scale
    path when the canonical mapping exceeds broadcast limits (unbounded
    sameAs growth). One coarse union+groupby shuffle per remapped column;
    inside each partition the lookup is the same sorted-searchsorted kernel
    as the broadcast remap, pyarrow-native end to end (int64 stays int64 —
    a pandas round-trip would degrade null-padded columns to float64 and
    corrupt full-range term ids). List-typed columns (lineage
    ``substitution``) are packed to large_binary for the ride. With
    ``flag_col`` each output row carries a bool marking whether ANY id
    changed — the same Δ-seed contract as the broadcast
    :func:`remap_triples`, accumulated across the per-column passes.

    Deliberately avoids Ray's native JoinOperator: its empty hash
    partitions emit schema-less blocks that are forwarded around
    map_batches UDFs uncalled, and any DOWNSTREAM native join that
    receives one crashes with "No match … FieldRef" (Ray 2.49) — chained
    per-column joins are exactly that shape (regression:
    test_remap_joined_matches_broadcast)."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray

    from raydf.joins import _widen_type, arrow_schema, default_partitions, widen_offsets

    P = num_partitions if num_partitions is not None else default_partitions()

    schema = pa.schema(
        [pa.field(f.name, _widen_type(f.type), f.nullable)
         for f in arrow_schema(triples_ds)]
    )
    list_cols = [
        f.name for f in schema
        if pa.types.is_large_list(f.type) or pa.types.is_list(f.type)
    ]
    id_cols = list(cols)

    def pack(t: pa.Table) -> pa.Table:
        for name in list_cols:
            i = t.schema.get_field_index(name)
            t = t.set_column(i, pa.field(name, pa.large_binary()),
                             _pack_list_i64(t[name]))
        return t

    def unpack(t: pa.Table) -> pa.Table:
        for name in list_cols:
            i = t.schema.get_field_index(name)
            t = t.set_column(i, pa.field(name, pa.large_list(pa.int64())),
                             _unpack_list_i64(t[name]))
        return t

    packed_fields = [
        pa.field(f.name, pa.large_binary()) if f.name in list_cols else f
        for f in schema
    ]
    if flag_col is not None:
        packed_fields.append(pa.field(flag_col, pa.bool_()))
    tcols = [f.name for f in packed_fields]

    flagged = triples_ds.map_batches(
        lambda t: widen_offsets(t) if flag_col is None else widen_offsets(t).append_column(
            flag_col, pa.array(np.zeros(len(t), bool), pa.bool_())
        ),
        batch_format="pyarrow",
    )

    # ---- Bloom gate: only rows whose id columns MIGHT be in the mapping
    # enter the per-column exchanges. Without it every pass partitions the
    # FULL dataset by that column's value — and `pred` has ~10 distinct
    # values while `graph` is almost always the 0 sentinel, so those two
    # passes funnel the whole input into a handful of sort partitions: a
    # serial straggler at any scale, and (pre-widening) the 2 GiB varlen
    # offset overflow the 12M-file 4-CPU leg died on. Gated, the clean
    # majority (no id in the mapping) bypasses all four exchanges, and the
    # dirty rows' hot keys are actual mapping ids — md5-low64, uniform.
    # FP rows (≈1.5%) just miss the lookup and pass through unchanged.
    # NOTE: triples_ds is consumed three times (clean scan + dirty scan +
    # a column-pruned hot-value scan) — callers pass materialized or
    # file-backed datasets.
    n_map = mapping_ds.count()
    if n_map == 0:
        return flagged
    bloom_ref = ray.put(build_key_bloom(mapping_ds, "node", n_hint=n_map))

    # ---- Exact hot-value inline remap + passenger routing. Two residual
    # skew sources survive the bloom gate: (a) a dirty row rides EVERY
    # column exchange, so a row dirty only on subj still gets partitioned
    # by its pred (~10 distinct values) and graph (constant 0) in those
    # passes — the whole dirty set funnels into a handful of reduce tasks;
    # (b) a genuinely hot mapped id (or a bloom FP on a constant value)
    # keys one partition with its full row share. Routing fix, per column:
    # rows whose value bloom-MISSES the mapping are PASSENGERS (uniform
    # partition id, excluded from the lookup — exact: zero false
    # negatives); rows whose value is a detected heavy hitter are remapped
    # INLINE against a driver-fetched slice of the mapping (always tiny:
    # ≤ |cols|·P values) and ride as passengers too; only cold bloom-hit
    # values key the exchange — and by the hot threshold none of them
    # exceeds the one-partition share. One extra column-pruned streaming
    # pass over the input (top-K counts per block) buys the balance.
    from raydf.joins import hot_values

    if hot_min is None:
        hot_min = int(os.environ.get("RAYDF_REMAP_HOT_MIN", 100_000))
    hot, _total = hot_values(
        triples_ds.select_columns(id_cols), id_cols, P=P, min_hot=hot_min
    )
    all_hot = np.unique(np.concatenate([hot[c] for c in id_cols]))
    if len(all_hot):
        def _hot_rows(t: pa.Table) -> pa.Table:
            node = t["node"].to_numpy(zero_copy_only=False).astype(np.int64)
            pos = np.clip(np.searchsorted(all_hot, node), 0, len(all_hot) - 1)
            return t.filter(pa.array(all_hot[pos] == node))

        hm = mapping_ds.map_batches(_hot_rows, batch_format="pyarrow").to_pandas()
        hk = hm["node"].to_numpy(np.int64)
        order = np.argsort(hk)
        hk = hk[order]
        hv = hm["canon"].to_numpy(np.int64)[order]
    else:
        hk = hv = np.empty(0, np.int64)
    hot_ref = ray.put((hk, hv, hot))

    def _split(want_dirty: bool):
        def f(t: pa.Table) -> pa.Table:
            bloom = ray.get(bloom_ref)
            dirty = np.zeros(len(t), bool)
            for c in id_cols:
                dirty |= bloom_maybe_contains(
                    bloom, t[c].to_numpy(zero_copy_only=False)
                )
            return t.filter(pa.array(dirty if want_dirty else ~dirty))

        return f

    clean = flagged.map_batches(_split(False), batch_format="pyarrow")
    out = flagged.map_batches(_split(True), batch_format="pyarrow")
    if list_cols:
        out = out.map_batches(pack, batch_format="pyarrow")

    for c in cols:

        def tag_left(t: pa.Table, _c=c) -> pa.Table:
            key = t[_c].to_numpy(zero_copy_only=False).astype(np.int64)
            n = len(t)
            bloom = ray.get(bloom_ref)
            hk_, hv_, hot_ = ray.get(hot_ref)
            maybe = bloom_maybe_contains(bloom, key)
            hs = hot_.get(_c)
            if hs is not None and len(hs):
                pos = np.clip(np.searchsorted(hs, key), 0, len(hs) - 1)
                ishot = hs[pos] == key
            else:
                ishot = np.zeros(n, bool)
            new = key
            if ishot.any() and len(hk_):
                pos = np.clip(np.searchsorted(hk_, key), 0, len(hk_) - 1)
                inmap = ishot & (hk_[pos] == key)
                if inmap.any():
                    new = np.where(inmap, hv_[pos], key)
                    i = t.schema.get_field_index(_c)
                    t = t.set_column(i, t.schema.field(i), pa.array(new, pa.int64()))
                    if flag_col is not None:
                        chg = (
                            t[flag_col].to_numpy(zero_copy_only=False)
                            | (new != key)
                        )
                        j = t.schema.get_field_index(flag_col)
                        t = t.set_column(j, t.schema.field(j),
                                         pa.array(chg, pa.bool_()))
            # lookups (cold bloom-hits) key the exchange; everything else
            # is a passenger on a uniform partition id (block-offset so
            # many small blocks don't all start at partition 0)
            lookup = maybe & ~ishot
            off = int(_mix64(key[:1])[0] % np.uint64(P)) if n else 0
            p = np.where(lookup, _mix_mod(new, P), (np.arange(n) + off) % P)
            t = widen_offsets(t)
            t = t.append_column("__node", pa.nulls(n, pa.int64()))
            t = t.append_column("__canon", pa.nulls(n, pa.int64()))
            t = t.append_column(
                "__side",
                pa.array(np.where(lookup, 0, 2).astype(np.int8)),
            )
            return t.append_column("__p", pa.array(p, pa.int64()))

        def tag_right(t: pa.Table) -> pa.Table:
            node = t["node"].to_numpy(zero_copy_only=False)
            n = len(t)
            data = {f.name: pa.nulls(n, f.type) for f in packed_fields}
            data["__node"] = t["node"].cast(pa.int64())
            data["__canon"] = t["canon"].cast(pa.int64())
            data["__side"] = pa.array(np.ones(n, np.int8))
            data["__p"] = pa.array(_mix_mod(node, P), pa.int64())
            return pa.table(data)

        u = out.map_batches(tag_left, batch_format="pyarrow").union(
            mapping_ds.map_batches(tag_right, batch_format="pyarrow")
        )

        def merge(t: pa.Table, _c=c) -> pa.Table:
            if t.schema.field(_c).type != pa.int64():
                # loud, because silent would be data corruption: the only
                # way an int64 id column arrives here non-int64 is Ray's
                # sort reduce normalizing the partition through PANDAS
                # (most-prevalent block type wins when empty pandas blocks
                # crowd the stream), which null-pads int64 → float64 and
                # loses id bits above 2^53. joins.group_out_arrow keeps
                # group-map outputs arrow precisely to prevent this.
                raise RuntimeError(
                    f"remap merge: column {_c!r} arrived as "
                    f"{t.schema.field(_c).type} (expected int64) — a pandas "
                    "block slipped into the exchange and degraded id columns"
                )
            # __side: 0 = lookup row, 1 = mapping row, 2 = passenger
            # (bloom-miss or inline-remapped hot row — rides the exchange
            # for schema continuity but must NOT be value-looked-up: an
            # inline-remapped row's new canon could coincidentally equal a
            # mapping node in this partition and be remapped twice)
            side = t["__side"]
            pas = t.filter(pc.equal(side, 2)).select(tcols)
            l = t.filter(pc.equal(side, 0)).select(tcols)
            r = t.filter(pc.equal(side, 1))
            if len(r) and len(l):
                k = r["__node"].to_numpy(zero_copy_only=False).astype(np.int64)
                v = r["__canon"].to_numpy(zero_copy_only=False).astype(np.int64)
                order = np.argsort(k)
                k, v = k[order], v[order]
                arr = l[_c].to_numpy(zero_copy_only=False)
                pos = np.clip(np.searchsorted(k, arr), 0, len(k) - 1)
                new = np.where(k[pos] == arr, v[pos], arr)
                i = l.schema.get_field_index(_c)
                l = l.set_column(i, l.schema.field(i), pa.array(new, pa.int64()))
                if flag_col is not None:
                    chg = l[flag_col].to_numpy(zero_copy_only=False) | (new != arr)
                    j = l.schema.get_field_index(flag_col)
                    l = l.set_column(j, l.schema.field(j), pa.array(chg, pa.bool_()))
            return pa.concat_tables([l, pas]) if len(pas) else l

        out = u.groupby("__p").map_groups(merge, batch_format="pyarrow")

    if list_cols:
        out = out.map_batches(unpack, batch_format="pyarrow")
    return clean.union(out)


def remap_triples(triples_ds, mapping: pd.DataFrame, *, flag_col: str | None = None):
    """Remap subj/pred/obj/graph through the canonical mapping; with
    ``flag_col`` each row also gets a bool marking whether any id changed
    (the Δ seed for incremental re-deduction after a merge). Graph names
    are resources too, so merged graph ids remap like any position (the
    default-graph sentinel 0 is never a mapping node — nodes are real
    term ids)."""
    if len(mapping) == 0 and flag_col is None:
        return triples_ds
    return triples_ds.map_batches(
        make_remapper(mapping, cols=("subj", "pred", "obj", "graph"), flag_col=flag_col),
        batch_format="pyarrow",
    )


def compose_mappings_ds(total_ds, new_ds, *, num_partitions: int | None = None):
    """Distributed ``total ∘ new`` over (node, canon) mapping Datasets —
    same semantics as :func:`raydf.pipeline.compose_mappings`, with nothing
    driver-resident: total's canon values are remapped through new via the
    partitioned joined lookup, and new rows whose node is absent from total
    append via a partitioned anti-join (the scale path when the accumulated
    Eq mapping exceeds MAPPING_BROADCAST_LIMIT)."""
    from raydf.relops import anti_join_keys

    remapped = remap_triples_joined(
        total_ds, new_ds, cols=("canon",), num_partitions=num_partitions
    )
    extra = anti_join_keys(
        new_ds, total_ds.select_columns(["node"]), ["node"],
        num_partitions=num_partitions,
    )
    # normalize both branches to arrow blocks (anti_join_keys emits pandas
    # blocks; a mixed-type union breaks downstream schema sampling)
    def _arrow_i64(b) -> pa.Table:
        if isinstance(b, pa.Table):
            return pa.table(
                {"node": b["node"].cast(pa.int64()), "canon": b["canon"].cast(pa.int64())}
            )
        return pa.table(
            {
                "node": pa.array(b["node"].to_numpy(np.int64), pa.int64()),
                "canon": pa.array(b["canon"].to_numpy(np.int64), pa.int64()),
            }
        )

    return remapped.map_batches(_arrow_i64, batch_format="pyarrow").union(
        extra.map_batches(_arrow_i64, batch_format="pyarrow")
    )


def remap_terms_joined(terms_ds, mapping_ds, *, num_partitions: int | None = None):
    """Joined-lookup variant of :func:`remap_terms` for mapping Datasets
    past MAPPING_BROADCAST_LIMIT: canonical_id starts as term_id and is
    remapped through the mapping via the partitioned lookup — the term
    dictionary never meets a driver frame."""

    def _add(t: pa.Table) -> pa.Table:
        return t.append_column(
            "canonical_id", t["term_id"].cast(pa.int64()).combine_chunks()
        )

    withc = terms_ds.map_batches(_add, batch_format="pyarrow")
    return remap_triples_joined(
        withc, mapping_ds, cols=("canonical_id",), num_partitions=num_partitions
    )


def remap_terms(terms_ds, mapping: pd.DataFrame):
    """Term dictionary → add canonical_id column so the interpretation keeps
    every lexical form of a merged resource (ReverseTermInterpretation:
    ``literals_of`` = dictionary rows sharing canonical_id)."""
    if len(mapping) == 0:
        return terms_ds.map_batches(
            lambda df: df.assign(canonical_id=df["term_id"]), batch_format="pandas"
        )
    remap = make_remapper(mapping, cols=("canonical_id",))

    def _add(df: pd.DataFrame) -> pd.DataFrame:
        df = df.assign(canonical_id=df["term_id"])
        return remap(df)

    return terms_ds.map_batches(_add, batch_format="pandas")
