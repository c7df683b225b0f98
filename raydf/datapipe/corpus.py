"""Corpus-level operations for training-data pipelines: deterministic
train/test splits and global term statistics.

Both are classic wide-pipeline shapes: the split is embarrassingly
parallel (pure per-row hash, no shuffle at all); top-terms is the
canonical combiner pattern — per-batch local counts shrink the shuffle to
the vocabulary size, the groupby sums partials, and only k rows reach the
driver."""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

_WORD_RE = r"\w+"


def split_by_hash(ds, key: str = "doc_id", train_pct: int = 80,
                  alias: str = "split"):
    """Deterministic, engine-portable train/test assignment:
    ``md5(str(key))[:8] as uint % 100 < train_pct → 'train'``.

    md5 (not a seeded fast hash) is deliberate: the assignment is
    reproducible from any engine — SQL oracles, a later Spark/DuckDB
    re-run — so membership never silently drifts. Rows never move: this
    is a stateless map, no shuffle, no sampling bias from block order.
    md5 per key is ~1 μs — noise next to the I/O of any real corpus row;
    swap in a vectorized xxhash only if the key column dominates."""

    def f(batch: pa.Table) -> pa.Table:
        ids = pd.Series(batch[key].to_pylist()).astype(str)
        h = np.fromiter(
            (
                int(hashlib.md5(s.encode()).hexdigest()[:8], 16) % 100
                for s in ids
            ),
            dtype=np.int64,
            count=len(ids),
        )
        split = np.where(h < train_pct, "train", "test")
        return batch.append_column(alias, pa.array(split, pa.string()))

    return ds.map_batches(f, batch_format="pyarrow")


def stratified_sample(ds, strata: list[str], n: int, *, key: str = "doc_id",
                      num_partitions: int | None = None):
    """Deterministic stratified sample: the ``n`` rows with the smallest
    ``md5_u64(str(key))`` per stratum (ties broken by the key) — a
    balanced per-group subset that any engine reproduces exactly
    (DuckDB: ``ROW_NUMBER() OVER (PARTITION BY strata ORDER BY
    md5_number_lower(key), key) <= n``).

    Distribution shape: :func:`raydf.relops.topk_per_group` — per-block
    combiner keeps ≤ n rows per stratum per block, so the shuffle moves
    ``strata × n × blocks`` rows at most, never the corpus."""
    from raydf.datapipe.dedup import md5_u64
    from raydf.relops import topk_per_group

    # md5_u64 is uint64; topk orders int64. Shift into signed order-
    # preserving form: x - 2^63 keeps uint64 ordering under int64 compare.
    def add_hash_signed(batch: pa.Table) -> pa.Table:
        ids = pd.Series(batch[key].to_pylist()).astype(str).to_numpy(object)
        h = (md5_u64(ids) - np.uint64(1 << 63)).astype(np.int64)
        return batch.append_column("__h", pa.array(h, pa.int64()))

    out = topk_per_group(
        ds.map_batches(add_hash_signed, batch_format="pyarrow"),
        strata, "__h", n, ascending=True, tie_cols=[key],
        num_partitions=num_partitions,
    )
    return out.drop_columns(["__h"])


def pack_chunks(
    ds,
    token_col: str = "n_tokens",
    budget: int = 2048,
    key: str = "doc_id",
    num_shards: int = 32,
    alias: str = "chunk_id",
):
    """Assign documents to fixed-token-budget training chunks,
    deterministically and shuffle-free.

    The industry-standard sequence-packing step, in its contiguous
    ("next-fit by cumulative budget") form: documents are sharded by the
    same engine-portable md5 hash as :func:`split_by_hash`, ordered by
    ``key`` within a shard, and chunk ``floor(cumsum_before / budget)``
    — so a chunk is a contiguous run of docs whose preceding token mass
    fills whole budgets. Chunks are shard-local (``chunk_id`` =
    ``shard * 2**32 + local chunk``): packing never needs a global
    order, matching how real pipelines pack per output shard.

    Contiguous packing wastes at most one doc's tokens per boundary vs
    bin-packing heuristics, but is stateless, reproducible from ANY
    engine (it is plain SQL window arithmetic — see the driver oracle),
    and preserves shard locality for resumable writes. Rows stay where
    they are: the assignment is a per-shard sort of (key, n_tokens)
    pairs only, done inside one coarse partition map."""
    from raydf.joins import partitioned_group_map

    def shard_of(ids: pd.Series) -> np.ndarray:
        return np.fromiter(
            (
                int(hashlib.md5(s.encode()).hexdigest()[:8], 16) % num_shards
                for s in ids.astype(str)
            ),
            dtype=np.int64,
            count=len(ids),
        )

    def add_shard(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["__shard"] = shard_of(df[key])
        return df

    def pack(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["__shard", key], kind="mergesort").reset_index(drop=True)
        tok = df[token_col].to_numpy(np.int64)
        # tokens BEFORE each doc within its shard
        before = (
            df.groupby("__shard", sort=False)[token_col].cumsum().to_numpy(np.int64)
            - tok
        )
        df[alias] = df["__shard"].to_numpy(np.int64) * (1 << 32) + before // budget
        return df.drop(columns="__shard")

    with_shard = ds.map_batches(add_shard, batch_format="pandas")
    return partitioned_group_map(with_shard, ["__shard"], pack)


def top_terms(docs_ds, k: int = 20, text_col: str = "text"):
    """Global top-k most frequent word tokens (lowercased ``\\w+``),
    deterministic tie-break by token.

    Partial/final: each batch emits its LOCAL (token, count) partials
    (shuffle volume ∝ vocabulary per block, not corpus tokens), a
    ``groupby.sum`` folds them, and the final top-k is a sort+limit over
    the distinct vocabulary — the only all-to-all touches token counts,
    never documents."""
    def local_counts(batch: pa.Table) -> pa.Table:
        tok = (
            pd.Series(batch[text_col].to_pylist())
            .str.lower()
            .str.findall(_WORD_RE)
            .explode()
            .dropna()
        )
        c = tok.value_counts()
        return pa.table(
            {
                "token": pa.array(c.index.astype(str), pa.string()),
                "n": pa.array(c.to_numpy(np.int64), pa.int64()),
            }
        )

    # Sort-based fold, not groupby().aggregate(Sum): Ray 2.49's
    # hash-shuffle Aggregate is pathologically slow at low CPU counts
    # (measured 2026-08-19 — see canonicalize.canonical_mapping_distributed_ds)
    from raydf.joins import partitioned_group_map

    def ksum(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("token", sort=False)["n"].sum()
        return pd.DataFrame(
            {"token": g.index.astype(str), "n": g.to_numpy(np.int64)}
        )

    counts = docs_ds.map_batches(local_counts, batch_format="pyarrow")
    total = partitioned_group_map(counts, ["token"], ksum)
    return total.sort(key=["n", "token"], descending=[True, False]).limit(k)
