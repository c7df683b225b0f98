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


def top_terms(docs_ds, k: int = 20, text_col: str = "text"):
    """Global top-k most frequent word tokens (lowercased ``\\w+``),
    deterministic tie-break by token.

    Partial/final: each batch emits its LOCAL (token, count) partials
    (shuffle volume ∝ vocabulary per block, not corpus tokens), a
    ``groupby.sum`` folds them, and the final top-k is a sort+limit over
    the distinct vocabulary — the only all-to-all touches token counts,
    never documents."""
    from ray.data.aggregate import Sum

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

    counts = docs_ds.map_batches(local_counts, batch_format="pyarrow")
    total = counts.groupby("token").aggregate(Sum("n", alias_name="n"))
    return total.sort(key=["n", "token"], descending=[True, False]).limit(k)
