"""Mergeable quantile sketch (deterministic KLL-style) and the
combiner-based approximate group-quantile operator built on it.

:func:`raydf.relops.quantile_per_group` is the exact contract and must
co-locate every group value (one full-row shuffle). This module is the
scale path its docstring promises: each input block folds its rows into a
bounded summary per group (the combiner), the shuffle then moves only
``groups × O(k log n)`` summary values instead of every row, and a final
per-group merge answers the quantiles. Error is the classic KLL/MRL bound
(rank error ∝ n / k up the compaction levels); with no compaction — every
group ≤ k rows — the sketch IS the sorted data and results are exactly the
'lower'-interpolation order statistics, which is what the SQL-checked
driver query exercises.

Determinism: textbook KLL flips a coin per compaction (keep odd or even
ranks). Here the parity alternates with a per-sketch compaction counter —
fully deterministic and engine-reproducible, at the cost of the slightly
weaker (but still unbiased-in-expectation-over-levels) classic
Munro-Paterson behavior. Merges concatenate level-wise then re-compact,
so the fold is associative up to the documented rank error regardless of
block order.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pandas as pd

# serialized sketch row layout: int64 list = [k, n_levels, len_0, .., len_m,
# compactions, values...] — flat int64 so it rides an Arrow large_list
# column through any shuffle without Python objects.


class KLL:
    """Deterministic KLL-style quantile summary over int64 values.

    Level i holds a sorted int64 array whose items each represent 2**i
    original rows. ``capacity`` bounds the total retained items; a level
    longer than ``capacity // (n_levels)`` is compacted: keep alternating
    ranks (parity from a running counter), promote survivors up a level.
    """

    __slots__ = ("k", "levels", "compactions", "n")

    def __init__(self, k: int = 256):
        self.k = int(k)
        self.levels: list[np.ndarray] = [np.empty(0, np.int64)]
        self.compactions = 0
        self.n = 0

    # -- building ----------------------------------------------------
    def add(self, values: np.ndarray) -> "KLL":
        v = np.asarray(values, np.int64)
        self.n += len(v)
        self.levels[0] = np.sort(np.concatenate([self.levels[0], v]))
        self._shrink()
        return self

    def merge(self, other: "KLL") -> "KLL":
        assert self.k == other.k
        while len(self.levels) < len(other.levels):
            self.levels.append(np.empty(0, np.int64))
        for i, lv in enumerate(other.levels):
            if len(lv):
                self.levels[i] = np.sort(np.concatenate([self.levels[i], lv]))
        self.n += other.n
        self.compactions += other.compactions
        self._shrink()
        return self

    def _shrink(self):
        while sum(len(lv) for lv in self.levels) > self.k:
            # compact the lowest level that holds more than its share
            cap = max(2, self.k // (2 * len(self.levels)))
            i = next(
                (j for j, lv in enumerate(self.levels) if len(lv) > cap),
                None,
            )
            if i is None:
                break
            lv = self.levels[i]
            off = self.compactions & 1
            self.compactions += 1
            survivors = lv[off::2]
            self.levels[i] = np.empty(0, np.int64)
            if i + 1 == len(self.levels):
                self.levels.append(np.empty(0, np.int64))
            self.levels[i + 1] = np.sort(
                np.concatenate([self.levels[i + 1], survivors])
            )

    # -- querying ----------------------------------------------------
    def quantile(self, q: float) -> int:
        """Weighted 'lower' order statistic: the retained value whose
        cumulative weight first exceeds ``floor(q * (n - 1))``."""
        vals = np.concatenate([lv for lv in self.levels if len(lv)])
        wts = np.concatenate(
            [
                np.full(len(lv), 1 << i, np.int64)
                for i, lv in enumerate(self.levels)
                if len(lv)
            ]
        )
        order = np.argsort(vals, kind="stable")
        vals, wts = vals[order], wts[order]
        target = int(np.floor(q * (self.n - 1))) if self.n > 1 else 0
        idx = int(np.searchsorted(np.cumsum(wts), target + 1, side="left"))
        return int(vals[min(idx, len(vals) - 1)])

    # -- flat int64 (de)serialization --------------------------------
    def to_flat(self) -> np.ndarray:
        lens = [len(lv) for lv in self.levels]
        head = np.array(
            [self.k, self.n, self.compactions, len(lens), *lens], np.int64
        )
        return np.concatenate([head] + [lv for lv in self.levels])

    @classmethod
    def from_flat(cls, flat: np.ndarray) -> "KLL":
        flat = np.asarray(flat, np.int64)
        s = cls(int(flat[0]))
        s.n = int(flat[1])
        s.compactions = int(flat[2])
        m = int(flat[3])
        lens = flat[4 : 4 + m].astype(np.int64)
        s.levels = []
        off = 4 + m
        for ln in lens:
            s.levels.append(flat[off : off + ln])
            off += ln
        if not s.levels:
            s.levels = [np.empty(0, np.int64)]
        return s


def approx_quantile_per_group(
    ds,
    keys: Sequence[str],
    col: str,
    qs: Sequence[float],
    *,
    k: int = 256,
    num_partitions: int | None = None,
):
    """Approximate per-group quantiles via mergeable KLL summaries.

    Stage 1 (combiner, ``map_batches``): each block groups its OWN rows and
    emits one flat-serialized sketch per (block, group) — the shuffle never
    sees raw rows. Stage 2 (one coarse hash shuffle on ``keys``): merge a
    group's sketches, answer every ``q``. Output columns match
    :func:`raydf.relops.quantile_per_group` (``p50``-style names), and for
    groups with ≤ ``k`` rows per the whole input the values are exactly the
    'lower' order statistics."""
    import pyarrow as pa

    from raydf.joins import partitioned_group_map

    keys = list(keys)
    qs = list(qs)

    def local(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for kv, grp in df.groupby(keys, sort=False):
            kv = kv if isinstance(kv, tuple) else (kv,)
            sk = KLL(k).add(grp[col].to_numpy(np.int64))
            # plain list → pyarrow infers list<int64>, keeping the shuffle
            # free of pickled Python objects
            rows.append((*kv, sk.to_flat().tolist()))
        out = pd.DataFrame(rows, columns=keys + ["__sketch"])
        return out

    def finalize(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for kv, grp in df.groupby(keys, sort=False):
            kv = kv if isinstance(kv, tuple) else (kv,)
            it = iter(grp["__sketch"])
            sk = KLL.from_flat(next(it))
            for flat in it:
                sk.merge(KLL.from_flat(flat))
            rows.append((*kv, *(sk.quantile(q) for q in qs)))
        cols = keys + [f"p{int(round(q * 100))}" for q in qs]
        return pd.DataFrame(rows, columns=cols)

    pre = ds.map_batches(
        local,
        batch_format="pandas",
        batch_size=65536,
    )
    return partitioned_group_map(pre, keys, finalize, num_partitions=num_partitions)


# ------------------------------------------------------------- HyperLogLog

HLL_P = 12  # 2^12 = 4096 registers; standard error ~1.04/sqrt(4096) = 1.6%


def _bit_length_u64(w: np.ndarray) -> np.ndarray:
    """Exact vectorized bit_length for uint64 (branchless CLZ) — no
    float log2, whose last-ulp rounding could mis-bin boundary values."""
    bl = np.zeros(len(w), np.int64)
    v = w.copy()
    for shift in (32, 16, 8, 4, 2, 1):
        m = v >= (np.uint64(1) << np.uint64(shift))
        bl[m] += shift
        v[m] >>= np.uint64(shift)
    bl[w > 0] += 1
    return bl


def hll_rho(values) -> tuple[np.ndarray, np.ndarray]:
    """(bucket, rho) per value: md5-hash → top HLL_P bits pick the
    register, rho = leading-zero count of the remaining 64-HLL_P bits + 1.
    md5 (md5_number_lower semantics) keeps the registers recomputable by
    a SQL oracle — the whole sketch state is engine-portable."""
    from raydf.datapipe.dedup import md5_u64

    h = md5_u64(values)
    shift = np.uint64(64 - HLL_P)
    bucket = (h >> shift).astype(np.int64)
    w = h & np.uint64((1 << (64 - HLL_P)) - 1)
    rho = (64 - HLL_P) + 1 - _bit_length_u64(w)
    return bucket, rho.astype(np.int64)


def hll_estimate(rho_counts: "pd.Series") -> float:
    """Cardinality estimate from a {rho: n_registers} map (one group's
    register histogram — all the estimator needs; bucket identity is
    irrelevant to the formula). Classic HLL with the linear-counting
    small-range correction."""
    m = 1 << HLL_P
    filled = int(rho_counts.sum())
    zeros = m - filled
    inv_sum = zeros * 1.0 + sum(n * 2.0 ** (-int(r)) for r, n in rho_counts.items())
    alpha = 0.7213 / (1 + 1.079 / m)
    e = alpha * m * m / inv_sum
    if e <= 2.5 * m and zeros:
        return m * float(np.log(m / zeros))
    return float(e)


def hll_register_histogram(ds, group_col: str, value_col: str):
    """Distributed HLL per group, emitted as the exact-integer register
    histogram ``(group, rho, n_registers)`` — the SQL-checkable sketch
    state (estimates are floats whose summation order differs per engine;
    the histogram is engine-exact and sufficient to compute them).

    Combiner shape: each batch folds its rows into local register maxima
    (≤ groups × 4096 rows leave any block), one groupby-max merges
    registers, one groupby-count collapses to the histogram. Shuffle is
    sketch-sized, never data-sized."""
    import pyarrow as pa

    def local(df: pd.DataFrame) -> pd.DataFrame:
        bucket, rho = hll_rho(df[value_col].astype(str).to_numpy(object))
        out = pd.DataFrame(
            {"g": df[group_col].to_numpy(), "bucket": bucket, "rho": rho}
        )
        return out.groupby(["g", "bucket"], sort=False, as_index=False)["rho"].max()

    regs = (
        ds.map_batches(local, batch_format="pandas", batch_size=65536)
        .groupby(["g", "bucket"])
        .max("rho")
    )

    def hist(df: pd.DataFrame) -> pd.DataFrame:
        out = (
            df.groupby(["g", "max(rho)"], sort=False)
            .size()
            .reset_index(name="n_registers")
        )
        return out.rename(columns={"g": group_col, "max(rho)": "rho"})

    from raydf.joins import partitioned_group_map

    return partitioned_group_map(regs, ["g"], hist)


# ------------------------------------------------------- Count-Min sketch

CMS_DEPTH = 4
CMS_WIDTH = 1024


def cms_buckets(tokens: np.ndarray, depth: int = CMS_DEPTH,
                width: int = CMS_WIDTH) -> np.ndarray:
    """(depth, len(tokens)) bucket matrix: row d hashes ``"{d}:{tok}"``
    with md5 (md5_number_lower semantics) mod width — the d-prefix is the
    standard independent-row trick and keeps every cell recomputable by a
    SQL oracle (same contract as the HLL registers / minhash shingles)."""
    from raydf.datapipe.dedup import md5_u64

    return np.stack(
        [
            (md5_u64(np.array([f"{d}:{t}" for t in tokens], dtype=object))
             % np.uint64(width)).astype(np.int64)
            for d in range(depth)
        ]
    )


def cms_estimate(state: pd.DataFrame, tokens, *, depth: int = CMS_DEPTH,
                 width: int = CMS_WIDTH) -> np.ndarray:
    """Point-query the sketch: estimate(tok) = min over rows d of
    cell[d][h_d(tok)] — the classic Count-Min upper-bound estimator.
    ``state``: (d, w, cnt) frame as produced by :func:`cms_token_counts`."""
    cells = np.zeros((depth, width), np.int64)
    cells[state["d"].to_numpy(np.int64), state["w"].to_numpy(np.int64)] = (
        state["cnt"].to_numpy(np.int64)
    )
    b = cms_buckets(np.asarray(tokens, dtype=object), depth, width)
    return cells[np.arange(depth)[:, None], b].min(axis=0)


def cms_token_counts(docs, *, text_col: str = "text",
                     depth: int = CMS_DEPTH, width: int = CMS_WIDTH):
    """Mergeable Count-Min sketch of word-token frequencies across a
    corpus, emitted as the exact-integer nonzero-cell state
    ``(d, w, cnt)`` — heavy-hitter estimation at 100 TB without a
    vocabulary-sized shuffle.

    Combiner shape: each batch dedups its tokens (md5 only on uniques),
    bincounts into a local depth×width sketch, and emits ≤ depth×width
    partial rows; one small keyed shuffle sums cells. Shuffle is
    sketch-sized (≤ 4096 rows/block), never corpus-sized."""
    import pyarrow as pa

    import re

    word = re.compile(r"[a-z0-9]+")

    def local(df: pd.DataFrame) -> pd.DataFrame:
        toks = df[text_col].str.lower().str.findall(word).explode().dropna()
        if len(toks) == 0:
            return pd.DataFrame(
                {"d": pd.Series([], dtype=np.int64),
                 "w": pd.Series([], dtype=np.int64),
                 "cnt": pd.Series([], dtype=np.int64)}
            )
        uniq, counts = np.unique(toks.to_numpy(dtype=object), return_counts=True)
        b = cms_buckets(uniq, depth, width)
        cells = np.zeros((depth, width), np.int64)
        for d in range(depth):
            np.add.at(cells[d], b[d], counts)
        dd, ww = np.nonzero(cells)
        return pd.DataFrame(
            {"d": dd.astype(np.int64), "w": ww.astype(np.int64),
             "cnt": cells[dd, ww]}
        )

    partials = docs.map_batches(local, batch_format="pandas", batch_size=65536)

    def total(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["d", "w"], sort=False, as_index=False)["cnt"].sum()
        return g.astype({"d": np.int64, "w": np.int64, "cnt": np.int64})

    from raydf.joins import partitioned_group_map

    return partitioned_group_map(partials, ["d", "w"], total, num_partitions=8)


# ---------------------------------------------------------- Bloom filter

BLOOM_BITS = 1 << 14
BLOOM_HASHES = 2


def bloom_bits(values: np.ndarray, *, n_hashes: int = BLOOM_HASHES,
               n_bits: int = BLOOM_BITS) -> np.ndarray:
    """(n_hashes, len(values)) bit-index matrix: row d hashes
    ``"{d}:{v}"`` with md5 mod n_bits — the same d-prefixed independent-
    row contract as the Count-Min sketch, so every set bit is
    recomputable by a SQL oracle."""
    from raydf.datapipe.dedup import md5_u64

    return np.stack(
        [
            (md5_u64(np.array([f"{d}:{v}" for v in values], dtype=object))
             % np.uint64(n_bits)).astype(np.int64)
            for d in range(n_hashes)
        ]
    )


def bloom_build(ds, value_col: str, *, n_hashes: int = BLOOM_HASHES,
                n_bits: int = BLOOM_BITS):
    """Mergeable Bloom filter over a column, emitted as the exact set-bit
    rows ``(d, bit)`` (distinct) — the membership sketch a pipeline ships
    to cheaply pre-filter against a huge key set (seen-URL / known-hash
    suppression) without shuffling the keys themselves.

    Combiner shape: each batch dedups its values, hashes the uniques and
    emits its local set-bit rows (≤ n_hashes·n_bits per block); one
    sketch-sized distinct merges blocks — union IS the Bloom merge."""
    import pyarrow as pa

    from raydf.joins import distinct

    def local(df: pd.DataFrame) -> pd.DataFrame:
        vals = np.unique(df[value_col].astype(str).to_numpy(dtype=object))
        if len(vals) == 0:
            return pd.DataFrame({"d": pd.Series([], dtype=np.int64),
                                 "bit": pd.Series([], dtype=np.int64)})
        b = bloom_bits(vals, n_hashes=n_hashes, n_bits=n_bits)
        out = pd.DataFrame(
            {"d": np.repeat(np.arange(n_hashes, dtype=np.int64), b.shape[1]),
             "bit": b.reshape(-1)}
        )
        return out.drop_duplicates()

    partials = ds.map_batches(local, batch_format="pandas", batch_size=65536)
    return distinct(partials, ["d", "bit"], num_partitions=8)


def bloom_contains(state: pd.DataFrame, values, *, n_hashes: int = BLOOM_HASHES,
                   n_bits: int = BLOOM_BITS) -> np.ndarray:
    """Probe the sketch: True iff EVERY row's bit is set (may false-
    positive at the standard (1-e^{-kn/m})^k rate, never false-negative).
    ``state``: (d, bit) frame as produced by :func:`bloom_build`."""
    cells = np.zeros((n_hashes, n_bits), bool)
    cells[state["d"].to_numpy(np.int64), state["bit"].to_numpy(np.int64)] = True
    b = bloom_bits(np.asarray(values, dtype=object), n_hashes=n_hashes,
                   n_bits=n_bits)
    return cells[np.arange(n_hashes)[:, None], b].all(axis=0)
