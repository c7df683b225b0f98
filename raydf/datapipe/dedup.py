"""Deduplication operators over a documents table (id + text).

All variants follow the same scale shape:

* **exact**        — vectorized content hash per batch (combiner) →
  ``groupby(hash).map_groups(min-id)``: the shuffle moves one row per
  distinct hash after local pre-dedup.
* **MinHash-LSH**  — shingle → k minhashes → b bands; explode to
  (band, band_hash, doc) rows; ``groupby(band, band_hash)`` emits
  candidate pairs; pairs verified by shingle-Jaccard; connected
  components pick the min-id survivor per near-dup cluster. Only
  candidate pairs ever leave their bucket.
* **SimHash**      — 64-bit simhash per doc; bucket by the 4×16-bit
  sub-fingerprints (any near-dup within Hamming distance ≤3 shares at
  least one sub-band); verify Hamming distance in-bucket.
* **n-gram Jaccard** — direct pairwise verification used as the verifier
  for candidate pairs (and exposed standalone for small relations).
* **embedding cosine** — see raydf.datapipe.ann (bucketed by coarse LSH
  sign-bits, verified by exact cosine).

Deterministic throughout, no RNG state — a retried task reproduces its
output bit-for-bit. The sketch string hashes (minhash shingles, simhash
tokens) are md5-derived (:func:`md5_u64`) specifically so a SQL engine
can recompute the signatures and the driver can hash-check the full
near-dedup result against a DuckDB oracle; permutation coefficients are
process constants embedded into the oracle SQL as literals.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd
import pyarrow as pa

from raydf import terms
from raydf.joins import distinct, partitioned_group_map


def _text_hash(texts) -> np.ndarray:
    return terms.hash64_strings(np.asarray(texts, dtype=object), prefix=b"doc\x1f")


def md5_u64(values) -> np.ndarray:
    """uint64 string hash reproducible in ANSI-SQL engines:
    ``int.from_bytes(md5(s).digest()[8:], 'little')`` equals DuckDB's
    ``md5_number_lower(s)`` — the sketch kernels (minhash shingles,
    simhash tokens) use this so their DuckDB oracles can recompute
    signatures bit-for-bit. Hash uniques, scatter back (same shape as
    terms.hash64_strings)."""
    arr = np.asarray(values, dtype=object)
    if len(arr) == 0:
        return np.empty(0, np.uint64)
    uniq, inv = np.unique(arr, return_inverse=True)
    hs = np.fromiter(
        (
            int.from_bytes(hashlib.md5(str(u).encode()).digest()[8:], "little")
            for u in uniq
        ),
        dtype=np.uint64,
        count=len(uniq),
    )
    return hs[inv]


# ------------------------------------------------------------------ exact


def exact_dedup(docs_ds, *, id_col: str = "doc_id", text_col: str = "text",
                num_partitions: int | None = None):
    """Keep the min-id document per exact text (hash-partitioned).

    ``num_partitions=None`` → CPU-scaled (joins.default_partitions); each
    partition is one in-memory frame per task, so the count must grow with
    input size / cluster width."""

    def add_hash(batch: pa.Table) -> pa.Table:
        h = _text_hash(batch[text_col].to_pylist())
        return batch.append_column("__h", pa.array(h, pa.int64()))

    def local_min(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(id_col).drop_duplicates("__h")

    ds = docs_ds.map_batches(add_hash, batch_format="pyarrow")
    ds = ds.map_batches(local_min, batch_format="pandas")  # combiner
    out = partitioned_group_map(ds, ["__h"], local_min, num_partitions=num_partitions)
    return out.drop_columns(["__h"])


# ------------------------------------------------------------- minhash-lsh


# ASCII whitespace, matching the SQL oracle's RE2 '\s+' — Python's bare
# str.split() is Unicode-aware (NBSP etc.) and would silently diverge from
# any RE2-based reimplementation on non-ASCII corpora (ADVICE r02)
_WS_RE = re.compile(r"\s+", re.ASCII)


def _shingles(text: str, k: int) -> set:
    t = _WS_RE.sub(" ", text.lower()).strip()
    if len(t) < k:
        return {t}
    return {t[i : i + k] for i in range(len(t) - k + 1)}


_M31 = (1 << 31) - 1  # Mersenne prime: a, b, x < 2^31 keeps a*x+b < 2^63,
# exact in BOTH numpy int64 (no wrap) and plain SQL BIGINT — the oracle
# recomputes signatures bit-for-bit without 128-bit arithmetic


def minhash_coefficients(num_hashes: int) -> tuple[list[int], list[int]]:
    """Deterministic universal-hash coefficients (both < 2^31-1; a is
    nonzero with overwhelming probability — seeded from |1'd 64-bit
    hashes), derived from the permutation index — no RNG state, stable
    across processes, and exported so the DuckDB oracle can embed them
    as literals."""
    mask = (1 << 64) - 1
    a = [((terms._h64(f"mh-a-{i}".encode()) | 1) & mask) % _M31 for i in range(num_hashes)]
    b = [(terms._h64(f"mh-b-{i}".encode()) & mask) % _M31 for i in range(num_hashes)]
    return a, b


def _minhash_matrix(shingle_hashes: list[np.ndarray], num_hashes: int) -> np.ndarray:
    """num_docs × num_hashes minhash signatures from per-doc shingle hash arrays."""
    a_l, b_l = minhash_coefficients(num_hashes)
    a = np.array(a_l, dtype=np.int64)
    b = np.array(b_l, dtype=np.int64)
    out = np.empty((len(shingle_hashes), num_hashes), dtype=np.int64)
    for d, sh in enumerate(shingle_hashes):
        if len(sh) == 0:
            out[d, :] = 0
            continue
        x = (sh.astype(np.uint64) % np.uint64(_M31)).astype(np.int64)
        # (num_hashes, n_shingles) via broadcasting, then min over shingles;
        # products < 2^62 — exact int64, no modular wrap anywhere
        vals = (np.multiply.outer(a, x) + b[:, None]) % _M31
        out[d, :] = vals.min(axis=1)
    return out


class MinHasher:
    """Actor-pool stage: text → (band_id, band_hash) LSH keys.

    Shingling+hashing state (hash coefficients) built once per actor."""

    def __init__(self, *, k: int = 5, num_hashes: int = 64, bands: int = 16):
        assert num_hashes % bands == 0
        self.k, self.num_hashes, self.bands = k, num_hashes, bands
        self.rows_per_band = num_hashes // bands

    def signatures(self, texts: list[str]) -> np.ndarray:
        sh = [
            md5_u64(np.array(sorted(_shingles(t, self.k)), dtype=object))
            for t in texts
        ]
        return _minhash_matrix(sh, self.num_hashes)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        sig = self.signatures(batch["text"].to_pylist())
        n = len(ids)
        band_ids, band_hashes, doc_ids = [], [], []
        for bnd in range(self.bands):
            seg = sig[:, bnd * self.rows_per_band : (bnd + 1) * self.rows_per_band]
            cols = [seg[:, i].astype(np.int64) for i in range(seg.shape[1])]
            bh = terms.combine_hash_columns(*cols)
            band_ids.append(np.full(n, bnd, dtype=np.int32))
            band_hashes.append(bh)
            doc_ids.append(ids)
        return pa.table(
            {
                "band": pa.array(np.concatenate(band_ids), pa.int32()),
                "band_hash": pa.array(np.concatenate(band_hashes), pa.int64()),
                "doc_id": pa.array(np.concatenate(doc_ids), pa.int64()),
            }
        )


def minhash_candidate_pairs(docs_ds, *, k=5, num_hashes=64, bands=16, concurrency=4,
                            num_partitions=None):
    """LSH candidate pairs (a < b) — docs sharing any band bucket."""
    keys = docs_ds.map_batches(
        MinHasher,
        fn_constructor_kwargs={"k": k, "num_hashes": num_hashes, "bands": bands},
        batch_format="pyarrow",
        batch_size=1024,
        concurrency=concurrency,
    )

    def pairs_of_partition(df: pd.DataFrame) -> pd.DataFrame:
        # drop singleton buckets first (the vast majority) — vectorized
        df = df[df.duplicated(subset=["band", "band_hash"], keep=False)]
        parts = []
        for _, g in df.groupby(["band", "band_hash"], sort=False):
            ids = np.sort(g["doc_id"].unique())
            if len(ids) < 2:
                continue
            # bucket sizes are tiny by construction; cap pathological buckets
            ids = ids[:200]
            ai, bi = np.triu_indices(len(ids), k=1)
            parts.append(pd.DataFrame({"a": ids[ai], "b": ids[bi]}))
        if not parts:
            return pd.DataFrame(
                {"a": pd.Series(dtype=np.int64), "b": pd.Series(dtype=np.int64)}
            )
        return pd.concat(parts, ignore_index=True)

    pairs = partitioned_group_map(keys, ["band", "band_hash"], pairs_of_partition,
                                  num_partitions=num_partitions)
    return distinct(pairs, ["a", "b"])


def _pair_jaccard(df: pd.DataFrame, k: int, threshold: float) -> pd.DataFrame:
    """Shingle-Jaccard over rows carrying text_a/text_b (shingle sets cached
    per distinct doc within the batch)."""
    sims = []
    cache: dict[int, set] = {}

    def sh(i, text):
        if i not in cache:
            cache[i] = _shingles(text, k)
        return cache[i]

    for a, b, ta, tb in zip(df["a"], df["b"], df["text_a"], df["text_b"]):
        sa, sb = sh(int(a), ta), sh(int(b), tb)
        inter = len(sa & sb)
        union = len(sa | sb) or 1
        sims.append(inter / union)
    df = df.assign(jaccard=sims)
    return df.loc[df["jaccard"] >= threshold, ["a", "b", "jaccard"]]


def jaccard_verify(pairs_ds, docs_df: pd.DataFrame, *, k=5, threshold=0.8,
                   text_col="text", id_col="doc_id"):
    """Verify candidate pairs by shingle Jaccard ≥ threshold — BROADCAST
    variant: ships the whole id→text dict to every task. Only valid when
    the corpus fits comfortably in one worker heap (test fixtures, small
    relations); the engine path is :func:`jaccard_verify_joined`."""
    import ray

    ref = ray.put(docs_df.set_index(id_col)[text_col].to_dict())

    def verify(df: pd.DataFrame) -> pd.DataFrame:
        texts = ray.get(ref)
        df = df.assign(
            text_a=[texts[int(a)] for a in df["a"]],
            text_b=[texts[int(b)] for b in df["b"]],
        )
        return _pair_jaccard(df, k, threshold)

    return pairs_ds.map_batches(verify, batch_format="pandas")


def jaccard_verify_joined(pairs_ds, docs_ds, *, k=5, threshold=0.8,
                          text_col="text", id_col="doc_id",
                          num_partitions: int | None = None):
    """Scale path: two partitioned lookups ``pairs ⋈ docs`` on a then b
    ship each candidate's text into its pair's partition — the corpus is
    never collected or broadcast; data moved ∝ candidate pairs, not
    documents. Built on joins.partitioned_lookup_join rather than chained
    native ``Dataset.join`` calls: candidate pairs are FEW, so the first
    join's empty hash partitions would feed schema-less blocks into the
    second and crash intermittently (Ray 2.49)."""
    from raydf.joins import partitioned_lookup_join

    # materialize between steps: pairs are few (the premise of LSH), and
    # partitioned_lookup_join's schema fetch would otherwise EXECUTE the
    # lazy candidate pipeline once for the schema and again for the union
    # — measured 4x candidate generation across the two lookups
    j = partitioned_lookup_join(
        pairs_ds.materialize(), "a", docs_ds, id_col, text_col, "text_a",
        num_partitions=num_partitions,
    ).materialize()
    j = partitioned_lookup_join(
        j, "b", docs_ds, id_col, text_col, "text_b",
        num_partitions=num_partitions,
    )
    return j.map_batches(
        lambda df: _pair_jaccard(df, k, threshold), batch_format="pandas"
    )


def _mapping_as_ds(mapping_df):
    """Driver-branch (node, canon) frame → Dataset, so minhash_dedup's
    mapping return is ONE type on both branches."""
    import ray.data as rd

    return rd.from_arrow(
        pa.table(
            {
                "node": pa.array(mapping_df["node"].to_numpy(np.int64), pa.int64()),
                "canon": pa.array(mapping_df["canon"].to_numpy(np.int64), pa.int64()),
            }
        )
    )


def minhash_dedup(docs_ds, *, k=5, num_hashes=64, bands=16,
                  threshold=0.8, concurrency=4, num_partitions=None):
    """Full near-dedup: LSH candidates → joined Jaccard verify → connected
    components → survivors + cluster mapping.

    Returns ``(survivors_ds, mapping_ds)``: BOTH are Datasets, whatever
    branch ran — a type-polymorphic mapping (pandas below
    ``canonicalize.DRIVER_PAIR_LIMIT``, Dataset above) worked at test
    scale and broke the first time a corpus crossed the threshold
    (ADVICE r03). Internally the driver branch still computes the
    union-find mapping as a pandas frame (pairs fit by definition there);
    past the limit components come from min-label propagation
    (:func:`canonical_mapping_distributed_ds`) and survivors from a
    partitioned anti-join (:func:`raydf.relops.anti_join_keys`) — no
    ``to_pandas()`` / broadcast of anything pair- or corpus-sized."""
    from raydf import canonicalize
    from raydf.joins import BROADCAST_ROW_LIMIT, broadcast_semi_filter
    from raydf.relops import anti_join_keys

    pairs = minhash_candidate_pairs(
        docs_ds, k=k, num_hashes=num_hashes, bands=bands, concurrency=concurrency,
        num_partitions=num_partitions,
    )
    verified = jaccard_verify_joined(
        pairs, docs_ds, k=k, threshold=threshold, num_partitions=num_partitions
    )
    # materialize ONCE: the count() gate and the downstream consumer would
    # otherwise each re-execute the whole candidate+verify pipeline
    verified_pairs = verified.select_columns(["a", "b"]).materialize()
    n_pairs = verified_pairs.count()
    if n_pairs <= canonicalize.DRIVER_PAIR_LIMIT:
        mapping = canonicalize.canonical_mapping_driver(verified_pairs.to_pandas())
        if len(mapping) == 0:
            return docs_ds, _mapping_as_ds(mapping)
        dropped = mapping[["node"]].rename(columns={"node": "doc_id"})
        if len(dropped) <= BROADCAST_ROW_LIMIT:
            survivors = broadcast_semi_filter(docs_ds, dropped, on=["doc_id"], anti=True)
        else:
            import ray.data as rd

            survivors = anti_join_keys(
                docs_ds, rd.from_pandas(dropped), ["doc_id"],
                num_partitions=num_partitions,
            )
        return survivors, _mapping_as_ds(mapping)
    mapping_ds = canonicalize.canonical_mapping_distributed_ds(verified_pairs)
    # rename via an explicit arrow map, not Dataset.rename_columns: the lazy
    # schema fetch downstream (anti_join_keys' tagged union) observed the
    # PRE-rename name in schema() while blocks carried the renamed column
    # (Ray 2.49) — KeyError at run time
    dropped_ds = mapping_ds.map_batches(
        lambda t: pa.table({"doc_id": t["node"]}), batch_format="pyarrow"
    )
    survivors = anti_join_keys(
        docs_ds, dropped_ds, ["doc_id"], num_partitions=num_partitions
    )
    return survivors, mapping_ds


# ---------------------------------------------------------------- simhash


class SimHasher:
    """Actor-pool stage: 64-bit simhash over token hashes."""

    def __init__(self):
        import re

        self.tok = re.compile(r"\w+", re.ASCII)

    def simhash(self, text: str) -> int:
        toks = self.tok.findall(text.lower())
        if not toks:
            return 0
        hs = md5_u64(np.array(toks, dtype=object))
        bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)) & 1).astype(np.int32)
        v = np.where(bits.sum(axis=0) * 2 >= len(hs), 1, 0).astype(np.uint64)
        return int((v << np.arange(64, dtype=np.uint64)).sum())

    def __call__(self, batch: pa.Table) -> pa.Table:
        sh = np.array(
            [self.simhash(t) for t in batch[  # per-doc; token hashing vectorized inside
                "text"
            ].to_pylist()],
            dtype=np.uint64,
        )
        out = batch.select(["doc_id"]).append_column(
            "simhash", pa.array(sh.view(np.int64), pa.int64())
        )
        return out


def simhash_pairs(docs_ds, *, max_hamming: int = 3, concurrency: int = 4,
                  num_partitions=None):
    """Near-dup pairs by simhash: bucket on 4×16-bit sub-bands (pigeonhole:
    hamming ≤ 3 ⇒ one identical sub-band), verify Hamming in-bucket."""
    sigs = docs_ds.map_batches(
        SimHasher, batch_format="pyarrow", batch_size=1024, concurrency=concurrency
    )

    def explode(batch: pa.Table) -> pa.Table:
        h = batch["simhash"].to_numpy(zero_copy_only=False).view(np.uint64)
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        bands, keys, dids, sims = [], [], [], []
        for b in range(4):
            bands.append(np.full(len(h), b, dtype=np.int32))
            keys.append(((h >> np.uint64(16 * b)) & np.uint64(0xFFFF)).astype(np.int64))
            dids.append(ids)
            sims.append(h.view(np.int64))
        return pa.table(
            {
                "band": pa.array(np.concatenate(bands), pa.int32()),
                "key": pa.array(np.concatenate(keys), pa.int64()),
                "doc_id": pa.array(np.concatenate(dids), pa.int64()),
                "simhash": pa.array(np.concatenate(sims), pa.int64()),
            }
        )

    def pairs_of_partition(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df.duplicated(subset=["band", "key"], keep=False)]
        parts = []
        for _, g in df.groupby(["band", "key"], sort=False):
            g = g.drop_duplicates("doc_id").sort_values("doc_id")
            if len(g) < 2:
                continue
            ids = g["doc_id"].to_numpy()[:200]
            hs = g["simhash"].to_numpy().view(np.uint64)[:200]
            ai, bi = np.triu_indices(len(ids), k=1)
            x = hs[ai] ^ hs[bi]
            ham = np.array([bin(int(v)).count("1") for v in x])
            keep = ham <= max_hamming
            parts.append(
                pd.DataFrame({"a": ids[ai][keep], "b": ids[bi][keep], "hamming": ham[keep]})
            )
        if not parts:
            return pd.DataFrame(
                {c: pd.Series(dtype=np.int64) for c in ("a", "b", "hamming")}
            )
        return pd.concat(parts, ignore_index=True)

    pairs = partitioned_group_map(
        sigs.map_batches(explode, batch_format="pyarrow"),
        ["band", "key"],
        pairs_of_partition,
        num_partitions=num_partitions,
    )
    return distinct(pairs, ["a", "b"])


# --------------------------------------------------------- ngram jaccard


def ngram_jaccard_pairs(docs_df: pd.DataFrame, *, k=5, threshold=0.8) -> pd.DataFrame:
    """Exact pairwise n-gram Jaccard (driver-side; the verifier kernel —
    use minhash_dedup for anything beyond a few thousand docs)."""
    ids = docs_df["doc_id"].tolist()
    sh = [_shingles(t, k) for t in docs_df["text"]]
    rows = []
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            inter = len(sh[i] & sh[j])
            union = len(sh[i] | sh[j]) or 1
            jac = inter / union
            if jac >= threshold:
                rows.append((ids[i], ids[j], jac))
    return pd.DataFrame(rows, columns=["a", "b", "jaccard"])
