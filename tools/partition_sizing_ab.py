#!/usr/bin/env python
"""A/B evidence for joins.partitions_for_bytes (VERDICT r02 #7).

Synthesizes a deterministic 1M-document corpus (~300 B texts), then
measures the minhash text-carrying exchanges under (a) the CPU-scaled
partition default and (b) the byte-sized count, reporting:

  * partitions used,
  * the MAX per-partition frame bytes of the band-key exchange (the
    quantity that blows a worker heap when partition count doesn't grow
    with the corpus),
  * wall time of candidate generation end-to-end.

Prints one JSON line; record the result in BASELINE.md next to the
sizing rule. Usage: python tools/partition_sizing_ab.py [n_docs]
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq


def synth_docs(path: str, n: int) -> None:
    if os.path.exists(os.path.join(path, "_DONE")):
        return
    os.makedirs(path, exist_ok=True)
    words = [f"w{i:04d}" for i in range(4096)]
    chunk = 100_000
    for c0 in range(0, n, chunk):
        ids = np.arange(c0, min(c0 + chunk, n), dtype=np.int64)
        # ~40 words/doc, deterministic per id; ~10% near-dup pairs
        rng_idx = (ids[:, None] * 131 + np.arange(40)[None, :] * 17) % 4096
        texts = [" ".join(words[j] for j in row) for row in rng_idx]
        pq.write_table(
            pa.table({"doc_id": pa.array(ids), "text": pa.array(texts)}),
            os.path.join(path, f"part-{c0:09d}.parquet"),
        )
    open(os.path.join(path, "_DONE"), "w").write("ok")


def max_partition_bytes(keys_ds, P: int) -> int:
    """Largest per-partition frame bytes of the (band, band_hash) exchange
    — computed directly from the hash the exchange itself uses."""

    def part_bytes(df: pd.DataFrame) -> pd.DataFrame:
        h = pd.util.hash_pandas_object(df[["band", "band_hash"]], index=False).to_numpy()
        p = (h % np.uint64(P)).astype(np.int64)
        rowbytes = np.full(len(df), 20, np.int64)  # band(4)+hash(8)+doc_id(8)
        out = pd.DataFrame({"p": p, "b": rowbytes}).groupby("p")["b"].sum()
        return out.reset_index()

    agg = (
        keys_ds.map_batches(part_bytes, batch_format="pandas")
        .groupby("p")
        .sum("b")
        .to_pandas()
    )
    col = [c for c in agg.columns if c.startswith("sum")][0]
    return int(agg[col].max())


def main() -> None:
    import ray
    import ray.data as rd

    from raydf.datapipe.dedup import MinHasher, minhash_candidate_pairs
    from raydf.joins import default_partitions, partitions_for_bytes

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    path = f"/tmp/raydf_bench/docs_{n}"
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=32, include_dashboard=False,
                 log_to_driver=False)
    synth_docs(path, n)
    disk = sum(
        os.path.getsize(os.path.join(path, f))
        for f in os.listdir(path)
        if f.endswith(".parquet")
    )
    docs = rd.read_parquet(path)
    keys = docs.map_batches(
        MinHasher, fn_constructor_kwargs={}, batch_format="pyarrow",
        batch_size=1024, concurrency=8,
    ).materialize()

    out: dict = {"n_docs": n, "disk_bytes": disk}
    for label, P in (
        ("cpu_default", default_partitions()),
        ("byte_sized", partitions_for_bytes(disk * 4)),
    ):
        t0 = time.time()
        pairs = minhash_candidate_pairs(docs, num_partitions=P, concurrency=8)
        n_pairs = pairs.count()
        out[label] = {
            "partitions": P,
            "max_partition_bytes": max_partition_bytes(keys, P),
            "candidate_pairs": n_pairs,
            "candidate_secs": round(time.time() - t0, 1),
        }
    print(json.dumps(out))
    ray.shutdown()


if __name__ == "__main__":
    main()
