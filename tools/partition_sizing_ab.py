#!/usr/bin/env python
"""A/B evidence for joins.partitions_for_bytes (VERDICT r02 #7).

Synthesizes a 1M-document corpus with ~1.2 KB unique texts, then measures
the quantity that drives per-task peak memory in every text-carrying
exchange (minhash verify lookups, decontam gram shuffles): the MAX
per-partition text bytes — each partition is ONE in-memory pandas frame
per task in partitioned_group_map / partitioned_lookup_join.

Compares (a) a small-cluster CPU floor (8 = 2×CPU on a 4-CPU cluster —
the count a CPU-only rule would pick regardless of corpus size) against
(b) partitions_for_bytes(disk × 4, floor=8). The CPU-only count's frame
size grows linearly with the corpus; the byte-sized count caps it near
PARTITION_TARGET_BYTES.

Prints one JSON line; the result and the sizing rule live in BASELINE.md.
Usage: python tools/partition_sizing_ab.py [n_docs]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq


def synth_docs(path: str, n: int) -> None:
    """~1.2 KB unique text per doc (id-salted hex words — incompressible
    enough that on-disk bytes track in-memory bytes within ~2x)."""
    if os.path.exists(os.path.join(path, "_DONE")):
        return
    os.makedirs(path, exist_ok=True)
    chunk = 50_000
    rng = np.random.RandomState(7)
    salts = rng.randint(0, 1 << 62, size=160, dtype=np.int64)
    for c0 in range(0, n, chunk):
        ids = np.arange(c0, min(c0 + chunk, n), dtype=np.int64)
        # 160 7-hex-char words per doc, all id-dependent: ~1.2KB, unique
        words = (ids[:, None] * 1_000_003 + salts[None, :]) & 0xFFFFFFF
        texts = [" ".join(format(w, "07x") for w in row) for row in words]
        pq.write_table(
            pa.table({"doc_id": pa.array(ids), "text": pa.array(texts)}),
            os.path.join(path, f"part-{c0:09d}.parquet"),
        )
    open(os.path.join(path, "_DONE"), "w").write("ok")


def max_partition_text_bytes(docs, P: int) -> int:
    """Largest per-partition frame bytes of a text exchange hashed on
    doc_id % P — computed with the same hash partitioned_lookup_join and
    partitioned_group_map use."""

    def part_bytes(df: pd.DataFrame) -> pd.DataFrame:
        h = pd.util.hash_array(df["doc_id"].to_numpy())
        p = (h % np.uint64(P)).astype(np.int64)
        b = df["text"].str.len().to_numpy(np.int64)
        return pd.DataFrame({"p": p, "b": b}).groupby("p")["b"].sum().reset_index()

    agg = (
        docs.map_batches(part_bytes, batch_format="pandas")
        .groupby("p")
        .sum("b")
        .to_pandas()
    )
    col = [c for c in agg.columns if c.startswith("sum")][0]
    return int(agg[col].max())


def main() -> None:
    import ray
    import ray.data as rd

    from raydf.joins import partitions_for_bytes

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    path = f"/tmp/raydf_bench/docs1k_{n}"
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=32, include_dashboard=False,
                 log_to_driver=False)
    t0 = time.time()
    synth_docs(path, n)
    disk = sum(
        os.path.getsize(os.path.join(path, f))
        for f in os.listdir(path)
        if f.endswith(".parquet")
    )
    docs = rd.read_parquet(path)
    floor = 8  # 2 x CPU on a 4-CPU cluster: what a CPU-only rule picks
    out = {"n_docs": n, "disk_bytes": disk, "synth_secs": round(time.time() - t0, 1)}
    for label, P in (
        ("cpu_floor_only", floor),
        ("byte_sized", partitions_for_bytes(disk * 4, floor=floor)),
    ):
        out[label] = {
            "partitions": P,
            "max_partition_text_bytes": max_partition_text_bytes(docs, P),
        }
    print(json.dumps(out))
    ray.shutdown()


if __name__ == "__main__":
    main()
