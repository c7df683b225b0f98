"""Final graph materialization — the `.brdf`/paged-store stand-in
(reference Cargo.toml:10-12, .gitignore:3; no paged code ships in the
checkout). BASELINE.json north_star fixes the layout: a
**dictionary-encoded triple store sorted by (subj, pred)**:

* ``<out>/triples/bucket=K/`` — Parquet, hash-bucketed by subj
  (``_mix_mod(subj, B)``) and **sorted by (subj, pred) within each
  bucket**. A subject's triples live entirely in one bucket directory in
  (subj, pred) order — the same point-lookup / merge-scan contract as a
  global sort, without the global range exchange: the all-to-all becomes
  ONE deterministic hash shuffle with no range-sampling pass, each bucket
  is independently resumable/verifiable, and readers prune to
  ``bucket=_mix_mod(subj, B)`` for point lookups (SURVEY §1.2 layout).
* ``<out>/terms/``   — the term dictionary (id → kind/lexical/datatype,
  plus canonical_id after Eq merges) — the "dictionary" of the encoding.

``decode_triples`` joins the two back into lexical form for tests,
oracles and exports (order-insensitive, so both layouts decode alike).
"""

from __future__ import annotations

import os

import pandas as pd
import ray.data as rd


def materialize_graph(
    triples_ds,
    terms_ds,
    out_dir: str,
    *,
    min_rows_per_file: int = 500_000,
    sort_buckets: int | None = None,
) -> dict:
    """Write the (subj,pred)-ordered bucketed store.

    ``sort_buckets`` defaults to ``joins.default_partitions()`` (2× cluster
    CPUs) — each bucket is sorted in one task, so B bounds both the reduce
    parallelism and the per-task memory (≈ triples/B rows)."""
    import pyarrow as pa

    from raydf.canonicalize import _mix_mod
    from raydf.joins import default_partitions

    B = sort_buckets if sort_buckets is not None else default_partitions()
    triples_dir = os.path.join(out_dir, "triples")
    terms_dir = os.path.join(out_dir, "terms")

    # the dictionary write is independent of the triples layout — run it
    # in a worker thread so its (distinct + optional joined-remap)
    # pipeline overlaps the triples staging/sort instead of serializing
    # after it (the "materialize finalize" driver gap of the r04 scaling
    # post-mortem); two driver threads = two streaming jobs interleaving
    # at the Ray scheduler
    import threading

    terms_exc: list[BaseException] = []

    def _write_terms() -> None:
        try:
            terms_ds.write_parquet(
                terms_dir, min_rows_per_file=min_rows_per_file, mode="overwrite"
            )
        except BaseException as e:
            terms_exc.append(e)

    terms_thread = threading.Thread(
        target=_write_terms, name="raydf-terms-write", daemon=True
    )
    terms_thread.start()

    def _join_terms() -> None:
        terms_thread.join()
        if terms_exc:
            raise terms_exc[0]

    if os.environ.get("RAYDF_GLOBAL_SORT", "0") != "0":
        # A/B control: the pre-r04 global range-partitioned sort
        triples_ds.sort(["subj", "pred"]).write_parquet(
            triples_dir, min_rows_per_file=min_rows_per_file, mode="overwrite"
        )
        _join_terms()
        return {"triples": triples_dir, "terms": terms_dir}

    def tag(t: pa.Table) -> pa.Table:
        subj = t["subj"].to_numpy(zero_copy_only=False)
        return t.append_column("bucket", pa.array(_mix_mod(subj, B), pa.int64()))

    if os.environ.get("RAYDF_SORT_EXCHANGE", "0") != "0":
        # A/B control: the groupby sort-exchange bucket path. The staged
        # write below replaced it for the same reason as
        # deduce._dedup_and_write: the all-to-all barrier is
        # CPU-count-invariant wall the staging write doesn't pay.
        def sort_bucket(t: pa.Table) -> pa.Table:
            return t.sort_by([("subj", "ascending"), ("pred", "ascending")])

        (
            triples_ds.map_batches(tag, batch_format="pyarrow")
            .groupby("bucket")
            .map_groups(sort_bucket, batch_format="pyarrow")
            .write_parquet(
                triples_dir,
                partition_cols=["bucket"],
                min_rows_per_file=min_rows_per_file,
                mode="overwrite",
            )
        )
    else:
        # staged bucket write: stream triples into a hive bucket-partitioned
        # staging dir (no shuffle), then one task per bucket reads, sorts by
        # (subj, pred) and writes its final bucket files — per-bucket memory
        # ≈ triples/B rows, so B is the sizing knob
        import glob
        import shutil

        import pyarrow.parquet as pq
        import ray

        staged = triples_dir + "_staging"
        shutil.rmtree(triples_dir, ignore_errors=True)
        shutil.rmtree(staged, ignore_errors=True)
        triples_ds.map_batches(tag, batch_format="pyarrow").write_parquet(
            staged, partition_cols=["bucket"]
        )

        @ray.remote(num_cpus=1)
        def _sort_bucket(j: int) -> int:
            files = glob.glob(os.path.join(staged, f"bucket={j}", "*.parquet"))
            if not files:
                return 0
            parts = []
            for f in files:
                tf = pq.ParquetFile(f).read()
                if "bucket" in tf.schema.names:  # hive strips it; be safe
                    tf = tf.drop_columns(["bucket"])
                parts.append(tf)
            import pyarrow as pa

            t = pa.concat_tables(parts).sort_by(
                [("subj", "ascending"), ("pred", "ascending")]
            )
            if len(t) == 0:
                return 0
            d = os.path.join(triples_dir, f"bucket={j}")
            os.makedirs(d, exist_ok=True)
            for i in range(0, len(t), min_rows_per_file):
                pq.write_table(
                    t.slice(i, min_rows_per_file),
                    os.path.join(d, f"part-{i // min_rows_per_file:05d}.parquet"),
                    # fine row groups keep point-lookup predicate pushdown
                    # and downstream scan parallelism at the exchange
                    # path's granularity
                    row_group_size=125_000,
                )
            return len(t)

        ray.get([_sort_bucket.remote(j) for j in range(B)])
        shutil.rmtree(staged, ignore_errors=True)
    # readers prune point lookups to bucket=_mix_mod(subj, B) — B must be
    # discoverable without listing (empty buckets write no directory).
    # An all-empty triples dataset writes NO bucket dirs at all, so the
    # marker must (re)create triples_dir itself (ADVICE r04).
    os.makedirs(triples_dir, exist_ok=True)
    with open(os.path.join(triples_dir, "_BUCKETS"), "w") as f:
        f.write(str(B))
    _join_terms()
    return {"triples": triples_dir, "terms": terms_dir}


def store_buckets(out_dir: str) -> int | None:
    """Bucket count of a materialized store (None = global-sort layout)."""
    p = os.path.join(out_dir, "triples", "_BUCKETS")
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return int(f.read().strip())


def lookup_subject(out_dir: str, subj: int):
    """Point lookup: prune to the subject's bucket directory, then a
    predicate-pushdown Parquet scan — touches 1/B of the store."""
    import numpy as np
    import pyarrow.dataset as pads

    from raydf.canonicalize import _mix_mod

    B = store_buckets(out_dir)
    if B is None:
        root = os.path.join(out_dir, "triples")
    else:
        k = int(_mix_mod(np.asarray([subj], dtype=np.int64), B)[0])
        root = os.path.join(out_dir, "triples", f"bucket={k}")
        if not os.path.exists(root):  # empty bucket — subject absent
            import pyarrow as pa

            return pa.table(
                {"subj": pa.array([], pa.int64()), "pred": pa.array([], pa.int64()),
                 "obj": pa.array([], pa.int64()), "sign": pa.array([], pa.bool_())}
            )
    ds = pads.dataset(root, format="parquet")
    cols = [c for c in ("subj", "pred", "obj", "sign") if c in ds.schema.names]
    return ds.to_table(columns=cols, filter=pads.field("subj") == subj)


def decode_triples(triples_ds, terms, *, num_partitions: int = 16):
    """Interned triples → lexical view.

    ``terms`` may be a driver pandas frame (small dictionaries → one
    ``ray.put`` broadcast + vectorized map per batch) or a
    ``ray.data.Dataset`` (engine-scale dictionaries → THREE hash joins on
    subj/pred/obj; the dictionary never leaves the cluster). A pandas
    frame larger than joins.BROADCAST_ROW_LIMIT is rejected — pass the
    Dataset instead."""
    from raydf.joins import BROADCAST_ROW_LIMIT

    if isinstance(terms, pd.DataFrame):
        assert len(terms) <= BROADCAST_ROW_LIMIT, (
            "term dictionary too large to broadcast — pass it as a "
            "ray.data.Dataset to take the 3x hash-join decode path"
        )
        return _decode_broadcast(triples_ds, terms)
    return _decode_joined(triples_ds, terms, num_partitions=num_partitions)


def _decode_broadcast(triples_ds, terms_df: pd.DataFrame):
    import ray

    small = terms_df.drop_duplicates("term_id")[["term_id", "lexical"]]
    ref = ray.put(small)

    def _dec(df: pd.DataFrame) -> pd.DataFrame:
        t = ray.get(ref).set_index("term_id")["lexical"]
        out = pd.DataFrame(
            {
                "s_lex": df["subj"].map(t),
                "p_lex": df["pred"].map(t),
                "o_lex": df["obj"].map(t),
                "sign": df["sign"],
            }
        )
        return out

    return triples_ds.map_batches(_dec, batch_format="pandas")


def _decode_joined(triples_ds, terms_ds, *, num_partitions: int | None = None):
    """3× partitioned-lookup decode: triples ⋈ terms on subj, pred, obj in
    turn, each as ONE union+groupby shuffle with an in-process sorted-
    searchsorted lookup per partition. Shuffles ∝ triples + dictionary;
    nothing driver-resident. Deliberately avoids Ray's native
    JoinOperator — its empty hash partitions emit schema-less blocks that
    crash chained joins ("No match … FieldRef", Ray 2.49; same fix as
    canonicalize.remap_triples_joined — regression:
    test_decode_join_path_matches_broadcast)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    from raydf.canonicalize import _mix_mod
    from raydf.joins import default_partitions

    P = num_partitions if num_partitions is not None else default_partitions()

    out = triples_ds.select_columns(["subj", "pred", "obj", "sign"])
    fields = [
        ("subj", pa.int64()), ("pred", pa.int64()),
        ("obj", pa.int64()), ("sign", pa.bool_()),
    ]
    for key, new in (("subj", "s_lex"), ("pred", "p_lex"), ("obj", "o_lex")):
        cur = tuple(fields)
        lcols = tuple(nm for nm, _ in cur)

        def tag_left(t: pa.Table, _k=key) -> pa.Table:
            ids = t[_k].to_numpy(zero_copy_only=False)
            t = t.append_column("__tid", pa.nulls(len(t), pa.int64()))
            t = t.append_column("__lex", pa.nulls(len(t), pa.large_string()))
            t = t.append_column("__side", pa.array(np.zeros(len(t), np.int8)))
            return t.append_column("__p", pa.array(_mix_mod(ids, P), pa.int64()))

        def tag_right(t: pa.Table, _cur=cur) -> pa.Table:
            n = len(t)
            tid = t["term_id"].to_numpy(zero_copy_only=False)
            data = {nm: pa.nulls(n, ty) for nm, ty in _cur}
            data["__tid"] = t["term_id"].cast(pa.int64())
            data["__lex"] = t["lexical"].cast(pa.large_string())
            data["__side"] = pa.array(np.ones(n, np.int8))
            data["__p"] = pa.array(_mix_mod(tid, P), pa.int64())
            return pa.table(data)

        u = out.map_batches(tag_left, batch_format="pyarrow").union(
            terms_ds.map_batches(tag_right, batch_format="pyarrow")
        )

        def merge(t: pa.Table, _k=key, _new=new, _lcols=lcols) -> pa.Table:
            right = pc.equal(t["__side"], 1)
            l = t.filter(pc.invert(right)).select(list(_lcols))
            r = t.filter(right)
            ids = l[_k].to_numpy(zero_copy_only=False)
            k = r["__tid"].to_numpy(zero_copy_only=False).astype(np.int64)
            lex = np.asarray(r["__lex"].to_pylist(), dtype=object)
            k, first = np.unique(k, return_index=True)
            lex = lex[first]
            if len(k) and len(ids):
                pos = np.clip(np.searchsorted(k, ids), 0, len(k) - 1)
                hit = k[pos] == ids
            else:
                pos = np.zeros(len(ids), np.int64)
                hit = np.zeros(len(ids), bool)
            l = l.filter(pa.array(hit))  # inner-join semantics
            vals = lex[pos[hit]] if len(k) else np.empty(0, object)
            return l.drop_columns([_k]).append_column(
                _new, pa.array(vals, pa.large_string())
            )

        out = u.groupby("__p").map_groups(merge, batch_format="pyarrow")
        fields = [(nm, ty) for nm, ty in fields if nm != key] + [
            (new, pa.large_string())
        ]
    return out.select_columns(["s_lex", "p_lex", "o_lex", "sign"])


def read_graph(out_dir: str):
    """Scan the triple store; the hive ``bucket`` partition column (string
    at read time) is dropped so both layouts present the same schema."""
    ds = rd.read_parquet(os.path.join(out_dir, "triples"))
    if "bucket" in ds.schema().names:
        ds = ds.drop_columns(["bucket"])
    return ds


def decode_graph(out_dir: str):
    """Decoded lexical view of a materialized graph directory. Routes by
    dictionary size from Parquet METADATA (no execution): small → broadcast
    decode, large → the 3× hash-join decode."""
    import glob

    import pyarrow.parquet as pq

    from raydf.joins import BROADCAST_ROW_LIMIT

    triples = read_graph(out_dir)
    term_files = sorted(glob.glob(os.path.join(out_dir, "terms", "*.parquet")))
    rows = sum(pq.ParquetFile(f).metadata.num_rows for f in term_files)
    if rows <= BROADCAST_ROW_LIMIT:
        terms = pq.read_table(
            term_files, columns=["term_id", "lexical"]
        ).to_pandas()
    else:
        terms = rd.read_parquet(term_files)
    return decode_triples(triples, terms)
