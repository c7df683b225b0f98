"""Final graph materialization — the `.brdf`/paged-store stand-in
(reference Cargo.toml:10-12, .gitignore:3; no paged code ships in the
checkout). BASELINE.json north_star fixes the layout: a
**dictionary-encoded triple store sorted by (subj, pred)**:

* ``<out>/triples/`` — Parquet, globally sorted by (subj, pred) via
  ``Dataset.sort`` (range-partitioned shuffle), multiple part files so a
  re-run can verify/skip finished ranges; int64 ids only.
* ``<out>/terms/``   — the term dictionary (id → kind/lexical/datatype,
  plus canonical_id after Eq merges) — the "dictionary" of the encoding.

``decode_triples`` joins the two back into lexical form for tests,
oracles and exports.
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
) -> dict:
    triples_dir = os.path.join(out_dir, "triples")
    terms_dir = os.path.join(out_dir, "terms")
    triples_ds.sort(["subj", "pred"]).write_parquet(
        triples_dir, min_rows_per_file=min_rows_per_file, mode="overwrite"
    )
    terms_ds.write_parquet(terms_dir, min_rows_per_file=min_rows_per_file, mode="overwrite")
    return {"triples": triples_dir, "terms": terms_dir}


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
    return rd.read_parquet(os.path.join(out_dir, "triples"))


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
