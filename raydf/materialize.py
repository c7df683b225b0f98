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


def _decode_joined(triples_ds, terms_ds, *, num_partitions: int = 16):
    """3× hash-join decode: triples ⋈ terms on subj, pred, obj in turn.
    Shuffles ∝ triples + dictionary; nothing driver-resident."""
    import pyarrow as pa

    from raydf.match import _join_partitions

    P = _join_partitions(num_partitions)

    def side(key: str, out: str):
        def f(t: pa.Table) -> pa.Table:
            return t.select(["term_id", "lexical"]).rename_columns([key, out])

        return f

    j = triples_ds.select_columns(["subj", "pred", "obj", "sign"])
    # native-join empty-side guard (Ray 2.49 aggregator crashes when a
    # side contributes zero blocks)
    if j.limit(1).count() == 0:
        import pyarrow as pa

        return rd.from_arrow(
            pa.table(
                {
                    "s_lex": pa.array([], pa.large_string()),
                    "p_lex": pa.array([], pa.large_string()),
                    "o_lex": pa.array([], pa.large_string()),
                    "sign": pa.array([], pa.bool_()),
                }
            )
        )
    for key, out in (("subj", "s_lex"), ("pred", "p_lex"), ("obj", "o_lex")):
        rhs = terms_ds.map_batches(side(key, out), batch_format="pyarrow")
        j = j.join(rhs, join_type="inner", num_partitions=P, on=(key,),
                   validate_schemas=False)
    return j.select_columns(["s_lex", "p_lex", "o_lex", "sign"])


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
