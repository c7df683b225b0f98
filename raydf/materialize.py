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


def decode_triples(triples_ds, terms_df: pd.DataFrame):
    """Interned triples → lexical view via broadcast dictionary lookup.

    At dictionary sizes past joins.BROADCAST_ROW_LIMIT switch to three
    hash joins on subj/pred/obj against the terms Dataset."""
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


def read_graph(out_dir: str):
    return rd.read_parquet(os.path.join(out_dir, "triples"))
