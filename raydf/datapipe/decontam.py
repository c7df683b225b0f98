"""Benchmark decontamination: flag training documents that share word
n-grams with an evaluation/benchmark set — the standard leakage check a
training-data pipeline runs before a corpus ships (n-gram overlap against
eval sets, as popularized by GPT-3/PaLM-style dedup+decontam appendices).

The reference engine has no such operator (it is an RDF deduction
library); this module is part of the LLM-data operator family layered on
the same Ray Data substrate (SURVEY.md §2.7 O41 note).

Shape (scale-first):

1. ``ngram_rows`` — stateless ``map_batches`` kernel: one input document
   row → one row per DISTINCT word n-gram in it. Fully vectorized: words
   come from one ``Series.str.findall`` call, windows from shifted flat
   numpy slices (no per-row Python loop over grams); per-doc dedup is a
   single pandas ``duplicated`` over the exploded (row, gram) frame. A
   document appears in exactly one batch row, so per-batch dedup ⇒ global
   per-(doc, gram) distinctness — no extra shuffle needed for it.
2. ONE tagged-union hash shuffle on the gram string co-locates train and
   benchmark grams (``relops._two_sided_partition_map`` — the same
   exchange primitive as the as-of/range joins); each partition computes
   the semi-join hit rows and immediately collapses them to per-doc
   partial counts, so at most ``docs × partitions`` tiny rows leave the
   big shuffle.
3. A final small ``partitioned_group_map`` sums the partials per doc.

Joining on the gram STRING (not a hash) keeps the result exact — no
collision caveat — and n-grams are short, so the shuffled key is barely
wider than an 8-byte hash. The benchmark side is routed through the same
shuffle rather than a driver broadcast: eval sets are usually small, but
nothing here requires it, and there is deliberately no ``to_pandas`` of
either corpus anywhere in the path.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from raydf.joins import partitioned_group_map
from raydf.relops import _two_sided_partition_map

_WORD_RE = r"[a-z0-9]+"


def make_ngram_fn(n: int, *, text_col: str = "text", id_col: str = "doc_id"):
    """Batch kernel: documents table → (doc_id, gram) rows, one per
    DISTINCT n-gram per document.

    Delegates the windowing to the ONE shared positional n-gram kernel
    (:func:`raydf.datapipe.spans.make_ngram_pos_fn` — same tokenization
    contract, position column dropped, per-doc distinct applied here) so
    a tokenization/boundary fix lands in every gram consumer at once."""
    assert n >= 1
    from raydf.datapipe.spans import make_ngram_pos_fn

    pos_fn = make_ngram_pos_fn(n, text_col=text_col, id_col=id_col)

    def f(batch: pa.Table) -> pa.Table:
        t = pos_fn(batch)
        out = t.select([id_col, "gram"]).to_pandas()
        out = out[~out.duplicated()]
        return pa.table(
            {
                id_col: pa.array(out[id_col].to_numpy(np.int64), pa.int64()),
                "gram": pa.array(out["gram"].tolist(), pa.string()),
            }
        )

    return f


def ngram_rows(docs, n: int = 3, *, text_col: str = "text", id_col: str = "doc_id"):
    """Dataset of (doc_id, gram): one row per distinct word n-gram per doc."""
    return docs.map_batches(
        make_ngram_fn(n, text_col=text_col, id_col=id_col), batch_format="pyarrow"
    )


def decontaminate(train_docs, bench_docs, *, n: int = 3,
                  num_partitions: int | None = None, salt: int | None = None):
    """Per-train-document count of distinct word n-grams shared with the
    benchmark corpus: Dataset of ``(doc_id, n_overlap)`` with
    ``n_overlap ≥ 1`` (clean documents are absent — consumers anti-join or
    left-join-fill-0 as needed, both without re-scanning text).

    ``train_docs`` / ``bench_docs``: any Datasets with (doc_id, text).

    ``salt=S``: exact hot-gram path — a gram carried by a large fraction
    of the corpus (boilerplate, a viral snippet) serializes its partition;
    salting spreads the train rows by ``splitmix64(doc_id) % S`` and
    replicates the (small) benchmark gram set to every shard. The kernel
    counts LEFT rows against a right membership set, so mixed salt shards
    in one partition are harmless — no per-shard grouping needed."""
    tg = ngram_rows(train_docs, n)
    bg = ngram_rows(bench_docs, n).select_columns(["gram"])

    def hit_partials(l: pd.DataFrame, r: pd.DataFrame) -> pd.DataFrame:
        # l: train (doc_id, gram) — globally distinct; r: benchmark grams
        if len(l) == 0 or len(r) == 0:
            return pd.DataFrame({"doc_id": pd.Series([], dtype=np.int64),
                                 "n_partial": pd.Series([], dtype=np.int64)})
        hits = l[l["gram"].isin(set(r["gram"]))]
        vc = hits["doc_id"].value_counts()
        return pd.DataFrame(
            {"doc_id": vc.index.to_numpy(np.int64), "n_partial": vc.to_numpy(np.int64)}
        )

    partials = _two_sided_partition_map(
        tg, bg, ["gram"], hit_partials,
        num_partitions=num_partitions,
        out_schema_fn=lambda ls, rs: pa.schema(
            [pa.field("doc_id", pa.int64()), pa.field("n_partial", pa.int64())]
        ),
        salt=salt, salt_col="doc_id" if salt and salt > 1 else None,
    )

    def total(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("doc_id", sort=False)["n_partial"].sum()
        return pd.DataFrame(
            {"doc_id": g.index.to_numpy(np.int64), "n_overlap": g.to_numpy(np.int64)}
        )

    # partials are tiny (≤ contaminated-docs × partitions rows); a small
    # second shuffle finishes the aggregation
    return partitioned_group_map(partials, ["doc_id"], total, num_partitions=8)
