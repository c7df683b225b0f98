"""N-gram language-model scoring for perplexity-style quality filtering
(the CCNet / Gopher corpus-filtering stage: train a cheap LM on the
corpus, score every document, drop the tails).

Integer contract: with ``SCALE = 1_000_000``, a document's score is

    lm_score = Σ over adjacent token pairs (w1, w2) of
               (SCALE · c(w1, w2)) // c(w1·)

where ``c(w1, w2)`` is the corpus bigram count and ``c(w1·)`` the count
of w1 as a bigram left-hand side — i.e. the floor-scaled conditional
probability ``P(w2 | w1)``, summed per token transition. ``lm_avg``
(= lm_score // n_pairs) is the per-transition average — the monotone
stand-in for negative log-perplexity that stays EXACT int64 and therefore
SQL-hash-checkable (no float log). Tokenization is the repo-wide
SQL-reproducible contract: ``[a-z0-9]+`` over lowercased text.

Scale shape (100 TB): NO broadcast model and NO driver state — the model
IS the data. Batch-local pair extraction pre-aggregates per
(doc, w1, w2); ONE w1-keyed exchange co-locates every occurrence of a
left token, so both the bigram count and its denominator are
partition-local group sums; per-doc partials then collapse through one
doc-keyed exchange. Two exchanges total, both over pre-aggregated rows,
every kernel vectorized. Skew note: a hyper-frequent w1 ("the") makes one
hot partition — raise num_partitions or pre-salt w1 like decontam does if
a partition exceeds worker heap; counts stay exact either way.

Reference parity: inferdf-rs has no text layer; this belongs to the
training-data operator families (quality scoring) layered on top.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd

SCALE = 1_000_000

_WORD = re.compile(r"[a-z0-9]+")


def _pair_rows(df: pd.DataFrame, text_col: str, id_col: str) -> pd.DataFrame:
    """Batch-local kernel → per-(doc, w1, w2) occurrence counts, PLUS one
    zero-count baseline row per document keyed by a doc-UNIQUE pseudo-w1
    (``\\x00<doc_id>`` — unmatchable by the [a-z0-9]+ tokenizer, and
    unique so baselines spread evenly across the w1 exchange instead of
    funneling a shared sentinel into one hot partition). Baselines keep
    token-poor docs (< 2 tokens) in the output without re-scanning the
    documents table for its ids."""
    toks = df[text_col].str.lower().str.findall(_WORD)
    counts = toks.map(len).to_numpy()
    doc_ids = df[id_col].to_numpy(np.int64)
    ids = np.repeat(doc_ids, counts)
    flat = toks.explode().dropna().to_numpy(dtype=object)
    if len(flat) >= 2:
        same = ids[:-1] == ids[1:]
        pairs = (
            pd.DataFrame(
                {"doc_id": ids[:-1][same], "w1": flat[:-1][same],
                 "w2": flat[1:][same]}
            )
            .groupby(["doc_id", "w1", "w2"], sort=False)
            .size()
            .reset_index(name="n_occ")
        )
    else:
        pairs = pd.DataFrame(
            {"doc_id": np.empty(0, np.int64),
             "w1": pd.Series([], dtype=object),
             "w2": pd.Series([], dtype=object),
             "n_occ": []}
        )
    base = pd.DataFrame(
        {"doc_id": doc_ids,
         "w1": np.char.add("\x00", doc_ids.astype(str)).astype(object),
         "w2": np.full(len(doc_ids), "", dtype=object),
         "n_occ": np.zeros(len(doc_ids), np.int64)}
    )
    out = pd.concat([pairs, base], ignore_index=True)
    out["n_occ"] = out["n_occ"].astype(np.int64)
    return out


def lm_score(docs, *, text_col: str = "text", id_col: str = "doc_id",
             scale: int = SCALE, num_partitions: int | None = None):
    """→ Dataset[{doc_id, n_pairs, lm_score, lm_avg}] — one row per input
    document (including empty/one-token docs, scored 0)."""
    from raydf.joins import partitioned_group_map

    pairs = docs.map_batches(
        lambda df: _pair_rows(df, text_col, id_col), batch_format="pandas"
    )

    def score_by_w1(part: pd.DataFrame) -> pd.DataFrame:
        """All rows of a given w1 are here: c(w1·) = Σ n_occ over the w1
        group, c(w1, w2) = Σ n_occ over the (w1, w2) group; every
        occurrence of that pair contributes (scale·c)//cleft. Baseline
        rows (n_occ = 0, doc-unique pseudo-w1) have cleft = 0 and score 0."""
        n_occ = part["n_occ"].to_numpy(np.int64)
        cleft = (
            part.groupby("w1", sort=False)["n_occ"].transform("sum")
            .to_numpy(np.int64)
        )
        c = (
            part.groupby(["w1", "w2"], sort=False)["n_occ"].transform("sum")
            .to_numpy(np.int64)
        )
        contrib = n_occ * ((scale * c) // np.maximum(cleft, 1))
        return pd.DataFrame(
            {"doc_id": part["doc_id"].to_numpy(np.int64),
             "n_pairs": n_occ, "part_score": contrib}
        )

    partials = partitioned_group_map(
        pairs, ["w1"], score_by_w1, num_partitions=num_partitions
    )

    # block-local pre-agg → one doc-keyed exchange → final per-doc sums
    def combine(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("doc_id", as_index=False)[["n_pairs", "part_score"]].sum()

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("doc_id", as_index=False)[["n_pairs", "part_score"]].sum()
        n = g["n_pairs"].to_numpy(np.int64)
        s = g["part_score"].to_numpy(np.int64)
        return pd.DataFrame(
            {"doc_id": g["doc_id"].to_numpy(np.int64),
             "n_pairs": n, "lm_score": s,
             "lm_avg": s // np.maximum(n, 1)}
        )

    pre = partials.map_batches(combine, batch_format="pandas")
    return partitioned_group_map(pre, ["doc_id"], finish,
                                 num_partitions=num_partitions)
