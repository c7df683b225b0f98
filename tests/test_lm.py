"""Bigram LM scoring (perplexity-filter stage): exact-integer contract vs
a brute-force in-process reference, including <2-token documents and the
repeated-pair path."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from raydf.datapipe.lm import SCALE, lm_score


def _brute(docs: pd.DataFrame) -> pd.DataFrame:
    import re

    tok = re.compile(r"[a-z0-9]+")
    toks = {r.doc_id: tok.findall(r.text.lower()) for r in docs.itertuples()}
    big, left = {}, {}
    for ts in toks.values():
        for a, b in zip(ts, ts[1:]):
            big[(a, b)] = big.get((a, b), 0) + 1
            left[a] = left.get(a, 0) + 1
    rows = []
    for did, ts in toks.items():
        s = sum((SCALE * big[(a, b)]) // left[a] for a, b in zip(ts, ts[1:]))
        n = max(len(ts) - 1, 0)
        rows.append((did, n, s, s // max(n, 1)))
    return (
        pd.DataFrame(rows, columns=["doc_id", "n_pairs", "lm_score", "lm_avg"])
        .sort_values("doc_id")
        .reset_index(drop=True)
    )


def test_lm_score_matches_bruteforce(ray_session):
    rng = np.random.default_rng(11)
    vocab = [f"w{i}" for i in range(30)]
    texts = [
        " ".join(rng.choice(vocab, rng.integers(2, 40))) for _ in range(120)
    ]
    texts += ["", "single", "UPPER lower UPPER lower", "a a a a a"]
    docs = pd.DataFrame({"doc_id": np.arange(len(texts), dtype=np.int64),
                         "text": texts})
    out = (
        lm_score(rd.from_pandas(docs), num_partitions=7)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(out, _brute(docs), check_dtype=False)
    # token-poor docs surface with zero scores, never dropped
    empties = out[out["doc_id"] >= 120].iloc[:2]
    assert (empties["n_pairs"] == 0).all() and (empties["lm_score"] == 0).all()
    # the all-repeat doc "a a a a a": P(a|a)=1 → every pair scores SCALE
    rep = out[out["doc_id"] == 123].iloc[0]
    assert rep["n_pairs"] == 4 and rep["lm_avg"] == SCALE


def test_lm_score_fluent_beats_shuffled(ray_session):
    """The filtering property: natural repeated phrasing scores above
    token-salad on a corpus dominated by the repeated phrasing."""
    fluent = "the cat sat on the mat"
    docs = pd.DataFrame(
        {"doc_id": np.arange(9, dtype=np.int64),
         "text": [fluent] * 8 + ["mat the on sat cat the"]}
    )
    out = lm_score(rd.from_pandas(docs)).to_pandas().set_index("doc_id")
    assert out.loc[8, "lm_avg"] < out.loc[0, "lm_avg"]
