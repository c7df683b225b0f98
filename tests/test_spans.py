"""Exact-substring (span) dedup tests: duplicated-gram stats, coverage
masks, and scrubbing vs a hand-computed brute force (Lee et al. 2021
ExactSubstr semantics over word 4-grams)."""

import hashlib
import re

import numpy as np
import pyarrow as pa
import ray.data as rd

from raydf.datapipe import spans

WORD = re.compile(r"[a-z0-9]+")


def docs_table(texts):
    return pa.table(
        {
            "doc_id": pa.array(np.arange(len(texts), dtype=np.int64), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )


def brute(texts, n):
    """Reference: per-doc distinct grams / dup grams / covered positions."""
    words = [WORD.findall(t.lower()) for t in texts]
    grams = [
        [(" ".join(w[i : i + n]), i) for i in range(len(w) - n + 1)] for w in words
    ]
    owners = {}
    for d, gs in enumerate(grams):
        for g, _ in gs:
            owners.setdefault(g, set()).add(d)
    dup = {g for g, o in owners.items() if len(o) >= 2}
    stats, covered, scrubbed = {}, {}, {}
    for d, gs in enumerate(grams):
        distinct = {g for g, _ in gs}
        if distinct:
            stats[d] = (len(distinct), len(distinct & dup))
        cov = {i + k for g, i in gs if g in dup for k in range(n)}
        covered[d] = cov
        kept = [w for j, w in enumerate(words[d]) if j not in cov]
        scrubbed[d] = (len(words[d]), len(words[d]) - len(kept),
                       hashlib.md5(" ".join(kept).encode()).hexdigest())
    return stats, covered, scrubbed


TEXTS = [
    "alpha beta gamma delta epsilon zeta eta theta",       # shares 4-gram run with doc 2
    "one two three four five six seven eight nine",        # unique
    "intro words alpha beta gamma delta epsilon tail",     # dup span with doc 0
    "one two three four others entirely different here",   # dup span with doc 1
    "short doc",                                           # < n words: no spans
    "repeat repeat repeat repeat repeat repeat",           # self-repeat only (1 doc)
    "REPEAT repeat Repeat rePeat repeat repeat extra",     # lowercases into doc 5's gram
]


def test_dup_span_stats_matches_brute_force():
    stats, _, _ = brute(TEXTS, 4)
    out = (
        spans.dup_span_stats(rd.from_arrow(docs_table(TEXTS)), n=4, num_partitions=3)
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert set(out.index) == set(stats)  # doc 4 (too short) absent
    for d, (n_spans, n_dup) in stats.items():
        assert out.loc[d, "n_spans"] == n_spans
        assert out.loc[d, "n_dup_spans"] == n_dup
    # the planted cross-doc spans are actually found
    assert out.loc[0, "n_dup_spans"] >= 1
    assert out.loc[5, "n_dup_spans"] >= 1  # via doc 6's lowercased words


def test_dup_span_stats_salted_equivalent():
    """Planted hot gram (one boilerplate 4-gram in 80% of docs): the
    salted two-phase path must reproduce the single-exchange result
    exactly, including the brute-force ground truth."""
    boiler = "standard footer text here"
    texts = [
        (f"{boiler} body{i} words{i} tail{i} more{i}" if i % 5 else
         f"clean document {i} without footer stanza {i}")
        for i in range(30)
    ]
    ds = rd.from_arrow(docs_table(texts))
    base = (
        spans.dup_span_stats(ds, n=4, num_partitions=4)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    salted = (
        spans.dup_span_stats(ds, n=4, num_partitions=4, salt=3)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    import pandas as pd

    pd.testing.assert_frame_equal(salted[base.columns.tolist()], base)
    stats, _, _ = brute(texts, 4)
    for d, (n_spans, n_dup) in stats.items():
        row = salted[salted["doc_id"] == d].iloc[0]
        assert row["n_spans"] == n_spans and row["n_dup_spans"] == n_dup


def test_dup_span_covered_positions():
    _, covered, _ = brute(TEXTS, 4)
    out = spans.dup_span_covered(
        rd.from_arrow(docs_table(TEXTS)), n=4, num_partitions=3
    ).to_pandas()
    got = {}
    for d, p in zip(out["doc_id"], out["pos"]):
        got.setdefault(d, set()).add(p)
    assert got == {d: c for d, c in covered.items() if c}
    assert len(out) == len(out.drop_duplicates())  # distinct (doc, pos)


def test_scrub_dup_spans_matches_brute_force():
    _, _, scrubbed = brute(TEXTS, 4)
    out = (
        spans.scrub_dup_spans(rd.from_arrow(docs_table(TEXTS)), n=4, num_partitions=3)
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert len(out) == len(TEXTS)  # every doc present, touched or not
    for d, (n_words, n_removed, md5) in scrubbed.items():
        assert out.loc[d, "n_words"] == n_words
        assert out.loc[d, "n_removed"] == n_removed
        assert out.loc[d, "clean_md5"] == md5
    assert out.loc[4, "n_removed"] == 0  # too-short doc untouched
    # doc 1 loses its "one two three four" span to doc 3 but keeps the tail
    assert 0 < out.loc[1, "n_removed"] < out.loc[1, "n_words"]


def test_scrub_no_duplicates_is_identity_md5():
    texts = ["completely unique words here now", "another disjoint set of tokens"]
    out = (
        spans.scrub_dup_spans(rd.from_arrow(docs_table(texts)), n=4, num_partitions=2)
        .to_pandas()
        .sort_values("doc_id")
    )
    assert (out["n_removed"] == 0).all()
    exp = [hashlib.md5(" ".join(WORD.findall(t.lower())).encode()).hexdigest()
           for t in texts]
    assert list(out["clean_md5"]) == exp
