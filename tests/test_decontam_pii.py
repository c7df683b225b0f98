"""Decontamination (benchmark n-gram overlap) and PII redaction."""

import hashlib
import re

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from raydf.datapipe.decontam import decontaminate, make_ngram_fn
from raydf.datapipe.text import pii_redact

DOCS = [
    (0, "the quick brown fox jumps over the lazy dog"),
    (1, "a quick brown fox leaps over a sleepy cat"),  # shares "quick brown fox"
    (2, "entirely different words appear in this one"),
    (3, "the quick brown fox strikes again and again"),
    (4, "short"),  # fewer tokens than n — no grams
    (5, ""),  # empty text
]


def _table():
    return pa.table(
        {
            "doc_id": pa.array([d for d, _ in DOCS], pa.int64()),
            "text": pa.array([t for _, t in DOCS], pa.string()),
        }
    )


def _ref_grams(text: str, n: int = 3) -> set:
    w = re.findall(r"[a-z0-9]+", text.lower())
    return {" ".join(w[i : i + n]) for i in range(len(w) - n + 1)}


def test_ngram_kernel_matches_reference_and_handles_edges():
    out = make_ngram_fn(3)(_table()).to_pandas()
    got = set(zip(out.doc_id, out.gram))
    want = {(d, g) for d, t in DOCS for g in _ref_grams(t)}
    assert got == want
    # short/empty docs contribute nothing, and no cross-document gram leaks
    assert not any(d in (4, 5) for d, _ in got)


def test_ngram_kernel_no_cross_doc_windows():
    # adjacent docs whose concatenation would create a bogus gram
    t = pa.table(
        {
            "doc_id": pa.array([10, 11], pa.int64()),
            "text": pa.array(["alpha beta", "gamma delta epsilon"], pa.string()),
        }
    )
    out = make_ngram_fn(3)(t).to_pandas()
    assert set(out.gram) == {"gamma delta epsilon"}


def test_decontaminate_counts_distinct_overlaps(ray_session):
    # doc 0 is the benchmark; doc 1 shares exactly "quick brown fox",
    # doc 3 shares "the quick brown" AND "quick brown fox"; doc 2 none
    docs = rd.from_arrow(_table())
    bench = docs.filter(lambda r: r["doc_id"] == 0)
    train = docs.filter(lambda r: r["doc_id"] != 0)
    got = (
        decontaminate(train, bench, n=3, num_partitions=4)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert got.doc_id.tolist() == [1, 3]
    assert got.n_overlap.tolist() == [1, 2]


def test_pii_redact_counts_and_redacts():
    t = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": pa.array(
                [
                    "mail bob@example.com or alice@sub.example.org today",
                    "call 555-123-4567 or 555-000-1111 now",
                    "no pii here",
                ],
                pa.string(),
            ),
        }
    )
    out = pii_redact(t).to_pandas()
    assert out.n_emails.tolist() == [2, 0, 0]
    assert out.n_phones.tolist() == [0, 2, 0]
    exp = [
        "mail [EMAIL] or [EMAIL] today",
        "call [PHONE] or [PHONE] now",
        "no pii here",
    ]
    assert out.clean_md5.tolist() == [
        hashlib.md5(e.encode()).hexdigest() for e in exp
    ]


def test_ngram_kernel_property_random_texts():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    texts = st.lists(
        st.text(
            alphabet=st.sampled_from(list("ab1 .!\t\n")), min_size=0, max_size=60
        ),
        min_size=1,
        max_size=8,
    )

    @settings(max_examples=60, deadline=None)
    @given(texts)
    def check(ts):
        for n in (1, 2, 3):
            t = pa.table(
                {
                    "doc_id": pa.array(range(len(ts)), pa.int64()),
                    "text": pa.array(ts, pa.string()),
                }
            )
            out = make_ngram_fn(n)(t).to_pandas()
            got = set(zip(out.doc_id, out.gram))
            want = {(d, g) for d, x in enumerate(ts) for g in _ref_grams(x, n)}
            assert got == want

    check()


def test_pii_redact_idempotent():
    # the replacement tokens contain no redactable substrings, so a second
    # pass is a no-op — the md5 witness survives re-scrubbing
    t = pa.table(
        {
            "doc_id": pa.array([1], pa.int64()),
            "text": pa.array(["x bob@ex.com y 555-123-4567 z"], pa.string()),
        }
    )
    once = pii_redact(t).to_pandas()
    redacted = "x [EMAIL] y [PHONE] z"
    assert once.clean_md5[0] == hashlib.md5(redacted.encode()).hexdigest()
    t2 = pa.table(
        {"doc_id": pa.array([1], pa.int64()), "text": pa.array([redacted], pa.string())}
    )
    twice = pii_redact(t2).to_pandas()
    assert twice.clean_md5[0] == once.clean_md5[0]
    assert twice.n_emails[0] == 0 and twice.n_phones[0] == 0


def test_pii_phone_word_boundaries():
    # digits glued to the pattern must NOT match (\b anchors)
    t = pa.table(
        {
            "doc_id": pa.array([1], pa.int64()),
            "text": pa.array(["9555-123-45678 and 555-123-4567."], pa.string()),
        }
    )
    out = pii_redact(t).to_pandas()
    assert out.n_phones.tolist() == [1]
