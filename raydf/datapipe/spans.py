"""Exact-substring (span) deduplication across a corpus: find word
n-gram spans that occur in more than one document, score documents by how
much of their text is cross-document duplicated, and scrub those spans
out — the ExactSubstr family from "Deduplicating Training Data Makes
Language Models Better" (Lee et al., 2021), re-expressed over hash
partitions instead of a suffix array.

The reference engine has no such operator (it is an RDF deduction
library); this module extends the LLM-data operator family layered on the
same Ray Data substrate (SURVEY.md §2.7 O41 note), sharing the gram
tokenization contract with :mod:`raydf.datapipe.decontam` (ASCII
``[a-z0-9]+`` words, so the DuckDB RE2 oracle reproduces it bit-for-bit).

Shape (scale-first — no all-pairs, no suffix array, no driver collect):

1. ``ngram_pos_rows`` — stateless ``map_batches`` kernel: one document
   row → one row per n-gram WITH its word position (``(doc_id, pos,
   gram)``). Same shifted-flat-numpy windowing as decontam's kernel;
   positions are what let the scrub map grams back onto words.
2. ONE hash shuffle on the gram string co-locates every occurrence of a
   gram (``joins.partitioned_group_map``); each partition counts
   distinct docs per gram in-process, so "duplicated" (≥2 docs) is exact.
   * stats: the partition collapses straight to per-doc partials
     (total / duplicated distinct-gram counts) — at most
     ``docs × partitions`` tiny rows leave the big shuffle;
   * scrub: the partition emits only the occurrence rows of duplicated
     grams (``(doc_id, pos)``), bounded by the duplicated text itself.
3. stats: a small second shuffle sums partials per doc. scrub: covered
   word positions go through ONE more hash shuffle on ``doc_id``
   two-sided with the documents table (``relops._two_sided_partition_map``
   — the as-of/range-join exchange), where each partition re-tokenizes
   its docs, drops covered words and emits the scrubbed text's md5.

Joining on the gram STRING (not a hash) keeps the result exact — no
collision caveat. Grams are short (n words), so the shuffled key is a
few tens of bytes; size ``num_partitions`` from input bytes
(``joins.partitions_for_bytes`` with the gram expansion factor) so
per-partition frames stay flat.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

from raydf.joins import partitioned_group_map
from raydf.relops import _two_sided_partition_map

_WORD_RE = r"[a-z0-9]+"  # ASCII on both sides (Python re ⊇ DuckDB RE2)


def make_ngram_pos_fn(n: int, *, text_col: str = "text", id_col: str = "doc_id"):
    """Batch kernel: documents table → (doc_id, pos, gram) rows, one per
    n-gram OCCURRENCE (pos = 0-based word index of the span start)."""
    assert n >= 1

    def f(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        texts = pd.Series(batch[text_col].to_pylist()).fillna("")
        words = texts.str.lower().str.findall(_WORD_RE)
        counts = words.map(len).to_numpy()
        flat = words.explode(ignore_index=True).dropna()
        toks = flat.to_numpy(dtype=object)
        doc_of = np.repeat(np.arange(len(ids)), counts)
        # 0-based word position within each document
        starts = np.zeros(len(counts), np.int64)
        np.cumsum(counts[:-1], out=starts[1:])
        pos_of = np.arange(len(toks), dtype=np.int64) - starts[doc_of]
        m = len(toks) - n + 1
        empty = pa.table(
            {
                id_col: pa.array([], pa.int64()),
                "pos": pa.array([], pa.int64()),
                "gram": pa.array([], pa.string()),
            }
        )
        if m <= 0:
            return empty
        same = doc_of[:m] == doc_of[n - 1:]
        gram = pd.Series(toks[:m])
        for i in range(1, n):
            gram = gram + " " + pd.Series(toks[i : m + i])
        out = pd.DataFrame(
            {id_col: ids[doc_of[:m]], "pos": pos_of[:m], "gram": gram}
        )[same]
        if len(out) == 0:
            return empty
        return pa.table(
            {
                id_col: pa.array(out[id_col].to_numpy(np.int64), pa.int64()),
                "pos": pa.array(out["pos"].to_numpy(np.int64), pa.int64()),
                "gram": pa.array(out["gram"].tolist(), pa.string()),
            }
        )

    return f


def ngram_pos_rows(docs, n: int = 4, *, text_col: str = "text", id_col: str = "doc_id"):
    """Dataset of (doc_id, pos, gram): one row per n-gram occurrence."""
    return docs.map_batches(
        make_ngram_pos_fn(n, text_col=text_col, id_col=id_col),
        batch_format="pyarrow",
    )


def dup_span_stats(docs, *, n: int = 4, num_partitions: int | None = None,
                   text_col: str = "text", id_col: str = "doc_id",
                   salt: int | None = None):
    """Per-document cross-corpus duplication score: Dataset of
    ``(doc_id, n_spans, n_dup_spans)`` where ``n_spans`` counts the doc's
    DISTINCT word n-grams and ``n_dup_spans`` those of them that also
    occur in at least one OTHER document. Documents shorter than ``n``
    words have no spans and are absent (consumers left-join-fill-0).

    A training pipeline thresholds ``n_dup_spans / n_spans`` to drop or
    route heavily-duplicated documents before the (more expensive) scrub.

    ``salt=S``: exact hot-gram path (equivalence-tested). The default ONE
    gram exchange serializes a gram carried by most of the corpus into a
    single task; the salted variant trades one exchange for three
    skew-free ones — see :func:`_dup_span_stats_salted`."""
    if salt and salt > 1:
        return _dup_span_stats_salted(
            docs, n=n, salt=salt, num_partitions=num_partitions,
            text_col=text_col, id_col=id_col,
        )
    grams = ngram_pos_rows(docs, n, text_col=text_col, id_col=id_col)

    def partials(df: pd.DataFrame) -> pd.DataFrame:
        out = {id_col: pd.Series([], dtype=np.int64),
               "n_spans_p": pd.Series([], dtype=np.int64),
               "n_dup_p": pd.Series([], dtype=np.int64)}
        if len(df) == 0:
            return pd.DataFrame(out)
        dg = df[[id_col, "gram"]].drop_duplicates()
        per_gram = dg.groupby("gram", sort=False)[id_col].transform("size")
        dup = dg[per_gram.to_numpy() >= 2]
        t = dg.groupby(id_col, sort=False).size()
        d = dup.groupby(id_col, sort=False).size().reindex(t.index, fill_value=0)
        return pd.DataFrame(
            {
                id_col: t.index.to_numpy(np.int64),
                "n_spans_p": t.to_numpy(np.int64),
                "n_dup_p": d.to_numpy(np.int64),
            }
        )

    p = partitioned_group_map(grams, ["gram"], partials, num_partitions=num_partitions)

    def total(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(id_col, sort=False)[["n_spans_p", "n_dup_p"]].sum()
        return pd.DataFrame(
            {
                id_col: g.index.to_numpy(np.int64),
                "n_spans": g["n_spans_p"].to_numpy(np.int64),
                "n_dup_spans": g["n_dup_p"].to_numpy(np.int64),
            }
        )

    # partials are tiny (≤ docs × partitions rows); small second shuffle
    return partitioned_group_map(p, [id_col], total, num_partitions=8)


def _dup_span_stats_salted(docs, *, n: int, salt: int,
                           num_partitions: int | None,
                           text_col: str, id_col: str):
    """Skew-free exact variant of :func:`dup_span_stats`.

    A power-law gram (site boilerplate, a viral snippet) makes the
    default single gram exchange land most of the corpus in one task.
    This path splits every stage of the computation by
    ``__salt = splitmix64(doc_id) % S``, which is EXACT because each
    distinct (doc, gram) pair has one home shard:

    1. (gram, salt)-keyed exchange → in-shard ``drop_duplicates`` gives
       the globally-distinct (doc, gram) set; the hot gram spreads over S
       tasks. Materialized once — three consumers below.
    2. ``n_spans``: per-batch per-doc partial counts → small doc-keyed sum.
    3. dup-gram set: per-batch per-gram partial counts → native groupby
       sum (pre-aggregated: the hot gram is ≤1 row per block) → grams
       with ≥2 docs.
    4. ``n_dup_spans``: salted membership exchange (the decontam kernel
       shape — dup grams replicate ×S, doc rows split by salt), per-doc
       partials → the same doc-keyed sum as 2 (one union’d exchange).
    """
    import pyarrow.compute as pc

    from raydf.canonicalize import _mix_mod

    S = salt
    grams = ngram_pos_rows(docs, n, text_col=text_col, id_col=id_col)

    def tag(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                id_col: t[id_col],
                "gram": t["gram"],
                "__salt": pa.array(_mix_mod(ids, S), pa.int64()),
            }
        )

    def shard_distinct(df: pd.DataFrame) -> pd.DataFrame:
        return df[[id_col, "gram"]].drop_duplicates()

    dg = partitioned_group_map(
        grams.map_batches(tag, batch_format="pyarrow"),
        ["gram", "__salt"], shard_distinct, num_partitions=num_partitions,
    ).materialize()  # genuinely reused 3× below (spans, gram counts, dup)

    def span_partial(t: pa.Table) -> pa.Table:
        g = t.select([id_col]).to_pandas().groupby(id_col, sort=False).size()
        return pa.table(
            {
                id_col: pa.array(g.index.to_numpy(np.int64), pa.int64()),
                "n_spans_p": pa.array(g.to_numpy(np.int64), pa.int64()),
                "n_dup_p": pa.array(np.zeros(len(g), np.int64), pa.int64()),
            }
        )

    spans_p = dg.map_batches(span_partial, batch_format="pyarrow")

    def gram_partial(t: pa.Table) -> pa.Table:
        g = t.select(["gram"]).to_pandas().groupby("gram", sort=False).size()
        return pa.table(
            {
                "gram": pa.array(g.index.tolist(), pa.string()),
                "n": pa.array(g.to_numpy(np.int64), pa.int64()),
            }
        )

    # Sort-based fold (groupby().sum is Ray's hash-shuffle Aggregate —
    # pathologically slow at low CPU counts; see canonicalize note)
    def ksum(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("gram", sort=False)["n"].sum()
        return pd.DataFrame({"gram": g.index.astype(str),
                             "n": g.to_numpy(np.int64)})

    dup_grams = partitioned_group_map(
        dg.map_batches(gram_partial, batch_format="pyarrow"),
        ["gram"], ksum, num_partitions=num_partitions,
    ).map_batches(
        lambda t: t.filter(pc.greater_equal(t["n"], 2)).select(["gram"]),
        batch_format="pyarrow",
    )

    def hit_partials(l: pd.DataFrame, r: pd.DataFrame) -> pd.DataFrame:
        if len(l) == 0 or len(r) == 0:
            return pd.DataFrame(
                {
                    id_col: pd.Series([], dtype=np.int64),
                    "n_spans_p": pd.Series([], dtype=np.int64),
                    "n_dup_p": pd.Series([], dtype=np.int64),
                }
            )
        hits = l[l["gram"].isin(set(r["gram"]))]
        vc = hits[id_col].value_counts()
        return pd.DataFrame(
            {
                id_col: vc.index.to_numpy(np.int64),
                "n_spans_p": np.zeros(len(vc), np.int64),
                "n_dup_p": vc.to_numpy(np.int64),
            }
        )

    dup_p = _two_sided_partition_map(
        dg, dup_grams, ["gram"], hit_partials,
        num_partitions=num_partitions,
        out_schema_fn=lambda ls, rs: pa.schema(
            [
                pa.field(id_col, pa.int64()),
                pa.field("n_spans_p", pa.int64()),
                pa.field("n_dup_p", pa.int64()),
            ]
        ),
        salt=S, salt_col=id_col,
    )

    def total(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(id_col, sort=False)[["n_spans_p", "n_dup_p"]].sum()
        return pd.DataFrame(
            {
                id_col: g.index.to_numpy(np.int64),
                "n_spans": g["n_spans_p"].to_numpy(np.int64),
                "n_dup_spans": g["n_dup_p"].to_numpy(np.int64),
            }
        )

    return partitioned_group_map(
        spans_p.union(dup_p), [id_col], total, num_partitions=8
    )


def dup_span_covered(docs, *, n: int = 4, num_partitions: int | None = None,
                     distinct: bool = True, text_col: str = "text",
                     id_col: str = "doc_id"):
    """Dataset of ``(doc_id, pos)`` — every word position covered by at
    least one cross-document duplicated n-gram span. Intermediate of
    :func:`scrub_dup_spans`, exposed for pipelines that only need the
    mask (e.g. loss-masking instead of removal).

    Positions are deduped per gram partition; the same (doc, pos) can
    still arrive from different overlapping grams in other partitions, so
    ``distinct=True`` (default) adds one bucketed distinct. Consumers that
    re-partition by doc anyway (the scrub) pass ``distinct=False`` and
    dedup in their own partition — one shuffle instead of two."""
    grams = ngram_pos_rows(docs, n, text_col=text_col, id_col=id_col)

    def dup_occurrences(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({id_col: pd.Series([], dtype=np.int64),
                                 "pos": pd.Series([], dtype=np.int64)})
        nd = df.groupby("gram", sort=False)[id_col].transform("nunique")
        hit = df[nd.to_numpy() >= 2]
        # expand each span start to its n covered word positions, then
        # dedup — overlapping spans of one doc collapse here, inside the
        # partition, before anything is shuffled again
        ids = np.repeat(hit[id_col].to_numpy(np.int64), n)
        pos = np.repeat(hit["pos"].to_numpy(np.int64), n) + np.tile(
            np.arange(n, dtype=np.int64), len(hit)
        )
        out = pd.DataFrame({id_col: ids, "pos": pos}).drop_duplicates()
        return out.reset_index(drop=True)

    out = partitioned_group_map(
        grams, ["gram"], dup_occurrences, num_partitions=num_partitions
    )
    if distinct:
        from raydf import joins

        # covered rows are corpus-sized on heavily-duplicated corpora —
        # size the distinct like the gram shuffle, not a fixed count
        out = joins.distinct(out, [id_col, "pos"], num_partitions=num_partitions
                             if num_partitions is not None else 32)
    return out


def scrub_dup_spans(docs, *, n: int = 4, num_partitions: int | None = None,
                    text_col: str = "text", id_col: str = "doc_id"):
    """Remove every cross-document duplicated n-gram span from each
    document: Dataset of ``(doc_id, n_words, n_removed, clean_md5)`` where
    ``clean_md5`` is the md5 of the document's remaining words joined by
    single spaces (tokenization = lowercased ASCII ``[a-z0-9]+``, the
    decontam contract). Every input document appears exactly once —
    untouched docs have ``n_removed = 0`` and the md5 of their normalized
    text.

    Scale shape: gram shuffle → covered positions (bounded by duplicated
    text) → ONE two-sided doc_id shuffle with the documents table; the
    full text crosses the exchange once and is rebuilt in-partition."""
    covered = dup_span_covered(docs, n=n, num_partitions=num_partitions,
                               distinct=False,  # rebuild dedups per doc partition
                               text_col=text_col, id_col=id_col)
    doc_text = docs.select_columns([id_col, text_col])

    def rebuild(l: pd.DataFrame, r: pd.DataFrame) -> pd.DataFrame:
        # l: covered (id, pos); r: documents (id, text)
        if len(r) == 0:
            return pd.DataFrame({
                id_col: pd.Series([], dtype=np.int64),
                "n_words": pd.Series([], dtype=np.int64),
                "n_removed": pd.Series([], dtype=np.int64),
                "clean_md5": pd.Series([], dtype=object),
            })
        words = (
            pd.Series(r[text_col].to_numpy())
            .fillna("")
            .str.lower()
            .str.findall(_WORD_RE)
        )
        ids = r[id_col].to_numpy(np.int64)
        counts = words.map(len).to_numpy()
        toks = words.explode(ignore_index=True).dropna().to_numpy(dtype=object)
        doc_of = np.repeat(ids, counts)
        starts = np.zeros(len(counts), np.int64)
        np.cumsum(counts[:-1], out=starts[1:])
        pos_of = np.arange(len(toks), dtype=np.int64) - np.repeat(starts, counts)
        # vectorized covered-word mask: one merge against the (doc, pos)
        # coverage rows instead of per-word set membership
        flat = pd.DataFrame({id_col: doc_of, "pos": pos_of})
        covered_mask = (
            flat.merge(l.drop_duplicates(), how="left", indicator=True)["_merge"]
            .to_numpy()
            == "both"
        )
        keep = ~covered_mask
        joined = (
            pd.Series(toks[keep])
            .groupby(pd.Series(doc_of[keep]), sort=False)
            .agg(" ".join)  # stable: occurrence order within each doc
            .reindex(ids, fill_value="")
            .to_numpy(dtype=object)
        )
        removed = (
            pd.Series(covered_mask.astype(np.int64))
            .groupby(pd.Series(doc_of), sort=False)
            .sum()
            .reindex(ids, fill_value=0)
            .to_numpy(np.int64)
        )
        md5s = [hashlib.md5(s.encode()).hexdigest() for s in joined]
        return pd.DataFrame(
            {id_col: ids, "n_words": counts.astype(np.int64),
             "n_removed": removed, "clean_md5": md5s}
        )

    return _two_sided_partition_map(
        covered, doc_text, [id_col], rebuild,
        num_partitions=num_partitions,
        out_schema_fn=lambda ls, rs: pa.schema(
            [pa.field(id_col, pa.int64()), pa.field("n_words", pa.int64()),
             pa.field("n_removed", pa.int64()), pa.field("clean_md5", pa.string())]
        ),
    )
