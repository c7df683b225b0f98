"""Text-analysis stages over a documents table: language id, quality
scoring, token counting, fingerprinting. All are ``map_batches`` kernels;
the language identifier is an actor-pool stage (profiles built once per
actor)."""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd
import pyarrow as pa

# character-class n-gram profiles for a tiny deterministic heuristic lang-id.
# Dict INSERTION ORDER is the idxmax tie-break and is replicated verbatim in
# the SQL oracle's CASE ladder — extend both together, append-only.
_LANG_MARKERS = {
    "en": [" the ", " and ", " of ", " to ", " in ", " is "],
    "de": [" der ", " die ", " und ", " das ", " ist ", " nicht "],
    "fr": [" le ", " la ", " les ", " de ", " et ", " est "],
    "es": [" el ", " la ", " los ", " de ", " que ", " es "],
    "it": [" il ", " che ", " di ", " non ", " per ", " sono "],
    "pt": [" o ", " os ", " uma ", " com ", " para ", " mais "],
    "nl": [" het ", " een ", " van ", " niet ", " zijn ", " op "],
}


class LangId:
    """Actor-pool language identifier with a pluggable model.

    ``model_loader`` (a picklable zero-arg callable) loads a real
    classifier ONCE per actor in ``__init__`` — anything exposing
    ``predict(list[str]) -> list[str]`` (a fasttext wrapper, an onnx
    session…) plugs in with no kernel change. Without one, the built-in
    deterministic heuristic runs: CJK codepoint ratio → zh; else argmax of
    stop-word marker hit counts; ties/no-hits → unknown."""

    def __init__(self, model_loader=None):
        self.model = model_loader() if model_loader is not None else None
        self.markers = {
            lang: re.compile("|".join(re.escape(m) for m in ms))
            for lang, ms in _LANG_MARKERS.items()
        }
        self.cjk = re.compile(r"[一-鿿]")

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.model is not None:
            pred_list = list(self.model.predict(batch["text"].to_pylist()))
            return batch.append_column(
                "lang_pred", pa.array(pred_list, pa.string())
            )
        texts = pd.Series(batch["text"].to_pylist())
        padded = " " + texts.str.lower() + " "
        counts = {
            lang: padded.str.count(rx.pattern) for lang, rx in self.markers.items()
        }
        cjk_ratio = texts.str.count(self.cjk.pattern) / texts.str.len().clip(lower=1)
        score = pd.DataFrame(counts)
        best = score.idxmax(axis=1).where(score.max(axis=1) > 0, "unknown")
        pred = best.where(cjk_ratio < 0.05, "zh")
        return batch.append_column("lang_pred", pa.array(pred.tolist(), pa.string()))


# (?a): ASCII \w/\d/\s — matches RE2 semantics (DuckDB oracles) on
# non-ASCII corpora; Python default \w is Unicode-aware (ADVICE r02)
_WORD_RE = r"(?a)\w+"
_SENT_RE = r"[.!?]+"


def token_stats(batch: pa.Table) -> pa.Table:
    """Whitespace/wordish token counting + a BPE-ish subword estimate
    (chars/4 heuristic commonly used for budget estimates)."""
    texts = pd.Series(batch["text"].to_pylist())
    n_tokens = texts.str.count(_WORD_RE).astype(np.int64)
    n_ws = texts.str.split().map(len).astype(np.int64)
    n_chars = texts.str.len().astype(np.int64)
    out = batch.select(["doc_id"])
    out = out.append_column("n_tokens", pa.array(n_tokens.to_numpy(), pa.int64()))
    out = out.append_column("n_ws_tokens", pa.array(n_ws.to_numpy(), pa.int64()))
    out = out.append_column("n_chars_calc", pa.array(n_chars.to_numpy(), pa.int64()))
    out = out.append_column(
        "est_bpe_tokens", pa.array((n_chars // 4).to_numpy(), pa.int64())
    )
    return out


_STOPWORDS = frozenset(
    "the and of a to in is that it for on with as are was be this at by an".split()
)
# \b-anchored alternation counts exactly the findall(\w+) tokens that are
# stopwords (boundaries reject partial-token matches like 'the' in 'other')
_STOP_RE = r"(?a)\b(?:" + "|".join(sorted(_STOPWORDS)) + r")\b"


def quality_score(batch: pa.Table) -> pa.Table:
    """Heuristic quality features: length, punctuation/digit/upper ratios,
    stopword ratio, mean word length, and a composite [0,1] score.
    All ratios via vectorized ``str.count`` regex kernels — no per-row
    token loops (sum of \\w+ match lengths ≡ count of \\w chars)."""
    texts = pd.Series(batch["text"].to_pylist())
    lower = texts.str.lower()
    n_chars = texts.str.len().clip(lower=1)
    n_words = texts.str.count(_WORD_RE).clip(lower=1)
    stop_ratio = lower.str.count(_STOP_RE) / n_words
    punct_ratio = texts.str.count(r"(?a)[^\w\s]") / n_chars
    digit_ratio = texts.str.count(r"(?a)\d") / n_chars
    upper_ratio = texts.str.count(r"[A-Z]") / n_chars
    mean_word_len = (texts.str.count(r"(?a)\w") / n_words).where(
        texts.str.count(_WORD_RE) > 0, 0.0
    )
    score = (
        0.4 * np.clip(stop_ratio / 0.4, 0, 1)
        + 0.2 * (1 - np.clip(punct_ratio / 0.3, 0, 1))
        + 0.2 * (1 - np.clip(digit_ratio / 0.3, 0, 1))
        + 0.2 * np.clip((mean_word_len - 2) / 5, 0, 1)
    )
    out = batch.select(["doc_id"])
    for name, s in (
        ("stop_ratio", stop_ratio),
        ("punct_ratio", punct_ratio),
        ("digit_ratio", digit_ratio),
        ("upper_ratio", upper_ratio),
        ("mean_word_len", mean_word_len),
        ("quality", pd.Series(score)),
    ):
        out = out.append_column(name, pa.array(s.to_numpy(np.float64), pa.float64()))
    return out


_WORDS_RE = r"(?a)\w+"


def repetition_scores(batch: pa.Table) -> pa.Table:
    """Gopher-style repetition signals per document: fraction of duplicate
    lines and fraction of occurrences of the most frequent word bigram.

    Emitted as integer micro-fractions (``*_e6``, floor division) so the
    driver's value-hash compare against a SQL oracle is exact — float
    fractions would be at the mercy of engine-specific last-ulp rounding.
    Vectorized via explode+groupby (no per-row Python)."""
    texts = pd.Series(batch["text"].to_pylist())
    idx = pd.RangeIndex(len(texts))
    texts.index = idx

    # duplicate-line fraction
    lines = texts.str.split("\n")
    n_lines = lines.map(len).to_numpy(np.int64)
    ex = lines.explode()
    nd = (
        pd.DataFrame({"i": ex.index.to_numpy(), "l": ex.to_numpy()})
        .drop_duplicates()
        .groupby("i")
        .size()
        .reindex(idx, fill_value=0)
        .to_numpy(np.int64)
    )
    dup_line_frac = (n_lines - nd) * 1_000_000 // np.maximum(n_lines, 1)

    # top word-bigram fraction
    toks = texts.str.lower().str.findall(_WORDS_RE)
    t = toks.explode().dropna()
    d = pd.DataFrame({"i": t.index.to_numpy(), "w": t.to_numpy()})
    d["w2"] = d["w"].shift(-1)
    d["i2"] = np.append(d["i"].to_numpy()[1:], -1)
    bg = d[d["i"] == d["i2"]]
    if len(bg):
        counts = bg.groupby(["i", "w", "w2"], sort=False).size()
        mc = counts.groupby(level="i").max()
        nb = counts.groupby(level="i").sum()
        top = (mc * 1_000_000 // nb).reindex(idx, fill_value=0).to_numpy(np.int64)
    else:
        top = np.zeros(len(texts), np.int64)

    out = batch.select(["doc_id"])
    out = out.append_column("dup_line_frac_e6", pa.array(dup_line_frac, pa.int64()))
    out = out.append_column("top_bigram_frac_e6", pa.array(top, pa.int64()))
    return out


def _roll64(data: bytes) -> int:
    """Base-131 polynomial hash mod 2^64 (≡ the per-byte Horner loop
    ``h = h*131 + ch``), vectorized: powers via uint64 cumprod (numpy
    integer overflow wraps mod 2^64 by definition)."""
    if not data:
        return -0x8000000000000000
    arr = np.frombuffer(data, np.uint8).astype(np.uint64)
    p = np.full(len(arr), np.uint64(131))
    p[0] = np.uint64(1)
    powers = np.cumprod(p)  # 131^0 .. 131^(n-1)
    h = int((arr * powers[::-1]).sum(dtype=np.uint64))
    return h - 0x8000000000000000


# PII patterns kept deliberately inside the RE2 ∩ Python-`re` common
# subset (no backrefs, no lookaround) so an external SQL engine (DuckDB
# uses RE2) applies the IDENTICAL semantics — the oracle check depends on
# it, and at engine scale it means the scrub spec is portable.
PII_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z][A-Za-z]+"
PII_PHONE_RE = r"\b\d\d\d-\d\d\d-\d\d\d\d\b"


def pii_redact(batch: pa.Table) -> pa.Table:
    """PII scrub: count + redact email addresses and NNN-NNN-NNNN phone
    numbers. Emits per-doc counts and the md5 of the redacted text (the
    checkable witness that the replacement happened byte-for-byte) — a
    real pipeline would emit the redacted text column itself; md5 keeps
    the test/oracle output narrow. Vectorized ``str.count``/
    ``str.replace`` kernels; no per-row scanning loops."""
    texts = pd.Series(batch["text"].to_pylist())
    n_emails = texts.str.count(PII_EMAIL_RE).astype(np.int64)
    n_phones = texts.str.count(PII_PHONE_RE).astype(np.int64)
    clean = texts.str.replace(PII_EMAIL_RE, "[EMAIL]", regex=True).str.replace(
        PII_PHONE_RE, "[PHONE]", regex=True
    )
    md5s = [hashlib.md5(t.encode()).hexdigest() for t in clean]
    out = batch.select(["doc_id"])
    out = out.append_column("n_emails", pa.array(n_emails.to_numpy(), pa.int64()))
    out = out.append_column("n_phones", pa.array(n_phones.to_numpy(), pa.int64()))
    out = out.append_column("clean_md5", pa.array(md5s, pa.string()))
    return out


def fingerprint(batch: pa.Table) -> pa.Table:
    """Document fingerprints: md5 of normalized text (stable, SQL-checkable)
    + a 64-bit rolling hash (winnowing-style content id)."""
    texts = batch["text"].to_pylist()
    md5s, rolls = [], []
    for t in texts:
        norm = " ".join(t.lower().split())
        raw = norm.encode()
        md5s.append(hashlib.md5(raw).hexdigest())
        rolls.append(_roll64(raw))
    out = batch.select(["doc_id"])
    out = out.append_column("md5_fingerprint", pa.array(md5s, pa.string()))
    out = out.append_column("rolling_hash", pa.array(rolls, pa.int64()))
    return out


# ------------------------------------------------- TF-IDF keyword extraction


def tfidf_top_terms(docs, n_docs: int, *, k: int = 3, scale: int = 1_000_000,
                    text_col: str = "text", id_col: str = "doc_id",
                    num_partitions: int | None = None):
    """Top-k characteristic terms per document by integer-scaled TF-IDF:
    ``score_e6 = tf · ((n_docs·scale) // df)`` (nonnegative floor division
    — bit-identical in numpy and SQL), ties broken by term ascending.
    The keyword-extraction / doc-descriptor stage of a text pipeline.

    Scale shape: a batch-local (doc, term, tf) kernel (each doc lives in
    one batch, so tf needs no shuffle), ONE term-keyed exchange where df
    is the partition-local group size (tf rows are distinct per
    (doc, term)), then the existing top-k-per-group combiner
    (:func:`raydf.relops.topk_per_group` — ≤ k rows per doc per block
    enter the final shuffle). ``n_docs`` is the corpus size (cheap
    metadata count), passed in so the operator stays a pure Dataset
    transform."""
    import pyarrow as pa

    from raydf.joins import partitioned_group_map
    from raydf.relops import topk_per_group

    word = re.compile(r"[a-z0-9]+")
    idf_num = n_docs * scale

    def tf_rows(df: pd.DataFrame) -> pd.DataFrame:
        toks = df[text_col].str.lower().str.findall(word)
        counts = toks.map(len).to_numpy()
        flat = toks.explode().dropna()
        ids = np.repeat(df[id_col].to_numpy(np.int64), counts)
        g = (
            pd.DataFrame({"doc_id": ids, "term": flat.to_numpy(dtype=object)})
            .groupby(["doc_id", "term"], sort=False)
            .size()
            .reset_index(name="tf")
        )
        return g.astype({"doc_id": np.int64, "tf": np.int64})

    tf = docs.map_batches(tf_rows, batch_format="pandas")

    def score(part: pd.DataFrame) -> pd.DataFrame:
        dfc = part.groupby("term", sort=False)["term"].transform("size")
        tfv = part["tf"].to_numpy(np.int64)
        idf = idf_num // dfc.to_numpy(np.int64)
        with np.errstate(over="ignore"):
            s = tfv * idf
        if len(s) and ((idf != 0) & (s // np.where(idf == 0, 1, idf) != tfv)).any():
            # fail loud instead of numpy's silent int64 wraparound (the
            # SQL oracle would error on BIGINT overflow, not wrap)
            raise OverflowError(
                "tf*idf exceeds int64 — lower `scale` or shard the corpus "
                f"(n_docs={n_docs}, max tf={int(tfv.max())})"
            )
        return pd.DataFrame(
            {"doc_id": part["doc_id"].to_numpy(np.int64),
             "term": part["term"].to_numpy(dtype=object),
             "score_e6": s}
        )

    scored = partitioned_group_map(tf, ["term"], score, num_partitions=num_partitions)
    return topk_per_group(
        scored, ["doc_id"], "score_e6", k, tie_cols=["term"],
        num_partitions=num_partitions,
    )
