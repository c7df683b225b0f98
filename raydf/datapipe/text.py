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

# character-class n-gram profiles for a tiny deterministic heuristic lang-id
_LANG_MARKERS = {
    "en": [" the ", " and ", " of ", " to ", " in ", " is "],
    "de": [" der ", " die ", " und ", " das ", " ist ", " nicht "],
    "fr": [" le ", " la ", " les ", " de ", " et ", " est "],
    "es": [" el ", " la ", " los ", " de ", " que ", " es "],
}


class LangId:
    """Actor-pool language identifier.

    Heuristic: CJK codepoint ratio → zh; else argmax of stop-word marker
    hit counts; ties/no-hits → unknown. Deterministic; markers compiled
    once per actor."""

    def __init__(self):
        self.markers = {
            lang: re.compile("|".join(re.escape(m) for m in ms))
            for lang, ms in _LANG_MARKERS.items()
        }
        self.cjk = re.compile(r"[一-鿿]")

    def __call__(self, batch: pa.Table) -> pa.Table:
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


_WORD_RE = r"\w+"
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


def quality_score(batch: pa.Table) -> pa.Table:
    """Heuristic quality features: length, punctuation/digit/upper ratios,
    stopword ratio, mean word length, and a composite [0,1] score."""
    texts = pd.Series(batch["text"].to_pylist())
    n_chars = texts.str.len().clip(lower=1)
    words = texts.str.lower().str.findall(_WORD_RE)
    n_words = words.map(len).clip(lower=1)
    stop_ratio = words.map(lambda ws: sum(w in _STOPWORDS for w in ws)) / n_words
    punct_ratio = texts.str.count(r"[^\w\s]") / n_chars
    digit_ratio = texts.str.count(r"\d") / n_chars
    upper_ratio = texts.str.count(r"[A-Z]") / n_chars
    mean_word_len = words.map(lambda ws: np.mean([len(w) for w in ws]) if ws else 0.0)
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


def fingerprint(batch: pa.Table) -> pa.Table:
    """Document fingerprints: md5 of normalized text (stable, SQL-checkable)
    + a 64-bit rolling hash (winnowing-style content id)."""
    texts = batch["text"].to_pylist()
    md5s, rolls = [], []
    for t in texts:
        norm = " ".join(t.lower().split())
        md5s.append(hashlib.md5(norm.encode()).hexdigest())
        h = 0
        for ch in norm.encode():
            h = (h * 131 + ch) & 0xFFFFFFFFFFFFFFFF
        rolls.append(h - 0x8000000000000000)
    out = batch.select(["doc_id"])
    out = out.append_column("md5_fingerprint", pa.array(md5s, pa.string()))
    out = out.append_column("rolling_hash", pa.array(rolls, pa.int64()))
    return out
