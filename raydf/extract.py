"""Source-code → triple extraction (SURVEY.md O41; BASELINE.json north_star).

The reference engine has no extraction layer (datasets are built in host
code, reference src/lib.rs:51-53); BASELINE.json requires one: from each
``(repo, path, commit, lang, content)`` row emit

* structural triples — ``repo contains dir₁ contains … contains file``,
  ``file writtenIn lang``, ``file atCommit commit``, ``file declaresModule m``
* mention triples — per-language ``imports`` / ``defines`` / ``calls``
  parsed from ``content`` with compiled regexes (stateful actor pool).

Output is the *wide lexical* triple layout (FIXTURES.md F2 + sha256):
``(s_kind, s_lex, s_dt, p_kind, p_lex, p_dt, o_kind, o_lex, o_dt, sign,
content_sha256)``. The per-row invariant ``sha256(content)`` is stamped on
every emitted triple and carried through the whole pipeline
(BASELINE.json input_hint).

Interning to the int64 triple schema happens downstream
(:func:`intern_wide_batch`) so the extraction checkpoint keeps lexical
forms — the term dictionary is then a column-pruned re-read of that
checkpoint, not a second pass over ``content``.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd
import pyarrow as pa

from raydf import terms
from raydf.schema import (
    KG_AT_COMMIT,
    KG_CALLS,
    KG_CONTAINS,
    KG_DEFINES,
    KG_IMPORTS,
    KG_SAME_AS,
    KG_WRITTEN_IN,
    KIND_IRI,
    KIND_LITERAL,
    TRIPLES_SCHEMA,
    XSD_STRING,
)

KG_DECLARES_MODULE = "https://raydf.dev/kg#declaresModule"

WIDE_SCHEMA = pa.schema(
    [
        pa.field("s_kind", pa.uint8()),
        pa.field("s_lex", pa.large_string()),
        pa.field("s_dt", pa.large_string(), nullable=True),
        pa.field("p_kind", pa.uint8()),
        pa.field("p_lex", pa.large_string()),
        pa.field("p_dt", pa.large_string(), nullable=True),
        pa.field("o_kind", pa.uint8()),
        pa.field("o_lex", pa.large_string()),
        pa.field("o_dt", pa.large_string(), nullable=True),
        pa.field("sign", pa.bool_()),
        pa.field("content_sha256", pa.large_string(), nullable=True),
    ]
)


def _wide_table(rows: dict[str, list]) -> pa.Table:
    n = len(rows["s_lex"])
    return pa.table(
        {
            "s_kind": pa.array(rows["s_kind"], pa.uint8()),
            "s_lex": pa.array(rows["s_lex"], pa.large_string()),
            "s_dt": pa.array(rows.get("s_dt", [None] * n), pa.large_string()),
            "p_kind": pa.array(rows["p_kind"], pa.uint8()),
            "p_lex": pa.array(rows["p_lex"], pa.large_string()),
            "p_dt": pa.array(rows.get("p_dt", [None] * n), pa.large_string()),
            "o_kind": pa.array(rows["o_kind"], pa.uint8()),
            "o_lex": pa.array(rows["o_lex"], pa.large_string()),
            "o_dt": pa.array(rows.get("o_dt", [None] * n), pa.large_string()),
            "sign": pa.array([True] * n, pa.bool_()),
            "content_sha256": pa.array(rows["sha"], pa.large_string()),
        },
        schema=WIDE_SCHEMA,
    )


def sha256_column(contents) -> list[str]:
    return [hashlib.sha256(c.encode()).hexdigest() for c in contents]


def extract_structural(batch: pa.Table) -> pa.Table:
    """Stateless flat-map: one source row → k structural triples.

    Vectorized: all node strings come from pandas ``str`` kernels; the
    only per-depth work is one masked slice-join per directory level
    (paths are shallow — ≤ ~10 levels — while rows are millions, so the
    loop runs over LEVELS, never rows). This is the single biggest 100 TB
    stage; the former per-row emit loop was its dominant Python cost.
    sha256 over content stays a C-speed hashlib loop.
    """
    n_in = len(batch)
    if n_in == 0:
        return WIDE_SCHEMA.empty_table()
    idx = pd.RangeIndex(n_in)
    repo = pd.Series(batch["repo"].to_pylist(), index=idx)
    path = pd.Series(batch["path"].to_pylist(), index=idx)
    commit = pd.Series(batch["commit"].to_pylist(), index=idx)
    lang = pd.Series(batch["lang"].to_pylist(), index=idx)
    sha = pd.Series(sha256_column(batch["content"].to_pylist()), index=idx)

    repo_node = "repo:" + repo
    file_node = "file:" + repo + "/" + path
    parts = path.str.split("/")
    ndirs = parts.str.len() - 1  # directory levels above the file
    maxdirs = int(ndirs.max())

    def frame(s, p, o, h, o_kind=KIND_IRI, o_dt=None):
        n = len(s)
        return pd.DataFrame(
            {
                "s_lex": np.asarray(s, dtype=object),
                "p_lex": np.full(n, p, dtype=object),
                "o_kind": np.full(n, o_kind, dtype=np.uint8),
                "o_lex": np.asarray(o, dtype=object),
                "o_dt": np.full(n, o_dt, dtype=object),
                "sha": np.asarray(h, dtype=object),
            }
        )

    frames = []
    prev = repo_node  # per-row containment source at the current level
    dir_prefix = "dir:" + repo + "/"
    for d in range(maxdirs):
        has = ndirs > d
        cur = dir_prefix[has] + parts[has].str[: d + 1].str.join("/")
        frames.append(frame(prev[has], KG_CONTAINS, cur, sha[has]))
        prev = prev.copy()
        prev[has] = cur
    frames.append(frame(prev, KG_CONTAINS, file_node, sha))
    frames.append(frame(file_node, KG_WRITTEN_IN, "lang:" + lang, sha))
    frames.append(
        frame(file_node, KG_AT_COMMIT, commit, sha, o_kind=KIND_LITERAL, o_dt=XSD_STRING)
    )
    stem = parts.str[-1].str.rsplit(".", n=1).str[0]
    frames.append(frame(file_node, KG_DECLARES_MODULE, "module:" + stem, sha))

    all_df = pd.concat(frames, ignore_index=True)
    n = len(all_df)
    return _wide_table(
        {
            "s_kind": np.full(n, KIND_IRI, np.uint8),
            "s_lex": all_df["s_lex"].to_numpy(),
            "p_kind": np.full(n, KIND_IRI, np.uint8),
            "p_lex": all_df["p_lex"].to_numpy(),
            "o_kind": all_df["o_kind"].to_numpy(),
            "o_lex": all_df["o_lex"].to_numpy(),
            "o_dt": all_df["o_dt"].to_numpy(),
            "sha": all_df["sha"].to_numpy(),
        }
    )


_KEYWORDS = frozenset(
    """if else for while return def class import from as with try except lambda
    fn let mut use pub struct enum impl trait match loop const static
    function var new typeof instanceof require module exports
    func type package go defer range map chan interface switch case print
    println print_ len str int float append vec println!""".split()
)

LANG_RULES: dict[str, dict[str, str]] = {
    "python": {
        "imports": r"^\s*(?:from\s+([A-Za-z_][\w\.]*)|import\s+([A-Za-z_][\w\.]*))",
        "defines": r"^\s*(?:def|class)\s+([A-Za-z_]\w*)",
    },
    "rust": {
        "imports": r"^\s*use\s+([A-Za-z_][\w:]*)",
        "defines": r"\b(?:fn|struct|enum|trait)\s+([A-Za-z_]\w*)",
    },
    "javascript": {
        "imports": r"(?:require\(\s*['\"]([^'\"]+)['\"]\s*\)|import\s+(?:[\w{},*\s]+\s+from\s+)?['\"]([^'\"]+)['\"])",
        "defines": r"\b(?:function|class)\s+([A-Za-z_$][\w$]*)",
    },
    "go": {
        "imports": r"import\s+\"([^\"]+)\"",
        "defines": r"\b(?:func|type)\s+(?:\([^)]*\)\s*)?([A-Za-z_]\w*)",
    },
}
CALL_RE = r"\b([A-Za-z_]\w*)\s*\("


class MentionExtractor:
    """Actor-pool stage (O41): per-language regex mention extraction.

    Regexes are compiled once per actor in ``__init__`` and reused across
    batches (`map_batches(MentionExtractor, concurrency=N)`); the body is
    pandas ``str.findall`` over lang-masked sub-frames.
    """

    def __init__(self):
        self.rules = {
            lang: {k: re.compile(v, re.MULTILINE) for k, v in spec.items()}
            for lang, spec in LANG_RULES.items()
        }
        self.call_re = re.compile(CALL_RE)

    def __call__(self, batch: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "repo": batch["repo"].to_pandas(),
                "path": batch["path"].to_pandas(),
                "lang": batch["lang"].to_pandas(),
                "content": batch["content"].to_pandas(),
            }
        )
        df["sha"] = sha256_column(df["content"].tolist())
        df["file"] = "file:" + df["repo"] + "/" + df["path"]

        frames: list[pd.DataFrame] = []

        def explode(sub: pd.DataFrame, matches: pd.Series, pred: str, obj_prefix: str):
            m = matches.map(
                lambda ms: sorted(
                    {x for g in ms for x in ((g,) if isinstance(g, str) else g) if x}
                )
            )
            e = pd.DataFrame({"s_lex": sub["file"], "o": m, "sha": sub["sha"]}).explode("o")
            e = e.dropna(subset=["o"])
            e["p_lex"] = pred
            e["o_lex"] = obj_prefix + e["o"].astype(str)
            frames.append(e[["s_lex", "p_lex", "o_lex", "sha"]])

        for lang, rules in self.rules.items():
            sub = df[df["lang"] == lang]
            if len(sub) == 0:
                continue
            explode(sub, sub["content"].str.findall(rules["imports"]), KG_IMPORTS, "module:")
            defs = sub["content"].str.findall(rules["defines"])
            explode(sub, defs, KG_DEFINES, "sym:")
            calls = sub["content"].str.findall(self.call_re)
            defs_sets = defs.map(set)
            calls = pd.Series(
                [
                    [c for c in set(cs) if c not in _KEYWORDS and c not in ds]
                    for cs, ds in zip(calls, defs_sets)
                ],
                index=sub.index,
            )
            explode(sub, calls, KG_CALLS, "sym:")

        if not frames:
            return WIDE_SCHEMA.empty_table()
        all_df = pd.concat(frames, ignore_index=True)
        n = len(all_df)
        return _wide_table(
            {
                "s_kind": [KIND_IRI] * n,
                "s_lex": all_df["s_lex"].tolist(),
                "p_kind": [KIND_IRI] * n,
                "p_lex": all_df["p_lex"].tolist(),
                "o_kind": [KIND_IRI] * n,
                "o_lex": all_df["o_lex"].tolist(),
                "o_dt": [None] * n,
                "sha": all_df["sha"].tolist(),
            }
        )


class EntityLinkScorer:
    """Entity linker (north_star "entity-link scorer" stage): proposes
    ``module:X sameAs file:F`` links from ``declaresModule`` triples.
    Score = string similarity between module name and file stem
    (difflib.SequenceMatcher, computed once per unique pair per batch);
    links above ``threshold`` become sameAs triples feeding the
    ``sameAs ⇒ Eq`` rule and union-find canonicalization."""

    def __init__(self, threshold: float = 0.9):
        import difflib

        self.threshold = threshold
        self._ratio = lambda a, b: difflib.SequenceMatcher(None, a, b).ratio()

    def __call__(self, wide_batch: pa.Table) -> pa.Table:
        df = wide_batch.to_pandas()
        df = df[df["p_lex"] == KG_DECLARES_MODULE]
        if len(df) == 0:
            return WIDE_SCHEMA.empty_table()
        mod_name = df["o_lex"].str.removeprefix("module:")
        stem = df["s_lex"].str.rpartition("/")[2].str.rpartition(".")[0]
        uniq = {(m, s): self._ratio(m, s) for m, s in set(zip(mod_name, stem))}
        score = pd.Series(
            [uniq[(m, s)] for m, s in zip(mod_name, stem)], index=df.index
        )
        keep = df[score >= self.threshold]
        n = len(keep)
        return _wide_table(
            {
                "s_kind": [KIND_IRI] * n,
                "s_lex": keep["o_lex"].tolist(),
                "p_kind": [KIND_IRI] * n,
                "p_lex": [KG_SAME_AS] * n,
                "o_kind": [KIND_IRI] * n,
                "o_lex": keep["s_lex"].tolist(),
                "o_dt": [None] * n,
                "sha": keep["content_sha256"].tolist(),
            }
        )


class SourceExtractor:
    """One-pass actor-pool extractor: structural ∪ mention ∪ entity-link
    triples from a single scan of ``content``.

    At 100 TB the scan dominates; fanning structural / mention / link
    extraction out as separate Dataset branches would re-read the source
    once per branch (and a self-referencing union deadlocks actor-pool
    scheduling on small clusters). One callable class per actor: regexes
    compiled once in ``__init__``, three extractors share each decoded
    batch."""

    def __init__(self, *, link_threshold: float | None = 0.9):
        self.mentions = MentionExtractor()
        self.scorer = (
            EntityLinkScorer(link_threshold) if link_threshold is not None else None
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        structural = extract_structural(batch)
        parts = [structural, self.mentions(batch)]
        if self.scorer is not None:
            parts.append(self.scorer(structural))
        return pa.concat_tables(parts)


def extract_wide(
    source_ds,
    *,
    mention_concurrency: int | None = None,
    batch_size: int = 2048,
    link_threshold: float | None = None,
):
    """source_code Dataset → wide lexical triples Dataset (one-pass).

    ``concurrency=(min, N)`` — the pool may still shrink below N when the
    input/cluster can't feed it (avoids deadlocking on reserved CPUs), but
    the minimum is N/2 rather than 1: Ray Data's autoscaling ramp from one
    actor was measurably starving the big-CPU side of this
    embarrassingly-parallel stage (5M files: extract scaled only 1.4×
    from 8→32 CPUs)."""
    n = mention_concurrency or 4
    return source_ds.map_batches(
        SourceExtractor,
        fn_constructor_kwargs={"link_threshold": link_threshold},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=(max(1, n // 2), n),
    )


# ------------------------------------------------------------- interning


def intern_wide_batch(batch: pa.Table) -> pa.Table:
    """Wide lexical triples → interned int64 triple rows (round 0, stated)."""
    n = len(batch)
    cols = {}
    for pos, out_name in (("s", "subj"), ("p", "pred"), ("o", "obj")):
        kind = batch[f"{pos}_kind"].to_numpy(zero_copy_only=False)
        lex = batch[f"{pos}_lex"].to_numpy(zero_copy_only=False)
        dt = batch[f"{pos}_dt"].to_numpy(zero_copy_only=False)
        keys = np.array(
            [f"{k}\x1f{d if d is not None else ''}\x1f{l}" for k, l, d in zip(kind, lex, dt)],
            dtype=object,
        )
        cols[out_name] = terms.hash64_strings(keys)
    return pa.table(
        {
            "subj": pa.array(cols["subj"], pa.int64()),
            "pred": pa.array(cols["pred"], pa.int64()),
            "obj": pa.array(cols["obj"], pa.int64()),
            "sign": batch["sign"],
            "graph": pa.array(np.zeros(n, dtype=np.int64), pa.int64()),
            "rule_idx": pa.nulls(n, pa.int32()),
            "round": pa.array(np.zeros(n, dtype=np.int32), pa.int32()),
            "substitution": pa.nulls(n, pa.large_list(pa.int64())),
            # cast: pre-r04 wide checkpoints stamped 32-bit `string`
            "content_sha256": batch["content_sha256"].cast(pa.large_string()),
        },
        schema=TRIPLES_SCHEMA,
    )


def terms_delta_batch(batch: pa.Table) -> pa.Table:
    """Wide lexical triples → term-dictionary rows (pre-dedup within batch)."""
    frames = []
    for pos in ("s", "p", "o"):
        frames.append(
            pd.DataFrame(
                {
                    "kind": batch[f"{pos}_kind"].to_numpy(zero_copy_only=False),
                    "lexical": batch[f"{pos}_lex"].to_numpy(zero_copy_only=False),
                    "datatype": batch[f"{pos}_dt"].to_numpy(zero_copy_only=False),
                }
            )
        )
    df = pd.concat(frames, ignore_index=True).drop_duplicates()
    keys = np.array(
        [
            f"{k}\x1f{d if d is not None and d == d else ''}\x1f{l}"
            for k, l, d in zip(df["kind"], df["lexical"], df["datatype"])
        ],
        dtype=object,
    )
    df["term_id"] = terms.hash64_strings(keys)
    df = df.drop_duplicates("term_id")
    return pa.table(
        {
            "term_id": pa.array(df["term_id"].to_numpy(), pa.int64()),
            "kind": pa.array(df["kind"].to_numpy().astype(np.uint8), pa.uint8()),
            "lexical": pa.array(df["lexical"].tolist(), pa.large_string()),
            "datatype": pa.array(
                [None if d is None or d != d else d for d in df["datatype"]], pa.large_string()
            ),
        }
    )
