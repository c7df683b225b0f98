"""Deterministic synthetic ``source_code`` input (FIXTURES.md F1).

BASELINE.json's input_hint fixes the pipeline input shape:
``(repo:string, path:string, commit:string, lang:string, content:large_string)``.
No external data exists in the sandbox, so benchmarks and tests synthesize
this table deterministically (pure function of the row index — no RNG
state, so generation itself is an embarrassingly parallel Ray pipeline and
any slice can be regenerated independently for resume/verification).

Content templates per language embed known import/def/call mentions so the
expected extraction triples are computable in closed form by tests.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

from raydf.schema import SOURCE_CODE_SCHEMA

LANGS = ("python", "rust", "javascript", "go")

_FILLER = (
    "the quick brown fox jumps over the lazy dog while the engine streams "
    "arrow blocks through the object store with backpressure "
)


def _content(i: int, lang: str) -> str:
    """Deterministic file body with extractable mentions.

    Each file i: imports module ``mod_{i % 17}``, defines symbol
    ``fn_{i}``, calls symbol ``fn_{(i * 7 + 1) % N?}`` — call targets wrap
    within a window of 100 so call→def links exist across files.
    """
    imp = f"mod_{i % 17}"
    defn = f"fn_{i}"
    call = f"fn_{(i // 100) * 100 + (i * 7 + 1) % 100}"  # same 100-file window
    pad = _FILLER * (1 + i % 3)
    if lang == "python":
        body = f"import {imp}\n\ndef {defn}(x):\n    return {call}(x) + 1\n"
    elif lang == "rust":
        body = f"use {imp};\n\nfn {defn}(x: u64) -> u64 {{\n    {call}(x) + 1\n}}\n"
    elif lang == "javascript":
        body = f"const m = require('{imp}');\n\nfunction {defn}(x) {{\n  return {call}(x) + 1;\n}}\n"
    else:  # go
        body = f'import "{imp}"\n\nfunc {defn}(x int) int {{\n    return {call}(x) + 1\n}}\n'
    return body + "// " + pad + f" file-{i}\n"


def source_code_batch(indices: np.ndarray) -> pa.Table:
    """Generate rows for the given file indices (vector of int64)."""
    idx = np.asarray(indices, dtype=np.int64)
    n_repos = 8
    repos, paths, commits, langs, contents = [], [], [], [], []
    for i in idx.tolist():
        repo = f"org{i % 4}/repo{i % n_repos}"
        # 1-3 levels of directories → transitive `contains` is non-trivial
        depth = i % 3
        parts = [f"src"] + [f"pkg{(i // (3 ** d)) % 3}" for d in range(depth)]
        lang = LANGS[i % len(LANGS)]
        ext = {"python": "py", "rust": "rs", "javascript": "js", "go": "go"}[lang]
        path = "/".join(parts) + f"/mod_{i % 17}.{ext}" if i % 5 == 0 else "/".join(
            parts
        ) + f"/file_{i}.{ext}"
        commit = hashlib.sha1(f"commit-{i % 64}".encode()).hexdigest()[:12]
        repos.append(repo)
        paths.append(path)
        commits.append(commit)
        langs.append(lang)
        contents.append(_content(i, lang))
    return pa.table(
        {
            "repo": pa.array(repos, pa.string()),
            "path": pa.array(paths, pa.string()),
            "commit": pa.array(commits, pa.string()),
            "lang": pa.array(langs, pa.string()),
            "content": pa.array(contents, pa.large_string()),
        },
        schema=SOURCE_CODE_SCHEMA,
    )


def source_code_table(num_files: int) -> pa.Table:
    """Small in-memory fixture for unit tests."""
    return source_code_batch(np.arange(num_files))


def source_code_dataset(num_files: int):
    """Distributed deterministic generation as a Ray Data pipeline."""
    import ray.data as rd

    return rd.range(num_files).map_batches(
        lambda b: source_code_batch(b["id"]), batch_format="numpy", batch_size=4096
    )


def triples_from_terms(rows, *, sign=None, graphs=None):
    """Tiny literal triple graphs for tests — the ``grdf_triples!`` analog
    (reference src/lib.rs:50-53). ``rows``: list of (s, p, o) where each
    position is a raydf.rules.ConstTerm. ``graphs``: optional per-row
    named-graph ConstTerm (or None = default graph) — the
    ``Statement::with_graph`` quad form. Returns (triples_table,
    terms_table) in the engine's interned schemas."""
    import pyarrow as pa

    from raydf.schema import GRAPH_DEFAULT, TRIPLES_SCHEMA
    from raydf.terms import terms_table

    sign = sign or [True] * len(rows)
    graphs = graphs or [None] * len(rows)
    subj = [t[0].id for t in rows]
    pred = [t[1].id for t in rows]
    obj = [t[2].id for t in rows]
    gids = [GRAPH_DEFAULT if g is None else g.id for g in graphs]
    n = len(rows)
    triples = pa.table(
        {
            "subj": pa.array(subj, pa.int64()),
            "pred": pa.array(pred, pa.int64()),
            "obj": pa.array(obj, pa.int64()),
            "sign": pa.array(sign, pa.bool_()),
            "graph": pa.array(gids, pa.int64()),
            "rule_idx": pa.nulls(n, pa.int32()),
            "round": pa.array([0] * n, pa.int32()),
            "substitution": pa.nulls(n, pa.large_list(pa.int64())),
            "content_sha256": pa.nulls(n, pa.large_string()),
        },
        schema=TRIPLES_SCHEMA,
    )
    seen = []
    for t, g in zip(rows, graphs):
        for term in list(t) + ([g] if g is not None else []):
            tup = (term.kind, term.lexical, term.datatype)
            if tup not in seen:
                seen.append(tup)
    return triples, terms_table(seen)


def write_source_code(out_dir: str, num_files: int, *, rows_per_file: int = 16384,
                      row_group_size: int = 2048) -> str:
    """Materialize the synthetic input to Parquet once (bench input cache).

    Small row groups (not just many files) matter: Ray's parquet reader
    splits per row group, so one-group files cap read/extract parallelism
    at the file count no matter how many CPUs the cluster has."""
    import os

    done = os.path.join(out_dir, "_DONE")
    if os.path.exists(done):
        return out_dir
    ds = source_code_dataset(num_files)
    ds.write_parquet(
        out_dir, min_rows_per_file=rows_per_file, row_group_size=row_group_size
    )
    with open(done, "w") as f:
        f.write(str(num_files))
    return out_dir
