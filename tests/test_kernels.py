"""Pure in-process kernel tests (no Ray session): the vectorized driver
connected-components, mapping composition, and the list<->binary packers
that carry lineage through acero joins."""

import numpy as np
import pandas as pd
import pyarrow as pa


def test_canonical_mapping_driver_matches_bruteforce():
    from raydf.canonicalize import canonical_mapping_driver

    rng = np.random.RandomState(3)
    a = rng.randint(0, 200, 500).astype(np.int64)
    b = rng.randint(0, 200, 500).astype(np.int64)
    got = canonical_mapping_driver(pd.DataFrame({"a": a, "b": b}))

    # brute-force union-find ground truth
    parent: dict[int, int] = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for x, y in zip(a, b):
        parent[find(int(x))] = find(int(y))
    comp: dict[int, list] = {}
    for n in set(a) | set(b):
        comp.setdefault(find(int(n)), []).append(int(n))
    want = {}
    for members in comp.values():
        canon = min(members)
        for m in members:
            if m != canon:
                want[m] = canon
    got_map = dict(zip(got["node"], got["canon"]))
    assert got_map == want


def test_canonical_mapping_driver_empty_and_chain():
    from raydf.canonicalize import canonical_mapping_driver

    empty = canonical_mapping_driver(pd.DataFrame({"a": [], "b": []}))
    assert len(empty) == 0
    # long chain exercises pointer jumping across iterations
    n = 4096
    chain = canonical_mapping_driver(
        pd.DataFrame({"a": np.arange(1, n, dtype=np.int64),
                      "b": np.arange(0, n - 1, dtype=np.int64)})
    )
    assert len(chain) == n - 1
    assert set(chain["canon"]) == {0}


def test_compose_mappings_vectorized():
    from raydf.pipeline import compose_mappings

    total = pd.DataFrame({"node": [10, 11], "canon": [5, 6]})
    new = pd.DataFrame({"node": [5, 12], "canon": [1, 7]})
    out = compose_mappings(total, new)
    m = dict(zip(out["node"], out["canon"]))
    # 10 -> 5 -> 1 re-pointed; 11 -> 6 untouched; 12 -> 7 appended
    assert m == {10: 1, 11: 6, 12: 7, 5: 1}


def test_pack_unpack_list_roundtrip():
    from raydf.canonicalize import _pack_list_i64, _unpack_list_i64

    big = 2**62 + 7
    arr = pa.array([[1, 2, 3], None, [], [big], [0]], pa.large_list(pa.int64()))
    chunked = pa.chunked_array([arr.slice(0, 2), arr.slice(2, 3)])
    packed = _pack_list_i64(chunked)
    assert packed.type == pa.large_binary()
    back = _unpack_list_i64(packed)
    assert back.to_pylist() == arr.to_pylist()
    # sliced binary input (offset != 0) must also decode
    assert _unpack_list_i64(packed.slice(2, 3)).to_pylist() == [[], [big], [0]]
    # all-null column (the common stated-triples case)
    nulls = _pack_list_i64(pa.chunked_array([pa.nulls(4, pa.large_list(pa.int64()))]))
    assert _unpack_list_i64(nulls).to_pylist() == [None] * 4


def test_md5_u64_matches_duckdb_md5_number_lower():
    """The sketch hash contract: md5_u64 must equal DuckDB's
    md5_number_lower for any string — the whole minhash/simhash oracle
    rests on this equality."""
    import duckdb

    from raydf.datapipe.dedup import md5_u64

    samples = ["", "hello", "a b  c", "Ünïcode", "x" * 500, "7\x1fq"]
    got = md5_u64(np.array(samples, dtype=object))
    con = duckdb.connect()
    for s, g in zip(samples, got):
        (want,) = con.execute("SELECT md5_number_lower(?)", [s]).fetchone()
        assert int(g) == int(want), s


def test_minhash_coefficients_31bit_exact():
    """Coefficients and shingle hashes stay below 2^31 so a*x+b < 2^63:
    exact in int64 numpy AND plain SQL BIGINT (no modular wrap)."""
    from raydf.datapipe.dedup import _M31, md5_u64, minhash_coefficients

    a, b = minhash_coefficients(64)
    assert all(0 < v < _M31 for v in a)
    assert all(0 <= v < _M31 for v in b)
    x = md5_u64(np.array(["shingle"], dtype=object)).astype(np.uint64) % np.uint64(_M31)
    assert max(a) * int(x[0]) + max(b) < 2**63


def test_media_histogram_matches_numpy():
    from raydf.datapipe.multimodal import MediaHistogrammer, synthetic_media_table

    tbl = synthetic_media_table(8)
    out = MediaHistogrammer(bins=64)(tbl).to_pandas()
    assert len(out) == 8 * 64
    # every payload is 1024 fake pixels
    assert (out.groupby("media_id")["n"].sum() == 1024).all()
    # spot-check one media against a direct numpy histogram
    import hashlib

    raw = np.frombuffer(
        hashlib.sha256(b"image-3").digest() * 32, dtype=np.uint8
    )
    want, _ = np.histogram(raw, bins=64, range=(0, 255))
    got = out[out["media_id"] == 3].sort_values("bin")["n"].to_numpy()
    assert (got == want).all()
    # SQL-side binning rule is identical: min(floor(v*64/255), 63)
    v = np.arange(256)
    np_bins = np.clip(np.searchsorted(np.linspace(0, 255, 65), v, side="right") - 1, 0, 63)
    sql_bins = np.minimum(v * 64 // 255, 63)
    assert (np_bins == sql_bins).all()


def test_ascii_regex_semantics_match_duckdb_on_unicode():
    """Kernels tokenize with (?a)/re.ASCII so Python \\w and \\s agree with
    DuckDB's RE2 on NON-ASCII text (accents, NBSP, unicode spaces) —
    previously a silent kernel/oracle divergence risk (ADVICE r02)."""
    import duckdb
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from raydf.datapipe.dedup import _shingles
    from raydf.datapipe.text import token_stats

    texts = [
        "café touché résumé",          # accented words
        "non breaking space here",               # NBSP
        "ideographic　space and   em-space",      # unicode spaces
        "plain ascii text",
    ]
    df = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})

    got = (
        rd.from_arrow(pa.Table.from_pandas(df))
        .map_batches(token_stats, batch_format="pyarrow")
        .to_pandas()
        .sort_values("doc_id")["n_tokens"]
        .tolist()
    )
    con = duckdb.connect()
    con.register("documents", df)
    want = [
        r[0]
        for r in con.execute(
            r"SELECT len(regexp_extract_all(text, '\w+')) FROM documents ORDER BY doc_id"
        ).fetchall()
    ]
    assert got == want

    # shingle normalization: RE2 \s+ collapse == the kernel's ASCII _WS_RE
    for t in texts:
        sql_norm = con.execute(
            r"SELECT trim(regexp_replace(lower(?), '\s+', ' ', 'g'))", [t]
        ).fetchone()[0]
        kernel_shingles = _shingles(t, 5)
        want_shingles = (
            {sql_norm}
            if len(sql_norm) < 5
            else {sql_norm[i : i + 5] for i in range(len(sql_norm) - 4)}
        )
        assert kernel_shingles == want_shingles
