"""End-to-end flagship pipeline tests (BASELINE.json north_star):
extract → fixpoint → canonicalize → materialize over the deterministic
synthetic source_code table, plus checkpoint-resume and the per-row
sha256(content) invariant."""

import glob
import hashlib
import json
import os

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest
import ray.data as rd

from raydf.fixtures import source_code_dataset, source_code_table
from raydf.materialize import decode_triples, read_graph
from raydf.pipeline import kg_pipeline
from raydf.schema import KG_CONTAINS, KG_WRITTEN_IN, RDF_TYPE

N_FILES = 120


@pytest.fixture(scope="module")
def pipeline_run(tmp_path_factory):
    # link_entities=False: keep lexical identities stable so structural
    # assertions are exact (the sameAs→Eq merge path is tested separately)
    wd = str(tmp_path_factory.mktemp("kg_e2e"))
    metrics = kg_pipeline(
        source_code_dataset(N_FILES),
        wd,
        link_entities=False,
        buckets=4,
        num_partitions=4,
        max_rounds=8,
        max_generations=2,
    )
    return wd, metrics


def _decoded(metrics) -> pd.DataFrame:
    triples = rd.read_parquet(os.path.join(metrics["graph_dir"], "triples"))
    terms_df = rd.read_parquet(
        glob.glob(os.path.join(metrics["graph_dir"], "terms", "*.parquet"))
    ).to_pandas()
    return decode_triples(triples, terms_df).to_pandas()


def test_pipeline_structural_and_derived_triples(pipeline_run):
    _, metrics = pipeline_run
    assert metrics["triples"] > 0
    dec = _decoded(metrics)
    src = source_code_table(N_FILES).to_pandas()

    # every input file has its writtenIn triple
    written = dec[dec["p_lex"] == KG_WRITTEN_IN]
    files = set("file:" + src["repo"] + "/" + src["path"])
    assert files <= set(written["s_lex"])

    # transitive contains closure: every file node is contained (possibly
    # through dirs) by its repo node
    contains = dec[dec["p_lex"] == KG_CONTAINS]
    repo_direct = contains[contains["s_lex"].str.startswith("repo:")]
    per_repo = src.assign(f="file:" + src["repo"] + "/" + src["path"], r="repo:" + src["repo"])
    pairs = set(zip(repo_direct["s_lex"], repo_direct["o_lex"]))
    missing = [(r, f) for r, f in zip(per_repo["r"], per_repo["f"]) if (r, f) not in pairs]
    assert not missing

    # type propagation fired
    assert (dec["p_lex"] == RDF_TYPE).any()


def test_pipeline_no_duplicate_triples(pipeline_run):
    _, metrics = pipeline_run
    files = glob.glob(
        os.path.join(metrics["graph_dir"], "triples", "**", "*.parquet"),
        recursive=True,
    )
    df = pq.read_table(files, columns=["subj", "pred", "obj", "sign"]).to_pandas()
    assert not df.duplicated().any()


def test_materialized_store_bucketed_sorted_by_subj_pred(pipeline_run):
    """SURVEY §1.2 layout: triples/bucket=K/ dirs, each pure in subj-hash
    and (subj, pred)-sorted within — a subject's triples are one contiguous
    sorted run inside exactly one bucket."""
    from raydf.canonicalize import _mix_mod

    _, metrics = pipeline_run
    bucket_dirs = sorted(
        glob.glob(os.path.join(metrics["graph_dir"], "triples", "bucket=*"))
    )
    assert bucket_dirs, "expected hive-style bucket=K directories"
    B = max(int(os.path.basename(d).split("=")[1]) for d in bucket_dirs) + 1
    seen_subj_bucket: dict[int, int] = {}
    for d in bucket_dirs:
        k = int(os.path.basename(d).split("=")[1])
        df = pq.read_table(
            sorted(glob.glob(os.path.join(d, "*.parquet"))),
            columns=["subj", "pred"],
        ).to_pandas()
        # bucket purity: every subject hashes to this bucket (so any B' >= B
        # used at read time prunes point lookups to one directory)
        hashes = _mix_mod(df["subj"].to_numpy(), B)
        assert (hashes == k).all()
        key = list(zip(df["subj"], df["pred"]))
        assert key == sorted(key)
        for s in df["subj"].unique():
            assert seen_subj_bucket.setdefault(int(s), k) == k


def test_sha256_invariant_per_row(pipeline_run):
    """Every extraction triple carries sha256 of exactly its source row's
    content (BASELINE.json input_hint per-row invariant)."""
    wd, _ = pipeline_run
    wide = pq.read_table(
        glob.glob(os.path.join(wd, "extracted", "*.parquet")),
        columns=["s_lex", "p_lex", "o_lex", "content_sha256"],
    ).to_pandas()
    src = source_code_table(N_FILES).to_pandas()
    src["sha"] = [hashlib.sha256(c.encode()).hexdigest() for c in src["content"]]
    src["file"] = "file:" + src["repo"] + "/" + src["path"]
    expected = dict(zip(src["file"], src["sha"]))

    written = wide[wide["p_lex"] == KG_WRITTEN_IN]
    assert len(written) == len(src)
    for s_lex, sha in zip(written["s_lex"], written["content_sha256"]):
        assert expected[s_lex] == sha
    # and the full sha set is preserved through extraction
    assert set(wide["content_sha256"].dropna()) == set(src["sha"])


def test_entity_linking_merges_module_and_file(tmp_path):
    """With linking on, module:mod_k sameAs file:.../mod_k.* pairs collapse
    to one canonical resource: after the merge the decoded graph uses one
    lexical for both, so the pair never co-occurs as distinct subjects."""
    wd = str(tmp_path / "linked")
    metrics = kg_pipeline(
        source_code_dataset(60),
        wd,
        link_entities=True,
        buckets=4,
        num_partitions=4,
        max_rounds=8,
        max_generations=2,
    )
    assert metrics["merged_entities"] > 0
    wide = pq.read_table(
        glob.glob(os.path.join(wd, "extracted", "*.parquet")),
        columns=["s_lex", "p_lex", "o_lex"],
    ).to_pandas()
    linked = wide[wide["p_lex"].str.endswith("#sameAs")]
    assert len(linked) > 0
    dec = _decoded(metrics)
    lex_in_graph = set(dec["s_lex"]) | set(dec["o_lex"])
    for a, b in zip(linked["s_lex"], linked["o_lex"]):
        assert not (a in lex_in_graph and b in lex_in_graph), (a, b)


def _decoded_sorted(metrics) -> pd.DataFrame:
    df = _decoded(metrics)[["s_lex", "p_lex", "o_lex", "sign"]]
    return df.sort_values(["s_lex", "p_lex", "o_lex", "sign"]).reset_index(drop=True)


def test_pipeline_joined_canonicalization_matches_broadcast(tmp_path, monkeypatch):
    """Forced-branch equivalence (VERDICT r03 #1): with the broadcast gate
    at 0, the flagship's merge path must run fully as Datasets —
    composition, triple remap, terms remap — with the broadcast remaps
    never called, and produce an identical decoded graph."""
    import raydf.pipeline as pl
    from raydf import canonicalize as cz

    common = dict(link_entities=True, buckets=4, num_partitions=4,
                  max_rounds=8, max_generations=2)
    m_b = kg_pipeline(source_code_dataset(60), str(tmp_path / "bcast"), **common)
    assert m_b["merged_entities"] > 0

    def boom(*a, **k):
        raise AssertionError("broadcast path used on the joined branch")

    monkeypatch.setattr(cz, "MAPPING_BROADCAST_LIMIT", 0)
    monkeypatch.setattr(pl, "remap_triples", boom)
    monkeypatch.setattr(pl, "remap_terms", boom)
    monkeypatch.setattr(pl, "compose_mappings", boom)
    m_j = kg_pipeline(source_code_dataset(60), str(tmp_path / "joined"), **common)
    assert m_j["merged_entities"] == m_b["merged_entities"]
    pd.testing.assert_frame_equal(_decoded_sorted(m_j), _decoded_sorted(m_b))


def test_pipeline_distributed_pairs_matches_broadcast(tmp_path, monkeypatch):
    """Forcing BOTH gates to 0 additionally routes the Eq pair sets through
    distributed min-label propagation (no driver union-find at all); the
    decoded graph must still be identical."""
    import raydf.pipeline as pl
    from raydf import canonicalize as cz

    common = dict(link_entities=True, buckets=4, num_partitions=4,
                  max_rounds=8, max_generations=2)
    m_b = kg_pipeline(source_code_dataset(60), str(tmp_path / "bcast"), **common)

    def boom(*a, **k):
        raise AssertionError("driver union-find called on the distributed branch")

    monkeypatch.setattr(cz, "DRIVER_PAIR_LIMIT", 0)
    monkeypatch.setattr(cz, "MAPPING_BROADCAST_LIMIT", 0)
    monkeypatch.setattr(cz, "canonical_mapping_driver", boom)
    monkeypatch.setattr(pl, "remap_triples", boom)
    monkeypatch.setattr(pl, "remap_terms", boom)
    monkeypatch.setattr(pl, "compose_mappings", boom)
    m_j = kg_pipeline(source_code_dataset(60), str(tmp_path / "dist"), **common)
    assert m_j["merged_entities"] == m_b["merged_entities"] > 0
    pd.testing.assert_frame_equal(_decoded_sorted(m_j), _decoded_sorted(m_b))


def test_resume_skips_completed_stages(pipeline_run):
    wd, metrics = pipeline_run
    m2 = kg_pipeline(
        source_code_dataset(N_FILES),
        wd,
        link_entities=False,
        buckets=4,
        num_partitions=4,
        max_rounds=8,
        max_generations=2,
    )
    assert m2["triples"] == metrics["triples"]
    # completed extraction was not recomputed: _DONE marker untouched and
    # stage wall time is near-zero on resume
    assert m2["stages"]["extract"] < 1.0
    # fixpoint rounds were replayed from the manifest, not recomputed
    assert [r["round"] for r in m2["rounds"]] == [r["round"] for r in metrics["rounds"]]


def test_lineage_columns_present(pipeline_run):
    wd, metrics = pipeline_run
    gen0 = glob.glob(os.path.join(wd, "gen*", "triples", "round-*", "**", "*.parquet"),
                     recursive=True)
    df = pq.read_table(gen0, columns=["rule_idx", "round"]).to_pandas()
    stated = df[df["round"] == 0]
    derived = df[df["round"] > 0]
    assert stated["rule_idx"].isna().all()          # Cause::Stated
    assert len(derived) and derived["rule_idx"].notna().all()  # Cause::Entailed

    # per-round metrics recorded in the manifest
    man = json.load(open(glob.glob(os.path.join(wd, "gen*", "MANIFEST.json"))[0]))
    assert all("seconds" in r and "new_triples" in r for r in man["rounds"])


def test_decode_join_path_matches_broadcast(ray_session):
    """The 3x hash-join decode (engine-scale dictionaries) must reproduce
    the broadcast decode exactly."""
    import ray.data as rd

    from raydf import rules as R
    from raydf.fixtures import triples_from_terms
    from raydf.materialize import decode_triples

    def _iri(s):
        return R.iri(f"https://example.org/{s}")

    rows = [
        (_iri("a"), _iri("p"), _iri("b")),
        (_iri("b"), _iri("p"), _iri("c")),
        (_iri("c"), _iri("q"), _iri("a")),
    ]
    triples, terms_tbl = triples_from_terms(rows)
    tds = rd.from_arrow(triples).materialize()
    terms_df = terms_tbl.to_pandas()

    via_bcast = (
        decode_triples(tds, terms_df)
        .to_pandas()
        .sort_values(["s_lex", "p_lex", "o_lex"])
        .reset_index(drop=True)
    )
    via_join = (
        decode_triples(tds, rd.from_arrow(terms_tbl))
        .to_pandas()
        .sort_values(["s_lex", "p_lex", "o_lex"])
        .reset_index(drop=True)
    )
    import pandas as pd

    pd.testing.assert_frame_equal(
        via_join[["s_lex", "p_lex", "o_lex", "sign"]],
        via_bcast[["s_lex", "p_lex", "o_lex", "sign"]],
    )
    assert len(via_join) == 3


def test_resume_refuses_mismatched_format(tmp_path):
    """A workdir stamped by a different id scheme must refuse to resume
    (silent resume would mix term-id schemes across stages — ADVICE r02)."""
    import pytest

    from raydf.pipeline import _check_workdir_format

    d = tmp_path / "wd_v1"
    d.mkdir()
    (d / "_FORMAT").write_text("1:blake2b-low64")
    with pytest.raises(RuntimeError, match="engine format"):
        _check_workdir_format(str(d))

    # unstamped dir with a completed stage = legacy → also refused
    d2 = tmp_path / "wd_legacy"
    (d2 / "extracted").mkdir(parents=True)
    (d2 / "extracted" / "_DONE").write_text("ok")
    with pytest.raises(RuntimeError, match="predates format stamping"):
        _check_workdir_format(str(d2))

    # fresh dir gets stamped and re-checks clean
    d3 = tmp_path / "wd_fresh"
    d3.mkdir()
    _check_workdir_format(str(d3))
    _check_workdir_format(str(d3))  # idempotent


def test_materialize_staged_matches_sort_exchange(tmp_path, monkeypatch, ray_session):
    """The staged bucket write (default) and the groupby sort-exchange
    control (RAYDF_SORT_EXCHANGE=1) must produce byte-equivalent stores:
    same bucket assignment, same within-bucket (subj,pred) order, same
    decoded triple set, same _BUCKETS contract."""
    import pyarrow as pa

    from raydf.materialize import materialize_graph, read_graph, store_buckets

    rng = np.random.default_rng(3)
    n = 5_000
    triples = pa.table(
        {
            "subj": pa.array(rng.integers(-2**62, 2**62, n), pa.int64()),
            "pred": pa.array(rng.integers(1, 9, n), pa.int64()),
            "obj": pa.array(rng.integers(-2**62, 2**62, n), pa.int64()),
            "sign": pa.array(rng.integers(0, 2, n).astype(bool)),
        }
    )
    terms = pa.table(
        {"term_id": pa.array(np.arange(10, dtype=np.int64)),
         "lexical": pa.array([f"t{i}" for i in range(10)])}
    )
    outs = {}
    for name, env in (("staged", "0"), ("exchange", "1")):
        monkeypatch.setenv("RAYDF_SORT_EXCHANGE", env)
        out = str(tmp_path / name)
        materialize_graph(
            rd.from_arrow(triples), rd.from_arrow(terms), out,
            min_rows_per_file=700, sort_buckets=8,
        )
        assert store_buckets(out) == 8
        dfs = []
        for d in sorted(glob.glob(os.path.join(out, "triples", "bucket=*"))):
            k = int(os.path.basename(d).split("=")[1])
            df = pq.read_table(
                sorted(glob.glob(os.path.join(d, "*.parquet")))
            ).to_pandas()
            key = list(zip(df["subj"], df["pred"]))
            assert key == sorted(key), f"bucket {k} not (subj,pred)-sorted"
            df["bucket"] = k
            dfs.append(df)
        outs[name] = (
            pd.concat(dfs)
            .sort_values(["bucket", "subj", "pred", "obj", "sign"])
            .reset_index(drop=True)
        )
        assert read_graph(out).count() == n
    pd.testing.assert_frame_equal(
        outs["staged"][["bucket", "subj", "pred", "obj", "sign"]],
        outs["exchange"][["bucket", "subj", "pred", "obj", "sign"]],
    )
