"""raydf — a Ray-Data-native knowledge-graph construction & RDF deduction engine.

Re-implements, from scratch and Ray-Data-first, the query/deduction
capabilities of the reference engine ``spruceid/inferdf-rs``
(/root/reference, a single-threaded in-memory Rust library): signed triple
datasets, conjunctive rule hypotheses (non-linear triple patterns),
forward-chaining deduction to fixpoint, expression evaluation
(boolean/decimal/string/regex literals), validation, and Eq-merge entity
canonicalization — plus the source-code → triple extraction front-end and
the large-scale training-data operators (dedup, similarity search, text
analysis) the reference lacks.

Everything is expressed over ``ray.data.Dataset`` pipelines: zero-copy
Arrow ``map_batches`` for per-record work, hash joins / groupby shuffles
for the wide steps, actor pools for stateful stages, Parquet checkpoints
for resumability.
"""

def _stabilize_fsspec_http() -> None:
    """Make ``fsspec.implementations.http`` import race-free.

    Ray Data's path resolution re-attempts ``from fsspec.implementations.http
    import HTTPFileSystem`` on EVERY read/write. Without ``aiohttp`` the
    submodule fails mid-import and is removed from ``sys.modules``, so two
    threads driving Datasets concurrently can race: one observes the other's
    partially-initialized module and raises a plain ``ImportError`` that
    Ray's ``except ModuleNotFoundError`` does not catch. Installing a stable
    stub (whose sentinel class matches nothing) keeps the semantics — no
    HTTP filesystem can exist without aiohttp — and removes the race."""
    try:
        from fsspec.implementations.http import HTTPFileSystem  # noqa: F401
    except ImportError:
        import sys
        import types

        stub = types.ModuleType("fsspec.implementations.http")

        class HTTPFileSystem:  # isinstance() sentinel only
            def __init__(self, *a, **kw):
                # keep the original failure mode visible: constructing the
                # filesystem (fsspec registry hit on a real http:// URL)
                # fails exactly like the absent dependency would
                raise ImportError("aiohttp is required for HTTPFileSystem")

        stub.HTTPFileSystem = HTTPFileSystem
        sys.modules["fsspec.implementations.http"] = stub
        # make plain `import fsspec.implementations.http` + attribute
        # access resolve to the stub too
        import fsspec.implementations as _fsspec_impl

        setattr(_fsspec_impl, "http", stub)


_stabilize_fsspec_http()

from raydf import schema, terms
from raydf.rules import Rule, System, load_system, parse_rule
from raydf.deduce import FixpointEngine
from raydf.pipeline import kg_pipeline

__all__ = [
    "schema",
    "terms",
    "Rule",
    "System",
    "load_system",
    "parse_rule",
    "FixpointEngine",
    "kg_pipeline",
]
