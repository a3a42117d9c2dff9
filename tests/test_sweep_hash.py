"""Change-aware sweep hashing must see through shared helpers.

Round-8 escape: commit f91556a changed `minhash_lsh_pairs`' execution
plan via the module-level helper `_has_shingles`, but the sweep sidecar
hashed only the registered callable, so the dependent queries kept their
stale green rank and the driver skipped re-sweeping them. These tests
pin the fix (`registry._closure_sources`): a no-op edit to a helper a
query references flips that query's hash (=> rank 0 at next load),
while queries that don't reference the helper keep their hash.
"""

from __future__ import annotations

import importlib.util
import sys
import textwrap

from local_datalakehouse_phase2_spark import registry
from local_datalakehouse_phase2_spark.operators import text
from local_datalakehouse_phase2_spark.registry import (
    QuerySpec,
    _closure_sources,
    _source_hashes,
)

MODULE_V1 = textwrap.dedent(
    """
    def helper(x):
        return x + 1

    def deep_helper(x):
        return x * 2

    def mid_helper(x):
        return deep_helper(x)

    def query_uses_helper(spark, sf_dir):
        return helper(3)

    def query_transitive(spark, sf_dir):
        return mid_helper(3)

    def query_lambda(spark, sf_dir):
        f = lambda v: helper(v)
        return f(1)

    def query_independent(spark, sf_dir):
        return 42
    """
)

# Identical query bodies; only the HELPER bodies differ (a comment — the
# kind of "no-op" edit the done-criterion names, plus a real change in
# deep_helper to exercise transitivity).
MODULE_V2 = MODULE_V1.replace(
    "def helper(x):\n    return x + 1",
    "def helper(x):\n    # tweaked\n    return x + 1",
).replace(
    "def deep_helper(x):\n    return x * 2",
    "def deep_helper(x):\n    return x * 2 + 0",
)


def _load(tmp_path, name: str, body: str):
    tmp_path.mkdir(parents=True, exist_ok=True)
    p = tmp_path / f"{name}.py"
    p.write_text(body)
    spec = importlib.util.spec_from_file_location(name, p)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def _hashes(mod) -> dict[str, str]:
    reg = {
        n: QuerySpec(name=n, fn=getattr(mod, n))
        for n in (
            "query_uses_helper",
            "query_transitive",
            "query_lambda",
            "query_independent",
        )
    }
    # pkg override: the temp modules aren't inside the real package, so
    # scope the same-package walk to the temp module itself.
    import hashlib

    return {
        n: hashlib.md5(
            (_closure_sources(s.fn, pkg=mod.__name__) or n).encode()
        ).hexdigest()
        for n, s in reg.items()
    }


def test_helper_edit_flips_dependent_hashes(tmp_path):
    v1 = _hashes(_load(tmp_path / "a", "m_v1", MODULE_V1))
    v2 = _hashes(_load(tmp_path / "b", "m_v2", MODULE_V2))
    # direct reference: flipped
    assert v1["query_uses_helper"] != v2["query_uses_helper"]
    # transitive reference (query -> mid_helper -> deep_helper): flipped
    assert v1["query_transitive"] != v2["query_transitive"]
    # helper referenced only inside a lambda (nested code object): flipped
    assert v1["query_lambda"] != v2["query_lambda"]
    # no reference: NOT flipped — helper edits must not flood rank 0
    assert v1["query_independent"] == v2["query_independent"]


def test_real_registry_hash_sees_has_shingles():
    """The exact round-8 escape: dedup queries must hash in
    `_has_shingles` (and the pipeline helpers between)."""
    from local_datalakehouse_phase2_spark.operators import dedup

    src = _closure_sources(dedup.minhash_lsh_pairs)
    assert "def _has_shingles" in src
    assert "def minhash_lsh_pairs" in src
    # and a text query pulls in its shared tokenizer
    assert "def tokens_col" in _closure_sources(text.token_frequency)


def test_source_hashes_cover_registry():
    specs = registry.all_specs()
    hashes = _source_hashes(specs)
    assert set(hashes) == set(specs)
    assert all(len(h) == 32 for h in hashes.values())


def test_scheme_migration_rebootstraps(tmp_path, monkeypatch):
    """An old-scheme sidecar is discarded wholesale (its hashes are
    incomparable), re-trusted at round 0, and stamped with the scheme."""
    import json
    import os

    # point the rank loader at an isolated root with a v1-style sidecar
    fake_root = tmp_path / "repo"
    pkg_dir = fake_root / "pkg"
    pkg_dir.mkdir(parents=True)
    sidecar = fake_root / "SWEEP_HASHES.json"
    sidecar.write_text(json.dumps({"some_query": {"hash": "deadbeef", "round": 5}}))

    real_abspath = os.path.abspath

    def fake_abspath(p):
        if p == registry.__file__:
            return str(pkg_dir / "registry.py")
        return real_abspath(p)

    monkeypatch.setattr(os.path, "abspath", fake_abspath)
    try:
        registry._sweep_rank()
    finally:
        monkeypatch.undo()
    data = json.loads(sidecar.read_text())
    assert data["__scheme__"] == registry._HASH_SCHEME
    # old-scheme entry replaced by current-scheme entries trusted at round 0
    assert data.get("some_query", {}).get("hash") != "deadbeef"
