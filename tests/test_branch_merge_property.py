"""Property test: a branch READ always equals the post-MERGE main read.

Round 10's rebase-across-equality-delete case caught state_at_branch
folding chain files at write-time seq while merge_branch re-stamps
them — one concrete sequence where the branch read and the published
result disagreed. This generalizes that single example: hypothesis
drives random interleavings of main appends / equality deletes / COW
deletes / overwrites with branch appends / COW deletes and mid-stream
rebases, then asserts the Nessie promise the fix established — after
re-anchoring the branch at main's head (base current, the documented
drop_conflicting recovery flow), what you READ on the branch is
exactly what merging PUBLISHES.

Sequences are kept short (Spark commits are ~0.3 s each) but the op
mix covers every visibility mechanism that feeds the fold: data file
add/remove, content=2 tombstones with seq gating, whole-state
overwrite claims, and base moves.
"""

from __future__ import annotations

import tempfile

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from local_datalakehouse_phase2_spark.lakehouse import (
    CommitConflictError,
    Lakehouse,
    merge_branch,
    rebase_branch,
)

# (op, key) — keys from a small domain so deletes actually hit rows
_OPS = st.tuples(
    st.sampled_from(
        [
            "main_append",
            "branch_append",
            "main_eqdel",
            "main_cowdel",
            "branch_cowdel",
            "main_overwrite",
            "rebase",
        ]
    ),
    st.integers(min_value=0, max_value=6),
)


def _rows(df):
    return {tuple(r) for r in df.collect()}


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(ops=st.lists(_OPS, min_size=1, max_size=6))
def test_branch_read_equals_merge_publish(spark, ops):
    tag = iter(range(10_000))

    def df(*rows):
        return spark.createDataFrame(list(rows), "k bigint, v string")

    lake = Lakehouse(spark, tempfile.mkdtemp(prefix="branch_prop_"))
    lake.create_namespace("lab")
    t = lake.create_table("lab.t", schema="k bigint, v string")
    t.append(df((0, "seed0"), (1, "seed1")).coalesce(1))
    t.create_branch("dev")

    for op, k in ops:
        v = f"{op[:1]}{next(tag)}"
        try:
            if op == "main_append":
                t.append(df((k, v)))
            elif op == "branch_append":
                t.append(df((k, v)), ref="dev")
            elif op == "main_eqdel":
                t.equality_delete(spark.createDataFrame([(k,)], "k bigint"), ["k"])
            elif op == "main_cowdel":
                t.delete_where(f"k = {k}", mode="copy-on-write")
            elif op == "branch_cowdel":
                t.delete_where(f"k = {k}", mode="copy-on-write", ref="dev")
            elif op == "main_overwrite":
                t.overwrite(df((k, v)))
            elif op == "rebase":
                rebase_branch(t, "dev", drop_conflicting=True)
        except CommitConflictError:
            # a legal mid-sequence refusal (e.g. branch COW delete
            # racing a main rewrite of the same files) — the property
            # is about whatever state results, not about op success
            pass

    # The promise is conditional on a CURRENT base: a branch read folds
    # main only to its fork base by design (hypothesis's minimal
    # counterexample to the unconditional form is a single main append
    # after the fork — merge of the empty chain is a no-op while main
    # moved on). So re-anchor at main's head first; from there the
    # branch view must be exactly what merge publishes.
    rebase_branch(t, "dev", drop_conflicting=True)
    expected = _rows(t.read(ref="dev"))
    merge_branch(t, "dev")
    assert _rows(t.read()) == expected


# r17 (VERDICT item 2a): heavy suite — excluded from the default
# driver-contract run by pytest.ini's `-m "not slow"`; the builder
# gate runs `pytest -m slow` so coverage is unchanged, only WHERE
# it runs moved.
import pytest as _pytest_r17

pytestmark = _pytest_r17.mark.slow
