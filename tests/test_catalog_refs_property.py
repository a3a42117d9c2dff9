"""Property test for catalog-wide refs: the Nessie promise at catalog
scope — after a rebase to current main, what you READ on the catalog
branch (on EVERY table) is exactly what merge_catalog_branch
PUBLISHES, and tables the branch never wrote are untouched by the
merge.

tests/test_branch_merge_property.py proves the read/merge agreement
for one table's branch; this drives random interleavings ACROSS two
tables — branch writes, main writes, whole catalog rebases, even
mid-sequence merges — where the new failure modes live: per-table pins
drifting apart, the lazy member-branch fork picking the wrong anchor,
merge publishing one table's chain but not another's, reanchor after a
mid-sequence merge corrupting a later one.

Invariants asserted after every generated sequence:
1. rebase-then-read == merge-then-read, per table (the per-table
   promise, composed);
2. the merge changes NO table outside the branch's written set;
3. after the merge the branch view equals main for every pinned table
   (the branch is freshly re-anchored: nothing pending).
"""

from __future__ import annotations

import tempfile
import time

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from local_datalakehouse_phase2_spark.lakehouse import (
    CommitConflictError,
    Lakehouse,
)

_OPS = st.tuples(
    st.sampled_from(
        [
            "branch_append_t1",
            "branch_append_t2",
            "main_append_t1",
            "main_append_t2",
            "main_overwrite_t1",
            "branch_cowdel_t1",
            "rebase",
            "merge",
        ]
    ),
    st.integers(min_value=0, max_value=6),
)


def _rows(df):
    return {tuple(r) for r in df.collect()}


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(ops=st.lists(_OPS, min_size=1, max_size=6))
def test_catalog_branch_read_equals_catalog_merge_publish(spark, ops):
    tag = iter(range(10_000))

    def df(*rows):
        return spark.createDataFrame(list(rows), "k bigint, v string")

    lake = Lakehouse(spark, tempfile.mkdtemp(prefix="catref_prop_"))
    lake.create_namespace("lab")
    for ident in ("lab.t1", "lab.t2"):
        t = lake.create_table(ident, schema="k bigint, v string")
        t.append(df((0, "seed0"), (1, "seed1")).coalesce(1))
    lake.create_branch("etl")

    for op, k in ops:
        v = f"{op[:1]}{next(tag)}"
        try:
            if op == "branch_append_t1":
                lake.append("lab.t1", df((k, v)), catalog_ref="etl")
            elif op == "branch_append_t2":
                lake.append("lab.t2", df((k, v)), catalog_ref="etl")
            elif op == "main_append_t1":
                lake.table("lab.t1").append(df((k, v)))
            elif op == "main_append_t2":
                lake.table("lab.t2").append(df((k, v)))
            elif op == "main_overwrite_t1":
                lake.table("lab.t1").overwrite(df((k, v)))
            elif op == "branch_cowdel_t1":
                lake.delete_where("lab.t1", f"k = {k}", catalog_ref="etl")
            elif op == "rebase":
                lake.rebase_catalog_branch("etl", drop_conflicting=True)
            elif op == "merge":
                lake.merge_catalog_branch("etl")
        except CommitConflictError:
            # a legal mid-sequence refusal (branch work conflicting
            # with a main rewrite) — the property is about whatever
            # state results, not about op success
            pass

    # which tables does the branch currently hold unpublished work on?
    written = {
        ident
        for ident in ("lab.t1", "lab.t2")
        if "catalog.etl" in lake.table(ident).log.refs()
        and lake.table(ident).log.branch_info("catalog.etl")[2]
    }

    # 1+2: rebase to current main, capture the branch view and the
    # untouched-main view, merge, compare
    lake.rebase_catalog_branch("etl", drop_conflicting=True)
    expected_branch = {
        ident: _rows(lake.read(ident, catalog_ref="etl"))
        for ident in ("lab.t1", "lab.t2")
    }
    main_before = {
        ident: _rows(lake.read(ident)) for ident in ("lab.t1", "lab.t2")
    }
    lake.merge_catalog_branch("etl")
    for ident in ("lab.t1", "lab.t2"):
        got_main = _rows(lake.read(ident))
        assert got_main == expected_branch[ident], (
            f"{ident}: merge published {sorted(got_main)} but the "
            f"rebased branch read was {sorted(expected_branch[ident])}"
        )
        if ident not in written:
            assert got_main == main_before[ident], (
                f"{ident}: merge changed a table the branch never wrote"
            )
        # 3: freshly re-anchored branch view equals main
        assert _rows(lake.read(ident, catalog_ref="etl")) == got_main


_TAG_OPS = st.lists(
    st.tuples(
        st.sampled_from(
            [
                "append_t1",
                "append_t2",
                "overwrite_t1",
                "cowdel_t1",
                "mordel_t2",
                "compact_t1",
                "expire",
                "branch_churn",
            ]
        ),
        st.integers(min_value=0, max_value=6),
    ),
    min_size=1,
    max_size=8,
)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(ops=_TAG_OPS)
def test_tag_reads_survive_random_churn(spark, ops):
    """The catalog tag promise, property-tested: after ANY sequence of
    main-side appends/overwrites/deletes/compactions/expiry and
    catalog-branch churn, every table's read THROUGH the tag is
    byte-identical to its content at tag time (the reproducible-
    training-run pin; expiry must never collect a pinned snapshot,
    maintenance must never rewrite it away)."""
    import pyspark.sql.functions as F

    from local_datalakehouse_phase2_spark.lakehouse import (
        expire_snapshots,
        rewrite_data_files,
    )

    with tempfile.TemporaryDirectory(prefix="tagprop_") as root:
        lake = Lakehouse(spark, root)
        lake.create_namespace("lab")
        t1 = lake.create_table("lab.p1", schema="k bigint, v string")
        t2 = lake.create_table("lab.p2", schema="k bigint, v string")

        def df(lo, n=3, tag="x"):
            return spark.range(lo, lo + n).select(
                F.col("id").alias("k"),
                F.concat(F.lit(tag), F.col("id")).alias("v"),
            )

        t1.append(df(0))
        t2.append(df(100))
        lake.create_tag("train")
        want1 = _rows(lake.read("lab.p1", catalog_ref="train"))
        want2 = _rows(lake.read("lab.p2", catalog_ref="train"))

        seq = 1000
        for op, _arg in ops:
            if op == "append_t1":
                t1.append(df(seq)); seq += 10
            elif op == "append_t2":
                t2.append(df(seq)); seq += 10
            elif op == "overwrite_t1":
                t1.overwrite(df(seq)); seq += 10
            elif op == "cowdel_t1":
                t1.delete_where("k >= 0", mode="copy-on-write")
            elif op == "mordel_t2":
                t2.delete_where("k >= 100 AND k < 103", mode="merge-on-read")
            elif op == "compact_t1":
                rewrite_data_files(t1, min_input_files=1)
            elif op == "expire":
                expire_snapshots(t1, retain_last=1, older_than=time.time() + 60)
                expire_snapshots(t2, retain_last=1, older_than=time.time() + 60)
            elif op == "branch_churn":
                name = f"etl{seq}"
                lake.create_branch(name)
                lake.append("lab.p1", df(seq, tag="b"), catalog_ref=name)
                lake.merge_catalog_branch(name)
                lake.drop_branch(name)
                seq += 10
            # the pin holds after EVERY op, not just at the end
            assert _rows(lake.read("lab.p1", catalog_ref="train")) == want1
            assert _rows(lake.read("lab.p2", catalog_ref="train")) == want2


# r17 (VERDICT item 2a): heavy suite — excluded from the default
# driver-contract run by pytest.ini's `-m "not slow"`; the builder
# gate runs `pytest -m slow` so coverage is unchanged, only WHERE
# it runs moved.
import pytest as _pytest_r17

pytestmark = _pytest_r17.mark.slow
