"""Runbook replay through the SQL surface (lakehouse/sql.py).

Drives the reference guide's §3-§8 sequence with the guide's OWN
statement text (/root/reference/SPARK_ICEBERG_GUIDE.md:80-340) —
namespace/table DDL, small-file explosion, metadata-table checks,
compaction, snapshot expiry, orphan sweep, rollback/time travel — and
asserts the same post-conditions tests/test_lakehouse.py checks via
the Python API.
"""

from __future__ import annotations

import time

import pytest

from local_datalakehouse_phase2_spark.lakehouse import Lakehouse, LakehouseSQL, SqlError


@pytest.fixture()
def lsql(spark, tmp_path) -> LakehouseSQL:
    return LakehouseSQL(Lakehouse(spark, str(tmp_path / "wh")), catalog_name="nessie")


def test_runbook_replay(lsql):
    # §3 namespace
    lsql.sql(
        "CREATE NAMESPACE IF NOT EXISTS nessie.lab WITH PROPERTIES ('comment'='lab namespace');"
    )
    assert [r.namespace for r in lsql.sql("SHOW NAMESPACES IN nessie").collect()] == ["lab"]
    ns = lsql.sql("DESCRIBE NAMESPACE EXTENDED nessie.lab").collect()
    assert ("Property: comment", "lab namespace") in [tuple(r) for r in ns]

    # §4 table tuned for small files
    lsql.sql(
        """
        CREATE TABLE IF NOT EXISTS nessie.lab.small_files (
          id BIGINT,
          name STRING
        ) USING iceberg
        TBLPROPERTIES (
          'format-version'='2',
          'write.target-file-size-bytes'='65536',  -- ~64KB target
          'write.distribution-mode'='none'         -- minimal shuffling
        );
        """
    )
    assert [r.tableName for r in lsql.sql("SHOW TABLES IN nessie.lab").collect()] == [
        "small_files"
    ]

    # §5 initial rows + snapshot inspection
    lsql.sql("INSERT INTO nessie.lab.small_files VALUES (1,'alice'), (2,'bob'), (3,'charlie');")
    rows = lsql.sql("SELECT * FROM nessie.lab.small_files ORDER BY id").collect()
    assert [(r.id, r.name) for r in rows] == [(1, "alice"), (2, "bob"), (3, "charlie")]
    snaps = lsql.sql(
        """
        SELECT snapshot_id, committed_at, operation
        FROM nessie.lab.small_files.snapshots
        ORDER BY committed_at DESC;
        """
    ).collect()
    assert snaps[0].operation == "append"

    # §6 small-file explosion: appends + generator + tiny partitions
    lsql.sql("INSERT INTO nessie.lab.small_files VALUES (4,'d'),(5,'e'),(6,'f');")
    lsql.sql(
        """
        INSERT INTO nessie.lab.small_files
        SELECT id, CONCAT('name_', CAST(id AS STRING))
        FROM RANGE(7, 200);
        """
    )
    lsql.sql("SET spark.sql.shuffle.partitions=4;")
    lsql.sql(
        """
        INSERT INTO nessie.lab.small_files
        SELECT id, CONCAT('bulk_', CAST(id AS STRING))
        FROM RANGE(200, 1000);
        """
    )
    n_rows = lsql.sql("SELECT COUNT(*) AS n FROM nessie.lab.small_files").first().n
    assert n_rows == 999

    # §7 verify explosion via the .files metadata table
    files_before = lsql.sql(
        """
        SELECT COUNT(*) AS data_files,
               CAST(SUM(file_size_in_bytes) AS BIGINT) AS total_bytes
        FROM nessie.lab.small_files.files
        WHERE content = 0;
        """
    ).first()
    assert files_before.data_files >= 4
    assert files_before.total_bytes > 0
    tiniest = lsql.sql(
        """
        SELECT file_path, file_size_in_bytes
        FROM nessie.lab.small_files.files
        WHERE content = 0
        ORDER BY file_size_in_bytes ASC
        LIMIT 10;
        """
    ).collect()
    assert len(tiniest) > 0

    # §8.2 enable GC
    lsql.sql("ALTER TABLE nessie.lab.small_files SET TBLPROPERTIES ('gc.enabled'='true');")

    # §8.3 compaction
    res = lsql.sql(
        """
        CALL nessie.system.rewrite_data_files(
          table => 'lab.small_files',
          options => map(
            'target-file-size-bytes','134217728',
            'min-input-files','1',
            'max-concurrent-file-group-rewrites','4',
            'partial-progress.enabled','true'
          )
        );
        """
    ).first()
    assert res.rewritten_files == files_before.data_files
    files_after = (
        lsql.sql("SELECT COUNT(*) AS n FROM nessie.lab.small_files.files WHERE content = 0")
        .first()
        .n
    )
    assert files_after < files_before.data_files
    assert lsql.sql("SELECT COUNT(*) AS n FROM nessie.lab.small_files").first().n == 999

    # §8.4 manifest compaction
    assert lsql.sql(
        "CALL nessie.system.rewrite_manifests(table => 'lab.small_files');"
    ).first().checkpoint_version is not None

    # §8.5 expire old snapshots
    before = lsql.sql("SELECT COUNT(*) AS n FROM nessie.lab.small_files.snapshots").first().n
    exp = lsql.sql(
        "CALL nessie.system.expire_snapshots(table => 'lab.small_files', retain_last => 2);"
    ).first()
    assert exp.expired_snapshots == before - 2
    assert (
        lsql.sql("SELECT COUNT(*) AS n FROM nessie.lab.small_files.snapshots").first().n == 2
    )

    # §8.6 orphan sweep: young files survive the 24h floor
    orph = lsql.sql(
        "CALL nessie.system.remove_orphan_files(table => 'lab.small_files');"
    ).first()
    assert orph.deleted_files == 0
    # a cutoff younger than 24h must refuse (guide :274)
    with pytest.raises(Exception, match="24h"):
        ts = time.strftime("%Y-%m-%d %H:%M:%S", time.gmtime(time.time() + 3600))
        lsql.sql(
            "CALL nessie.system.remove_orphan_files("
            f"table => 'lab.small_files', older_than => TIMESTAMP '{ts}');"
        )

    # §8.7 diagnostics
    by_content = lsql.sql(
        """
        SELECT content, COUNT(*) AS files
        FROM nessie.lab.small_files.files
        GROUP BY content;
        """
    ).collect()
    assert [r.content for r in by_content] == [0]  # COW: data files only
    desc = lsql.sql("DESCRIBE TABLE EXTENDED nessie.lab.small_files").collect()
    props = {r.col_name: r.data_type for r in desc}
    assert props.get("Property: gc.enabled") == "true"

    # §8.8 rollback / time travel
    head = lsql.sql(
        "SELECT snapshot_id FROM nessie.lab.small_files.snapshots "
        "ORDER BY committed_at DESC LIMIT 1"
    ).first().snapshot_id
    lsql.sql("INSERT INTO nessie.lab.small_files VALUES (9999,'extra');")
    assert lsql.sql("SELECT COUNT(*) AS n FROM nessie.lab.small_files").first().n == 1000
    rb = lsql.sql(
        "CALL nessie.system.rollback_to_snapshot("
        f"table => 'lab.small_files', snapshot_id => {head});"
    ).first()
    assert rb.rolled_back_to == head
    assert lsql.sql("SELECT COUNT(*) AS n FROM nessie.lab.small_files").first().n == 999
    # time travel still sees the pre-rollback row
    n_tt = (
        lsql.sql(
            f"SELECT COUNT(*) AS n FROM nessie.lab.small_files VERSION AS OF {head + 1}"
        )
        .first()
        .n
    )
    assert n_tt == 1000

    # §8.9 recommended properties
    lsql.sql(
        """
        ALTER TABLE nessie.lab.small_files SET TBLPROPERTIES (
          'write.target-file-size-bytes'='134217728',
          'write.distribution-mode'='hash',
          'gc.enabled'='true'
        );
        """
    )

    # §8.10 post-maintenance sanity
    sanity = lsql.sql(
        """
        SELECT
          SUM(CASE WHEN content=0 THEN 1 ELSE 0 END) AS data_files,
          SUM(CASE WHEN content=1 THEN 1 ELSE 0 END) AS pos_delete_files,
          SUM(CASE WHEN content=2 THEN 1 ELSE 0 END) AS eq_delete_files
        FROM nessie.lab.small_files.files;
        """
    ).first()
    assert sanity.pos_delete_files == 0 and sanity.eq_delete_files == 0


def test_timestamp_as_of_and_delete(lsql):
    lsql.sql("CREATE NAMESPACE nessie.lab2")
    lsql.sql("CREATE TABLE nessie.lab2.t (k BIGINT, v STRING)")
    lsql.sql("INSERT INTO nessie.lab2.t VALUES (1,'a'),(2,'b'),(3,'c')")
    # strftime floors to whole seconds, so pick a point strictly after
    # the first insert's commit and strictly before the second's
    mid = time.time() + 1.0
    time.sleep(2.5)
    lsql.sql("INSERT INTO nessie.lab2.t VALUES (4,'d')")
    ts = time.strftime("%Y-%m-%d %H:%M:%S", time.gmtime(mid))
    n_then = (
        lsql.sql(f"SELECT COUNT(*) AS n FROM nessie.lab2.t TIMESTAMP AS OF '{ts}'").first().n
    )
    assert n_then == 3
    lsql.sql("DELETE FROM nessie.lab2.t WHERE k % 2 = 0")
    assert lsql.sql("SELECT COUNT(*) AS n FROM nessie.lab2.t").first().n == 2

    # joins across a lakehouse table and an ordinary derived relation
    joined = lsql.sql(
        """
        SELECT a.k, a.v, b.k2
        FROM nessie.lab2.t a
        JOIN (SELECT id AS k2 FROM RANGE(0, 10)) b ON a.k = b.k2
        ORDER BY a.k
        """
    ).collect()
    assert [r.k for r in joined] == [1, 3]


def test_alter_add_column_and_describe(lsql):
    lsql.sql("CREATE NAMESPACE nessie.lab3")
    lsql.sql("CREATE TABLE nessie.lab3.t (k BIGINT)")
    lsql.sql("INSERT INTO nessie.lab3.t VALUES (1),(2)")
    lsql.sql("ALTER TABLE nessie.lab3.t ADD COLUMN score DOUBLE")
    rows = lsql.sql("SELECT k, score FROM nessie.lab3.t ORDER BY k").collect()
    assert [(r.k, r.score) for r in rows] == [(1, None), (2, None)]
    desc = lsql.sql("DESCRIBE TABLE nessie.lab3.t").collect()
    assert [(r.col_name, r.data_type) for r in desc[:2]] == [
        ("k", "bigint"),
        ("score", "double"),
    ]


def test_errors(lsql):
    lsql.sql("CREATE NAMESPACE nessie.lab4")
    lsql.sql("CREATE TABLE nessie.lab4.t (k BIGINT)")
    with pytest.raises(SqlError, match="unknown catalog"):
        lsql.sql("INSERT INTO other.lab4.t VALUES (1)")
    with pytest.raises(SqlError, match="missing table"):
        lsql.sql("CALL nessie.system.expire_snapshots(retain_last => 2)")
    with pytest.raises(SqlError, match="unknown procedure"):
        lsql.sql("CALL nessie.system.frobnicate(table => 'lab4.t')")
    with pytest.raises(SqlError, match="columns"):
        lsql.sql("INSERT INTO nessie.lab4.t VALUES (1, 'extra')")
    # DROP honors IF EXISTS
    assert lsql.sql("DROP TABLE IF EXISTS nessie.lab4.nope").first().dropped is False
    assert lsql.sql("DROP TABLE nessie.lab4.t").first().dropped is True


def test_update_statement_cow(lsql):
    lsql.sql("CREATE NAMESPACE nessie.upd")
    lsql.sql("CREATE TABLE nessie.upd.t (k BIGINT, v STRING, n BIGINT)")
    lsql.sql("INSERT INTO nessie.upd.t VALUES (1, 'a', 10), (2, 'b', 20), (3, 'c', 30)")
    lsql.sql("UPDATE nessie.upd.t SET v = upper(v), n = n + 100 WHERE k >= 2")
    got = {r.k: (r.v, r.n) for r in lsql.sql("SELECT * FROM nessie.upd.t").collect()}
    assert got == {1: ("a", 10), 2: ("B", 120), 3: ("C", 130)}
    # assignments see the PRE-update row (SQL swap semantics)
    lsql.sql("CREATE TABLE nessie.upd.swap (a BIGINT, b BIGINT)")
    lsql.sql("INSERT INTO nessie.upd.swap VALUES (1, 2)")
    lsql.sql("UPDATE nessie.upd.swap SET a = b, b = a WHERE a = 1")
    assert [tuple(r) for r in lsql.sql("SELECT a, b FROM nessie.upd.swap").collect()] == [(2, 1)]


def test_update_only_rewrites_affected_files(lsql):
    lsql.sql("CREATE NAMESPACE nessie.updf")
    lsql.sql("CREATE TABLE nessie.updf.t (k BIGINT, v STRING)")
    # three separate appends -> three files
    for lo in (0, 10, 20):
        lsql.sql(
            f"INSERT INTO nessie.updf.t SELECT id, concat('v', id) FROM range({lo}, {lo + 10}, 1, 1)"
        )
    t = lsql.lake.table("updf.t")
    before = set(t.log.state_at())
    assert len(before) == 3
    lsql.sql("UPDATE nessie.updf.t SET v = 'HIT' WHERE k = 15")  # one file only
    after = set(t.log.state_at())
    assert len(after) == 3
    assert len(before & after) == 2, "untouched files must carry over by reference"
    assert [r.v for r in t.read().filter("k = 15").collect()] == ["HIT"]
    assert t.read().filter("v = 'HIT'").count() == 1


def test_merge_statement_upsert(lsql):
    lsql.sql("CREATE NAMESPACE nessie.mrg")
    lsql.sql("CREATE TABLE nessie.mrg.t (k BIGINT, v STRING)")
    lsql.sql("INSERT INTO nessie.mrg.t VALUES (1, 'old1'), (2, 'old2'), (3, 'old3')")
    lsql.spark.sql(
        "SELECT * FROM VALUES (2, 'new2'), (4, 'new4') AS src(k, v)"
    ).createOrReplaceTempView("mrg_src")
    lsql.sql(
        """
        MERGE INTO nessie.mrg.t AS t USING mrg_src AS s
        ON t.k = s.k
        WHEN MATCHED THEN UPDATE SET *
        WHEN NOT MATCHED THEN INSERT *
        """
    )
    got = {r.k: r.v for r in lsql.sql("SELECT * FROM nessie.mrg.t").collect()}
    assert got == {1: "old1", 2: "new2", 3: "old3", 4: "new4"}


def test_merge_and_update_reject_bad_forms(lsql):
    lsql.sql("CREATE NAMESPACE nessie.bad")
    lsql.sql("CREATE TABLE nessie.bad.t (k BIGINT, v STRING)")
    lsql.sql("INSERT INTO nessie.bad.t VALUES (1, 'a')")
    with pytest.raises(SqlError, match="same-column equality"):
        lsql.sql(
            "MERGE INTO nessie.bad.t AS t USING nessie.bad.t AS s ON t.k = s.j "
            "WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *"
        )
    with pytest.raises(SqlError, match="multiple WHEN NOT MATCHED"):
        lsql.sql(
            "MERGE INTO nessie.bad.t AS t USING nessie.bad.t AS s ON t.k = s.k "
            "WHEN NOT MATCHED THEN INSERT * WHEN NOT MATCHED THEN INSERT *"
        )
    with pytest.raises(SqlError, match="cannot reference the target"):
        lsql.sql(
            "MERGE INTO nessie.bad.t AS t USING nessie.bad.t AS s ON t.k = s.k "
            "WHEN NOT MATCHED AND t.v = 'a' THEN INSERT *"
        )
    with pytest.raises(SqlError, match="unknown column"):
        lsql.sql("UPDATE nessie.bad.t SET nope = 1 WHERE k = 1")


def test_merge_per_column_update_and_conditional_delete(lsql):
    """Iceberg v2 row-level MERGE: per-column SET expressions and a
    conditional DELETE clause, first-matching-clause semantics."""
    lsql.sql("CREATE NAMESPACE nessie.mrg2")
    lsql.sql("CREATE TABLE nessie.mrg2.acct (k BIGINT, bal BIGINT, status STRING)")
    lsql.sql(
        "INSERT INTO nessie.mrg2.acct VALUES "
        "(1, 100, 'open'), (2, 200, 'open'), (3, 300, 'open'), (4, 400, 'open')"
    )
    lsql.spark.sql(
        "SELECT * FROM VALUES (1, 50, 'adj'), (2, -999, 'close'), "
        "(3, 10, 'adj'), (9, 90, 'new') AS src(k, delta, op)"
    ).createOrReplaceTempView("acct_src")
    lsql.sql(
        """
        MERGE INTO nessie.mrg2.acct AS t USING acct_src AS s
        ON t.k = s.k
        WHEN MATCHED AND s.op = 'close' THEN DELETE
        WHEN MATCHED THEN UPDATE SET bal = t.bal + s.delta, status = s.op
        WHEN NOT MATCHED THEN INSERT (k, bal, status) VALUES (s.k, s.delta, s.op)
        """
    )
    got = {
        r.k: (r.bal, r.status)
        for r in lsql.sql("SELECT * FROM nessie.mrg2.acct").collect()
    }
    assert got == {
        1: (150, "adj"),  # per-column update, expr sees pre-update row
        3: (310, "adj"),
        4: (400, "open"),  # unmatched target row carried over
        9: (90, "new"),  # INSERT (cols) VALUES (exprs)
    }  # k=2 deleted by the first matching clause


def test_merge_matched_delete_only(lsql):
    """MERGE with only WHEN MATCHED ... DELETE — no insert clause."""
    lsql.sql("CREATE NAMESPACE nessie.mrg3")
    lsql.sql("CREATE TABLE nessie.mrg3.t (k BIGINT, v STRING)")
    lsql.sql("INSERT INTO nessie.mrg3.t VALUES (1, 'a'), (2, 'b'), (3, 'c')")
    lsql.spark.sql(
        "SELECT * FROM VALUES (CAST(2 AS BIGINT)), (CAST(9 AS BIGINT)) AS src(k)"
    ).createOrReplaceTempView("del_src")
    lsql.sql(
        "MERGE INTO nessie.mrg3.t AS t USING del_src AS s ON t.k = s.k "
        "WHEN MATCHED THEN DELETE"
    )
    got = {r.k for r in lsql.sql("SELECT * FROM nessie.mrg3.t").collect()}
    assert got == {1, 3}


def test_merge_conditional_insert_and_star_update_with_condition(lsql):
    """WHEN NOT MATCHED AND cond THEN INSERT * filters inserts; a
    conditioned UPDATE SET * goes through the general path."""
    lsql.sql("CREATE NAMESPACE nessie.mrg4")
    lsql.sql("CREATE TABLE nessie.mrg4.t (k BIGINT, v STRING)")
    lsql.sql("INSERT INTO nessie.mrg4.t VALUES (1, 'old1'), (2, 'old2')")
    lsql.spark.sql(
        "SELECT * FROM VALUES (1, 'new1'), (2, 'SKIP'), (5, 'new5'), (6, 'SKIP') "
        "AS src(k, v)"
    ).createOrReplaceTempView("cond_src")
    lsql.sql(
        """
        MERGE INTO nessie.mrg4.t AS t USING cond_src AS s
        ON t.k = s.k
        WHEN MATCHED AND s.v != 'SKIP' THEN UPDATE SET *
        WHEN NOT MATCHED AND s.v != 'SKIP' THEN INSERT *
        """
    )
    got = {r.k: r.v for r in lsql.sql("SELECT * FROM nessie.mrg4.t").collect()}
    assert got == {1: "new1", 2: "old2", 5: "new5"}


def test_branch_tag_sql_surface(lsql):
    """Iceberg branch/tag DDL + VERSION AS OF 'ref' reads + the .refs
    metadata table + CALL fast_forward, end to end through SQL."""
    lsql.sql("CREATE NAMESPACE nessie.refs")
    lsql.sql("CREATE TABLE nessie.refs.t (k BIGINT, v STRING)")
    lsql.sql("INSERT INTO nessie.refs.t VALUES (1, 'a'), (2, 'b')")
    lsql.sql("ALTER TABLE nessie.refs.t CREATE BRANCH audit")
    lsql.sql("INSERT INTO nessie.refs.t VALUES (3, 'c')")
    lsql.sql("ALTER TABLE nessie.refs.t CREATE TAG rel AS OF VERSION 2")

    assert (
        lsql.sql("SELECT COUNT(*) AS n FROM nessie.refs.t VERSION AS OF 'audit'").first().n
        == 2
    )
    assert (
        lsql.sql("SELECT COUNT(*) AS n FROM nessie.refs.t VERSION AS OF 'rel'").first().n
        == 3
    )
    refs = {
        r.name: r.type
        for r in lsql.sql("SELECT * FROM nessie.refs.t.refs").collect()
    }
    assert refs == {"audit": "BRANCH", "rel": "TAG"}

    res = lsql.sql(
        "CALL nessie.system.fast_forward(table => 'refs.t', branch => 'audit')"
    ).first()
    assert res.snapshot_id == 2  # head: v0 create, v1 insert, v2 insert
    assert (
        lsql.sql("SELECT COUNT(*) AS n FROM nessie.refs.t VERSION AS OF 'audit'").first().n
        == 3
    )
    with pytest.raises(SqlError, match="immutable"):
        lsql.sql("CALL nessie.system.fast_forward(table => 'refs.t', branch => 'rel')")
    lsql.sql("ALTER TABLE nessie.refs.t DROP TAG rel")
    with pytest.raises(SqlError):
        lsql.sql("ALTER TABLE nessie.refs.t DROP BRANCH rel")


def test_merge_duplicate_source_keys_rejected(lsql):
    """SQL MERGE cardinality rule: duplicate source keys must raise,
    not silently duplicate the matched target row."""
    lsql.sql("CREATE NAMESPACE nessie.card")
    lsql.sql("CREATE TABLE nessie.card.t (k BIGINT, v STRING)")
    lsql.sql("INSERT INTO nessie.card.t VALUES (1, 'a')")
    lsql.spark.sql(
        "SELECT * FROM VALUES (1, 'x'), (1, 'y') AS src(k, v)"
    ).createOrReplaceTempView("dup_src")
    with pytest.raises(ValueError, match="duplicate"):
        lsql.sql(
            "MERGE INTO nessie.card.t AS t USING dup_src AS s ON t.k = s.k "
            "WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *"
        )
    with pytest.raises(ValueError, match="duplicate"):
        lsql.sql(
            "MERGE INTO nessie.card.t AS t USING dup_src AS s ON t.k = s.k "
            "WHEN MATCHED THEN UPDATE SET v = s.v"
        )


def test_bare_delete_and_update_without_where(lsql):
    lsql.sql("CREATE NAMESPACE nessie.bare")
    lsql.sql("CREATE TABLE nessie.bare.t (k BIGINT, v STRING)")
    lsql.sql("INSERT INTO nessie.bare.t VALUES (1, 'a'), (2, 'b')")
    lsql.sql("UPDATE nessie.bare.t SET v = 'z'")
    assert {r.v for r in lsql.sql("SELECT * FROM nessie.bare.t").collect()} == {"z"}
    lsql.sql("DELETE FROM nessie.bare.t")
    assert lsql.sql("SELECT COUNT(*) AS n FROM nessie.bare.t").first().n == 0


def test_merge_duplicate_unmatched_keys_both_insert(lsql):
    """Duplicate source keys that match NO target row are legal SQL:
    both rows insert (the cardinality rule is about matched rows)."""
    lsql.sql("CREATE NAMESPACE nessie.card2")
    lsql.sql("CREATE TABLE nessie.card2.t (k BIGINT, v STRING)")
    lsql.sql("INSERT INTO nessie.card2.t VALUES (1, 'a')")
    lsql.spark.sql(
        "SELECT * FROM VALUES (7, 'x'), (7, 'y') AS src(k, v)"
    ).createOrReplaceTempView("dup_new_src")
    lsql.sql(
        "MERGE INTO nessie.card2.t AS t USING dup_new_src AS s ON t.k = s.k "
        "WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *"
    )
    rows = sorted((r.k, r.v) for r in lsql.sql("SELECT * FROM nessie.card2.t").collect())
    assert rows == [(1, "a"), (7, "x"), (7, "y")]


def test_merge_shared_qualifier_rejected_and_alias_scoping(lsql):
    """A qualifier shared by both MERGE sides is ambiguous and must be
    rejected; with distinct aliases a self-merge is legal (the alias
    REPLACES the base name for qualification, as in SQL)."""
    lsql.sql("CREATE NAMESPACE nessie.amb")
    lsql.sql("CREATE TABLE nessie.amb.t (k BIGINT, v STRING)")
    lsql.sql("INSERT INTO nessie.amb.t VALUES (1, 'a')")
    with pytest.raises(SqlError, match="ambiguous MERGE qualifiers"):
        lsql.sql(
            "MERGE INTO nessie.amb.t USING nessie.amb.t ON t.k = t.k "
            "WHEN MATCHED THEN UPDATE SET *"
        )
    # distinct aliases: self-merge works, and t.v means the TARGET value
    lsql.sql(
        "MERGE INTO nessie.amb.t AS tgt USING nessie.amb.t AS s ON tgt.k = s.k "
        "WHEN MATCHED THEN UPDATE SET v = concat(tgt.v, s.v)"
    )
    assert lsql.sql("SELECT v FROM nessie.amb.t").first().v == "aa"


def test_version_as_of_unknown_ref_is_sql_error(lsql):
    lsql.sql("CREATE NAMESPACE nessie.refs3")
    lsql.sql("CREATE TABLE nessie.refs3.t (k BIGINT)")
    lsql.sql("INSERT INTO nessie.refs3.t VALUES (1)")
    with pytest.raises(SqlError, match="does not exist"):
        lsql.sql("SELECT * FROM nessie.refs3.t VERSION AS OF 'nope'")


def test_merge_insert_unknown_column_rejected(lsql):
    lsql.sql("CREATE NAMESPACE nessie.badins")
    lsql.sql("CREATE TABLE nessie.badins.t (k BIGINT, v STRING)")
    lsql.sql("INSERT INTO nessie.badins.t VALUES (1, 'a')")
    lsql.spark.sql("SELECT * FROM VALUES (9, 'x') AS src(k, v)").createOrReplaceTempView(
        "ins_src"
    )
    with pytest.raises(ValueError, match="unknown column"):
        lsql.sql(
            "MERGE INTO nessie.badins.t AS t USING ins_src AS s ON t.k = s.k "
            "WHEN NOT MATCHED THEN INSERT (kk, v) VALUES (s.k, s.v)"
        )


def test_merge_null_condition_falls_through_to_next_clause(lsql):
    """Three-valued logic: a NULL WHEN MATCHED condition does not pick
    the clause AND does not poison later clauses for that row."""
    lsql.sql("CREATE NAMESPACE nessie.nul")
    lsql.sql("CREATE TABLE nessie.nul.t (k BIGINT, v STRING)")
    lsql.sql("INSERT INTO nessie.nul.t VALUES (1, 'a'), (2, 'b')")
    lsql.spark.sql(
        "SELECT * FROM VALUES (1, CAST(NULL AS INT), 'x'), (2, 1, 'y') AS src(k, flag, v)"
    ).createOrReplaceTempView("nul_src")
    lsql.sql(
        """
        MERGE INTO nessie.nul.t AS t USING nul_src AS s ON t.k = s.k
        WHEN MATCHED AND s.flag = 1 THEN DELETE
        WHEN MATCHED THEN UPDATE SET v = s.v
        """
    )
    got = {r.k: r.v for r in lsql.sql("SELECT * FROM nessie.nul.t").collect()}
    # k=2: flag=1 -> deleted. k=1: NULL flag skips DELETE, second
    # clause still applies -> updated to 'x' (not carried as 'a')
    assert got == {1: "x"}


def test_merge_insert_only_ignores_duplicate_matched_keys(lsql):
    """Insert-only MERGE modifies no target row, so duplicate source
    keys that match the target are ignored rows, not an error."""
    lsql.sql("CREATE NAMESPACE nessie.insonly")
    lsql.sql("CREATE TABLE nessie.insonly.t (k BIGINT, v STRING)")
    lsql.sql("INSERT INTO nessie.insonly.t VALUES (1, 'a')")
    lsql.spark.sql(
        "SELECT * FROM VALUES (1, 'x'), (1, 'y'), (7, 'n') AS src(k, v)"
    ).createOrReplaceTempView("insonly_src")
    lsql.sql(
        "MERGE INTO nessie.insonly.t AS t USING insonly_src AS s ON t.k = s.k "
        "WHEN NOT MATCHED THEN INSERT *"
    )
    got = sorted((r.k, r.v) for r in lsql.sql("SELECT * FROM nessie.insonly.t").collect())
    assert got == [(1, "a"), (7, "n")]


def test_merge_qualifier_inside_string_literal_untouched(lsql):
    lsql.sql("CREATE NAMESPACE nessie.lit")
    lsql.sql("CREATE TABLE nessie.lit.t (k BIGINT, v STRING)")
    lsql.sql("INSERT INTO nessie.lit.t VALUES (1, 's.x'), (2, 'b')")
    lsql.spark.sql(
        "SELECT * FROM VALUES (CAST(1 AS BIGINT)), (CAST(2 AS BIGINT)) AS src(k)"
    ).createOrReplaceTempView("lit_src")
    lsql.sql(
        """
        MERGE INTO nessie.lit.t AS t USING lit_src AS s ON t.k = s.k
        WHEN MATCHED AND t.v = 's.x' THEN UPDATE SET v = 'hit s.v'
        """
    )
    got = {r.k: r.v for r in lsql.sql("SELECT * FROM nessie.lit.t").collect()}
    assert got == {1: "hit s.v", 2: "b"}  # literal 's.x' matched row 1 only


def test_merge_duplicate_insert_columns_rejected(lsql):
    lsql.sql("CREATE NAMESPACE nessie.dupcol")
    lsql.sql("CREATE TABLE nessie.dupcol.t (k BIGINT, v STRING)")
    lsql.sql("INSERT INTO nessie.dupcol.t VALUES (1, 'a')")
    lsql.spark.sql("SELECT * FROM VALUES (9, 'x') AS src(k, v)").createOrReplaceTempView(
        "dupcol_src"
    )
    with pytest.raises(SqlError, match="duplicate INSERT column"):
        lsql.sql(
            "MERGE INTO nessie.dupcol.t AS t USING dupcol_src AS s ON t.k = s.k "
            "WHEN NOT MATCHED THEN INSERT (k, k) VALUES (s.k, s.k)"
        )


def test_fast_forward_refuses_rewind(lsql):
    lsql.sql("CREATE NAMESPACE nessie.ffr")
    lsql.sql("CREATE TABLE nessie.ffr.t (k BIGINT)")
    lsql.sql("INSERT INTO nessie.ffr.t VALUES (1)")
    lsql.sql("INSERT INTO nessie.ffr.t VALUES (2)")
    lsql.sql("ALTER TABLE nessie.ffr.t CREATE BRANCH b")  # at head (v2)
    with pytest.raises(SqlError, match="not a fast-forward"):
        lsql.sql("CALL nessie.system.fast_forward(table => 'ffr.t', branch => 'b', to => 1)")


def test_ctas_creates_and_loads(lsql):
    """CREATE TABLE ... AS SELECT: schema from the query, data as the
    first snapshot, TBLPROPERTIES applied before the write."""
    lsql.sql("CREATE NAMESPACE nessie.ctas")
    lsql.sql("CREATE TABLE nessie.ctas.src (k BIGINT, v STRING)")
    lsql.sql("INSERT INTO nessie.ctas.src VALUES (1, 'a'), (2, 'b'), (3, 'c')")
    res = lsql.sql(
        "CREATE TABLE nessie.ctas.dst TBLPROPERTIES ('write.target-file-size-bytes'='65536') "
        "AS SELECT k, upper(v) AS vu FROM nessie.ctas.src WHERE k <= 2"
    ).first()
    assert res["created"] is True and res["added_files"] >= 1
    got = {(r.k, r.vu) for r in lsql.sql("SELECT * FROM nessie.ctas.dst").collect()}
    assert got == {(1, "A"), (2, "B")}
    t = lsql.lake.table("ctas.dst")
    assert t.properties()["write.target-file-size-bytes"] == "65536"
    assert [f.name for f in t.schema().fields] == ["k", "vu"]
    # IF NOT EXISTS on an existing table: no-op, query NOT run
    res2 = lsql.sql(
        "CREATE TABLE IF NOT EXISTS nessie.ctas.dst AS SELECT * FROM nessie.ctas.src"
    ).first()
    assert res2["created"] is False
    assert lsql.sql("SELECT count(*) AS c FROM nessie.ctas.dst").first()["c"] == 2


def test_sql_delete_honors_write_delete_mode(lsql):
    """Iceberg picks DELETE's mode from write.delete.mode; so do we:
    the SQL statement is unchanged, the property flips the plan from
    copy-on-write rewrites to content=1 tombstone files."""
    lsql.sql("CREATE NAMESPACE nessie.morns")
    lsql.sql(
        "CREATE TABLE nessie.morns.t (k BIGINT, v STRING) "
        "TBLPROPERTIES ('write.delete.mode'='merge-on-read')"
    )
    lsql.sql("INSERT INTO nessie.morns.t VALUES (1,'a'), (2,'b'), (3,'c'), (4,'d')")
    lsql.sql("DELETE FROM nessie.morns.t WHERE k IN (2, 4)")
    assert {r.k for r in lsql.sql("SELECT * FROM nessie.morns.t").collect()} == {1, 3}
    files = lsql.sql(
        "SELECT content, count(*) AS n FROM nessie.morns.t.files GROUP BY content"
    ).collect()
    by_content = {r.content: r.n for r in files}
    assert by_content.get(1, 0) >= 1  # tombstone file(s), no data rewrite
    # CALL the fold-back procedure through SQL; the tombstones drop and
    # results are unchanged
    lsql.sql("CALL nessie.system.rewrite_data_files(table => 'morns.t')")
    files2 = lsql.sql(
        "SELECT content, count(*) AS n FROM nessie.morns.t.files GROUP BY content"
    ).collect()
    assert {r.content for r in files2} == {0}
    assert {r.k for r in lsql.sql("SELECT * FROM nessie.morns.t").collect()} == {1, 3}


def test_truncate_table(spark, lsql):
    lsql.sql("CREATE NAMESPACE IF NOT EXISTS lab")
    lsql.sql("CREATE TABLE lab.trunc (k bigint)")
    lsql.sql("INSERT INTO lab.trunc SELECT id FROM range(0, 7)")
    t = lsql.lake.table("lab.trunc")
    v1 = t.log.latest_version()
    lsql.sql("TRUNCATE TABLE lab.trunc")
    assert t.read().count() == 0
    # snapshot semantics: pre-truncate data still time-travels
    assert t.read(version=v1).count() == 7


def test_show_tblproperties(spark, lsql):
    lsql.sql("CREATE NAMESPACE IF NOT EXISTS lab")
    lsql.sql(
        "CREATE TABLE lab.props (k bigint) "
        "TBLPROPERTIES ('write.target-file-size-bytes'='65536', 'owner'='me')"
    )
    rows = {r.key: r.value for r in lsql.sql("SHOW TBLPROPERTIES lab.props").collect()}
    assert rows["owner"] == "me"
    assert rows["write.target-file-size-bytes"] == "65536"
    one = lsql.sql("SHOW TBLPROPERTIES lab.props ('owner')").collect()
    assert [(r.key, r.value) for r in one] == [("owner", "me")]


def test_show_create_table_round_trips(spark, lsql):
    """SHOW CREATE TABLE reconstructs a statement the router itself can
    re-execute: schema, partition spec, and properties all round-trip."""
    lsql.sql("CREATE NAMESPACE IF NOT EXISTS lab")
    lsql.sql(
        "CREATE TABLE lab.sct (k BIGINT, ts TIMESTAMP, v STRING) "
        "PARTITIONED BY (days(ts)) TBLPROPERTIES ('owner'='me')"
    )
    stmt = lsql.sql("SHOW CREATE TABLE lab.sct").collect()[0].createtab_stmt
    assert "PARTITIONED BY (days(ts))" in stmt
    assert "'owner'='me'" in stmt
    # round-trip: run the reconstructed DDL under a new name
    lsql.sql(stmt.replace("lab.sct", "lab.sct2"))
    t2 = lsql.lake.table("lab.sct2")
    assert [f.name for f in t2.schema().fields] == ["k", "ts", "v"]
    assert t2.properties().get("owner") == "me"
    assert t2.properties().get("partition.spec") == "days(ts)"


def test_truncate_clears_tombstones(spark, lsql):
    lsql.sql("CREATE NAMESPACE IF NOT EXISTS lab")
    lsql.sql(
        "CREATE TABLE lab.tmor (k bigint) "
        "TBLPROPERTIES ('write.delete.mode'='merge-on-read')"
    )
    lsql.sql("INSERT INTO lab.tmor SELECT id FROM range(0, 10)")
    lsql.sql("DELETE FROM lab.tmor WHERE k = 3")  # MOR tombstone
    t = lsql.lake.table("lab.tmor")
    assert any(fi.content == 1 for fi in t.log.state_at().values())
    lsql.sql("TRUNCATE TABLE lab.tmor")
    assert t.read().count() == 0
    assert t.log.state_at() == {}  # no data files AND no tombstones
    lsql.sql("INSERT INTO lab.tmor VALUES (7)")
    assert t.read().count() == 1
