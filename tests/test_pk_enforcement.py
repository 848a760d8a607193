"""Opt-in PRIMARY KEY enforcement (reference: the ART index per unique
constraint rejects violating INSERTs with "duplicate key",
pkg/storage/index.go:329; constraint declarations table_constraint.go:12-51,
table.go:283-284). Default stays metadata-only (lakehouse stance); a table
created WITH (ENFORCE) / enforce_constraints=True validates NULL-free keys,
intra-batch uniqueness, and no collision with existing rows on every
INSERT / COPY / MERGE-insert path, raising IntegrityError."""

from __future__ import annotations

import shutil
import tempfile

import pytest

from plan_spark.engine import Engine, IntegrityError


@pytest.fixture()
def engine(spark):
    d = tempfile.mkdtemp(prefix="plan_spark_pk_")
    yield Engine(spark, d)
    shutil.rmtree(d, ignore_errors=True)


def _mk(engine, ddl_suffix=" WITH (ENFORCE)"):
    engine.sql(f"CREATE TABLE t (k INT PRIMARY KEY, v STRING){ddl_suffix}")
    engine.sql("INSERT INTO t VALUES (1, 'a'), (2, 'b')")


def test_duplicate_insert_rejected(engine):
    _mk(engine)
    with pytest.raises(IntegrityError, match="duplicate key"):
        engine.sql("INSERT INTO t VALUES (2, 'dup')")
    # the failed insert must not have committed anything
    assert engine.sql("SELECT COUNT(*) AS n FROM t").collect()[0].n == 2


def test_intra_batch_duplicate_rejected(engine):
    _mk(engine)
    with pytest.raises(IntegrityError, match="duplicate key"):
        engine.sql("INSERT INTO t VALUES (7, 'x'), (7, 'y')")
    assert engine.sql("SELECT COUNT(*) AS n FROM t").collect()[0].n == 2


def test_null_key_rejected(engine):
    _mk(engine)
    with pytest.raises(IntegrityError, match="NULL in PRIMARY KEY"):
        engine.sql("INSERT INTO t VALUES (NULL, 'z')")


def test_valid_insert_accepted(engine):
    _mk(engine)
    engine.sql("INSERT INTO t VALUES (3, 'c'), (4, 'd')")
    assert engine.sql("SELECT COUNT(*) AS n FROM t").collect()[0].n == 4


def test_unenforced_pk_still_permissive(engine):
    """Without ENFORCE, PK stays metadata — duplicate inserts succeed
    (Spark/lakehouse default, SURVEY §2.9)."""
    _mk(engine, ddl_suffix="")
    engine.sql("INSERT INTO t VALUES (2, 'dup')")
    assert engine.sql("SELECT COUNT(*) AS n FROM t").collect()[0].n == 3


def test_enforce_requires_pk(engine):
    with pytest.raises(ValueError, match="requires a PRIMARY KEY"):
        engine.sql("CREATE TABLE nopk (a INT) WITH (ENFORCE)")
    # the failed create must not brick the name (validation runs BEFORE
    # the dataset directory is written — r7 review finding)
    engine.sql("CREATE TABLE nopk (a INT PRIMARY KEY) WITH (ENFORCE)")
    engine.sql("INSERT INTO nopk VALUES (1)")
    assert engine.sql("SELECT COUNT(*) AS n FROM nopk").collect()[0].n == 1


def test_merge_duplicate_source_keys_matched_update_rejected(engine):
    """Duplicate ON keys in the source fan out the matched target row on
    the UPDATE path (left join) — enforced tables must refuse (r7 review
    finding: the insert-side check alone missed this)."""
    _mk(engine)
    engine.sql("CREATE TABLE usrc (k INT, v STRING)")
    engine.sql("INSERT INTO usrc VALUES (1, 'x'), (1, 'y')")
    with pytest.raises(IntegrityError, match="fan out"):
        engine.sql(
            "MERGE INTO t USING usrc ON k WHEN MATCHED THEN UPDATE SET *"
        )
    assert engine.sql("SELECT COUNT(*) AS n FROM t WHERE k = 1").collect()[0].n == 1


def test_composite_key(engine):
    engine.sql(
        "CREATE TABLE ck (a INT, b INT, v STRING, PRIMARY KEY (a, b))"
        " WITH (ENFORCE)"
    )
    engine.sql("INSERT INTO ck VALUES (1, 1, 'x'), (1, 2, 'y')")
    engine.sql("INSERT INTO ck VALUES (2, 1, 'z')")  # same a, new (a,b): fine
    with pytest.raises(IntegrityError, match="duplicate key"):
        engine.sql("INSERT INTO ck VALUES (1, 2, 'dup')")


def test_copy_from_validates(engine, tmp_path):
    _mk(engine)
    csv = tmp_path / "in.csv"
    csv.write_text("k,v\n2,dup\n9,ok\n")
    with pytest.raises(IntegrityError, match="duplicate key"):
        engine.copy_from("t", str(csv), fmt="csv")
    assert engine.sql("SELECT COUNT(*) AS n FROM t").collect()[0].n == 2


def test_delete_then_reinsert_is_legal(engine):
    _mk(engine)
    engine.sql("DELETE FROM t WHERE k = 2")
    engine.sql("INSERT INTO t VALUES (2, 'back')")
    rows = engine.sql("SELECT v FROM t WHERE k = 2").collect()
    assert [r.v for r in rows] == ["back"]


def test_merge_upsert_on_pk_allowed(engine):
    _mk(engine)
    engine.sql("CREATE TABLE src (k INT, v STRING)")
    engine.sql("INSERT INTO src VALUES (2, 'upd'), (5, 'new')")
    engine.sql(
        "MERGE INTO t USING src ON k "
        "WHEN MATCHED THEN UPDATE SET * "
        "WHEN NOT MATCHED THEN INSERT *"
    )
    rows = {r.k: r.v for r in engine.sql("SELECT k, v FROM t").collect()}
    assert rows == {1: "a", 2: "upd", 5: "new"}


def test_merge_duplicate_source_keys_rejected(engine):
    _mk(engine)
    engine.sql("CREATE TABLE src2 (k INT, v STRING)")
    engine.sql("INSERT INTO src2 VALUES (8, 'x'), (8, 'y')")
    with pytest.raises(IntegrityError, match="duplicate key"):
        engine.sql(
            "MERGE INTO t USING src2 ON k "
            "WHEN NOT MATCHED THEN INSERT *"
        )


def test_merge_on_non_pk_collision_rejected(engine):
    """ON v (not the key): an unmatched source row carrying an EXISTING k
    must be caught by the insert-vs-existing probe."""
    _mk(engine)
    engine.sql("CREATE TABLE src3 (k INT, v STRING)")
    engine.sql("INSERT INTO src3 VALUES (1, 'zz')")  # v 'zz' unmatched, k=1 exists
    with pytest.raises(IntegrityError, match="duplicate key"):
        engine.sql("MERGE INTO t USING src3 ON v WHEN NOT MATCHED THEN INSERT *")


def test_update_cannot_reassign_key(engine):
    _mk(engine)
    with pytest.raises(IntegrityError, match="may not reassign"):
        engine.sql("UPDATE t SET k = 9 WHERE k = 1")
    engine.sql("UPDATE t SET v = 'moved' WHERE k = 1")  # non-key SET is fine
    assert engine.sql("SELECT v FROM t WHERE k = 1").collect()[0].v == "moved"


def test_show_create_table_round_trips_enforce(engine):
    _mk(engine)
    ddl = engine.sql("SHOW CREATE TABLE t").collect()[0].create_stmt
    assert "WITH (ENFORCE)" in ddl and "PRIMARY KEY (k)" in ddl
    # the emitted DDL re-creates an enforced table
    engine.sql("DROP TABLE t")
    engine.sql(ddl)
    engine.sql("INSERT INTO t VALUES (1, 'a')")
    with pytest.raises(IntegrityError):
        engine.sql("INSERT INTO t VALUES (1, 'dup')")


def test_branch_targeted_insert_validates(engine):
    """t@b writes validate against the branch handle's snapshot (branches
    here are refs into one shared version log — a branch commit advances
    head, so the branch view and head agree after the write)."""
    _mk(engine)
    engine.sql("CREATE BRANCH dev ON t")
    engine.sql("INSERT INTO t@dev VALUES (5, 'branch-only')")
    with pytest.raises(IntegrityError, match="duplicate key"):
        engine.sql("INSERT INTO t@dev VALUES (5, 'dup-on-branch')")
    with pytest.raises(IntegrityError, match="duplicate key"):
        engine.sql("INSERT INTO t VALUES (5, 'dup-at-head')")
    assert engine.sql("SELECT COUNT(*) AS n FROM t").collect()[0].n == 3
