"""Round-8 integrity hardening: parent-side RESTRICT generalized to every
statement that can remove referenced key values (MERGE matched-DELETE,
UPDATE of a referenced column, RESTORE), exact value-survival semantics
under duplicate parent keys, the FK-references-a-declared-key rule
(SQL standard), constraint metadata tracking schema evolution
(RENAME/DROP COLUMN), the DROP-constraint escape hatch, and
IntegrityError's exception base (never absorbable as a benign-race
ValueError). Reference surface: table_constraint.go:10-16 +
pkg/storage/index.go:329 (the declared constraint model this engine
extends)."""

from __future__ import annotations

import shutil
import tempfile

import pytest

from plan_spark.engine import Engine, IntegrityError


@pytest.fixture()
def engine(spark):
    d = tempfile.mkdtemp(prefix="plan_spark_fkgap_")
    yield Engine(spark, d)
    shutil.rmtree(d, ignore_errors=True)


def _parent_child(engine, enforce_parent=True):
    suffix = " WITH (ENFORCE)" if enforce_parent else ""
    engine.sql(f"CREATE TABLE p (k INT PRIMARY KEY, v STRING){suffix}")
    engine.sql("INSERT INTO p VALUES (1, 'a'), (2, 'b'), (3, 'c')")
    engine.sql(
        "CREATE TABLE c (id INT PRIMARY KEY, pk INT, "
        "FOREIGN KEY (pk) REFERENCES p (k)) WITH (ENFORCE)"
    )
    engine.sql("INSERT INTO c VALUES (10, 1), (20, 2)")


def test_integrity_error_is_not_valueerror():
    """The concurrency convention treats ValueError from a racing write as
    benign — a constraint violation must never be absorbable that way."""
    assert not issubclass(IntegrityError, ValueError)
    assert issubclass(IntegrityError, RuntimeError)


# ---------------------------------------------------------------- RESTRICT

def test_merge_matched_delete_restricted(engine):
    _parent_child(engine)
    with pytest.raises(IntegrityError, match="FOREIGN KEY RESTRICT"):
        engine.sql(
            "MERGE INTO p USING (SELECT 1 AS k) s ON k "
            "WHEN MATCHED THEN DELETE"
        )
    assert engine.sql("SELECT COUNT(*) AS n FROM p").collect()[0].n == 3


def test_merge_matched_delete_unreferenced_ok(engine):
    _parent_child(engine)
    engine.sql(
        "MERGE INTO p USING (SELECT 3 AS k) s ON k WHEN MATCHED THEN DELETE"
    )
    assert engine.sql("SELECT COUNT(*) AS n FROM p").collect()[0].n == 2


def test_update_reassigning_referenced_column_restricted(engine):
    """UPDATE that moves a referenced key VALUE away orphans the child —
    refused (on an ENFORCED parent the key-reassignment guard fires first;
    either way the write must not land)."""
    _parent_child(engine)
    with pytest.raises(IntegrityError, match="may not reassign"):
        engine.sql("UPDATE p SET k = 99 WHERE k = 1")
    assert engine.sql("SELECT COUNT(*) AS n FROM p WHERE k = 1").collect()[0].n == 1


def test_update_unreferenced_key_ok(engine):
    _parent_child(engine, enforce_parent=False)
    engine.sql("UPDATE p SET k = 99 WHERE k = 3")  # no child references 3
    assert engine.sql("SELECT COUNT(*) AS n FROM p WHERE k = 99").collect()[0].n == 1


def test_update_nonkey_column_skips_restrict_scan(engine):
    _parent_child(engine)
    engine.sql("UPDATE p SET v = 'zz' WHERE k = 1")  # value col: never a RESTRICT event
    assert engine.sql("SELECT v FROM p WHERE k = 1").collect()[0].v == "zz"


def test_update_unenforced_parent_still_restricted(engine):
    """RESTRICT is child-driven: the parent's own enforcement flag is
    irrelevant when an ENFORCED child references it."""
    _parent_child(engine, enforce_parent=False)
    with pytest.raises(IntegrityError, match="FOREIGN KEY RESTRICT"):
        engine.sql("UPDATE p SET k = 99 WHERE k = 2")


def test_restore_parent_restricted(engine):
    """Rolling the parent back to a snapshot that lacks a referenced key
    value is a RESTRICT event too."""
    engine.sql("CREATE TABLE p (k INT PRIMARY KEY, v STRING) WITH (ENFORCE)")
    engine.sql("INSERT INTO p VALUES (1, 'a')")
    v_before = engine.dataset("p").version
    engine.sql("INSERT INTO p VALUES (2, 'b')")
    engine.sql(
        "CREATE TABLE c (id INT PRIMARY KEY, pk INT, "
        "FOREIGN KEY (pk) REFERENCES p (k)) WITH (ENFORCE)"
    )
    engine.sql("INSERT INTO c VALUES (10, 2)")
    with pytest.raises(IntegrityError, match="FOREIGN KEY RESTRICT"):
        engine.sql(f"RESTORE TABLE p TO VERSION AS OF {v_before}")
    # the refused restore committed nothing
    assert engine.sql("SELECT COUNT(*) AS n FROM p").collect()[0].n == 2


def test_restore_child_resurrecting_orphans_refused(engine):
    """The mirror case: restoring an enforced CHILD must not resurrect rows
    whose parents are gone."""
    _parent_child(engine)
    v_refs = engine.dataset("c").version  # c references p.k in {1, 2}
    engine.sql("DELETE FROM c WHERE id = 20")
    engine.sql("DELETE FROM p WHERE k = 2")  # legal now: no ref remains
    with pytest.raises(IntegrityError, match="FOREIGN KEY violation"):
        engine.sql(f"RESTORE TABLE c TO VERSION AS OF {v_refs}")


def test_duplicate_parent_keys_delete_survivor_ok(engine):
    """Value-survival semantics: with duplicate key VALUES in an unenforced
    parent, deleting one duplicate row keeps child refs valid (the value
    survives in the other row) — must NOT be refused."""
    engine.sql("CREATE TABLE p (k INT PRIMARY KEY, v STRING)")  # unenforced
    engine.sql("INSERT INTO p VALUES (1, 'a'), (1, 'dup'), (2, 'b')")
    engine.sql(
        "CREATE TABLE c (id INT PRIMARY KEY, pk INT, "
        "FOREIGN KEY (pk) REFERENCES p (k)) WITH (ENFORCE)"
    )
    engine.sql("INSERT INTO c VALUES (10, 1)")
    engine.sql("DELETE FROM p WHERE v = 'dup'")  # k=1 survives in row 'a'
    assert engine.sql("SELECT COUNT(*) AS n FROM p").collect()[0].n == 2
    with pytest.raises(IntegrityError, match="FOREIGN KEY RESTRICT"):
        engine.sql("DELETE FROM p WHERE v = 'a'")  # now the value vanishes


# --------------------------------------------- FK must reference a key

def test_fk_must_reference_declared_key(engine):
    engine.sql("CREATE TABLE pr (k INT PRIMARY KEY, x INT)")
    with pytest.raises(ValueError, match="PRIMARY KEY or a declared UNIQUE"):
        engine.sql(
            "CREATE TABLE cr (id INT, fx INT, "
            "FOREIGN KEY (fx) REFERENCES pr (x)) WITH (ENFORCE)"
        )
    engine.sql("ALTER TABLE pr ADD UNIQUE (x)")
    engine.sql(
        "CREATE TABLE cr (id INT, fx INT, "
        "FOREIGN KEY (fx) REFERENCES pr (x)) WITH (ENFORCE)"
    )


def test_alter_add_fk_must_reference_declared_key(engine):
    engine.sql("CREATE TABLE pr (k INT PRIMARY KEY, x INT)")
    engine.sql("CREATE TABLE cr (id INT, fx INT)")
    with pytest.raises(ValueError, match="PRIMARY KEY or a declared UNIQUE"):
        engine.sql("ALTER TABLE cr ADD FOREIGN KEY (fx) REFERENCES pr (x)")


# ------------------------------------- schema evolution keeps metadata

def test_rename_pk_column_keeps_enforcement(engine):
    engine.sql("CREATE TABLE t (k INT PRIMARY KEY, v STRING) WITH (ENFORCE)")
    engine.sql("INSERT INTO t VALUES (1, 'a')")
    engine.sql("ALTER TABLE t RENAME COLUMN k TO kk")
    with pytest.raises(IntegrityError, match="duplicate key"):
        engine.sql("INSERT INTO t VALUES (1, 'dup')")
    ddl = engine.sql("SHOW CREATE TABLE t").collect()[0].create_stmt
    assert "PRIMARY KEY (kk)" in ddl


def test_rename_referenced_parent_column_tracks_children(engine):
    _parent_child(engine)
    engine.sql("ALTER TABLE p RENAME COLUMN k TO kid")
    # child validation must now probe p.kid — a valid insert passes, an
    # orphan is still caught
    engine.sql("INSERT INTO c VALUES (30, 3)")
    with pytest.raises(IntegrityError, match="FOREIGN KEY violation"):
        engine.sql("INSERT INTO c VALUES (40, 404)")
    with pytest.raises(IntegrityError, match="FOREIGN KEY RESTRICT"):
        engine.sql("DELETE FROM p WHERE kid = 1")


def test_rename_not_null_column_keeps_enforcement(engine):
    engine.sql(
        "CREATE TABLE t (k INT PRIMARY KEY, v STRING NOT NULL) WITH (ENFORCE)"
    )
    engine.sql("ALTER TABLE t RENAME COLUMN v TO w")
    with pytest.raises(IntegrityError, match="NOT NULL column 'w'"):
        engine.sql("INSERT INTO t VALUES (1, NULL)")


def test_rename_check_column_refused(engine):
    engine.sql(
        "CREATE TABLE t (k INT PRIMARY KEY, n INT, CHECK (n > 0)) WITH (ENFORCE)"
    )
    with pytest.raises(ValueError, match="CHECK expression references"):
        engine.sql("ALTER TABLE t RENAME COLUMN n TO m")
    # escape hatch: drop the check, rename, re-add under the new name
    engine.sql("ALTER TABLE t DROP CHECK (n > 0)")
    engine.sql("ALTER TABLE t RENAME COLUMN n TO m")
    engine.sql("ALTER TABLE t ADD CHECK (m > 0)")
    with pytest.raises(IntegrityError, match="CHECK"):
        engine.sql("INSERT INTO t VALUES (1, -5)")


def test_drop_constrained_column_refused(engine):
    engine.sql(
        "CREATE TABLE t (k INT PRIMARY KEY, u INT, UNIQUE (u)) WITH (ENFORCE)"
    )
    with pytest.raises(ValueError, match="cannot drop column 'k'"):
        engine.sql("ALTER TABLE t DROP COLUMN k")
    with pytest.raises(ValueError, match="cannot drop column 'u'"):
        engine.sql("ALTER TABLE t DROP COLUMN u")
    engine.sql("ALTER TABLE t DROP UNIQUE (u)")
    engine.sql("ALTER TABLE t DROP COLUMN u")  # constraint gone -> allowed
    assert [f.name for f in engine.dataset("t").schema.fields if f.name == "u"] == []


def test_drop_not_null_column_drops_its_constraint(engine):
    engine.sql(
        "CREATE TABLE t (k INT PRIMARY KEY, v STRING NOT NULL, w INT) "
        "WITH (ENFORCE)"
    )
    engine.sql("ALTER TABLE t DROP COLUMN v")  # column-level NN goes with it
    engine.sql("INSERT INTO t VALUES (1, 5)")  # no stale-metadata explosion
    assert engine.sql("SELECT COUNT(*) AS n FROM t").collect()[0].n == 1


def test_drop_referenced_parent_column_refused(engine):
    _parent_child(engine)
    with pytest.raises(ValueError, match="FOREIGN KEYs in"):
        engine.sql("ALTER TABLE p DROP COLUMN k")


# --------------------------------------------------- DROP CONSTRAINT face

def test_drop_primary_key_guarded_by_fk(engine):
    _parent_child(engine)
    with pytest.raises(ValueError, match="FOREIGN KEYs in"):
        engine.sql("ALTER TABLE p DROP PRIMARY KEY")
    engine.sql("ALTER TABLE c DROP FOREIGN KEY (pk)")
    engine.sql("ALTER TABLE p DROP PRIMARY KEY")
    engine.sql("INSERT INTO p VALUES (1, 'dup-now-fine')")
    assert engine.sql("SELECT COUNT(*) AS n FROM p WHERE k = 1").collect()[0].n == 2


def test_drop_unique_backed_fk_survives_via_pk(engine):
    """Dropping UNIQUE(k) is fine when PRIMARY KEY(k) still backs the FK."""
    engine.sql(
        "CREATE TABLE p (k INT PRIMARY KEY, UNIQUE (k)) WITH (ENFORCE)"
    )
    engine.sql("CREATE TABLE c (pk INT, FOREIGN KEY (pk) REFERENCES p (k)) WITH (ENFORCE)")
    engine.sql("ALTER TABLE p DROP UNIQUE (k)")  # PK(k) remains


def test_drop_missing_constraint_loud(engine):
    engine.sql("CREATE TABLE t (k INT PRIMARY KEY)")
    with pytest.raises(ValueError, match="has no UNIQUE"):
        engine.sql("ALTER TABLE t DROP UNIQUE (k)")
    with pytest.raises(ValueError, match="has no NOT NULL"):
        engine.sql("ALTER TABLE t DROP NOT NULL k")
    with pytest.raises(ValueError, match="has no CHECK"):
        engine.sql("ALTER TABLE t DROP CHECK (k > 0)")
    with pytest.raises(ValueError, match="has no FOREIGN KEY"):
        engine.sql("ALTER TABLE t DROP FOREIGN KEY (k)")


# ---- round-8 review follow-ups -------------------------------------------


def test_merge_matched_update_restricted_unenforced_parent(engine):
    """MERGE matched-UPDATE reassigning a column an enforced child's FK
    references must RESTRICT even when the parent itself is UNENFORCED —
    the same child-driven rule UPDATE already applies (the review found
    the MERGE face unguarded: k=100 vanished silently)."""
    engine.sql("CREATE TABLE p (id INT PRIMARY KEY, k INT, UNIQUE (k))")
    engine.sql("INSERT INTO p VALUES (1, 100), (2, 200)")
    engine.sql(
        "CREATE TABLE c (cid INT PRIMARY KEY, pk INT, "
        "FOREIGN KEY (pk) REFERENCES p (k)) WITH (ENFORCE)"
    )
    engine.sql("INSERT INTO c VALUES (10, 100)")
    with pytest.raises(IntegrityError, match="RESTRICT"):
        engine.sql(
            "MERGE INTO p USING (SELECT 1 AS id, 999 AS k) s ON id "
            "WHEN MATCHED THEN UPDATE SET k = s.k"
        )
    assert engine.sql("SELECT k FROM p WHERE id = 1").collect()[0].k == 100
    # moving an UNreferenced key value is fine
    engine.sql(
        "MERGE INTO p USING (SELECT 2 AS id, 999 AS k) s ON id "
        "WHEN MATCHED THEN UPDATE SET k = s.k"
    )
    assert engine.sql("SELECT k FROM p WHERE id = 2").collect()[0].k == 999


def test_merge_matched_update_nonref_column_passes(engine):
    """Updating columns no child references skips the RESTRICT scan."""
    _parent_child(engine)
    engine.sql(
        "MERGE INTO p USING (SELECT 1 AS k, 'zz' AS v) s ON k "
        "WHEN MATCHED THEN UPDATE SET v = s.v"
    )
    assert engine.sql("SELECT v FROM p WHERE k = 1").collect()[0].v == "zz"


def test_drop_foreign_key_column_order_insensitive(engine):
    """DROP FOREIGN KEY identifies the key by column SET, like every other
    key face (the review found an ordered-list compare)."""
    engine.sql("CREATE TABLE pp (a INT, b INT, v STRING, PRIMARY KEY (a, b))")
    engine.sql(
        "CREATE TABLE cc (id INT PRIMARY KEY, fa INT, fb INT, "
        "FOREIGN KEY (fa, fb) REFERENCES pp (a, b))"
    )
    engine.sql("ALTER TABLE cc DROP FOREIGN KEY (fb, fa)")  # reordered
    assert not engine._entry("cc", "main").get("foreign_keys")


def test_rename_column_matching_check_literal_passes(engine):
    """A column name appearing only INSIDE a CHECK's string literal must
    not block RENAME/DROP (the review found a raw word-boundary regex)."""
    engine.sql(
        "CREATE TABLE t (k INT, status STRING, CHECK (status IN ('k', 'v')))"
    )
    engine.sql("INSERT INTO t VALUES (1, 'k')")
    engine.sql("ALTER TABLE t RENAME COLUMN k TO kk")
    assert "kk" in engine.dataset("t").to_df().columns
    # a REAL identifier mention still blocks
    engine.sql("CREATE TABLE t2 (n INT, CHECK (n > 0))")
    with pytest.raises(ValueError, match="CHECK"):
        engine.sql("ALTER TABLE t2 RENAME COLUMN n TO m")


def test_backquoted_identifier_with_double_dash(engine):
    """`a--b` inside backticks is an identifier, not a comment — the
    statement splitter must pass it through intact."""
    df = engine.sql("SELECT 1 AS `a--b`")
    assert df.columns == ["a--b"] and df.collect()[0][0] == 1
    # and a real comment after a backquoted identifier still strips
    df = engine.sql("SELECT 2 AS `x` -- trailing comment\n")
    assert df.collect()[0].x == 2
