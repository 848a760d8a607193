"""Engine API: DDL, INSERT, COPY FROM, SQL entry, EXPLAIN."""

from __future__ import annotations

import shutil
import tempfile

import pytest

from plan_spark.engine import Engine
from tests.conftest import SF_DIR


@pytest.fixture()
def engine(spark):
    d = tempfile.mkdtemp(prefix="plan_spark_wh_")
    yield Engine(spark, d)
    shutil.rmtree(d, ignore_errors=True)


def test_ddl_insert_sql(engine):
    engine.create_table("t", "a INT, b STRING, c DOUBLE", primary_key=["a"])
    engine.insert_values("t", [(1, "x", 1.5), (2, "y", 2.5), (3, "x", 3.5)])
    out = engine.sql("SELECT b, SUM(c) AS s FROM t GROUP BY b ORDER BY b").collect()
    assert [(r.b, r.s) for r in out] == [("x", 5.0), ("y", 2.5)]
    assert engine.tables() == ["t"]


def test_copy_from_parquet(engine):
    engine.create_table(
        "nat", "n_nationkey INT, n_name STRING, n_regionkey INT"
    )
    engine.copy_from("nat", f"{SF_DIR}/nation.parquet", fmt="parquet")
    assert engine.sql("SELECT COUNT(*) AS n FROM nat").collect()[0].n == 25


def test_copy_from_csv(engine, tmp_path):
    csv = tmp_path / "in.csv"
    csv.write_text("a,b\n1,foo\n2,bar\n")
    engine.create_table("c", "a INT, b STRING")
    engine.copy_from("c", str(csv), fmt="csv")
    rows = engine.sql("SELECT * FROM c ORDER BY a").collect()
    assert [(r.a, r.b) for r in rows] == [(1, "foo"), (2, "bar")]


def test_insert_appends_versions(engine):
    engine.create_table("v", "a INT")
    engine.insert_values("v", [(1,)])
    engine.insert_values("v", [(2,)])
    ds = engine.dataset("v")
    assert ds.version == 3  # create + 2 appends
    assert engine.sql("SELECT COUNT(*) AS n FROM v").collect()[0].n == 2


def test_explain_shows_pushdown(engine):
    engine.create_table("e", "a INT, b DOUBLE")
    engine.insert_values("e", [(i, float(i)) for i in range(100)])
    plan = engine.explain("SELECT a FROM e WHERE a > 50")
    assert "PushedFilters" in plan and "GreaterThan(a,50)" in plan


def test_drop_table(engine):
    engine.create_table("d", "a INT")
    engine.drop_table("d")
    assert engine.tables() == []
    with pytest.raises(KeyError):
        engine.dataset("d")


def test_sql_statement_routing(engine):
    """The reference's full server-loop surface through one sql() door:
    DDL + INSERT VALUES + DELETE/UPDATE + query (cmd/main/main.go:73-98)."""
    engine.sql("CREATE SCHEMA analytics")
    assert "analytics" in engine.schemas()
    engine.sql("CREATE TABLE st (a INT PRIMARY KEY, b STRING, c DOUBLE)")
    assert "st" in engine.tables()
    engine.sql("INSERT INTO st VALUES (1, 'x', 1.5), (2, 'y', 2.5), (3, 'x', 99.0)")
    got = engine.sql("SELECT COUNT(*) AS n FROM st").collect()[0].n
    assert got == 3
    engine.sql("DELETE FROM st WHERE a = 3")
    engine.sql("UPDATE st SET c = c * 10 WHERE b = 'x'")
    rows = {r.a: r.c for r in engine.sql("SELECT a, c FROM st ORDER BY a").collect()}
    assert rows == {1: 15.0, 2: 2.5}
    engine.sql("DROP TABLE st")
    assert "st" not in engine.tables()


def test_sql_copy_from(engine, tmp_path):
    csv = tmp_path / "in.csv"
    csv.write_text("a;b\n1;foo\n2;bar\n")
    engine.sql("CREATE TABLE cp (a INT, b STRING)")
    engine.sql(f"COPY cp FROM '{csv}' WITH (FORMAT 'csv', DELIMITER ';')")
    assert engine.sql("SELECT COUNT(*) AS n FROM cp").collect()[0].n == 2
