"""ALL 22 of the reference's VERBATIM TPC-H query texts through the SQL
front door.

Each file under /root/reference/cases/tpch/query/ is fed to ``Engine.sql()``
as-is — leading ``--`` dialect-marker comments, tab indentation, trailing
semicolon — and the result is compared to DuckDB running the SAME text over
the same parquet. This proves dialect parity (interval arithmetic, date
literals, ``substring(x from i for n)``, subquery alias column lists,
implicit comma joins, correlated and doubly-nested subqueries, EXISTS/NOT
EXISTS stacks) on the reference's own inputs rather than on adapted
rewrites — the reference's tester harness bar (AGENTS.md:148 runs all 22;
cmd/tester/main.go feeds the raw file text to the engine).

The driver fixtures are a SLIMMED TPC-H (no partsupp, ~10 spec columns
absent), so the data here is tests/tpch_fullgen.py's deterministic
full-schema micro-fixture: every table and column of the reference DDL
(cases/tpch/query/ddl.sql), spec value pools, and per-query non-vacuity
plants. Every text is asserted NON-VACUOUS below — an all-empty sweep
can never pass silently.
"""

from __future__ import annotations

import math
import os
import shutil
import tempfile

import duckdb
import pandas as pd
import pytest

from plan_spark.engine import Engine
from tests.tpch_fullgen import generate

QUERY_DIR = "/root/reference/cases/tpch/query"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "partsupp",
    "orders", "lineitem",
]
ALL_QUERIES = list(range(1, 23))

pytestmark = pytest.mark.skipif(
    not os.path.isdir(QUERY_DIR), reason="reference query files not present"
)


@pytest.fixture(scope="module")
def tpch_engine(spark):
    """An Engine whose tables are the full-schema micro-fixture, loaded via
    the front door (CREATE TABLE from the parquet schema + COPY FROM), and
    a DuckDB connection with views over the SAME parquet files."""
    d = tempfile.mkdtemp(prefix="plan_spark_verbatim_")
    data = os.path.join(d, "data")
    generate(data)
    eng = Engine(spark, os.path.join(d, "eng"))
    con = duckdb.connect()
    for t in TABLES:
        schema = spark.read.parquet(f"{data}/{t}.parquet").schema
        ddl = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in schema.fields)
        eng.create_table(t, ddl)
        eng.sql(f"COPY {t} FROM '{data}/{t}.parquet'")
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{data}/{t}.parquet')"
        )
    yield eng, con
    con.close()
    shutil.rmtree(d, ignore_errors=True)


def _cell(v):
    """Canonical cell: numerics to float (compared with tolerance), dates
    and strings to str. None stays None."""
    if v is None or (isinstance(v, float) and math.isnan(v)):
        return None
    if isinstance(v, bool):
        return str(v)
    if isinstance(v, (int, float)) or type(v).__name__ == "Decimal":
        return float(v)
    if hasattr(v, "isoformat"):
        s = v.isoformat()[:19]
        # a DATE and a midnight TIMESTAMP are the same temporal value; the
        # engines differ only in which one the parquet date column decodes to
        return s + "T00:00:00" if len(s) == 10 else s
    return str(v)


def _canon(df: pd.DataFrame) -> list[list]:
    """Order-insensitive canonical form: columns sorted by (lowercased)
    name, rows sorted by the stringified tuple. Numeric cells stay floats
    so the final comparison can be tolerant — double aggregation order
    differs between engines, so exact string equality would be wrong."""
    cols = sorted(df.columns, key=lambda c: c.lower())
    rows = [[_cell(v) for v in rec] for rec in df[cols].itertuples(index=False)]

    def key(r):
        # floats sort by a rounded rendering so a cross-engine ulp wobble
        # (or -0.0 vs 0.0) cannot reorder rows and misalign the compare
        return [f"{x + 0.0:.9g}" if isinstance(x, float) else repr(x) for x in r]

    return sorted(rows, key=key)


def _assert_rows_close(got: list[list], want: list[list], q: int) -> None:
    assert len(got) == len(want), f"q{q}: {len(got)} rows vs oracle {len(want)}"
    for i, (g, w) in enumerate(zip(got, want)):
        assert len(g) == len(w), f"q{q} row {i}: arity {len(g)} vs {len(w)}"
        for a, b in zip(g, w):
            if isinstance(a, float) and isinstance(b, float):
                ok = math.isclose(a, b, rel_tol=1e-9, abs_tol=1e-6)
            else:
                ok = a == b
            assert ok, f"q{q} row {i}: {g} vs oracle {w}"


@pytest.mark.parametrize("q", ALL_QUERIES)
def test_verbatim_matches_duckdb(tpch_engine, q):
    eng, con = tpch_engine
    text = open(f"{QUERY_DIR}/q{q}.sql").read()
    got = _canon(eng.sql(text).toPandas())
    want = _canon(con.execute(text).df())
    # non-vacuity: fullgen plants make every spec text return data; a
    # mutually-empty comparison must fail loudly, not pass silently
    assert any(any(c is not None for c in r) for r in want), f"q{q} vacuous"
    _assert_rows_close(got, want, q)


def test_verbatim_q1_nonvacuous(tpch_engine):
    """q1 must aggregate real row mass (guards a degenerate fixture)."""
    eng, _ = tpch_engine
    rows = eng.sql(open(f"{QUERY_DIR}/q1.sql").read()).collect()
    assert len(rows) >= 4 and all(r.count_order > 100 for r in rows)


def test_front_door_accepts_comments_and_semicolon(tpch_engine):
    """The raw .sql file shape — comment header, trailing ';' — is accepted
    by the statement splitter; a ';' or '--' INSIDE a literal still isn't a
    separator/comment."""
    eng, _ = tpch_engine
    df = eng.sql("-- header comment\nSELECT 1 AS x;\n")
    assert df.collect()[0].x == 1
    df = eng.sql("SELECT 'a;b--c' AS s")
    assert df.collect()[0].s == "a;b--c"
    with pytest.raises(ValueError, match="multi-statement"):
        eng.sql("SELECT 1; SELECT 2")
