"""ALL 99 of the reference's VERBATIM TPC-DS query texts through the SQL
front door.

The reference ships the full TPC-DS corpus (cases/tpcds/query/query1..99.sql
+ the star-schema DDL, cases/tpcds/tpcds.sql) but cannot execute it — its
planner has no window operator (pkg/plan/expr_properties.go:273 'window
function is not supported'). Here every file's text is fed UNMODIFIED to
``Engine.sql()`` — double-quoted aliases, interval arithmetic, comma joins,
trailing semicolon — and compared against DuckDB running the SAME text over
the SAME parquet (tests/tpcds_fullgen.py's deterministic full-schema
micro-fixture). This retires the shape-probe asterisk: the corpus RUNS.

Multi-part files: query14/23/24/39 each contain TWO top-level statements
(the spec emits both variants); the tester harness feeds statements one at
a time, so each part is its own case here (the front door rejects
multi-statement text by design).

Dialect notes (all handled by the front door, not by editing the texts):
- double-quoted identifiers (``as "order count"``) — pg-dialect rule,
  rewritten to backticks by Engine._rewrite_quoted_idents;
- ``cast(... as date) + interval '30 day'`` / ``+ 30 days`` — Spark SQL
  native;
- query30 references c_last_review_date_sk (TPC-DS v2.x rename); the
  fixture carries the column alongside the DDL's legacy
  c_last_review_date, so the text runs on both engines (see
  tpcds_fullgen docstring).

Non-vacuity: every one of the 103 parts is asserted NON-VACUOUS — the
fixture's per-query plants (tpcds_fullgen.apply_plants) put live rows
behind even the deep conjunctions (q64's cross-channel chain, q85's
demographic×price×state bands, q23/q24's corpus-average thresholds).
MAY_BE_EMPTY exists as the escape hatch for future fixture changes but is
currently empty.
"""

from __future__ import annotations

import math
import os
import re
import shutil
import tempfile

import duckdb
import pandas as pd
import pytest

from plan_spark.engine import Engine
from tests.tpcds_fullgen import generate, parse_ddl

QUERY_DIR = "/root/reference/cases/tpcds/query"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(QUERY_DIR), reason="reference query files not present"
)

# (query number, part index) for every top-level statement in the corpus
def _parts() -> list[tuple[int, int]]:
    out = []
    for q in range(1, 100):
        text = open(f"{QUERY_DIR}/query{q}.sql").read()
        n = len(_split(text))
        out.extend((q, i) for i in range(n))
    return out


def _split(text: str) -> list[str]:
    """Top-level statement split on ';' outside single-quoted literals."""
    parts, cur, i = [], [], 0
    in_str = False
    for ch in text:
        if ch == "'":
            in_str = not in_str
        if ch == ";" and not in_str:
            s = "".join(cur).strip()
            if s:
                parts.append(s)
            cur = []
        else:
            cur.append(ch)
    s = "".join(cur).strip()
    if s:
        parts.append(s)
    return parts


ALL_PARTS = _parts() if os.path.isdir(QUERY_DIR) else []

# parts whose EMPTY result is legitimate on a micro-fixture (corpus-scale
# value thresholds); everything else must be non-vacuous
MAY_BE_EMPTY: set[tuple[int, int]] = set()

# ORACLE-side text patches — applied ONLY to the DuckDB run (the engine
# always gets the raw file text). Each is a spec-text defect DuckDB
# rejects but a laxer binder accepts:
# - q58 orders by a bare `item_id` projected from all three CTE arms of a
#   3-way equijoin on exactly that column; the equality makes every
#   resolution identical, Spark binds it, DuckDB refuses the ambiguity.
# - q72 same class: bare `d_week_seq` in ORDER BY with d1/d2/d3 in scope,
#   equated by the join predicates for the surviving rows.
# - q77 uses the bare alias `returns`, a DuckDB reserved word; quoting it
#   is pure dialect, not semantics.
# - q54's `cast((revenue/50) as int)` lands on exact .5 boundaries
#   (revenue ≡ 25.00 mod 50.00); Spark truncates decimal->int casts,
#   DuckDB rounds, and the spec pins neither — the floor() pin makes the
#   compare about values, same as the null-order SET above.
def _oracle_patch(q: int, text: str) -> str:
    if q == 58:
        return text.replace("order by item_id", "order by ss_items.item_id")
    if q == 72:
        return re.sub(r"order by (.*), d_week_seq", r"order by \1, d1.d_week_seq", text)
    if q == 77:
        return re.sub(r"(?<![\w_])returns(?![\w_])", '"returns"', text)
    if q == 54:
        return text.replace(
            "cast((revenue/50) as int)", "cast(floor(revenue/50) as int)"
        )
    return text


@pytest.fixture(scope="module")
def tpcds_engine(spark):
    d = tempfile.mkdtemp(prefix="plan_spark_tpcds_")
    data = os.path.join(d, "data")
    generate(data)
    eng = Engine(spark, os.path.join(d, "eng"))
    con = duckdb.connect()
    # the spec never pins NULL placement in ORDER BY; Spark defaults to
    # NULLS FIRST (ASC) and DuckDB to NULLS LAST, which silently selects
    # DIFFERENT rows at a LIMIT boundary in the rollup queries (q14/q67).
    # Pin the oracle to Spark's convention so the compare is about values.
    con.execute("SET default_null_order='nulls_first'")
    for t in parse_ddl():
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
    if v is None or (isinstance(v, float) and math.isnan(v)):
        return None
    if isinstance(v, bool):
        return str(v)
    if isinstance(v, (int, float)) or type(v).__name__ == "Decimal":
        return float(v)
    if hasattr(v, "isoformat"):
        s = v.isoformat()[:19]
        return s + "T00:00:00" if len(s) == 10 else s
    return str(v)


def _canon(df: pd.DataFrame) -> list[list]:
    """POSITIONAL canonical form: both engines run the identical SELECT
    list, so column positions always align — and q39's `inv1.*, inv2.*`
    emits DUPLICATE column names, which a sort-by-name canon (the TPC-H
    harness form) cannot handle (pandas explodes duplicate labels and the
    two engines mangle them differently)."""
    rows = [[_cell(v) for v in rec] for rec in df.itertuples(index=False)]

    def key(r):
        return [f"{x + 0.0:.9g}" if isinstance(x, float) else repr(x) for x in r]

    return sorted(rows, key=key)


def _assert_rows_close(got: list[list], want: list[list], tag: str) -> None:
    assert len(got) == len(want), f"{tag}: {len(got)} rows vs oracle {len(want)}"
    for i, (g, w) in enumerate(zip(got, want)):
        assert len(g) == len(w), f"{tag} row {i}: arity {len(g)} vs {len(w)}"
        for a, b in zip(g, w):
            if isinstance(a, float) and isinstance(b, float):
                ok = math.isclose(a, b, rel_tol=1e-9, abs_tol=1e-6)
            else:
                ok = a == b
            assert ok, f"{tag} row {i}: {g} vs oracle {w}"


@pytest.mark.parametrize(
    "q,part", ALL_PARTS, ids=[f"q{q}p{p}" for q, p in ALL_PARTS]
)
def test_verbatim_matches_duckdb(tpcds_engine, q, part):
    eng, con = tpcds_engine
    text = _split(open(f"{QUERY_DIR}/query{q}.sql").read())[part]
    got = _canon(eng.sql(text).toPandas())
    want = _canon(con.execute(_oracle_patch(q, text)).df())
    if (q, part) not in MAY_BE_EMPTY:
        assert want, f"q{q} part {part} vacuous on the fixture"
    _assert_rows_close(got, want, f"q{q}p{part}")


class TestVerbatimPlans:
    """The front door must not cost Catalyst its optimizations: even for
    UNMODIFIED spec texts, filters reach the parquet scans, projections
    prune columns, and nothing falls back to Python row evaluation."""

    def _plan(self, eng, q: int, part: int = 0) -> str:
        text = _split(open(f"{QUERY_DIR}/query{q}.sql").read())[part]
        df = eng.sql(text)
        return df._jdf.queryExecution().explainString(
            df._sc._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("simple")
        )

    def test_q3_pushdown_and_pruning(self, tpcds_engine):
        eng, _ = tpcds_engine
        p = self._plan(eng, 3)
        # the dimension literals land in the scans, not in post-filters
        assert "PushedFilters" in p and "816" in p
        # column pruning: the 23-column fact scan reads only its join/
        # measure columns
        scans = re.findall(r"ReadSchema: struct<([^>]*)>", p)
        assert any(len(s.split(",")) <= 6 for s in scans), scans
        assert "BatchEvalPython" not in p

    def test_q7_no_python_no_cartesian(self, tpcds_engine):
        eng, _ = tpcds_engine
        p = self._plan(eng, 7)
        assert "BatchEvalPython" not in p
        assert "CartesianProduct" not in p

    def test_q51_windows_survive_front_door(self, tpcds_engine):
        eng, _ = tpcds_engine
        p = self._plan(eng, 51)
        assert p.count("Window") >= 2
        assert "BatchEvalPython" not in p

    # ---- r11: gates on the bench-scale sweep's slowest texts (r10
    # verdict #5 — tests/tpcds_bench.py at fact_scale=20, store_sales
    # ~560k: q14/q14_p1/q23/q23_p1/q72 head the table). Plan SHAPE is
    # scale-independent up to AQE's broadcast promotions, so the micro
    # fixture's plans pin the structure the bench scale runs. ----

    def test_q14_cross_channel_intersection_no_cartesian(self, tpcds_engine):
        """q14 (both parts): the iceberg cross-channel CTE stack — the
        bench sweep's slowest text. The intersect-of-channels and the
        avg-threshold scalar subquery must stay hash joins/aggregates:
        no cartesian product, no Python, and the rollup still Expands
        over grouped partials."""
        eng, _ = tpcds_engine
        for part in (0, 1):
            p = self._plan(eng, 14, part)
            assert "CartesianProduct" not in p, f"part {part}"
            assert "BatchEvalPython" not in p
            assert p.count("HashAggregate") >= 6

    def test_q23_max_channel_union_shapes(self, tpcds_engine):
        """q23 (both parts): frequent-item + best-customer CTEs feeding a
        channel union — semi-join/aggregate stack, no cartesian, no
        Python fallback."""
        eng, _ = tpcds_engine
        for part in (0, 1):
            p = self._plan(eng, 23, part)
            assert "CartesianProduct" not in p, f"part {part}"
            assert "BatchEvalPython" not in p
            assert "Union" in p or p.count("HashAggregate") >= 4

    def test_q72_inventory_week_join_no_blowup(self, tpcds_engine):
        """q72: the catalog_sales x inventory (part, week) join — the
        classic TPC-DS blowup query. The join must stay a hash equijoin
        (never nested-loop over the fact pair) with every demographic
        dim broadcast."""
        eng, _ = tpcds_engine
        p = self._plan(eng, 72)
        assert "CartesianProduct" not in p
        assert "BroadcastNestedLoopJoin" not in p
        assert p.count("BroadcastHashJoin") >= 4
        assert "BatchEvalPython" not in p

    def test_q64_sale_return_chain_hash_joins_only(self, tpcds_engine):
        """q64: the deepest join chain in the corpus (cross_sales built
        from ~12 relations, self-joined across years) — every join a
        hash join, no Python."""
        eng, _ = tpcds_engine
        p = self._plan(eng, 64)
        assert "CartesianProduct" not in p
        assert "BatchEvalPython" not in p
        assert p.count("HashJoin") >= 10
