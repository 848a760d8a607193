"""The reference's VERBATIM TPC-H query texts through the SQL front door.

Each file under /root/reference/cases/tpch/query/ is fed to ``Engine.sql()``
as-is — leading ``--`` dialect-marker comments, tab indentation, trailing
semicolon — and the result is compared to DuckDB running the SAME text over
the same data. This proves dialect parity (interval arithmetic, date
literals, ``substring(x from i for n)``, implicit comma joins, correlated
subqueries) on the reference's own inputs rather than on adapted rewrites.

The driver fixtures are a SLIMMED TPC-H: no partsupp table, and several
spec columns are absent (o_shippriority, l_commitdate/l_receiptdate,
l_shipmode/l_shipinstruct, c_address/c_phone, p_container, o_comment,
s_address/s_comment, n_comment). Queries needing those CANNOT run on this
data — the contract is a LOUD AnalysisException, never a silent wrong
answer; `RUNNABLE` below is exactly the subset the fixture schema supports.
"""

from __future__ import annotations

import os
import shutil
import tempfile

import duckdb
import pandas as pd
import pytest

from plan_spark.engine import Engine

QUERY_DIR = "/root/reference/cases/tpch/query"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders", "lineitem"]
# verbatim spec texts the slimmed fixture schema can satisfy
RUNNABLE = [1, 5, 6, 7, 8, 14, 18]
# verbatim texts that reference absent columns/tables: must fail LOUDLY
UNRUNNABLE = [3, 4, 9, 10, 12, 13, 15, 17, 19, 21, 22]

pytestmark = pytest.mark.skipif(
    not os.path.isdir(QUERY_DIR), reason="reference query files not present"
)


# deterministic key->name mapping applied IDENTICALLY on both engines:
# the fixture's synthetic NATION_i names make every spec text that filters
# on real nation names vacuous (q7's FRANCE/ARGENTINA pair). The spec's
# 25 names are assigned by n_nationkey, EXCEPT that FRANCE and ARGENTINA
# land on keys 20 and 19 — the supplier<->customer pair with the most
# cross trade inside q7's 1995-1996 ship window at sf0.001 (10 suppliers
# total, so most nation pairs carry zero) — making q7 genuinely exercise
# its comma-join + OR-of-nation-pairs shape. Date-window (q5) and
# p_type-literal (q8) vacuity is data-range-bound and stays — asserted
# empty on BOTH engines below.
_NATION_NAMES = [
    "ALGERIA", "ARGENTINA", "BRAZIL", "CANADA", "EGYPT", "ETHIOPIA",
    "FRANCE", "GERMANY", "INDIA", "INDONESIA", "IRAN", "IRAQ", "JAPAN",
    "JORDAN", "KENYA", "MOROCCO", "MOZAMBIQUE", "PERU", "CHINA", "ROMANIA",
    "SAUDI ARABIA", "VIETNAM", "RUSSIA", "UNITED KINGDOM", "UNITED STATES",
]
for _a, _b in ((6, 20), (1, 19)):  # FRANCE -> key 20, ARGENTINA -> key 19
    _NATION_NAMES[_a], _NATION_NAMES[_b] = _NATION_NAMES[_b], _NATION_NAMES[_a]


@pytest.fixture(scope="module")
def tpch_engine(spark):
    """An Engine whose tables are the sf0.001 fixture parquet, loaded via
    the front door (CREATE TABLE from the parquet schema + COPY FROM);
    nation names are remapped to the spec's names on BOTH engines."""
    from pyspark.sql import functions as F

    d = tempfile.mkdtemp(prefix="plan_spark_verbatim_")
    eng = Engine(spark, d)
    sf = "/root/testdata/sf0.001"
    nation_remap = os.path.join(d, "nation_remap.parquet")
    (
        spark.read.parquet(f"{sf}/nation.parquet")
        .withColumn(
            "n_name",
            F.element_at(
                F.array(*[F.lit(n) for n in _NATION_NAMES]),
                F.col("n_nationkey").cast("int") + 1,
            ),
        )
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(nation_remap)
    )
    for t in TABLES:
        schema = spark.read.parquet(f"{sf}/{t}.parquet").schema
        ddl = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in schema.fields)
        eng.create_table(t, ddl)
        src = nation_remap if t == "nation" else f"{sf}/{t}.parquet"
        eng.sql(f"COPY {t} FROM '{src}'")
    con = duckdb.connect()
    names_sql = ", ".join(f"'{n}'" for n in _NATION_NAMES)
    for t in TABLES:
        if t == "nation":
            con.execute(
                f"CREATE VIEW nation AS SELECT n_nationkey, "
                f"list_value({names_sql})[n_nationkey + 1] AS n_name, "
                f"n_regionkey FROM read_parquet('{sf}/nation.parquet')"
            )
        else:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')"
            )
    yield eng, con
    con.close()
    shutil.rmtree(d, ignore_errors=True)


def _canon(df: pd.DataFrame) -> list[tuple]:
    """Order-insensitive, float-tolerant canonical form: columns sorted by
    name, numerics rounded to 6 significant-ish decimals, rows sorted."""
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]").astype(str)
        elif df[c].dtype == object or str(df[c].dtype).startswith("decimal"):
            # decimals (Spark) and decimal.Decimal objects (DuckDB) compare
            # via a fixed-precision float rendering
            df[c] = df[c].map(
                lambda v: f"{float(v):.6f}"
                if isinstance(v, (int, float)) or hasattr(v, "as_integer_ratio")
                or type(v).__name__ == "Decimal"
                else str(v)
            )
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].map(lambda v: f"{v:.6f}")
        else:
            df[c] = df[c].astype(str)
    return sorted(map(tuple, df.values.tolist()))


@pytest.mark.parametrize("q", RUNNABLE)
def test_verbatim_matches_duckdb(tpch_engine, q):
    eng, con = tpch_engine
    text = open(f"{QUERY_DIR}/q{q}.sql").read()
    got = _canon(eng.sql(text).toPandas())
    want = _canon(con.execute(text).df())
    assert got == want, f"q{q} verbatim mismatch: {got[:3]} vs {want[:3]}"


def test_verbatim_q1_nonvacuous(tpch_engine):
    """q1 must actually aggregate rows (guards against an all-empty sweep
    silently passing the comparison)."""
    eng, _ = tpch_engine
    text = open(f"{QUERY_DIR}/q1.sql").read()
    rows = eng.sql(text).collect()
    assert len(rows) >= 4 and all(r.count_order > 0 for r in rows)


@pytest.mark.parametrize("q", [7, 14, 18])
def test_verbatim_more_nonvacuous(tpch_engine, q):
    """These spec texts must return DATA (q7 via the nation-name remap,
    q14/q18 via predicate windows the fixture range covers) — an empty
    match on both engines would be a vacuous pass."""
    eng, _ = tpch_engine
    df = eng.sql(open(f"{QUERY_DIR}/q{q}.sql").read()).toPandas()
    assert len(df.dropna(how="all")) > 0, f"q{q} is vacuous"


@pytest.mark.parametrize("q", [5, 8])
def test_verbatim_vacuous_on_both_engines(tpch_engine, q):
    """q5/q8 stay empty (1994 order window / exact p_type literal the
    synthetic fixtures don't contain) — asserted empty on BOTH engines so
    a fixture change that un-vacuouses them flips this test, prompting a
    promotion into the non-vacuous guard above."""
    eng, con = tpch_engine
    text = open(f"{QUERY_DIR}/q{q}.sql").read()
    assert len(eng.sql(text).toPandas().dropna(how="all")) == 0
    assert len(con.execute(text).df().dropna(how="all")) == 0


@pytest.mark.parametrize("q", UNRUNNABLE)
def test_unrunnable_fail_loud(tpch_engine, q):
    """Spec queries needing columns the slimmed fixtures lack must raise,
    never return a silently-wrong frame."""
    eng, _ = tpch_engine
    text = open(f"{QUERY_DIR}/q{q}.sql").read()
    with pytest.raises(Exception) as ei:
        eng.sql(text).collect()
    msg = str(ei.value)
    assert "UNRESOLVED_COLUMN" in msg or "TABLE_OR_VIEW_NOT_FOUND" in msg


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
