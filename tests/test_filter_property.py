"""Property-based check: manifest file pruning is SOUND for arbitrary
conjunct predicates — a pruned scan returns exactly the rows of an
unpruned scan with the same residual filter.

The parser (dataset.py _parse_filter_string, reference filter_parser.go)
is best-effort by design; what must NEVER happen is a fragment pruned that
held a matching row. Random predicates over a multi-fragment dataset with
interleaved / disjoint / boundary values probe exactly that."""

from __future__ import annotations

import shutil
import tempfile

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from plan_spark.dataset import Dataset

_COLS = ("a", "b", "s")

_num_lit = st.integers(min_value=-5, max_value=25)
_str_lit = st.sampled_from(["x0", "x1", "x5", "zz", ""])


@st.composite
def _conjunct(draw):
    col = draw(st.sampled_from(_COLS))
    kind = draw(st.sampled_from(["cmp", "in"]))
    if kind == "in":
        if col == "s":
            vals = draw(st.lists(_str_lit, min_size=1, max_size=3))
            lits = ", ".join(f"'{v}'" for v in vals)
        else:
            vals = draw(st.lists(_num_lit, min_size=1, max_size=3))
            lits = ", ".join(str(v) for v in vals)
        return f"{col} IN ({lits})"
    op = draw(st.sampled_from(["=", "<", "<=", ">", ">=", "!="]))
    if col == "s":
        return f"{col} {op} '{draw(_str_lit)}'"
    if col == "b" and draw(st.booleans()):
        return f"{col} {op} {draw(_num_lit)}.5"
    return f"{col} {op} {draw(_num_lit)}"


_pred = st.lists(_conjunct(), min_size=1, max_size=3).map(" AND ".join)


@pytest.fixture(scope="module")
def pruned_ds(spark):
    d = tempfile.mkdtemp(prefix="plan_spark_prop_")
    # three fragments with partly-overlapping ranges and disjoint string
    # sets, so different predicates prune different subsets
    base = spark.range(0, 60).select(
        F.col("id").cast("int").alias("a"),
        (F.col("id") % 7).cast("double").alias("b"),
        F.concat(F.lit("x"), (F.col("id") % 10).cast("string")).alias("s"),
    )
    ds = Dataset.create(spark, d, base.filter("a < 20").coalesce(1))
    ds.append(base.filter("a >= 15 AND a < 40").coalesce(1))
    ds.append(base.filter("a >= 40").coalesce(1))
    yield ds
    shutil.rmtree(d, ignore_errors=True)


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(pred=_pred)
def test_pruned_scan_equals_unpruned_scan(pruned_ds, pred):
    got = sorted(
        tuple(r) for r in pruned_ds.to_df(pred).select("a", "b", "s").collect()
    )
    want = sorted(
        tuple(r)
        for r in pruned_ds.to_df().filter(F.expr(pred)).select("a", "b", "s").collect()
    )
    assert got == want, f"pruning changed results for predicate: {pred!r}"


@pytest.fixture(scope="module")
def zordered_ds(spark):
    d = tempfile.mkdtemp(prefix="plan_spark_prop_z_")
    base = spark.range(0, 60).select(
        F.col("id").cast("int").alias("a"),
        (F.col("id") % 7).cast("double").alias("b"),
        F.concat(F.lit("x"), (F.col("id") % 10).cast("string")).alias("s"),
    )
    ds = Dataset.create(spark, d, base.repartition(3))
    ds.compact(strategy="zorder", zorder_by=["a", "b"], target_files=4)
    yield ds
    shutil.rmtree(d, ignore_errors=True)


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(pred=_pred)
def test_zordered_pruning_is_sound(zordered_ds, pred):
    """Same soundness property over a z-order-clustered layout — the
    bounding-box (rtree-class) pruning path must never drop a matching
    fragment either."""
    got = sorted(
        tuple(r) for r in zordered_ds.to_df(pred).select("a", "b", "s").collect()
    )
    want = sorted(
        tuple(r)
        for r in zordered_ds.to_df()
        .filter(F.expr(pred))
        .select("a", "b", "s")
        .collect()
    )
    assert got == want, f"z-order pruning changed results for: {pred!r}"


# predicates with OR / parens / mixed precedence — the shapes the OR-aware
# top-level splitter must never mis-prune, and (with a btree index present)
# the auto index routing must never mis-route
_bool_pred = st.lists(_conjunct(), min_size=2, max_size=4).flatmap(
    lambda cs: st.sampled_from(
        [
            " OR ".join(cs),
            f"{cs[0]} OR " + " AND ".join(cs[1:]),
            " AND ".join(cs[:-1]) + f" OR {cs[-1]}",
            "(" + " OR ".join(cs[:2]) + ")" + (
                " AND " + " AND ".join(cs[2:]) if cs[2:] else ""
            ),
        ]
    )
)


@pytest.fixture(scope="module")
def indexed_ds(spark):
    """Same layout as pruned_ds plus a fresh btree index on `a` and stable
    row ids, so the auto-routing path is live for every predicate."""
    d = tempfile.mkdtemp(prefix="plan_spark_prop_idx_")
    base = spark.range(0, 60).select(
        F.col("id").cast("int").alias("a"),
        (F.col("id") % 7).cast("double").alias("b"),
        F.concat(F.lit("x"), (F.col("id") % 10).cast("string")).alias("s"),
    )
    ds = Dataset.create(spark, d, base.filter("a < 20").coalesce(1), row_ids=True)
    ds.append(base.filter("a >= 15 AND a < 40").coalesce(1))
    ds.append(base.filter("a >= 40").coalesce(1))
    ds.create_index("ia", kind="btree", column="a", n_runs=3)
    yield ds
    shutil.rmtree(d, ignore_errors=True)


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(pred=_bool_pred)
def test_or_predicates_never_misprune(indexed_ds, pred):
    got = sorted(
        tuple(r) for r in indexed_ds.to_df(pred).select("a", "b", "s").collect()
    )
    want = sorted(
        tuple(r)
        for r in indexed_ds.to_df(use_indexes=False)
        .filter(F.expr(pred))
        .select("a", "b", "s")
        .collect()
    )
    assert got == want, f"pruning/routing changed results for: {pred!r}"
