"""Property-based check of the as-of join against a brute-force reference.

The reference repo has no property/randomized tests (SURVEY.md §5); the
as-of join is our most semantics-heavy custom operator, so it gets one:
random key/timestamp layouts (duplicates, empty sides, all-late rows) must
match the O(n*m) definition exactly.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from plan_spark.operators.asof import asof_join

_key = st.integers(min_value=0, max_value=3)
_ts = st.integers(min_value=0, max_value=50)
_val = st.integers(min_value=0, max_value=1000)

_left = st.lists(st.tuples(_key, _ts), min_size=0, max_size=20)
_right = st.lists(st.tuples(_key, _ts, _val), min_size=0, max_size=20)


def _brute(left, right):
    """max-ts right row with rts <= lts per key; among right rows tied on
    (key, ts) the greatest payload wins (the operator's documented
    deterministic tiebreak)."""
    out = []
    for i, (k, lts) in enumerate(left):
        best = None
        for rk, rts, v in right:
            if rk == k and rts <= lts and (best is None or (rts, v) > best):
                best = (rts, v)
        out.append((i, k, lts, best[1] if best else None))
    return sorted(out)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(left=_left, right=_right)
def test_asof_matches_brute_force(spark, left, right):
    # duplicate (key, ts) right rows are kept: the operator must pick the
    # greatest payload among them, deterministically
    ldf = spark.createDataFrame(
        [(i, k, t) for i, (k, t) in enumerate(left)] or [(None, None, None)],
        "idx long, k long, ts long",
    ).filter("idx IS NOT NULL")
    rdf = spark.createDataFrame(
        right or [(None, None, None)], "k long, rts long, v long"
    ).filter("k IS NOT NULL")
    got = sorted(
        (r.idx, r.k, r.ts, r.v)
        for r in asof_join(
            ldf, rdf, on="k", left_ts="ts", right_ts="rts", payload=["v"]
        ).collect()
    )
    assert got == _brute(left, right)
