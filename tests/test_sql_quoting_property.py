"""Property tests for the statement grammar's shared quote scanner
(engine._scan_top_level and the operand splits built on it): for ANY
string literal content — commas, keywords, parens, single/double quotes,
backslashes — an UPDATE carrying it must round-trip the exact value, and
the pure splitting helpers must agree with a character-level reference
implementation. This pins the bug class the r5 review passes kept
re-finding (regex backtracking into literals) shut permanently."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from plan_spark.engine import _find_top_level_kw, _split_top_level_commas

# content drawn from the adversarial alphabet: quote chars, escapes,
# separators, and the keywords the grammar splits on
_ADVERSARIAL = st.lists(
    st.sampled_from(
        list("ab,'\"\\()=; ") + ["WHERE", "SET", "VALUES", "AND", " WHERE "]
    ),
    min_size=0,
    max_size=12,
).map("".join)


def _sql_quote(value: str) -> str:
    """Escape a Python string into a Spark SQL single-quoted literal
    (Spark's default parser: backslash escapes are live, so both the
    backslash and the quote must be escaped)."""
    return "'" + value.replace("\\", "\\\\").replace("'", "\\'") + "'"


@given(_ADVERSARIAL)
@settings(
    max_examples=200,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_split_helpers_never_cut_inside_literals(content):
    """A comma list whose middle element is an arbitrary quoted literal
    must split into exactly three parts, with the literal intact; a WHERE
    inside the literal must be invisible to the keyword finder while the
    real trailing WHERE is found."""
    lit = _sql_quote(content)
    parts = _split_top_level_commas(f"a = 1, b = {lit}, c = 2")
    assert len(parts) == 3, parts
    assert parts[1].strip() == f"b = {lit}"
    s = f"x = {lit} WHERE k = 1"
    i = _find_top_level_kw(s, "WHERE")
    assert i == len(f"x = {lit} "), (s, i)
    # no top-level WHERE at all -> -1, whatever the literal contains
    assert _find_top_level_kw(f"x = {lit}", "WHERE") == -1


@given(st.lists(_ADVERSARIAL, min_size=1, max_size=3), _ADVERSARIAL)
@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_update_roundtrips_any_literal(spark, values, pred_lit):
    """End to end: UPDATE ... SET v = '<anything>' [WHERE with a literal]
    stores exactly that value (engine statement parsing + Spark literal
    semantics agree)."""
    import os
    import shutil
    import tempfile

    from plan_spark.engine import Engine

    d = tempfile.mkdtemp(prefix="plan_spark_qprop_")
    try:
        eng = Engine(spark, os.path.join(d, "wh"))
        eng.sql("CREATE TABLE qp (k INT, v STRING)")
        eng.sql("INSERT INTO qp VALUES " + ", ".join(
            f"({i}, 'seed')" for i in range(len(values))
        ))
        for i, val in enumerate(values):
            eng.sql(
                f"UPDATE qp SET v = {_sql_quote(val)} "
                f"WHERE k = {i} AND {_sql_quote(pred_lit)} = {_sql_quote(pred_lit)}"
            )
        got = {r.k: r.v for r in eng.sql("SELECT k, v FROM qp").collect()}
        assert got == {i: v for i, v in enumerate(values)}
    finally:
        shutil.rmtree(d, ignore_errors=True)
