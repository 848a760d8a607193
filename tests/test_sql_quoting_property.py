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


# --------------------------------------------------- _Stmt cursor properties
@given(_ADVERSARIAL)
@settings(
    max_examples=200,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_cursor_paren_body_and_string_lit_roundtrip(content):
    """The statement cursor's balanced-paren scan and string-literal
    decoder must round-trip ANY content: a paren body containing quoted
    parens/quotes comes back verbatim, and string_lit decodes exactly what
    _sql_quote encoded (same escape rules as Spark's parser)."""
    from plan_spark.engine import _Stmt

    lit = _sql_quote(content)
    # body contains a quoted literal with hostile chars + nested parens
    body = f"x = {lit}, y = (1 + (2))"
    p = _Stmt(f"({body}) TRAILER")
    assert p.paren_body() == body
    assert p.try_kw("TRAILER") and p.at_end()
    q = _Stmt(f"{lit} rest")
    assert q.string_lit() == content
    assert q.try_kw("rest") and q.at_end()


@given(_ADVERSARIAL)
@settings(
    max_examples=100,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_cursor_kw_never_matches_inside_literals_or_words(content):
    """try_kw is word-bounded and literal-blind by construction: a keyword
    embedded in an identifier or inside a quoted literal never matches."""
    from plan_spark.engine import _Stmt

    p = _Stmt("SELECTx FROM t")
    assert not p.try_kw("SELECT")
    lit = _sql_quote(f"WHERE {content}")
    q = _Stmt(f"{lit} WHERE k")
    assert q.string_lit() == f"WHERE {content}"
    assert q.try_kw("WHERE")  # the real one, after the literal
    assert q.ident("col") == "k"


def test_cursor_statement_smoke(spark):
    """Adversarial end-to-end heads through sql(): quoted literals carrying
    keywords/parens in CREATE TABLE DEFAULTs, COPY paths, and MERGE
    subqueries parse to the right statement."""
    import os
    import shutil
    import tempfile

    from plan_spark.engine import Engine

    d = tempfile.mkdtemp(prefix="plan_spark_cursor_")
    try:
        eng = Engine(spark, os.path.join(d, "wh"))
        # DEFAULT literal containing ') WITH (ENFORCE' and commas/keywords
        eng.sql(
            "CREATE TABLE ct (a INT, b STRING DEFAULT "
            "'x, PRIMARY KEY (oops) WITH (ENFORCE) NOT NULL')"
        )
        eng.sql("INSERT INTO ct (a) VALUES (1)")
        v = eng.sql("SELECT b FROM ct").collect()[0].b
        assert v == "x, PRIMARY KEY (oops) WITH (ENFORCE) NOT NULL"
        # MERGE USING subquery with a literal containing ')' and WHEN
        eng.sql("CREATE TABLE mt (k INT, v STRING)")
        eng.sql("INSERT INTO mt VALUES (1, 'a')")
        eng.sql(
            "MERGE INTO mt USING (SELECT 2 AS k, ') WHEN MATCHED' AS v) "
            "ON k WHEN NOT MATCHED THEN INSERT *"
        )
        rows = {r.k: r.v for r in eng.sql("SELECT k, v FROM mt").collect()}
        assert rows == {1: "a", 2: ") WHEN MATCHED"}
        # COPY TO a path containing spaces, then back
        out = os.path.join(d, "od d")
        eng.sql(f"COPY mt TO '{out}' WITH (FORMAT parquet)")
        eng.sql("CREATE TABLE mt2 (k INT, v STRING)")
        eng.sql(f"COPY mt2 FROM '{out}'")
        assert eng.sql("SELECT COUNT(*) AS n FROM mt2").collect()[0].n == 2
    finally:
        shutil.rmtree(d, ignore_errors=True)


@given(
    st.lists(
        st.sampled_from(list("ab-`'\" ;\n") + ["--", "x`y"]),
        min_size=0,
        max_size=10,
    ).map("".join)
)
@settings(max_examples=200, deadline=None)
def test_split_statements_preserves_quoted_regions(content):
    """_split_statements strips -- comments and splits on ';' only OUTSIDE
    single-quoted, double-quoted, AND backquoted regions: any content
    packed into a literal or a backtick identifier survives verbatim
    (the r8 review found `a--b` identifiers being clipped)."""
    from plan_spark.engine import Engine

    # single-quoted literal: whatever the content, the statement is one
    # piece and the literal is intact
    lit = "'" + content.replace("\\", "\\\\").replace("'", "\\'") + "'"
    out = Engine._split_statements(f"SELECT {lit} AS s")
    assert len(out) == 1 and lit in out[0]
    # backquoted identifier: backticks guard -- and ; (`` doubling aside)
    if "`" not in content:
        ident = f"`{content or 'x'}`"
        out = Engine._split_statements(f"SELECT 1 AS {ident}")
        assert out == [f"SELECT 1 AS {ident}"]


def test_split_statements_comment_and_semicolon_edges():
    from plan_spark.engine import Engine

    f = Engine._split_statements
    assert f("SELECT `a--b` FROM t") == ["SELECT `a--b` FROM t"]
    assert f("SELECT 1 -- c\n;") == ["SELECT 1 \n"] or f(
        "SELECT 1 -- c\n;"
    ) == ["SELECT 1"]
    assert f("SELECT ';--' AS s") == ["SELECT ';--' AS s"]
    assert len(f("SELECT 1; SELECT 2")) == 2


class TestQuotedIdentRewrite:
    """Engine._rewrite_quoted_idents (r10): the pg-dialect rule — double
    quotes ALWAYS delimit identifiers — rewritten to Spark backticks,
    never inside single-quoted string literals."""

    def test_basic_alias(self):
        from plan_spark.engine import Engine

        assert (
            Engine._rewrite_quoted_idents('count(*) as "order count"')
            == "count(*) as `order count`"
        )

    def test_inside_string_literal_untouched(self):
        from plan_spark.engine import Engine

        s = "select 'he said \"hi\"' as s"
        assert Engine._rewrite_quoted_idents(s) == s

    def test_escaped_double_quote_in_identifier(self):
        from plan_spark.engine import Engine

        # "" inside a quoted identifier is the escaped-quote form
        assert (
            Engine._rewrite_quoted_idents('select 1 as "a""b"')
            == 'select 1 as `a"b`'
        )

    def test_backtick_in_identifier_escaped(self):
        from plan_spark.engine import Engine

        assert (
            Engine._rewrite_quoted_idents('select 1 as "a`b"')
            == "select 1 as `a``b`"
        )

    def test_literal_then_identifier(self):
        from plan_spark.engine import Engine

        s = "select 'x\"y' as a, \"col name\" from t"
        assert (
            Engine._rewrite_quoted_idents(s)
            == "select 'x\"y' as a, `col name` from t"
        )

    def test_doubled_single_quote_literal_boundary(self):
        from plan_spark.engine import Engine

        # '' inside a literal must not end it and expose the " to rewrite
        s = "select 'it''s \"quoted\"' as s"
        assert Engine._rewrite_quoted_idents(s) == s

    def test_no_quotes_no_change(self):
        from plan_spark.engine import Engine

        s = "select a, b from t where c = 1"
        assert Engine._rewrite_quoted_idents(s) == s

    def test_backslash_escaped_quote_keeps_literal_boundary(self):
        """The r10 advice bug: a Spark-default backslash-escaped quote
        ('don\\'t') must not desynchronize the literal scan — a double
        quote INSIDE a later string literal stays a string character,
        and a real quoted identifier after such a literal is still
        rewritten."""
        from plan_spark.engine import Engine

        s = "SELECT 'don\\'t' AS a, c FROM t WHERE c = 'say \"hi\" now'"
        assert Engine._rewrite_quoted_idents(s) == s
        s2 = "SELECT 'don\\'t' AS a, \"col name\" FROM t"
        assert (
            Engine._rewrite_quoted_idents(s2)
            == "SELECT 'don\\'t' AS a, `col name` FROM t"
        )
        # backslash-backslash then a REAL closing quote: literal ends,
        # the following quoted identifier is code and must rewrite
        s3 = "SELECT 'p\\\\' AS a, \"b c\" FROM t"
        assert (
            Engine._rewrite_quoted_idents(s3)
            == "SELECT 'p\\\\' AS a, `b c` FROM t"
        )

    def test_time_travel_scan_agrees_on_escapes(self):
        """_rewrite_time_travel's literal split uses the same escape-aware
        scan: a VERSION AS OF phrase INSIDE a backslash-escaped literal is
        never mistaken for a time-travel clause (no dataset open attempt,
        text unchanged)."""
        from plan_spark.engine import Engine

        eng = Engine.__new__(Engine)  # no spark needed: no real clause
        s = "SELECT 'don\\'t FROM t VERSION AS OF 3' AS a FROM u"
        assert eng._rewrite_time_travel(s) == s
