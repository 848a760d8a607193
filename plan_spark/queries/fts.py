"""Full-text search: BM25 scoring + phrase search as DataFrame pipelines.

Reference capability: storage2's inverted index + BM25 + WAND top-k
(/root/reference/pkg/storage2/fts_index.go:154-330, fts_wand.go:12-30).
Spark-first redesign: there is no materialized inverted index — the posting
list IS a DataFrame (doc_id, term, tf) produced by explode, and BM25 is
pure relational math over it (idf join + length normalization). WAND's
skip-pointer pruning is unnecessary: candidate generation is a semi join on
query terms, which Spark executes hash-partitioned; at 100 TB the posting
DataFrame would be bucketed by term so repeated queries skip the shuffle.

Determinism: scores involve ln() whose last ulp may differ between libm and
the JVM — scores are rounded to 6 decimals and the result returns ALL
matching docs ordered by doc_id (no top-k cutoff), so a 1-ulp difference
cannot change the row set or the hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from plan_spark.catalog import table
from plan_spark.queries.text_ops import _DOCS_NORM_SQL, _norm_docs
from plan_spark.registry import register

_K1 = 1.2
_B = 0.75
_QUERY_TERMS = ("spark", "table", "query")
_QT_SQL = "('" + "','".join(_QUERY_TERMS) + "')"

_FTS_BM25_SQL = f"""
WITH d AS ({_DOCS_NORM_SQL}),
doclen AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl FROM d),
corpus AS (
  SELECT COUNT(*) AS n_docs,
         CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl
  FROM doclen),
posting AS (
  SELECT doc_id, tk AS term, COUNT(*) AS tf
  FROM (SELECT doc_id, unnest(toks) AS tk FROM d) t
  WHERE tk IN {_QT_SQL}
  GROUP BY doc_id, tk),
df AS (SELECT term, COUNT(*) AS dfreq FROM posting GROUP BY term),
scored AS (
  SELECT p.doc_id,
         ln((corpus.n_docs - df.dfreq + 0.5) / (df.dfreq + 0.5) + 1.0)
           * (p.tf * ({_K1} + 1.0))
           / (p.tf + {_K1} * (1.0 - {_B} + {_B} * dl.dl / corpus.avgdl)) AS s
  FROM posting p, df, doclen dl, corpus
  WHERE p.term = df.term AND p.doc_id = dl.doc_id)
SELECT doc_id, ROUND(SUM(s), 6) AS bm25
FROM scored
GROUP BY doc_id
ORDER BY doc_id
"""


@register("fts_bm25", oracle=_FTS_BM25_SQL, tags=("fts", "bm25"))
def fts_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25(k1=1.2, b=0.75) over a fixed term query.

    Plan shape: per-term tf is a map-side array filter over the token
    array (the query has a handful of terms — no explode, no posting
    shuffle); ALL corpus statistics (n_docs, avgdl, per-term dfreq) come
    from ONE single-row aggregate that broadcast-joins back; the score is
    then a pure map-side expression. One full scan, one scalar shuffle.
    At 100 TB with ad-hoc vocabularies the explode->posting shape (bucketed
    by term) takes over; for query scoring this shape is strictly better."""
    d = _norm_docs(spark, sf_dir)
    nt = len(_QUERY_TERMS)
    base = d.select(
        "doc_id",
        F.size("toks").cast("bigint").alias("dl"),
        *[
            F.size(F.expr(f"filter(toks, x -> x = '{t}')")).cast("bigint").alias(f"tf_{i}")
            for i, t in enumerate(_QUERY_TERMS)
        ],
    )
    stats = base.agg(
        F.count(F.lit(1)).alias("n_docs"),
        (F.sum("dl").cast("double") / F.count(F.lit(1))).alias("avgdl"),
        *[
            F.sum(F.when(F.col(f"tf_{i}") > 0, 1).otherwise(0)).alias(f"dfreq_{i}")
            for i in range(nt)
        ],
    )
    joined = base.join(F.broadcast(stats))
    parts = []
    for i in range(nt):
        idf = F.log(
            (F.col("n_docs") - F.col(f"dfreq_{i}") + F.lit(0.5))
            / (F.col(f"dfreq_{i}") + F.lit(0.5))
            + F.lit(1.0)
        )
        tf_part = (F.col(f"tf_{i}") * F.lit(_K1 + 1.0)) / (
            F.col(f"tf_{i}")
            + F.lit(_K1) * (F.lit(1.0 - _B) + F.lit(_B) * F.col("dl") / F.col("avgdl"))
        )
        parts.append(F.when(F.col(f"tf_{i}") > 0, idf * tf_part).otherwise(F.lit(0.0)))
    any_match = sum(F.col(f"tf_{i}") for i in range(nt)) > 0
    return (
        joined.filter(any_match)
        .select("doc_id", F.round(sum(parts), 6).alias("bm25"))
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# Boolean search (reference BooleanSearch, fts_index.go:471-479): a document
# qualifies iff it contains EVERY must term and NO must_not term; the BM25
# score sums over the must+should terms it contains. The registered query
# uses the same map-side shape as fts_bm25 (tf per term via array filter, one
# scalar stats aggregate broadcast back — no posting shuffle); the persisted-
# index path (FtsIndex.search_boolean: semi/anti posting joins) is pytest-
# checked for exact agreement with this oracle-checked query.
# ---------------------------------------------------------------------------

_B_MUST = ("spark", "join")
_B_SHOULD = ("query", "vector")
_B_MUST_NOT = ("slow",)
_B_SCORE = _B_MUST + _B_SHOULD  # dedup not needed: the sets are disjoint

_BOOL_SCORE_SQL = "('" + "','".join(_B_SCORE) + "')"
_BOOL_NOT_SQL = "('" + "','".join(_B_MUST_NOT) + "')"
_BOOL_MUST_SQL = "('" + "','".join(_B_MUST) + "')"

_FTS_BOOL_SQL = f"""
WITH d AS ({_DOCS_NORM_SQL}),
doclen AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl FROM d),
corpus AS (
  SELECT COUNT(*) AS n_docs,
         CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl
  FROM doclen),
posting AS (
  SELECT doc_id, tk AS term, COUNT(*) AS tf
  FROM (SELECT doc_id, unnest(toks) AS tk FROM d) t
  WHERE tk IN {_BOOL_SCORE_SQL}
  GROUP BY doc_id, tk),
df AS (SELECT term, COUNT(*) AS dfreq FROM posting GROUP BY term),
must_ok AS (
  SELECT doc_id FROM posting WHERE term IN {_BOOL_MUST_SQL}
  GROUP BY doc_id HAVING COUNT(DISTINCT term) = {len(set(_B_MUST))}),
excluded AS (
  SELECT DISTINCT doc_id
  FROM (SELECT doc_id, unnest(toks) AS tk FROM d) t
  WHERE tk IN {_BOOL_NOT_SQL}),
scored AS (
  SELECT p.doc_id,
         ln((corpus.n_docs - df.dfreq + 0.5) / (df.dfreq + 0.5) + 1.0)
           * (p.tf * ({_K1} + 1.0))
           / (p.tf + {_K1} * (1.0 - {_B} + {_B} * dl.dl / corpus.avgdl)) AS s
  FROM posting p, df, doclen dl, corpus
  WHERE p.term = df.term AND p.doc_id = dl.doc_id)
SELECT doc_id, ROUND(SUM(s), 6) AS bm25
FROM scored
WHERE doc_id IN (SELECT doc_id FROM must_ok)
  AND doc_id NOT IN (SELECT doc_id FROM excluded)
GROUP BY doc_id
ORDER BY doc_id
"""


@register("fts_bool", oracle=_FTS_BOOL_SQL, tags=("fts", "boolean"))
def fts_bool(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boolean FTS: must={spark,join}, should={query,vector},
    must_not={slow} (reference BooleanSearch fts_index.go:471-479).

    Plan shape: one corpus scan computes per-term tf columns map-side (array
    filters — no explode), the boolean predicate is a pure filter over those
    columns, and BM25 statistics come from ONE single-row aggregate that
    broadcast-joins back. One full scan, one scalar shuffle — identical
    scale shape to fts_bm25."""
    d = _norm_docs(spark, sf_dir)
    terms = list(_B_SCORE)
    base = d.select(
        "doc_id",
        F.size("toks").cast("bigint").alias("dl"),
        *[
            F.size(F.expr(f"filter(toks, x -> x = '{t}')")).cast("bigint").alias(f"tf_{i}")
            for i, t in enumerate(terms)
        ],
        *[
            F.size(F.expr(f"filter(toks, x -> x = '{t}')")).cast("bigint").alias(f"nf_{j}")
            for j, t in enumerate(_B_MUST_NOT)
        ],
    )
    stats = base.agg(
        F.count(F.lit(1)).alias("n_docs"),
        (F.sum("dl").cast("double") / F.count(F.lit(1))).alias("avgdl"),
        *[
            F.sum(F.when(F.col(f"tf_{i}") > 0, 1).otherwise(0)).alias(f"dfreq_{i}")
            for i in range(len(terms))
        ],
    )
    joined = base.join(F.broadcast(stats))
    qualify = F.lit(True)
    for i, t in enumerate(terms):
        if t in _B_MUST:
            qualify = qualify & (F.col(f"tf_{i}") > 0)
    for j in range(len(_B_MUST_NOT)):
        qualify = qualify & (F.col(f"nf_{j}") == 0)
    parts = []
    for i in range(len(terms)):
        idf = F.log(
            (F.col("n_docs") - F.col(f"dfreq_{i}") + F.lit(0.5))
            / (F.col(f"dfreq_{i}") + F.lit(0.5))
            + F.lit(1.0)
        )
        tf_part = (F.col(f"tf_{i}") * F.lit(_K1 + 1.0)) / (
            F.col(f"tf_{i}")
            + F.lit(_K1) * (F.lit(1.0 - _B) + F.lit(_B) * F.col("dl") / F.col("avgdl"))
        )
        parts.append(F.when(F.col(f"tf_{i}") > 0, idf * tf_part).otherwise(F.lit(0.0)))
    return (
        joined.filter(qualify)
        .select("doc_id", F.round(sum(parts), 6).alias("bm25"))
        .orderBy("doc_id")
    )


_PHRASE = "table hash"

_FTS_PHRASE_SQL = f"""
WITH d AS ({_DOCS_NORM_SQL})
SELECT doc_id,
       CAST((length(norm) - length(replace(norm, '{_PHRASE}', '')))
            / length('{_PHRASE}') AS BIGINT) AS n_occurrences
FROM d
WHERE norm LIKE '%{_PHRASE}%'
ORDER BY doc_id
"""


@register("fts_phrase", oracle=_FTS_PHRASE_SQL, tags=("fts", "phrase"))
def fts_phrase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Phrase search (reference: fts_index.go phrase path) via substring
    scan + occurrence count — predicate pushes to the scan, integer math."""
    d = _norm_docs(spark, sf_dir)
    n_occ = (
        (F.length("norm") - F.length(F.replace(F.col("norm"), F.lit(_PHRASE), F.lit(""))))
        / F.length(F.lit(_PHRASE))
    ).cast("bigint")
    return (
        d.filter(F.col("norm").like(f"%{_PHRASE}%"))
        .select("doc_id", n_occ.alias("n_occurrences"))
        .orderBy("doc_id")
    )
