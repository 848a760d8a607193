"""Training-data-pipeline + event-analytics operators (round-2 surface).

Net-new capabilities a 100 TB LLM-data pipeline needs beyond dedup/ANN
(text_ops.py, vector_ops.py): benchmark decontamination, rule-based quality
filtering (Gopher-style), PII redaction, sketch-based distinct counting,
funnel analysis, exact percentiles, distribution window functions, JSON
property extraction, pivot, and vocabulary/term-frequency extraction.

Reference capability anchors: the reference's scalar function registry and
aggregate machinery (/root/reference/pkg/compute/function.go,
pkg/compute/agg.go) — each query here is a declarative DataFrame pipeline
whose physical plan Catalyst owns end-to-end.

Determinism discipline (registry.py): md5-based hashes everywhere a
pseudo-random value is needed; double sums routed through DECIMAL(18,6);
every LIMIT carries a total ordering; identical expression shape on the
Spark and DuckDB sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from plan_spark.catalog import table
from plan_spark.queries.text_ops import _DOCS_NORM_SQL, _STOPLIST, _norm_docs
from plan_spark.registry import register

# ---------------------------------------------------------------------------
# Benchmark decontamination: n-gram overlap between the training corpus and
# a held-out eval set. Standard LLM-pipeline step (GPT-3/Llama style 13-gram
# decontamination); fixture-sized shingles are 3 tokens. The eval partition
# is deterministic: doc_id % 17 == 0.
# ---------------------------------------------------------------------------

_TRIGRAMS_SQL = f"""
  SELECT DISTINCT doc_id,
         array_to_string(list_slice(toks, i, i + 2), ' ') AS sh
  FROM (SELECT doc_id, toks, unnest(range(1, len(toks) - 1)) AS i
        FROM ({_DOCS_NORM_SQL}) dn
        WHERE len(toks) >= 3) t
"""

_DECONTAM_SQL = f"""
WITH s AS ({_TRIGRAMS_SQL}),
ev AS (SELECT DISTINCT sh FROM s WHERE doc_id % 17 = 0),
tr AS (SELECT doc_id, sh FROM s WHERE doc_id % 17 <> 0),
tot AS (SELECT doc_id, COUNT(*) AS n_shingles FROM tr GROUP BY doc_id),
hit AS (SELECT tr.doc_id, COUNT(*) AS n_overlap
        FROM tr JOIN ev ON tr.sh = ev.sh GROUP BY tr.doc_id)
SELECT tot.doc_id, tot.n_shingles,
       COALESCE(hit.n_overlap, 0) AS n_overlap,
       CAST(COALESCE(hit.n_overlap, 0) AS DOUBLE) / tot.n_shingles
         AS contamination
FROM tot LEFT JOIN hit ON hit.doc_id = tot.doc_id
ORDER BY tot.doc_id
"""


@register("decontam", oracle=_DECONTAM_SQL, tags=("text", "pipeline"))
def decontam(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Eval-set decontamination: per training doc, the fraction of its
    distinct word-3-grams that also occur in the (broadcast) eval-set shingle
    vocabulary. At 100 TB the eval set stays benchmark-sized (MBs of distinct
    shingles), so the overlap probe is a broadcast hash semi-join against the
    full corpus scan — no shuffle of the training side beyond its own
    per-doc groupBy."""
    d = _norm_docs(spark, sf_dir).filter(F.size("toks") >= 3)
    s = (
        d.select(
            "doc_id",
            F.explode(F.sequence(F.lit(1), F.size("toks") - 2)).alias("i"),
            "toks",
        )
        .select(
            "doc_id",
            F.concat_ws(" ", F.slice("toks", F.col("i"), F.lit(3))).alias("sh"),
        )
        .distinct()
    )
    ev = s.filter(F.col("doc_id") % 17 == 0).select("sh").distinct()
    tr = s.filter(F.col("doc_id") % 17 != 0)
    tot = tr.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_shingles"))
    hit = (
        tr.join(F.broadcast(ev), "sh")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_overlap"))
    )
    return (
        tot.join(hit, "doc_id", "left")
        .select(
            "doc_id",
            "n_shingles",
            F.coalesce(F.col("n_overlap"), F.lit(0)).alias("n_overlap"),
            (
                F.coalesce(F.col("n_overlap"), F.lit(0)).cast("double")
                / F.col("n_shingles")
            ).alias("contamination"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# Gopher-style rule-based quality filter: length, mean word length, stopword
# diversity, alphabetic-token fraction — each rule a boolean column, plus the
# composite keep decision.
# ---------------------------------------------------------------------------

_QUALITY_FILTER_SQL = f"""
WITH d AS ({_DOCS_NORM_SQL}),
m AS (
  SELECT doc_id,
         CAST(len(toks) AS BIGINT) AS n_tokens,
         CAST(list_sum(list_transform(toks, x -> length(x))) AS BIGINT)
           AS sum_len,
         CAST(len(list_distinct(list_filter(toks, x -> x IN {_STOPLIST})))
           AS BIGINT) AS n_stop_distinct,
         CAST(len(list_filter(toks, x -> regexp_matches(x, '[a-z]')))
           AS BIGINT) AS n_alpha
  FROM d)
SELECT doc_id, n_tokens,
       CAST(sum_len AS DOUBLE) / n_tokens AS mean_word_len,
       (n_tokens BETWEEN 10 AND 100000) AS len_ok,
       (CAST(sum_len AS DOUBLE) / n_tokens BETWEEN 3.0 AND 10.0)
         AS wordlen_ok,
       (n_stop_distinct >= 2) AS stop_ok,
       (CAST(n_alpha AS DOUBLE) / n_tokens >= 0.8) AS alpha_ok,
       ((n_tokens BETWEEN 10 AND 100000)
        AND (CAST(sum_len AS DOUBLE) / n_tokens BETWEEN 3.0 AND 10.0)
        AND (n_stop_distinct >= 2)
        AND (CAST(n_alpha AS DOUBLE) / n_tokens >= 0.8)) AS keep
FROM m
ORDER BY doc_id
"""


@register("quality_filter", oracle=_QUALITY_FILTER_SQL, tags=("text", "quality"))
def quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style document quality rules as one narrow scan of JVM
    higher-order array expressions (no UDF): token-count bounds, mean word
    length bounds, >=2 distinct stopwords, >=80% alphabetic tokens. Purely
    map-side — scales as a single pass over the corpus."""
    d = _norm_docs(spark, sf_dir)
    m = d.select(
        "doc_id",
        F.size("toks").cast("bigint").alias("n_tokens"),
        F.aggregate(
            F.transform("toks", lambda x: F.length(x).cast("bigint")),
            F.lit(0).cast("bigint"),
            lambda acc, x: acc + x,
        ).alias("sum_len"),
        F.size(
            F.array_distinct(F.expr(f"filter(toks, x -> x IN {_STOPLIST})"))
        ).cast("bigint").alias("n_stop_distinct"),
        F.size(F.expr("filter(toks, x -> x rlike '[a-z]')")).cast("bigint").alias(
            "n_alpha"
        ),
    )
    mean_len = F.col("sum_len").cast("double") / F.col("n_tokens")
    len_ok = (F.col("n_tokens") >= 10) & (F.col("n_tokens") <= 100000)
    wordlen_ok = (mean_len >= 3.0) & (mean_len <= 10.0)
    stop_ok = F.col("n_stop_distinct") >= 2
    alpha_ok = F.col("n_alpha").cast("double") / F.col("n_tokens") >= 0.8
    return m.select(
        "doc_id",
        "n_tokens",
        mean_len.alias("mean_word_len"),
        len_ok.alias("len_ok"),
        wordlen_ok.alias("wordlen_ok"),
        stop_ok.alias("stop_ok"),
        alpha_ok.alias("alpha_ok"),
        (len_ok & wordlen_ok & stop_ok & alpha_ok).alias("keep"),
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# PII redaction: regex scrub of emails and phone-shaped tokens. The fixture
# text is synthetic/clean, so the query deterministically augments each doc
# with one email + one phone (derived from doc_id) — the regexes then have
# real work to do and the redacted-output hash proves both engines scrub
# identically.
# ---------------------------------------------------------------------------

_EMAIL_RE = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
_PHONE_RE = "555-[0-9]{4}"

_PII_REDACT_SQL = f"""
WITH aug AS (
  SELECT doc_id,
         text || ' contact user' || CAST(doc_id AS VARCHAR)
              || '@example.com or call 555-'
              || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS raw
  FROM documents)
SELECT doc_id,
       CAST(len(regexp_extract_all(raw, '{_EMAIL_RE}')) AS BIGINT) AS n_emails,
       CAST(len(regexp_extract_all(raw, '{_PHONE_RE}')) AS BIGINT) AS n_phones,
       md5(regexp_replace(regexp_replace(raw, '{_EMAIL_RE}', '<EMAIL>', 'g'),
                          '{_PHONE_RE}', '<PHONE>', 'g')) AS redacted_fp
FROM aug
ORDER BY doc_id
"""


@register("pii_redact", oracle=_PII_REDACT_SQL, tags=("text", "pipeline"))
def pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex PII scrub (emails, phone-shaped strings) with per-doc match
    counts and an md5 fingerprint of the redacted text. Pure map-side
    regexp work in the JVM — at 100 TB this is embarrassingly parallel and
    pipelines into the same scan as the quality filter."""
    docs = table(spark, sf_dir, "documents")
    aug = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com or call 555-"),
            F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
        ).alias("raw"),
    )
    return aug.select(
        "doc_id",
        F.regexp_count("raw", F.lit(_EMAIL_RE)).cast("bigint").alias("n_emails"),
        F.regexp_count("raw", F.lit(_PHONE_RE)).cast("bigint").alias("n_phones"),
        F.md5(
            F.regexp_replace(
                F.regexp_replace("raw", _EMAIL_RE, "<EMAIL>"),
                _PHONE_RE,
                "<PHONE>",
            )
        ).alias("redacted_fp"),
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# KMV (k-minimum-values) distinct-count sketch — a deterministic,
# cross-engine-reproducible analogue of HyperLogLog (Spark's
# approx_count_distinct is HLL++ whose estimate is engine-internal; a KMV
# over md5 gives identical estimates in any engine).
# ---------------------------------------------------------------------------

_KMV_K = 64
_HEX15 = float(16**15)  # hash domain: first 15 hex chars of md5


def _hv_sql(col: str) -> str:
    """DuckDB: md5(col) -> non-negative BIGINT over the first 15 hex chars.
    THE hash-domain definition — every Bernoulli/KMV site derives from it."""
    return f"('0x' || substr(md5(CAST({col} AS VARCHAR)), 1, 15))::BIGINT"


def _hv_col(col: str):
    """Spark mirror of _hv_sql (identical value, any engine)."""
    return (
        F.conv(F.substring(F.md5(F.col(col).cast("string")), 1, 15), 16, 10)
        .cast("bigint")
    )


def _hash_frac(col: str):
    """md5-derived uniform [0,1) fraction — the deterministic Bernoulli."""
    return _hv_col(col).cast("double") / F.lit(_HEX15)

_DISTINCT_KMV_SQL = f"""
WITH h AS (
  SELECT DISTINCT event_type,
         {_hv_sql("user_id")} AS hv
  FROM events),
r AS (
  SELECT event_type, hv,
         row_number() OVER (PARTITION BY event_type ORDER BY hv) AS rk
  FROM h),
k AS (
  SELECT event_type, MAX(hv) AS kth, COUNT(*) AS kk
  FROM r WHERE rk <= {_KMV_K} GROUP BY event_type),
t AS (SELECT event_type, COUNT(*) AS true_distinct FROM h GROUP BY event_type)
SELECT k.event_type, t.true_distinct,
       CASE WHEN k.kk < {_KMV_K} THEN CAST(k.kk AS DOUBLE)
            ELSE ({_KMV_K}.0 - 1.0) / (CAST(k.kth AS DOUBLE) / {_HEX15!r})
       END AS est_distinct
FROM k JOIN t ON t.event_type = k.event_type
ORDER BY k.event_type
"""


@register("distinct_kmv", oracle=_DISTINCT_KMV_SQL, tags=("sketch", "agg"))
def distinct_kmv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate distinct users per event type via a k-minimum-values
    sketch (k=64) over md5 hashes, next to the exact count for error
    inspection. At 100 TB the rank step is a per-group top-k (k rows per
    group survive the shuffle), not a global sort; KMV sketches also merge
    associatively so a map-side partial keeps the shuffle tiny."""
    ev = table(spark, sf_dir, "events")
    h = (
        ev.select(
            "event_type",
            _hv_col("user_id").alias("hv"),
        )
        .distinct()
    )
    # per-input-partition pre-prune (r11, same shape as w_topn): the
    # global k smallest hashes of a group are a subset of the union of
    # each partition's local k smallest, so the few-valued event_type
    # window never sorts a whole group in one task — exact at every
    # scale, and exactly the "per-group top-k survives the shuffle"
    # recipe the docstring promises
    w_local = Window.partitionBy("event_type", "_pid").orderBy("hv")
    pruned = (
        h.withColumn("_pid", F.spark_partition_id())
        .withColumn("_rk_local", F.row_number().over(w_local))
        .filter(F.col("_rk_local") <= _KMV_K)
        .select("event_type", "hv")
    )
    w = Window.partitionBy("event_type").orderBy("hv")
    r = pruned.withColumn("rk", F.row_number().over(w))
    k = (
        r.filter(F.col("rk") <= _KMV_K)
        .groupBy("event_type")
        .agg(F.max("hv").alias("kth"), F.count(F.lit(1)).alias("kk"))
    )
    t = h.groupBy("event_type").agg(F.count(F.lit(1)).alias("true_distinct"))
    est = F.when(F.col("kk") < _KMV_K, F.col("kk").cast("double")).otherwise(
        (F.lit(float(_KMV_K)) - F.lit(1.0))
        / (F.col("kth").cast("double") / F.lit(_HEX15))
    )
    return (
        k.join(t, "event_type")
        .select("event_type", "true_distinct", est.alias("est_distinct"))
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# Funnel analysis: strictly-ordered view -> click -> purchase per user.
# ---------------------------------------------------------------------------

_FUNNEL_SQL = """
WITH s1 AS (
  SELECT user_id, MIN(ts) AS t1 FROM events
  WHERE event_type = 'view' GROUP BY user_id),
s2 AS (
  SELECT e.user_id, MIN(e.ts) AS t2 FROM events e
  JOIN s1 ON s1.user_id = e.user_id AND e.ts > s1.t1
  WHERE e.event_type = 'click' GROUP BY e.user_id),
s3 AS (
  SELECT e.user_id, MIN(e.ts) AS t3 FROM events e
  JOIN s2 ON s2.user_id = e.user_id AND e.ts > s2.t2
  WHERE e.event_type = 'purchase' GROUP BY e.user_id)
SELECT (SELECT COUNT(*) FROM s1) AS n_view,
       (SELECT COUNT(*) FROM s2) AS n_view_click,
       (SELECT COUNT(*) FROM s3) AS n_view_click_purchase
"""


@register("funnel", oracle=_FUNNEL_SQL, tags=("events", "analytics"))
def funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequential funnel: users who viewed, then clicked strictly after
    first view, then purchased strictly after first qualifying click.
    Every stage is a groupBy/join on user_id, so all three stages reuse one
    hash partitioning of the events scan — Catalyst collapses the chain to
    a single shuffle of the fact table at scale."""
    ev = table(spark, sf_dir, "events")
    s1 = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    # shuffle_hash pins: the probe side is a *filtered fact scan* — small at
    # test SF (Catalyst would broadcast it) but enormous at 100 TB; a shuffle
    # hash join on user_id lets every stage reuse the same hash partitioning.
    s2 = (
        ev.filter(F.col("event_type") == "click")
        .join(s1.hint("shuffle_hash"), "user_id")
        .filter(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    s3 = (
        ev.filter(F.col("event_type") == "purchase")
        .join(s2.hint("shuffle_hash"), "user_id")
        .filter(F.col("ts") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    return (
        s1.agg(F.count(F.lit(1)).alias("n_view"))
        .crossJoin(s2.agg(F.count(F.lit(1)).alias("n_view_click")))
        .crossJoin(s3.agg(F.count(F.lit(1)).alias("n_view_click_purchase")))
    )


# ---------------------------------------------------------------------------
# Exact grouped percentiles (discrete, rank-based — bit-identical across
# engines, unlike interpolated percentile whose FP evaluation order is
# engine-internal).
# ---------------------------------------------------------------------------

_PCT_SQL = """
WITH r AS (
  SELECT event_type, value, event_id,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY value, event_id) AS rk,
         COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM events)
SELECT event_type,
       MAX(n) AS n,
       MAX(CASE WHEN rk = CAST(ceil(0.50 * n) AS BIGINT) THEN value END) AS p50,
       MAX(CASE WHEN rk = CAST(ceil(0.90 * n) AS BIGINT) THEN value END) AS p90,
       MAX(CASE WHEN rk = CAST(ceil(0.99 * n) AS BIGINT) THEN value END) AS p99
FROM r GROUP BY event_type ORDER BY event_type
"""


@register("percentile_exact", oracle=_PCT_SQL, tags=("agg", "analytics"))
def percentile_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact discrete p50/p90/p99 of value per event type via ranks
    (nearest-rank definition). Rank-based selection avoids cross-engine FP
    interpolation differences. Past _DIST_SMALL_N rows the ranks come
    from the bucketed exact-rank core (_bucketed_rank — parallel
    per-group sorts) instead of the few-valued window, same r11
    discipline as w_dist; ranks are identical, so the pick() selection
    is unchanged. Oracle scales stay on the plain window."""
    ev = table(spark, sf_dir, "events")
    n_rows = _N_EVENTS_CACHE.get(sf_dir)
    if n_rows is None:
        n_rows = _N_EVENTS_CACHE[sf_dir] = ev.count()
    if n_rows > _DIST_SMALL_N:
        r = _bucketed_rank(ev.select("event_type", "value", "event_id")).select(
            "event_type",
            "value",
            "event_id",
            F.col("rank").alias("rk"),
            F.col("n_g").alias("n"),
        )
    else:
        w = Window.partitionBy("event_type").orderBy("value", "event_id")
        wn = Window.partitionBy("event_type")
        r = ev.select(
            "event_type",
            "value",
            "event_id",
            F.row_number().over(w).alias("rk"),
            F.count(F.lit(1)).over(wn).alias("n"),
        )

    def pick(p: float, name: str):
        return F.max(
            F.when(
                F.col("rk") == F.ceil(F.lit(p) * F.col("n")).cast("bigint"),
                F.col("value"),
            )
        ).alias(name)

    return (
        r.groupBy("event_type")
        .agg(F.max("n").alias("n"), pick(0.50, "p50"), pick(0.90, "p90"), pick(0.99, "p99"))
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# Distribution window functions: ntile / percent_rank / cume_dist.
# ---------------------------------------------------------------------------

_W_DIST_SQL = """
SELECT event_id, event_type, value,
       ntile(4)       OVER w AS quartile,
       percent_rank() OVER w AS pct_rank,
       cume_dist()    OVER w AS cdist
FROM events
WINDOW w AS (PARTITION BY event_type ORDER BY value, event_id)
ORDER BY event_type, value, event_id
"""


@register("w_dist", oracle=_W_DIST_SQL, tags=("window",))
def w_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NTILE/PERCENT_RANK/CUME_DIST over a per-event-type total ordering
    (event_id tiebreak makes every rank deterministic).

    Scale: partitionBy("event_type") has ~5 distinct values, so the
    plain window sorts each group's ENTIRE row set in one task — the r11
    sf10 re-sweep measured 40× for 100× data, all of it single-task
    sorts over 2M+ rows/group, a genuine 100 TB killer. Past
    _DIST_SMALL_N rows the same three functions come from the BUCKETED
    exact-rank formulation (_dist_windows_scalable): approximate value
    splits partition each group's sort into ~n_buckets parallel tasks,
    and the global rank is bucket-offset + within-bucket row_number —
    EXACT because the order key (value, event_id) is unique and
    bucketing is order-consistent; the splits' placement affects only
    load balance, never values. Driver-oracle scales stay on the plain
    window (bit-identical plan to the oracle's)."""
    ev = table(spark, sf_dir, "events")
    n = _N_EVENTS_CACHE.get(sf_dir)
    if n is None:
        n = _N_EVENTS_CACHE[sf_dir] = ev.count()
    if n > _DIST_SMALL_N:
        out = _dist_windows_scalable(ev)
    else:
        w = Window.partitionBy("event_type").orderBy("value", "event_id")
        out = ev.select(
            "event_id",
            "event_type",
            "value",
            F.ntile(4).over(w).alias("quartile"),
            F.percent_rank().over(w).alias("pct_rank"),
            F.cume_dist().over(w).alias("cdist"),
        )
    return out.orderBy("event_type", "value", "event_id")


@register("w_dist_bucketed", oracle=_W_DIST_SQL, tags=("window", "scale-arm"))
def w_dist_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The BUCKETED exact-rank arm of w_dist, gate-forced at every scale —
    same result contract (same oracle SQL) as w_dist, but the driver's
    DuckDB hash check executes the >1M-row scale path end-to-end instead
    of only the unit equivalence tests covering it (r11 verdict: the
    oracle never ran the size-gated arm). A hash mismatch here means the
    parallel-sort formulation broke, caught at oracle scale."""
    ev = table(spark, sf_dir, "events")
    return _dist_windows_scalable(ev).orderBy("event_type", "value", "event_id")


_DIST_SMALL_N = 1_000_000
_N_EVENTS_CACHE: dict[str, int] = {}  # sf_dir -> events row count


def _bucketed_rank(ev: DataFrame, n_buckets: int = 32) -> DataFrame:
    """The scalable exact-rank core: every row of ``ev`` (event_type,
    event_id, value, ...) plus ``rank`` (1-based position under
    ORDER BY value, event_id within its event_type) and ``n_g`` (group
    size) — WITHOUT a single-task per-group sort. Each group is split by
    ~equi-depth value boundaries (percentile_approx — placement is load
    balance only), row_number runs within (group, bucket), and the
    global rank is the cumulative earlier-bucket count plus the
    within-bucket row_number: exact for the unique (value, event_id)
    order key at any split placement. Shared by _dist_windows_scalable
    and percentile_exact's at-scale path."""
    totals = ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("n_g"))
    qs = [i / n_buckets for i in range(1, n_buckets)]
    bounds = ev.groupBy("event_type").agg(
        F.percentile_approx("value", qs, 10_000).alias("bs")
    )
    b = ev.join(F.broadcast(bounds), "event_type").withColumn(
        "bucket", F.expr("size(filter(bs, x -> x < value))")
    )
    w_in = Window.partitionBy("event_type", "bucket").orderBy(
        "value", "event_id"
    )
    ranked = b.withColumn("r_in", F.row_number().over(w_in))
    bcnt = ranked.groupBy("event_type", "bucket").agg(
        F.count(F.lit(1)).alias("bn")
    )
    w_off = (
        Window.partitionBy("event_type")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offs = bcnt.select(
        "event_type",
        "bucket",
        F.coalesce(F.sum("bn").over(w_off), F.lit(0)).alias("off"),
    )
    return (
        ranked.join(F.broadcast(offs), ["event_type", "bucket"])
        .join(F.broadcast(totals), "event_type")
        .withColumn("rank", F.col("off") + F.col("r_in"))
        .drop("bs", "bucket", "r_in", "off")
    )


def _dist_windows_scalable(ev: DataFrame, n_buckets: int = 32) -> DataFrame:
    """ntile(4)/percent_rank/cume_dist per event_type from the bucketed
    exact rank (_bucketed_rank). With a UNIQUE order key, percent_rank =
    (rank-1)/(n-1), cume_dist = rank/n, and ntile's uneven-bucket rule
    (first n%k tiles get one extra row) is closed-form in rank — all
    three bit-identical to the window functions, computed with the same
    IEEE divisions."""
    out = _bucketed_rank(ev, n_buckets)
    k = 4
    q = F.floor(F.col("n_g") / k)
    r = F.col("n_g") % k
    big = q + 1
    tile = F.when(
        F.col("rank") <= r * big, F.ceil(F.col("rank") / big)
    ).otherwise(r + F.ceil((F.col("rank") - r * big) / q))
    pct = F.when(
        F.col("n_g") > 1,
        (F.col("rank") - 1).cast("double") / (F.col("n_g") - 1),
    ).otherwise(F.lit(0.0))
    return out.select(
        "event_id",
        "event_type",
        "value",
        tile.cast("int").alias("quartile"),
        pct.alias("pct_rank"),
        (F.col("rank").cast("double") / F.col("n_g")).alias("cdist"),
    )


# ---------------------------------------------------------------------------
# Semi-structured JSON property extraction (events.props is a JSON string).
# ---------------------------------------------------------------------------

_JSON_PROPS_SQL = """
SELECT event_type,
       CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT)
         AS sum_k,
       MIN(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
       MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k,
       COUNT(*) AS n
FROM events
GROUP BY event_type
ORDER BY event_type
"""


@register("json_props_agg", oracle=_JSON_PROPS_SQL, tags=("json", "agg"))
def json_props_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON path extraction in the scan projection (get_json_object stays in
    codegen) feeding an integer aggregate — the shuffle carries only
    (event_type, partial sums)."""
    ev = table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("bigint")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.sum("k").alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# Pivot (wide event-type matrix per user).
# ---------------------------------------------------------------------------

_EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]

_PIVOT_SQL = """
SELECT user_id,
       COUNT(CASE WHEN event_type = 'click'    THEN 1 END) AS n_click,
       COUNT(CASE WHEN event_type = 'error'    THEN 1 END) AS n_error,
       COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS n_purchase,
       COUNT(CASE WHEN event_type = 'signup'   THEN 1 END) AS n_signup,
       COUNT(CASE WHEN event_type = 'view'     THEN 1 END) AS n_view,
       CAST(COALESCE(SUM(CASE WHEN event_type = 'purchase'
                              THEN CAST(value AS DECIMAL(18,6)) END),
                     0) AS DOUBLE) AS purchase_value
FROM events
GROUP BY user_id
ORDER BY user_id
"""


@register("pivot_events", oracle=_PIVOT_SQL, tags=("pivot", "agg"))
def pivot_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide per-user event matrix. Uses explicit pivot values so Spark skips
    the extra distinct-values pass — one shuffle, map-side combined. The
    decimal-routed purchase_value keeps the float sum shuffle-order-proof."""
    ev = table(spark, sf_dir, "events")
    agg = (
        ev.groupBy("user_id")
        .agg(
            *[
                F.count(F.when(F.col("event_type") == t, F.lit(1))).alias(f"n_{t}")
                for t in _EVENT_TYPES
            ],
            F.coalesce(
                F.sum(
                    F.when(
                        F.col("event_type") == "purchase",
                        F.col("value").cast("decimal(18,6)"),
                    )
                ),
                F.lit(0).cast("decimal(18,6)"),
            )
            .cast("double")
            .alias("purchase_value"),
        )
        .orderBy("user_id")
    )
    return agg


# ---------------------------------------------------------------------------
# Deterministic sampling + train/val/test split assignment. Hash-based
# Bernoulli sampling (md5 range test) instead of engine RNG TABLESAMPLE:
# reproducible across engines, stable under repartitioning, and a new column
# arriving later gets the same split — the property a training pipeline
# actually needs.
# ---------------------------------------------------------------------------

_SPLIT_SQL = f"""
WITH h AS (
  SELECT doc_id, source,
         {_hv_sql("doc_id")} AS hv
  FROM documents),
s AS (
  SELECT source,
         CASE WHEN CAST(hv AS DOUBLE) / {_HEX15!r} < 0.8 THEN 'train'
              WHEN CAST(hv AS DOUBLE) / {_HEX15!r} < 0.9 THEN 'val'
              ELSE 'test' END AS split,
         doc_id
  FROM h)
SELECT source, split, COUNT(*) AS n,
       MIN(doc_id) AS min_doc, MAX(doc_id) AS max_doc
FROM s GROUP BY source, split
ORDER BY source, split
"""


@register("sample_split", oracle=_SPLIT_SQL, tags=("pipeline", "sampling"))
def sample_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 80/10/10 train/val/test assignment by hashing the stable
    document key into [0,1). Pure map-side expression — at 100 TB the split
    is a free projection on every scan, needs no shuffle, and re-derives
    identically in any engine (the reproducibility TABLESAMPLE can't give)."""
    docs = table(spark, sf_dir, "documents")
    frac = _hash_frac("doc_id")
    s = docs.select(
        "source",
        F.when(frac < 0.8, F.lit("train"))
        .when(frac < 0.9, F.lit("val"))
        .otherwise(F.lit("test"))
        .alias("split"),
        "doc_id",
    )
    return (
        s.groupBy("source", "split")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("doc_id").alias("min_doc"),
            F.max("doc_id").alias("max_doc"),
        )
        .orderBy("source", "split")
    )


# ---------------------------------------------------------------------------
# Document chunking: fixed-size overlapping token windows (chunk 32, stride
# 24) — the standard pre-tokenization step for context-window training data
# and retrieval corpora.
# ---------------------------------------------------------------------------

_CHUNK, _STRIDE = 32, 24

_CHUNK_SQL = f"""
WITH d AS ({_DOCS_NORM_SQL}),
c AS (
  SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens, toks,
         unnest(range(1, len(toks) + 1, {_STRIDE})) AS start
  FROM d WHERE len(toks) >= 1)
SELECT doc_id,
       CAST(floor((start - 1) / {_STRIDE}.0) AS BIGINT) AS chunk_idx,
       CAST(start AS BIGINT) AS chunk_start,
       CAST(least({_CHUNK}, n_tokens - start + 1) AS BIGINT) AS chunk_len,
       md5(array_to_string(list_slice(toks, start, start + {_CHUNK} - 1), ' '))
         AS chunk_fp
FROM c ORDER BY doc_id, chunk_start
"""


@register("chunk_docs", oracle=_CHUNK_SQL, tags=("text", "pipeline"))
def chunk_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping token-window chunking (32-token chunks, stride 24) via
    sequence+explode — one narrow scan, fanout proportional to corpus token
    count, no shuffle at all until the final presentation sort. The md5
    chunk fingerprint doubles as the key for chunk-level dedup downstream."""
    d = _norm_docs(spark, sf_dir).filter(F.size("toks") >= 1)
    c = d.select(
        "doc_id",
        F.size("toks").cast("bigint").alias("n_tokens"),
        "toks",
        F.explode(F.sequence(F.lit(1), F.size("toks"), F.lit(_STRIDE))).alias(
            "start_i"
        ),
    ).withColumn("start", F.col("start_i").cast("bigint"))
    return c.select(
        "doc_id",
        F.floor((F.col("start") - 1) / F.lit(float(_STRIDE))).cast("bigint").alias(
            "chunk_idx"
        ),
        F.col("start").alias("chunk_start"),
        F.least(F.lit(_CHUNK).cast("bigint"), F.col("n_tokens") - F.col("start") + 1)
        .alias("chunk_len"),
        F.md5(
            F.concat_ws(" ", F.slice("toks", F.col("start").cast("int"), F.lit(_CHUNK)))
        ).alias("chunk_fp"),
    ).orderBy("doc_id", "chunk_start")


# ---------------------------------------------------------------------------
# Context-window sequence packing: GPT-style concat-then-cut. Documents are
# concatenated in doc_id order inside each source stream and the token
# stream is cut every L tokens; each doc is attributed to the sequence its
# first token lands in.
# ---------------------------------------------------------------------------

_SEQ_LEN = 256

_PACK_SQL = f"""
WITH d AS ({_DOCS_NORM_SQL}),
t AS (SELECT source, doc_id, CAST(len(toks) AS BIGINT) AS n_tokens FROM d),
o AS (
  SELECT source, doc_id, n_tokens,
         SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           - n_tokens AS start_off
  FROM t)
SELECT source,
       CAST(floor(start_off / {_SEQ_LEN}.0) AS BIGINT) AS seq_id,
       COUNT(*) AS n_docs,
       MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc,
       CAST(SUM(n_tokens) AS BIGINT) AS seq_tokens
FROM o GROUP BY source, CAST(floor(start_off / {_SEQ_LEN}.0) AS BIGINT)
ORDER BY source, seq_id
"""


@register("pack_sequences", oracle=_PACK_SQL, tags=("text", "pipeline"))
def pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing for pretraining: per source stream, a cumulative
    token-count window assigns every doc a byte-exact start offset, and
    sequences are the offset stream cut every 256 tokens. The window is
    partitioned by source, so packing parallelizes across streams at 100 TB
    (each stream's cumsum is one sorted partition — the same shape a real
    packing job uses per input shard)."""
    d = _norm_docs(spark, sf_dir)
    t = d.select("source", "doc_id", F.size("toks").cast("bigint").alias("n_tokens"))
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    o = t.withColumn("start_off", F.sum("n_tokens").over(w) - F.col("n_tokens"))
    return (
        o.withColumn(
            "seq_id",
            F.floor(F.col("start_off") / F.lit(float(_SEQ_LEN))).cast("bigint"),
        )
        .groupBy("source", "seq_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
            F.sum("n_tokens").alias("seq_tokens"),
        )
        .orderBy("source", "seq_id")
    )


# ---------------------------------------------------------------------------
# Vocabulary extraction: corpus-wide term frequencies, top 50.
# ---------------------------------------------------------------------------

_VOCAB_SQL = f"""
WITH d AS ({_DOCS_NORM_SQL}),
t AS (SELECT unnest(toks) AS tok FROM d),
c AS (SELECT tok, COUNT(*) AS cnt FROM t GROUP BY tok)
SELECT tok, cnt FROM c
ORDER BY cnt DESC, tok
LIMIT 50
"""


@register("vocab_topk", oracle=_VOCAB_SQL, tags=("text", "agg"))
def vocab_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary with term frequencies, top-50 by count (token
    tiebreak for a total order). Explode + map-side-combined groupBy +
    TakeOrderedAndProject — the classic first step of tokenizer training.
    At 100 TB the long tail is the cost; partial aggregation keeps the
    shuffle at distinct-token cardinality."""
    d = _norm_docs(spark, sf_dir)
    return (
        d.select(F.explode("toks").alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("tok"))
        .limit(50)
    )


# ---------------------------------------------------------------------------
# Gopher-style repetition filter: per-doc duplicate-token fraction and
# most-frequent-bigram mass. The standard "remove degenerate/boilerplate
# docs" rule that complements quality_filter's length/stopword rules.
# ---------------------------------------------------------------------------

_REP_SQL = f"""
WITH d AS ({_DOCS_NORM_SQL}),
b AS (
  SELECT doc_id, array_to_string(list_slice(toks, i, i + 1), ' ') AS bg
  FROM (SELECT doc_id, toks, unnest(range(1, len(toks))) AS i
        FROM d WHERE len(toks) >= 2) t),
cnt AS (SELECT doc_id, bg, COUNT(*) AS c FROM b GROUP BY doc_id, bg),
per AS (
  SELECT doc_id, SUM(c) AS n_bigrams, MAX(c) AS top_bigram_n
  FROM cnt GROUP BY doc_id),
u AS (
  SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens,
         CAST(len(list_distinct(toks)) AS BIGINT) AS n_distinct_tokens
  FROM d)
SELECT u.doc_id, u.n_tokens,
       CAST(p.top_bigram_n AS DOUBLE) / p.n_bigrams AS top_bigram_frac,
       1.0 - CAST(u.n_distinct_tokens AS DOUBLE) / u.n_tokens
         AS dup_token_frac,
       (CAST(p.top_bigram_n AS DOUBLE) / p.n_bigrams <= 0.18
        AND 1.0 - CAST(u.n_distinct_tokens AS DOUBLE) / u.n_tokens <= 0.7)
         AS keep
FROM u JOIN per p ON p.doc_id = u.doc_id
ORDER BY u.doc_id
"""


@register("rep_filter", oracle=_REP_SQL, tags=("text", "quality", "pipeline"))
def rep_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition-based quality filter (Gopher repetition rules): flag docs
    whose single most frequent word-bigram carries >18% of all bigram mass,
    or where >70% of tokens are repeats of earlier tokens.

    Scale shape: one explode + (doc_id, bigram) groupBy + per-doc groupBy —
    both map-side combined and both partitioned by doc_id, so the second
    aggregate reuses the first's shuffle partitioning. The unigram
    diversity leg never shuffles at all (array_distinct is a map-side
    higher-order function). Thresholds compare exact-integer ratios, so the
    keep decision is engine-stable."""
    d = _norm_docs(spark, sf_dir)
    u = d.select(
        "doc_id",
        F.size("toks").cast("bigint").alias("n_tokens"),
        F.size(F.array_distinct("toks")).cast("bigint").alias("n_distinct_tokens"),
    )
    b = (
        d.filter(F.size("toks") >= 2)
        .select(
            "doc_id",
            F.explode(F.sequence(F.lit(1), F.size("toks") - 1)).alias("i"),
            "toks",
        )
        .select(
            "doc_id",
            F.concat_ws(" ", F.slice("toks", F.col("i"), F.lit(2))).alias("bg"),
        )
    )
    per = (
        b.groupBy("doc_id", "bg")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id")
        .agg(F.sum("c").alias("n_bigrams"), F.max("c").alias("top_bigram_n"))
    )
    top_frac = F.col("top_bigram_n").cast("double") / F.col("n_bigrams")
    dup_frac = F.lit(1.0) - F.col("n_distinct_tokens").cast("double") / F.col(
        "n_tokens"
    )
    return (
        u.join(per, "doc_id")
        .select(
            "doc_id",
            "n_tokens",
            top_frac.alias("top_bigram_frac"),
            dup_frac.alias("dup_token_frac"),
            ((top_frac <= 0.18) & (dup_frac <= 0.7)).alias("keep"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# Stratified source sampling: per-source keep rates applied via the same
# deterministic md5 Bernoulli trick as sample_split — the domain-mixing
# step of corpus construction (downsample web, keep curated sources).
# ---------------------------------------------------------------------------

_STRAT_SQL = f"""
WITH h AS (
  SELECT doc_id, source,
         CAST(substr(source, 4) AS INTEGER) AS src_num,
         CAST({_hv_sql("doc_id")} AS DOUBLE) / {_HEX15!r} AS frac
  FROM documents),
s AS (
  SELECT source, doc_id, frac,
         CASE WHEN src_num < 5 THEN 1.0
              WHEN src_num < 10 THEN 0.5
              WHEN src_num < 15 THEN 0.25
              ELSE 0.1 END AS rate
  FROM h)
SELECT source, MAX(rate) AS rate,
       COUNT(*) AS n_total,
       CAST(SUM(CASE WHEN frac < rate THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       MIN(CASE WHEN frac < rate THEN doc_id END) AS min_kept,
       MAX(CASE WHEN frac < rate THEN doc_id END) AS max_kept
FROM s GROUP BY source
ORDER BY source
"""


@register("stratified_sample", oracle=_STRAT_SQL, tags=("pipeline", "sampling"))
def stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source stratified downsampling (domain mixing): curated sources
    keep 100%, progressively noisier tiers keep 50/25/10%, selected by the
    same engine-stable md5 Bernoulli hash as sample_split.

    Scale shape: a pure map-side projection + one source-cardinality groupBy
    — the mixing decision costs nothing extra on a 100 TB scan and
    re-derives identically on any engine or re-partitioning (statistical
    TABLESAMPLE cannot promise either)."""
    docs = table(spark, sf_dir, "documents")
    src_num = F.substring("source", 4, 10).cast("int")
    frac = _hash_frac("doc_id")
    rate = (
        F.when(src_num < 5, F.lit(1.0))
        .when(src_num < 10, F.lit(0.5))
        .when(src_num < 15, F.lit(0.25))
        .otherwise(F.lit(0.1))
    )
    s = docs.select(
        "source", "doc_id", frac.alias("frac"), rate.alias("rate")
    )
    kept = F.when(F.col("frac") < F.col("rate"), F.col("doc_id"))
    return (
        s.groupBy("source")
        .agg(
            F.max("rate").alias("rate"),
            F.count(F.lit(1)).alias("n_total"),
            F.sum(
                F.when(F.col("frac") < F.col("rate"), F.lit(1)).otherwise(F.lit(0))
            ).alias("n_kept"),
            F.min(kept).alias("min_kept"),
            F.max(kept).alias("max_kept"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# End-to-end curation pipeline: quality rules + repetition rules -> exact
# dedup (keep lowest doc_id per normalized text) -> deterministic split ->
# per-(source, split) accounting. The whole corpus-curation DAG as ONE
# declarative plan, value-checked against a relational emulation.
# ---------------------------------------------------------------------------

_E2E_SQL = f"""
WITH d AS ({_DOCS_NORM_SQL}),
q AS (
  SELECT doc_id, source, norm,
         CAST(len(toks) AS BIGINT) AS n_tokens,
         (CAST(len(toks) AS BIGINT) BETWEEN 10 AND 100000
          AND CAST(list_sum(list_transform(toks, x -> length(x))) AS DOUBLE)
              / len(toks) BETWEEN 3.0 AND 10.0
          AND len(list_distinct(list_filter(toks, x -> x IN {_STOPLIST}))) >= 2
          AND CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks) >= 0.3)
           AS keep_q
  FROM d),
kept AS (SELECT doc_id, source, norm, n_tokens FROM q WHERE keep_q),
win AS (
  SELECT MIN(doc_id) AS doc_id FROM kept GROUP BY md5(norm)),
final AS (
  SELECT k.doc_id, k.source, k.n_tokens,
         CASE WHEN CAST({_hv_sql("k.doc_id")} AS DOUBLE)
                   / {_HEX15!r} < 0.8 THEN 'train'
              WHEN CAST({_hv_sql("k.doc_id")} AS DOUBLE)
                   / {_HEX15!r} < 0.9 THEN 'val'
              ELSE 'test' END AS split
  FROM kept k JOIN win USING (doc_id))
SELECT source, split,
       COUNT(*) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS total_tokens
FROM final
GROUP BY source, split
ORDER BY source, split
"""


@register("pipeline_e2e", oracle=_E2E_SQL, tags=("pipeline", "composite"))
def pipeline_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full curation pipeline as one declarative DAG: Gopher-style
    quality rules + a token-diversity repetition rule, exact dedup keeping
    the lowest doc_id per normalized text, deterministic md5 split, and
    per-(source, split) doc/token accounting.

    Scale shape — what matters at 100 TB is that composing the stages adds
    NO passes: the quality/repetition metrics are map-side expressions on
    the single corpus scan, dedup is one md5-key groupBy (map-side
    combined), the winner set joins back by doc_id (both sides partitioned
    by the same key), and the final rollup is source x split cardinality.
    Catalyst fuses the whole thing; the corpus crosses the wire twice
    (dedup key, winner join), identical to running dedup alone."""
    d = _norm_docs(spark, sf_dir)
    mean_len = (
        F.aggregate(
            F.transform("toks", lambda x: F.length(x)),
            F.lit(0).cast("bigint"),
            lambda acc, v: acc + v,
        ).cast("double")
        / F.size("toks")
    )
    n_stop = F.size(
        F.array_distinct(F.expr(f"filter(toks, x -> x IN {_STOPLIST})"))
    )
    diversity = F.size(F.array_distinct("toks")).cast("double") / F.size("toks")
    keep_q = (
        F.size("toks").between(10, 100000)
        & mean_len.between(3.0, 10.0)
        & (n_stop >= 2)
        & (diversity >= 0.3)
    )
    kept = d.filter(keep_q).select(
        "doc_id", "source", "norm", F.size("toks").cast("bigint").alias("n_tokens")
    )
    win = kept.groupBy(F.md5("norm")).agg(F.min("doc_id").alias("doc_id"))
    frac = _hash_frac("doc_id")
    final = kept.join(win.select("doc_id"), "doc_id").select(
        "source",
        "n_tokens",
        F.when(frac < 0.8, F.lit("train"))
        .when(frac < 0.9, F.lit("val"))
        .otherwise(F.lit("test"))
        .alias("split"),
    )
    return (
        final.groupBy("source", "split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("total_tokens"),
        )
        .orderBy("source", "split")
    )


# ---------------------------------------------------------------------------
# Domain capping: keep at most K documents per source, best-first — the
# anti-domination step of corpus mixing (one crawl domain must not swamp
# the mixture). Rank within source by length then doc_id (total order).
# ---------------------------------------------------------------------------

_DOMAIN_CAP_K = 60

_DOMAIN_CAP_SQL = f"""
WITH ranked AS (
  SELECT source, doc_id, n_chars,
         ROW_NUMBER() OVER (PARTITION BY source
                            ORDER BY n_chars DESC, doc_id) AS rk
  FROM documents
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_kept,
       CAST(SUM(n_chars) AS BIGINT) AS chars_kept,
       CAST(MIN(n_chars) AS BIGINT) AS min_kept_chars,
       CAST(MAX(doc_id) AS BIGINT) AS max_kept_doc
FROM ranked WHERE rk <= {_DOMAIN_CAP_K}
GROUP BY source ORDER BY source
"""


@register("domain_cap", oracle=_DOMAIN_CAP_SQL, tags=("pipeline", "sampling"))
def domain_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain cap: keep the top-K documents per source (longest first,
    doc_id tiebreak) so no single domain dominates the training mixture —
    the standard anti-domination knob next to stratified_sample's keep
    rates.

    Scale shape: one shuffle on source + a row_number window whose
    partitions are per-domain document sets; with a skewed megadomain the
    window partition is that domain's size — still bounded by the cap's
    purpose (only the top K survive, and Spark's window spills) — and the
    accounting aggregate reuses the same partitioning. Determinism: the
    rank orders on exact integers with the unique doc_id tiebreak."""
    docs = table(spark, sf_dir, "documents").select("doc_id", "source", "n_chars")
    w = Window.partitionBy("source").orderBy(F.col("n_chars").desc(), F.col("doc_id"))
    return (
        docs.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= _DOMAIN_CAP_K)
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_kept"),
            F.sum("n_chars").cast("bigint").alias("chars_kept"),
            F.min("n_chars").cast("bigint").alias("min_kept_chars"),
            F.max("doc_id").cast("bigint").alias("max_kept_doc"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# Deterministic seeded corpus shuffle + sharding: the global permutation a
# training run reads. shard = seeded-hash bucket; the within-shard order is
# the hash order — certified below by an order fingerprint per shard, so the
# whole permutation (not just the bucketing) is hash-checked.
# ---------------------------------------------------------------------------

_SHUF_SEED, _N_SHARDS = "r5", 64

_CORPUS_SHUFFLE_SQL = f"""
WITH h AS (
  SELECT doc_id,
         ('0x' || substr(md5('{_SHUF_SEED}:' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
           AS hv
  FROM documents
),
s AS (SELECT doc_id, hv, hv % {_N_SHARDS} AS shard FROM h)
SELECT shard,
       COUNT(*) AS n_docs,
       CAST(split_part(string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY hv, doc_id),
                       ',', 1) AS BIGINT) AS head_doc,
       md5(string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY hv, doc_id)) AS seq_fp
FROM s
GROUP BY shard
ORDER BY shard
"""


@register("corpus_shuffle", oracle=_CORPUS_SHUFFLE_SQL, tags=("pipeline", "shuffle"))
def corpus_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seeded deterministic corpus shuffle: every document gets a stable
    position hv = md5(seed:doc_id); shard = hv % 64; the within-shard read
    order is ascending hv. Training-data pipelines need this exact shape —
    a reproducible global permutation that any engine re-derives bit-
    identically (engine RNG cannot), sharded so readers scale.

    The registered query certifies the PERMUTATION, not just the bucketing:
    per shard it emits the md5 fingerprint of the doc_id sequence in shuffle
    order, so a single transposition anywhere flips the hash.

    Scale shape: hv/shard are pure map-side projections. At production
    scale the materialization is `repartition(shard).sortWithinPartitions
    (hv)` -> sorted shard files (one shuffle, no global sort, no windows);
    here the per-shard fingerprint aggregates a collect over each shard's
    docs — shard count is the parallelism knob, sized so a shard's doc IDs
    fit an executor (64 at fixture scale, O(files) in production)."""
    docs = table(spark, sf_dir, "documents").select("doc_id")
    hv = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(f"{_SHUF_SEED}:"), F.col("doc_id").cast("string"))),
            1,
            15,
        ),
        16,
        10,
    ).cast("bigint")
    s = docs.select("doc_id", hv.alias("hv")).withColumn(
        "shard", F.col("hv") % _N_SHARDS
    )
    ordered = F.transform(
        F.array_sort(F.collect_list(F.struct("hv", "doc_id"))),
        lambda x: x["doc_id"].cast("string"),
    )
    return (
        s.groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.element_at(ordered, 1).cast("bigint").alias("head_doc"),
            F.md5(F.concat_ws(",", ordered)).alias("seq_fp"),
        )
        .orderBy("shard")
    )


# ---------------------------------------------------------------------------
# Temperature-based source mixture weights: the alpha=0.5 sampling recipe
# (weight ∝ tokens^alpha) that multilingual / multi-source LLM training uses
# to up-sample small sources without letting big ones dominate.
# ---------------------------------------------------------------------------

_MIX_SQL = f"""
WITH d AS ({_DOCS_NORM_SQL}),
per AS (
  SELECT source,
         COUNT(*) AS n_docs,
         CAST(SUM(len(toks)) AS BIGINT) AS n_tokens
  FROM d GROUP BY source
),
w AS (SELECT *, SQRT(CAST(n_tokens AS DOUBLE)) AS weight FROM per),
g AS (
  SELECT list_reduce(list_prepend(0.0, list(weight ORDER BY source)),
                     (a, v) -> a + v) AS denom,
         CAST(SUM(n_tokens) AS BIGINT) AS total_tokens
  FROM w
)
SELECT source, n_docs, n_tokens, weight,
       weight / denom AS share,
       CAST(n_tokens AS DOUBLE) / CAST(total_tokens AS DOUBLE) AS natural_share,
       (weight / denom)
         / (CAST(n_tokens AS DOUBLE) / CAST(total_tokens AS DOUBLE)) AS boost
FROM w, g
ORDER BY source
"""


@register("mixture_weights", oracle=_MIX_SQL, tags=("pipeline", "mixing"))
def mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-sampled source mixture (alpha = 0.5): per-source token
    counts -> weight = tokens^0.5 -> normalized sampling share, next to the
    natural (proportional) share and the up/down-sampling boost factor.
    The standard anti-domination knob for multi-source training mixes.

    Scale shape: one source-keyed aggregate over the corpus (map-side
    combinable longs); everything after runs on the source-cardinality
    table. The normalizer is a SEQUENTIAL fold over the source-sorted
    weight list (Spark F.aggregate == DuckDB list_reduce — same
    left-to-right IEEE adds, bit-identical), never an unordered float SUM
    whose partition order could flip low bits.

    Determinism: token counts are exact BIGINTs; weight = one sqrt;
    share/natural_share/boost are fixed-shape IEEE expressions over those."""
    d = _norm_docs(spark, sf_dir)
    per = d.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size("toks")).cast("bigint").alias("n_tokens"),
    )
    w = per.withColumn("weight", F.sqrt(F.col("n_tokens").cast("double")))
    g = w.agg(
        F.aggregate(
            F.transform(
                F.array_sort(F.collect_list(F.struct("source", "weight"))),
                lambda x: x["weight"],
            ),
            F.lit(0.0),
            lambda a, v: a + v,
        ).alias("denom"),
        F.sum("n_tokens").cast("bigint").alias("total_tokens"),
    )
    share = F.col("weight") / F.col("denom")
    natural = F.col("n_tokens").cast("double") / F.col("total_tokens").cast("double")
    return (
        w.crossJoin(F.broadcast(g))
        .select(
            "source",
            "n_docs",
            "n_tokens",
            "weight",
            share.alias("share"),
            natural.alias("natural_share"),
            (share / natural).alias("boost"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# Applying the temperature mixture: per-source keep rates from the alpha=0.5
# weights, materialized as a deterministic hash-Bernoulli sample — the
# corpus-rewrite half of mixture_weights (quota -> rate -> sampled counts).
# ---------------------------------------------------------------------------

_MIX_BUDGET = 200  # target sampled corpus size in docs (the mixing knob)

_MIX_APPLY_SQL = f"""
WITH d AS ({_DOCS_NORM_SQL}),
per AS (
  SELECT source,
         COUNT(*) AS n_docs,
         CAST(SUM(len(toks)) AS BIGINT) AS n_tokens
  FROM d GROUP BY source
),
w AS (SELECT *, SQRT(CAST(n_tokens AS DOUBLE)) AS weight FROM per),
g AS (
  SELECT list_reduce(list_prepend(0.0, list(weight ORDER BY source)),
                     (a, v) -> a + v) AS denom
  FROM w
),
r AS (
  SELECT source, n_docs, n_tokens,
         least(1.0, (weight / denom) * {_MIX_BUDGET} / CAST(n_docs AS DOUBLE))
           AS keep_rate
  FROM w, g
),
h AS (
  SELECT source,
         CAST({_hv_sql("doc_id")} AS DOUBLE) / {_HEX15!r} AS frac
  FROM documents
)
SELECT r.source, r.n_docs, r.n_tokens, r.keep_rate,
       CAST(SUM(CASE WHEN h.frac < r.keep_rate THEN 1 ELSE 0 END) AS BIGINT)
         AS kept
FROM h JOIN r ON h.source = r.source
GROUP BY r.source, r.n_docs, r.n_tokens, r.keep_rate
ORDER BY r.source
"""


@register("mixture_apply", oracle=_MIX_APPLY_SQL, tags=("pipeline", "mixing"))
def mixture_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature mixing APPLIED: each source's alpha=0.5 share of a fixed
    doc budget becomes a keep rate (quota/n_docs, capped at 1), realized as
    the same deterministic md5-Bernoulli sample sample_split uses — so the
    sampled corpus is reproducible in any engine, and per-source accounting
    (rate, kept) certifies the materialization.

    Scale shape: one source-keyed aggregate builds the rate table
    (source-cardinality), which broadcasts back onto the corpus; the keep
    test is a pure map-side expression per doc (no shuffle of the corpus
    beyond the final source-keyed accounting). At 100 TB the rewrite is a
    filter — the corpus streams once.

    Determinism: rates are fixed-shape IEEE expressions over exact BIGINTs
    and the sequential-fold normalizer; the Bernoulli threshold compares
    two identically-derived doubles, so the kept set is bit-stable."""
    d = _norm_docs(spark, sf_dir)
    per = d.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size("toks")).cast("bigint").alias("n_tokens"),
    )
    w = per.withColumn("weight", F.sqrt(F.col("n_tokens").cast("double")))
    g = w.agg(
        F.aggregate(
            F.transform(
                F.array_sort(F.collect_list(F.struct("source", "weight"))),
                lambda x: x["weight"],
            ),
            F.lit(0.0),
            lambda a, v: a + v,
        ).alias("denom")
    )
    r = w.crossJoin(F.broadcast(g)).select(
        "source",
        "n_docs",
        "n_tokens",
        F.least(
            F.lit(1.0),
            (F.col("weight") / F.col("denom"))
            * _MIX_BUDGET
            / F.col("n_docs").cast("double"),
        ).alias("keep_rate"),
    )
    frac = _hash_frac("doc_id")
    h = table(spark, sf_dir, "documents").select("source", frac.alias("frac"))
    return (
        h.join(F.broadcast(r), "source")
        .groupBy("source", "n_docs", "n_tokens", "keep_rate")
        .agg(
            F.sum(F.when(F.col("frac") < F.col("keep_rate"), 1).otherwise(0))
            .cast("bigint")
            .alias("kept")
        )
        .orderBy("source")
    )
