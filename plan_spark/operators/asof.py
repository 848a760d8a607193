"""As-of join — "latest right row at or before each left timestamp".

The reference has no as-of/range join (SURVEY.md §2.3: "not implemented");
this is net-new surface built the scalable way: instead of a nested-loop /
range join, union both sides tagged, sort within (key) partitions by
(ts, side), and carry the right-side payload forward with
last(..., ignorenulls=True). One shuffle on the key, no quadratic work,
no broadcast requirement — survives arbitrarily large both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    payload: list[str],
    how: str = "left",
) -> DataFrame:
    """For each left row, attach the payload of the right row with the
    greatest ``right_ts`` <= ``left_ts`` within the same ``on`` key.

    Equal timestamps count as "before" (right row at t matches left row at
    t), matching DuckDB's ``ASOF LEFT JOIN ... ON l.ts >= r.ts``.

    Scale: one hash shuffle on ``on`` + a per-partition sort — the same cost
    as a regular shuffled join; skewed keys are split by AQE.

    Determinism: when several right rows share the same (``on``,
    ``right_ts``), the one with the greatest ``payload`` tuple wins — the
    window ordering tie-breaks on the payload columns themselves, so the
    result is stable across runs and partitionings (ties remaining after
    that are byte-identical payloads, hence unobservable).
    """
    lcols = [c for c in left.columns]
    l = left.withColumn("__side", F.lit(1))
    r = right.select(
        F.col(on),
        F.col(right_ts).alias(left_ts),
        *[F.col(p) for p in payload],
    ).withColumn("__side", F.lit(0))
    # align schemas: left lacks payload cols, right lacks left extras
    for p in payload:
        l = l.withColumn(p, F.lit(None).cast(r.schema[p].dataType))
    for c in lcols:
        if c not in r.columns:
            r = r.withColumn(c, F.lit(None).cast(l.schema[c].dataType))
    u = l.select(*lcols, "__side", *payload).unionByName(
        r.select(*lcols, "__side", *payload)
    )
    # right rows sort before left rows at equal ts => "at or before"
    # semantics; payload columns as the final tiebreak => deterministic
    # winner among right rows sharing (key, ts)
    w = (
        Window.partitionBy(on)
        .orderBy(
            F.col(left_ts).asc(),
            F.col("__side").asc(),
            *[F.col(p).asc() for p in payload],
        )
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = u.select(
        *lcols,
        F.col("__side"),
        *[F.last(p, ignorenulls=True).over(w).alias(p) for p in payload],
    )
    out = filled.filter(F.col("__side") == 1).drop("__side")
    if how == "inner":
        out = out.filter(F.col(payload[0]).isNotNull())
    return out
