"""Join-consistent fixture scale-up: ``src_sf_dir`` × factor -> dst_dir.

The decade-scaling recipe the r8/r9 BASELINE.md sections used (generation
was inline in round history then; committed now so the curve is
reproducible): every table is a union of ``factor`` copies, copy ``i``
offsetting each KEY column by ``i * base(domain)`` where ``base`` is the
source domain's max key rounded up to a power of 10 — so the offsets are
identical wherever the domain appears (custkey in customer AND orders;
part/supp/order keys in lineitem) and every foreign key keeps resolving.
region/nation stay unchanged (fixed enum domains the copies keep
referencing). Non-key content is varied so the text/vector families are
not degenerate duplicates: document texts get a per-copy suffix token,
embeddings a small deterministic per-copy perturbation.

Usage:
    python tests/scale_gen.py /root/testdata/sf0.1 /tmp/plan_spark_sf1 10
    python tests/scale_gen.py /tmp/plan_spark_sf1 /tmp/plan_spark_sf10 10

The output keeps the driver layout (<dst>/<table>.parquet) so bench.py
runs against it via SPARK_GRAFT_SF_DIR=<dst>.
"""

from __future__ import annotations

import math
import os
import sys

from pyspark.sql import functions as F

# key domains: domain -> [(table, column), ...]
DOMAINS = {
    "custkey": [("customer", "c_custkey"), ("orders", "o_custkey")],
    "suppkey": [("supplier", "s_suppkey"), ("lineitem", "l_suppkey")],
    "partkey": [("part", "p_partkey"), ("lineitem", "l_partkey")],
    "orderkey": [("orders", "o_orderkey"), ("lineitem", "l_orderkey")],
    "eventid": [("events", "event_id")],
    "userid": [("events", "user_id")],
    "docid": [("documents", "doc_id")],
    "vecid": [("embeddings", "vec_id")],
}
COPIED_ASIS = ("region", "nation")
SCALED = (
    "customer", "supplier", "part", "orders", "lineitem",
    "events", "documents", "embeddings",
)


def _read(spark, src: str, t: str):
    return spark.read.parquet(os.path.join(src, f"{t}.parquet"))


def scale(spark, src: str, dst: str, factor: int = 10) -> None:
    os.makedirs(dst, exist_ok=True)
    # per-domain offset base from the SOURCE maxima (shared across tables)
    base: dict[str, int] = {}
    for dom, sites in DOMAINS.items():
        t0, c0 = sites[0]
        mx = _read(spark, src, t0).agg(F.max(c0)).collect()[0][0] or 0
        base[dom] = 10 ** math.ceil(math.log10(int(mx) + 2))
    col_off = {
        (t, c): base[dom] for dom, sites in DOMAINS.items() for t, c in sites
    }

    for t in COPIED_ASIS:
        _read(spark, src, t).write.mode("overwrite").parquet(
            os.path.join(dst, f"{t}.parquet")
        )
    for t in SCALED:
        df = _read(spark, src, t)
        copies = []
        for i in range(factor):
            c = df
            for col in df.columns:
                off = col_off.get((t, col))
                if off:
                    c = c.withColumn(col, F.col(col) + F.lit(i * off))
            if t == "documents" and i > 0:
                # vary the text so dedup/LSH families see near-dups, not
                # byte-identical 10x clones
                c = c.withColumn(
                    "text", F.concat(F.col("text"), F.lit(f" variant{i}"))
                ).withColumn("n_chars", F.col("n_chars") + F.lit(9))
            if t == "embeddings" and i > 0:
                # deterministic per-copy perturbation: elementwise, seeded
                # by (copy, position) — keeps vectors near the originals
                # without being equal. Cast back to the SOURCE element type
                # (sin() is double; the fixture stores array<float> and a
                # silent widening would drift every downstream schema).
                emb_type = df.schema["embedding"].dataType.simpleString()
                c = c.withColumn(
                    "embedding",
                    F.expr(
                        f"transform(embedding, (x, j) -> x + 0.01 * "
                        f"sin(cast({i} * 131 + j AS DOUBLE)))"
                    ).cast(emb_type),
                )
            copies.append(c)
        out = copies[0]
        for c in copies[1:]:
            out = out.unionAll(c)
        parts = max(8, out.rdd.getNumPartitions())
        out.repartition(parts).write.mode("overwrite").parquet(
            os.path.join(dst, f"{t}.parquet")
        )


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from plan_spark.session import get_spark

    src = sys.argv[1]
    dst = sys.argv[2]
    factor = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    s = get_spark("scale-gen")
    s.sparkContext.setLogLevel("ERROR")
    scale(s, src, dst, factor)
    for t in COPIED_ASIS + SCALED:
        n = s.read.parquet(os.path.join(dst, f"{t}.parquet")).count()
        print(f"{t}: {n}")
