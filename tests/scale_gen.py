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


def scale_realistic(
    spark, src: str, dst: str, factor: int = 100
) -> None:
    """Duplication-PROFILED scale-up of the dedup-family tables (r10
    verdict #2): the plain ``scale`` gives EVERY doc/vector factor-1
    near-twins — an adversarial regime that makes the dedup families'
    measured ratios fixture artifacts. This generator applies a
    realistic crawl-corpus profile instead, deciding per ORIGINAL row by
    a deterministic class (id % 100):

    - class < 5  (5%):  heavy-tail boilerplate — near-dup in EVERY copy
      (group size = factor, the license-header/nav-chrome regime);
    - class < 30 (25%): light duplication — near-dup in 1..4 extra
      copies (group sizes 2-5), unique elsewhere;
    - else       (70%): unique — every copy gets fresh content.

    Only documents + embeddings are profiled (the dedup family's
    inputs); run the other tables through ``scale`` or reuse an existing
    decade fixture for them. "Unique" documents are rebuilt from
    per-(row, copy) md5 tokens (no shared shingles); "unique" embeddings
    get a fresh pseudo-random direction (cosine ~0 to everything);
    near-dups keep the small perturbation ``scale`` uses."""
    os.makedirs(dst, exist_ok=True)
    for t, key in (("documents", "doc_id"), ("embeddings", "vec_id")):
        df = _read(spark, src, t)
        mx = df.agg(F.max(key)).collect()[0][0] or 0
        base = 10 ** math.ceil(math.log10(int(mx) + 2))
        d = (
            df.withColumn("_orig", F.col(key))
            .withColumn(
                "copy", F.explode(F.sequence(F.lit(0), F.lit(factor - 1)))
            )
            .withColumn(key, F.col(key) + F.col("copy") * F.lit(base))
        )
        cls = F.pmod(F.col("_orig"), F.lit(100))
        n_extra = F.pmod(F.col("_orig"), F.lit(4)) + 1  # 1..4 extra copies
        near = (
            (F.col("copy") == 0)
            | (cls < 5)
            | ((cls < 30) & (F.col("copy") <= n_extra))
        )
        if t == "documents":
            uniq_text = F.expr(
                "concat_ws(' ', transform(sequence(1, greatest("
                "cast(n_chars / 8 as int), 8)), "
                "j -> substring(md5(concat(_orig, '_', copy, '_', j)), 1, 7)))"
            )
            near_text = F.when(
                F.col("copy") == 0, F.col("text")
            ).otherwise(F.concat(F.col("text"), F.lit(" variant"), F.col("copy")))
            d = d.withColumn(
                "text", F.when(near, near_text).otherwise(uniq_text)
            ).withColumn("n_chars", F.length("text"))
        else:
            emb_type = df.schema["embedding"].dataType.simpleString()
            near_emb = F.when(F.col("copy") == 0, F.col("embedding")).otherwise(
                F.expr(
                    "transform(embedding, (x, j) -> x + 0.01 * "
                    "sin(cast(copy * 131 + j AS DOUBLE)))"
                ).cast(emb_type)
            )
            # fract(sin(seed)·43758.5453) per element — the classic shader
            # hash. A LINEAR phase (sin(seed + c·j)) would make two copies'
            # vectors cosine ≈ cos(Δseed) — occasionally ±1; the fract
            # decorrelates every (seed, j) pair.
            h = (
                "sin(cast(_orig * 7919 + copy * 104729 AS DOUBLE)"
                " + (j + 1) * 12.9898) * 43758.5453"
            )
            uniq_emb = F.expr(
                f"transform(embedding, (x, j) -> "
                f"2 * (({h}) - floor({h})) - 1)"
            ).cast(emb_type)
            d = d.withColumn(
                "embedding", F.when(near, near_emb).otherwise(uniq_emb)
            )
        out = d.drop("_orig", "copy")
        parts = max(16, df.rdd.getNumPartitions() * max(1, factor // 10))
        out.repartition(parts).write.mode("overwrite").parquet(
            os.path.join(dst, f"{t}.parquet")
        )


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from plan_spark.session import get_spark

    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    profile = "realistic" if "--profile=realistic" in sys.argv else "adversarial"
    src = args[0]
    dst = args[1]
    factor = int(args[2]) if len(args) > 2 else 10
    s = get_spark("scale-gen")
    s.sparkContext.setLogLevel("ERROR")
    if profile == "realistic":
        scale_realistic(s, src, dst, factor)
        tables = ("documents", "embeddings")
    else:
        scale(s, src, dst, factor)
        tables = COPIED_ASIS + SCALED
    for t in tables:
        n = s.read.parquet(os.path.join(dst, f"{t}.parquet")).count()
        print(f"{t}: {n}")
