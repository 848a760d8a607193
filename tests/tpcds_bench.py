"""Bench-scale TPC-DS verbatim sweep (r10 verdict #5).

Generates the sf0.1-equivalent star schema (tests/tpcds_fullgen.py with
fact_scale — store_sales ~600k rows at the default 20), loads it through
the Engine front door (CREATE TABLE + COPY, the exact path the
correctness suite certifies), then TIMES all 103 verbatim spec
statements end-to-end (Engine.sql -> noop sink). Correctness is the
micro-fixture suite's job (tests/test_tpcds_verbatim.py, every part
hash-compared vs DuckDB); this measures whether the plans those texts
get actually HOLD at data sizes where a bad join order or a lost
pushdown shows.

Usage:
    python tests/tpcds_bench.py [fact_scale] [runs]
prints one JSON line {total, per_query, slowest} and writes
/tmp/tpcds_bench.json.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

QUERY_DIR = "/root/reference/cases/tpcds/query"


def main() -> None:
    fact_scale = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    from plan_spark.engine import Engine
    from plan_spark.session import get_spark
    from tests.test_tpcds_verbatim import _split
    from tests.tpcds_fullgen import generate, parse_ddl

    spark = get_spark("tpcds-bench")
    spark.sparkContext.setLogLevel("ERROR")

    data = f"/tmp/tpcds_bench_sf{fact_scale}/data"
    if not os.path.exists(os.path.join(data, "store_sales.parquet")):
        print(f"generating fact_scale={fact_scale} fixture...", file=sys.stderr)
        generate(data, fact_scale=fact_scale)
    eng = Engine(spark, f"/tmp/tpcds_bench_sf{fact_scale}/eng_{os.getpid()}")
    for t in parse_ddl():
        schema = spark.read.parquet(f"{data}/{t}.parquet").schema
        ddl = ", ".join(
            f"{f.name} {f.dataType.simpleString()}" for f in schema.fields
        )
        eng.create_table(t, ddl)
        eng.sql(f"COPY {t} FROM '{data}/{t}.parquet'")

    times: dict[str, float] = {}
    for q in range(1, 100):
        text = open(f"{QUERY_DIR}/query{q}.sql").read()
        for part, stmt in enumerate(_split(text)):
            tag = f"q{q}" if part == 0 else f"q{q}_p{part}"
            try:
                eng.sql(stmt).write.format("noop").mode("overwrite").save()  # warm
                samples = []
                for _ in range(runs):
                    t0 = time.perf_counter()
                    eng.sql(stmt).write.format("noop").mode("overwrite").save()
                    samples.append(time.perf_counter() - t0)
                times[tag] = round(statistics.median(samples), 4)
            except Exception as e:
                print(f"{tag} FAILED: {e}", file=sys.stderr)
                times[tag] = -1.0
            print(f"{tag}: {times[tag]}", file=sys.stderr)
    total = round(sum(t for t in times.values() if t > 0), 2)
    slowest = sorted(times.items(), key=lambda kv: -kv[1])[:10]
    out = {
        "fact_scale": fact_scale,
        "store_sales_rows": spark.read.parquet(
            f"{data}/store_sales.parquet"
        ).count(),
        "runs": runs,
        "n_statements": len(times),
        "n_failed": sum(1 for t in times.values() if t < 0),
        "total_sec": total,
        "slowest": slowest,
        "per_query": times,
    }
    with open("/tmp/tpcds_bench.json", "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print(json.dumps({k: out[k] for k in (
        "fact_scale", "store_sales_rows", "n_statements", "n_failed",
        "total_sec", "slowest")}))


if __name__ == "__main__":
    main()
