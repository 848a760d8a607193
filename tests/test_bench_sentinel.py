"""bench.py's self-correcting contention sentinel (round-10 verdict #6).

The r8/r9 rounds both hit the same artifact bug: the driver's box was
CONTENDED during the sweep, the sentinel detected it (spread > 1.25), but
the recorded headline still carried the inflated total and needed a
quiet-run footnote. bench.py now ACTS on its own sentinel: spread past
RESWEEP_SPREAD triggers one single-run min-sweep and the headline reports
min(in-run, re-sweep) per query.

The synthetic test injects real CPU load (burner processes — Python
threads share the GIL and cannot contend a 32-core box) during the first
sweep, releases it, and shows the min-corrected totals converge back to
the quiet numbers.
"""

from __future__ import annotations

import multiprocessing as mp
import time

import pytest
from pyspark.sql import functions as F

import bench


class _Spec:
    def __init__(self, fn):
        self.fn = fn


def _mini_specs():
    """Five small-but-real queries: enough Spark work per call (~50-200 ms)
    that CPU contention is measurable, small enough the test stays fast."""

    def mk(rows, mod):
        def fn(spark, sf_dir):
            return (
                spark.range(rows)
                .groupBy((F.col("id") % mod).alias("k"))
                .agg(F.sum("id").alias("s"), F.avg("id").alias("a"))
                .orderBy("k")
            )
        return _Spec(fn)

    return {f"mini_{i}": mk(400_000 * (i + 1), 97 + i) for i in range(5)}


def _burn(stop_ts: float) -> None:
    x = 1.0
    while time.time() < stop_ts:
        x = x * 1.000001 + 1e-9  # pure CPU


class TestResweepMin:
    def test_min_correction_per_query(self, spark, tmp_path, monkeypatch):
        specs = _mini_specs()
        quiet = bench.sweep(spark, specs, str(tmp_path), runs=1)
        inflated = {n: t * 3.0 for n, t in quiet.items()}  # fake contended run
        corrected = bench.resweep_min(spark, specs, str(tmp_path), inflated)
        for n in specs:
            assert corrected[n] <= inflated[n]
        # the correction must come from a REAL re-execution, so a query
        # that fails in the resweep keeps its original number
        failed = dict(inflated)
        failed["mini_broken"] = -1.0
        specs2 = dict(specs)
        specs2["mini_broken"] = _Spec(lambda s, d: (_ for _ in ()).throw(RuntimeError()))
        corrected2 = bench.resweep_min(spark, specs2, str(tmp_path), failed)
        assert corrected2["mini_broken"] == -1.0

    def test_headline_converges_under_injected_load(self, spark, tmp_path):
        specs = _mini_specs()
        # quiet baseline
        quiet = bench.sweep(spark, specs, str(tmp_path), runs=1)
        quiet_total = sum(quiet.values())

        # contended sweep: saturate the box with burner PROCESSES
        procs = [
            mp.Process(target=_burn, args=(time.time() + 90,), daemon=True)
            for _ in range(3 * mp.cpu_count() // 2)
        ]
        for p in procs:
            p.start()
        try:
            time.sleep(0.5)  # let the load ramp
            contended = bench.sweep(spark, specs, str(tmp_path), runs=1)
        finally:
            for p in procs:
                p.terminate()
            for p in procs:
                p.join(timeout=10)
        contended_total = sum(contended.values())

        # load released: the corrective min-sweep
        corrected = bench.resweep_min(spark, specs, str(tmp_path), contended)
        corrected_total = sum(corrected.values())

        assert corrected_total <= contended_total + 1e-9
        if contended_total > 1.5 * quiet_total:
            # contention took: the corrected headline must shed most of the
            # inflation (converge toward — not necessarily exactly to — the
            # quiet number; 60% of the gap is well past any code-level delta)
            gap_before = contended_total - quiet_total
            gap_after = corrected_total - quiet_total
            assert gap_after < 0.4 * gap_before, (
                f"quiet={quiet_total:.2f} contended={contended_total:.2f} "
                f"corrected={corrected_total:.2f}"
            )
        else:
            pytest.skip(
                "burner load did not measurably contend this box; "
                "min-correction property still asserted above"
            )

    def test_threshold_constant(self):
        # the sentinel threshold the verdict named; a silent change should
        # be a conscious one
        assert bench.RESWEEP_SPREAD == 1.25
