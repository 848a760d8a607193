"""Job-count discipline of the control plane (r11 optimization).

A Spark job is a driver->cluster round-trip; sequential metadata-sized jobs
are pure scheduler latency at any scale. Two r11 findings pinned here:

1. AQE turns each exchange of an internal metadata collect into its own
   sequential job (a count_distinct stats aggregate = 3 jobs instead of 1).
   ``driver_sized`` plans those collects without AQE.
2. ``limit(1).collect()`` existence probes escalate through partition
   batches SEQUENTIALLY precisely when there is no hit — the success path
   of every constraint check. The probes now run one parallel existence
   aggregate and fetch the witness row only on the failure path.

The budgets below are exact-shape regression fences: if a refactor
reintroduces per-constraint probes or AQE-staged internal collects, the
counts jump well past them.
"""

import shutil

import pytest

from plan_spark.engine import Engine, IntegrityError


def _n_jobs(spark):
    return spark._jvm.scala.collection.JavaConverters.seqAsJavaList(
        spark._jsc.sc().statusStore().jobsList(None)
    ).size()


@pytest.fixture()
def eng(spark, tmp_path):
    path = str(tmp_path / "jobs_db")
    shutil.rmtree(path, ignore_errors=True)
    return Engine(spark, path)


def _jobs_for(spark, fn) -> int:
    j0 = _n_jobs(spark)
    fn()
    return _n_jobs(spark) - j0


def test_enforced_insert_job_budget(spark, eng):
    eng.sql("CREATE TABLE g (k BIGINT PRIMARY KEY, v STRING) WITH (ENFORCE)")
    # first INSERT: fused batch-stats aggregate (1 job, no AQE staging,
    # no existing-key probe on an empty table) + the fragment write
    n = _jobs_for(spark, lambda: eng.sql("INSERT INTO g VALUES (1, 'a'), (2, 'b')"))
    assert n <= 2, f"first enforced INSERT ran {n} jobs (budget 2)"
    # non-empty table: + existence aggregate and its broadcast build —
    # but never the sequential limit(1) escalation (3+ jobs alone)
    n = _jobs_for(spark, lambda: eng.sql("INSERT INTO g VALUES (3, 'c')"))
    assert n <= 4, f"legal INSERT on non-empty table ran {n} jobs (budget 4)"


def test_failing_insert_still_raises_with_witness(spark, eng):
    eng.sql("CREATE TABLE g (k BIGINT PRIMARY KEY, v STRING) WITH (ENFORCE)")
    eng.sql("INSERT INTO g VALUES (1, 'a')")
    with pytest.raises(IntegrityError, match=r"already contains.*1"):
        eng.sql("INSERT INTO g VALUES (1, 'dup')")
    with pytest.raises(IntegrityError, match="duplicate key in INSERT batch"):
        eng.sql("INSERT INTO g VALUES (7, 'x'), (7, 'y')")
    with pytest.raises(IntegrityError, match="NULL in PRIMARY KEY"):
        eng.sql("INSERT INTO g VALUES (NULL, 'n')")


def test_delete_job_budget(spark, eng):
    eng.sql("CREATE TABLE t (k BIGINT, v STRING)")
    eng.sql("INSERT INTO t VALUES (1, 'a'), (2, 'b'), (3, 'c'), (4, 'd')")
    # partial delete: one per-file hit-count job (collect over the
    # persisted hits — not 3 AQE stage jobs) + the sidecar write
    n = _jobs_for(spark, lambda: eng.sql("DELETE FROM t WHERE k % 2 = 0"))
    assert n <= 3, f"partial DELETE ran {n} jobs (budget 3)"


def test_fk_insert_success_path_budget(spark, eng):
    eng.sql("CREATE TABLE p (id BIGINT PRIMARY KEY) WITH (ENFORCE)")
    eng.sql("INSERT INTO p VALUES (1), (2)")
    eng.sql(
        "CREATE TABLE c (id BIGINT PRIMARY KEY, pid BIGINT, "
        "FOREIGN KEY (pid) REFERENCES p(id)) WITH (ENFORCE)"
    )
    # stats agg (1) + FK existence agg (1 + broadcast) + write; the old
    # shape paid an extra escalating anti-join take on the success path
    n = _jobs_for(spark, lambda: eng.sql("INSERT INTO c VALUES (10, 1)"))
    assert n <= 6, f"legal FK INSERT ran {n} jobs (budget 6)"
    with pytest.raises(IntegrityError, match="FOREIGN KEY violation"):
        eng.sql("INSERT INTO c VALUES (11, 99)")


def test_merge_duplicate_source_check(spark, eng):
    eng.sql("CREATE TABLE m (k BIGINT PRIMARY KEY, v STRING) WITH (ENFORCE)")
    eng.sql("INSERT INTO m VALUES (1, 'a')")
    # clean source passes through the single existence aggregate
    eng.sql(
        "MERGE INTO m USING (SELECT 1 AS k, 'up' AS v UNION ALL "
        "SELECT 2, 'new') s ON m.k = s.k "
        "WHEN MATCHED THEN UPDATE SET v = s.v "
        "WHEN NOT MATCHED THEN INSERT *"
    )
    rows = {(r.k, r.v) for r in eng.sql("SELECT k, v FROM m").collect()}
    assert rows == {(1, "up"), (2, "new")}
    # duplicate source keys still refused, witness included
    with pytest.raises(IntegrityError, match="duplicate key in MERGE source"):
        eng.sql(
            "MERGE INTO m USING (SELECT 3 AS k, 'x' AS v UNION ALL "
            "SELECT 3, 'y') s ON m.k = s.k "
            "WHEN MATCHED THEN UPDATE SET v = s.v "
            "WHEN NOT MATCHED THEN INSERT *"
        )


def test_driver_sized_restores_aqe(spark):
    from plan_spark.session import driver_sized

    assert spark.conf.get("spark.sql.adaptive.enabled") == "true"
    with driver_sized(spark):
        assert spark.conf.get("spark.sql.adaptive.enabled") == "false"
    assert spark.conf.get("spark.sql.adaptive.enabled") == "true"
    # restored even when the body raises
    with pytest.raises(RuntimeError):
        with driver_sized(spark):
            raise RuntimeError("boom")
    assert spark.conf.get("spark.sql.adaptive.enabled") == "true"


def test_driver_sized_overlapping_threads_restore_aqe(spark):
    """Overlapping blocks from concurrent statements must not capture each
    other's "false" as the restore value (the race left AQE permanently
    off for the whole session after any concurrent Engine workload)."""
    import threading

    from plan_spark.session import driver_sized

    assert spark.conf.get("spark.sql.adaptive.enabled") == "true"
    enter = threading.Barrier(4, timeout=30)
    inside = threading.Barrier(4, timeout=30)

    def worker():
        enter.wait()
        with driver_sized(spark):
            assert spark.conf.get("spark.sql.adaptive.enabled") == "false"
            inside.wait()  # every thread is inside before any exits

    threads = [threading.Thread(target=worker) for _ in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(60)
    assert spark.conf.get("spark.sql.adaptive.enabled") == "true"
    # plain nesting on one thread also restores
    with driver_sized(spark):
        with driver_sized(spark):
            assert spark.conf.get("spark.sql.adaptive.enabled") == "false"
        assert spark.conf.get("spark.sql.adaptive.enabled") == "false"
    assert spark.conf.get("spark.sql.adaptive.enabled") == "true"
