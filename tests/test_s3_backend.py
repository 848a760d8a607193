"""S3 Store + CommitHandler against the stubbed client (r10 verdict #3):
the protocol layer was proven in r9/r10 (CasCommitHandler + MemStore
storms); this pins the CONCRETE S3 mapping — If-None-Match/If-Match
conditional requests, 412 -> CasConflict, list/head/copy shapes — plus
the data-plane choreography (move = copy+delete, delete_prefix batches)
and the end-to-end dataset lifecycle with control plane on the stub.

Reference parity: pkg/storage2/s3_store.go (client ops),
s3_commit.go:11 (ETag conditional put)."""

from __future__ import annotations

import json
import threading

import pytest

from plan_spark.dataset.commit import (
    ABSENT,
    DELETE,
    CasConflict,
    detect_handler,
    handler_named,
)
from plan_spark.dataset.s3 import (
    S3CasCommitHandler,
    S3Store,
    set_s3_client_factory,
)
from tests.s3_stub import StubS3Client


@pytest.fixture()
def stub():
    c = StubS3Client()
    set_s3_client_factory(lambda: c)
    yield c
    set_s3_client_factory(None)


class TestS3Store:
    def test_get_put_exists_mtime(self, stub):
        st = S3Store(stub)
        with pytest.raises(FileNotFoundError):
            st.get("/ds/a.json")
        st.put_bytes("/ds/a.json", b"hello")
        assert st.get("/ds/a.json") == b"hello"
        assert st.exists("/ds/a.json") and not st.exists("/ds/b.json")
        assert st.mtime("/ds/a.json") > 0

    def test_list_returns_objects_and_subprefixes(self, stub):
        st = S3Store(stub)
        st.put_bytes("/ds/_versions/00000001.manifest.json", b"{}")
        st.put_bytes("/ds/data/f1.parquet", b"x")
        st.put_bytes("/ds/data/f2.parquet", b"y")
        st.put_bytes("/ds/_refs.json", b"{}")
        assert sorted(st.list("/ds/data")) == ["f1.parquet", "f2.parquet"]
        # top-level listing mirrors os.listdir: files AND 'directories'
        assert sorted(st.list("/ds")) == [
            "_refs.json", "_versions", "data"
        ]
        assert st.list("/absent") == []

    def test_move_is_copy_plus_delete(self, stub):
        st = S3Store(stub)
        st.put_bytes("/ds/_staging_x/part0.parquet", b"bytes")
        st.move("/ds/_staging_x/part0.parquet", "/ds/data/abc.parquet")
        assert st.get("/ds/data/abc.parquet") == b"bytes"
        assert not st.exists("/ds/_staging_x/part0.parquet")
        with pytest.raises(FileNotFoundError):
            st.move("/ds/absent", "/ds/data/zzz.parquet")

    def test_delete_raises_on_absent(self, stub):
        st = S3Store(stub)
        st.put_bytes("/ds/data/a.parquet", b"x")
        st.delete("/ds/data/a.parquet")
        with pytest.raises(FileNotFoundError):
            st.delete("/ds/data/a.parquet")

    def test_delete_prefix_sweeps_recursively(self, stub):
        st = S3Store(stub)
        for i in range(5):
            st.put_bytes(f"/ds/_staging_x/part{i}.parquet", b"x")
        st.put_bytes("/ds/data/keep.parquet", b"k")
        st.delete_prefix("/ds/_staging_x")
        assert st.list("/ds/_staging_x") == []
        assert st.exists("/ds/data/keep.parquet")
        st.delete_prefix("/ds/absent")  # idempotent no-op

    def test_dir_mtime_falls_back_to_newest_object(self, stub):
        st = S3Store(stub)
        st.put_bytes("/ds/_staging_x/p.parquet", b"x")
        assert st.mtime("/ds/_staging_x") > 0
        with pytest.raises(FileNotFoundError):
            st.mtime("/ds/_staging_empty")

    def test_s3_url_paths_address_their_bucket(self, stub):
        st = S3Store(stub)
        st.put_bytes("s3://mybkt/ds/a.json", b"v")
        assert st.get("s3://mybkt/ds/a.json") == b"v"
        assert "ds/a.json" in stub._buckets["mybkt"]

    def test_list_paginates(self, stub):
        st = S3Store(stub)
        for i in range(2500):
            st.put_bytes(f"/big/k{i:05d}", b"x")
        assert len(st.list("/big")) == 2500


class TestS3Cas:
    def test_create_if_absent_and_conflict(self, stub):
        h = S3CasCommitHandler(stub)
        h._cas("/ds/_versions/v1", ABSENT, b"m1")
        assert h._read("/ds/_versions/v1") == b"m1"
        with pytest.raises(CasConflict):
            h._cas("/ds/_versions/v1", ABSENT, b"m1-loser")
        assert h._read("/ds/_versions/v1") == b"m1"

    def test_replace_requires_current_content(self, stub):
        h = S3CasCommitHandler(stub)
        h.put("/ds/_refs.json", "{}")
        h._cas("/ds/_refs.json", b"{}", b'{"t":1}')
        with pytest.raises(CasConflict):
            h._cas("/ds/_refs.json", b"{}", b'{"t":2}')  # stale expected
        assert h._read("/ds/_refs.json") == b'{"t":1}'

    def test_conditional_delete(self, stub):
        h = S3CasCommitHandler(stub)
        h.put("/ds/_staged/s1.json", "payload")
        with pytest.raises(CasConflict):
            h._cas("/ds/_staged/s1.json", b"other", DELETE)
        h._cas("/ds/_staged/s1.json", b"payload", DELETE)
        with pytest.raises(FileNotFoundError):
            h._read("/ds/_staged/s1.json")

    def test_update_json_never_loses_updates(self, stub):
        h = S3CasCommitHandler(stub)
        path = "/ds/_refs.json"
        n_threads, n_each = 8, 20
        errs = []

        def worker(i):
            hh = S3CasCommitHandler(stub)
            for j in range(n_each):
                try:
                    hh.update_json(
                        path, lambda cur: {**(cur or {}), f"k{i}_{j}": 1}
                    )
                except Exception as e:  # pragma: no cover
                    errs.append(e)

        ts = [threading.Thread(target=worker, args=(i,)) for i in range(n_threads)]
        for t in ts:
            t.start()
        for t in ts:
            t.join()
        assert not errs
        final = json.loads(h._read(path))
        assert len(final) == n_threads * n_each

    def test_commit_winner_take_all(self, stub):
        h = S3CasCommitHandler(stub)
        h.commit("/ds/_versions/00000002.manifest.json", "winner")
        with pytest.raises(FileExistsError):
            h.commit("/ds/_versions/00000002.manifest.json", "loser")

    def test_registered_and_marker_roundtrip(self, stub, tmp_path):
        from plan_spark.dataset.commit import write_handler_marker
        from plan_spark.dataset.s3 import marker_roundtrip

        assert handler_named("s3").name == "s3"
        d = str(tmp_path / "ds")
        import os

        os.makedirs(d)
        write_handler_marker(d, "s3")
        assert detect_handler(d).name == "s3"
        assert marker_roundtrip(d) == "s3"


class TestS3DatasetLifecycle:
    def test_lifecycle_control_plane_on_stub(self, stub, spark, tmp_path):
        """Full mini-lifecycle — create/append/delete/compact/tag/
        time-travel/vacuum/index — with handler 's3': every CONTROL
        object (manifests, refs, branch kinds, claims) lives in the stub
        bucket, none on disk; the data plane stays on the local path's
        store (the same division the mem backend proves)."""
        import os

        from pyspark.sql import functions as F

        from plan_spark.dataset.dataset import Dataset

        p = str(tmp_path / "ds")
        ds = Dataset.create(
            spark,
            p,
            spark.range(100).select(
                F.col("id").alias("k"), (F.col("id") % 5).alias("grp")
            ),
            commit_handler="s3",
        )
        ds.append(
            spark.range(100, 150).select(
                F.col("id").alias("k"), (F.col("id") % 5).alias("grp")
            )
        )
        ds.delete("k >= 140")
        ds.tag("before_compact", ds.version)
        ds.compact()
        assert ds.to_df().count() == 140
        assert ds.checkout("before_compact").to_df().count() == 140
        ds.create_index("bt", kind="btree", column="k", n_runs=2)
        ds.vacuum(grace_seconds=0.0)
        assert ds.to_df().count() == 140
        # control objects on the stub, not on disk
        bucket = stub._buckets[
            os.environ.get("PLAN_SPARK_S3_BUCKET", "plan-spark")
        ]
        key_root = p.lstrip("/")
        assert any(
            k.startswith(f"{key_root}/_versions/") for k in bucket
        ), "manifests must live in the stub bucket"
        assert not os.path.exists(os.path.join(p, "_versions")) or not [
            f
            for f in os.listdir(os.path.join(p, "_versions"))
            if f.endswith(".manifest.json")
        ], "no manifest files may land on disk with the s3 handler"
        # reopening detects the handler from the marker and keeps working
        ds2 = Dataset.open(spark, p)
        assert ds2._handler.name == "s3"
        assert ds2.to_df().count() == 140


class TestReviewFixesR11:
    """Regressions for the r11 self-review findings on the S3 edges."""

    def test_delete_prefix_while_paginating_leaves_nothing(self, stub):
        # index-based continuation tokens skipped ~1000 survivors per
        # page when the caller deletes between pages; the key-cursor
        # token must cover every object
        st = S3Store(stub)
        for i in range(2500):
            st.put_bytes(f"/sweep/k{i:05d}", b"x")
        st.delete_prefix("/sweep")
        assert st.list("/sweep") == []
        with pytest.raises(FileNotFoundError):
            st.get("/sweep/k02000")

    def test_list_no_duplicate_prefixes_across_pages(self, stub):
        # a delimiter group straddling a page boundary must not re-emit
        st = S3Store(stub)
        for d in range(3):
            for i in range(900):
                st.put_bytes(f"/root/dir{d}/f{i:04d}", b"x")
        names = st.list("/root")
        assert sorted(names) == ["dir0", "dir1", "dir2"]
        assert len(names) == len(set(names))

    def test_dir_mtime_paginates_to_the_newest(self, stub):
        # the newest object sorts LAST; a MaxKeys=1000 single page would
        # under-report it and vacuum could sweep an in-flight staging dir
        st = S3Store(stub)
        for i in range(1500):
            st.put_bytes(f"/stage/p{i:05d}", b"x")
        with stub._lock:
            b = stub._buckets[list(stub._buckets)[0]]
            for k in list(b):
                if not k.endswith("p01499"):
                    b[k] = (b[k][0], 1000.0)
                else:
                    b[k] = (b[k][0], 2000.0)
        assert st.mtime("/stage") == 2000.0

    def test_detect_handler_s3_root_absent_marker(self, stub):
        from plan_spark.dataset.commit import detect_handler

        assert detect_handler("s3://bkt/ds").name == "s3"
        # local roots keep the pre-seam default
        assert detect_handler("/nonexistent/local/ds").name == "local"

    def test_create_rejects_posix_handlers_on_s3_root(self, stub, spark):
        from plan_spark.dataset.dataset import Dataset

        for h in ("cas", "mem"):
            with pytest.raises(ValueError, match="object-store root"):
                Dataset.create(
                    spark, "s3://bkt/ds", spark.range(1).toDF("k"),
                    commit_handler=h,
                )

    def test_s3a_scheme_maps_to_same_bucket(self, stub):
        from plan_spark.dataset.s3 import _split

        assert _split("s3a://bkt/a/b") == ("bkt", "a/b")
        assert _split("s3://bkt/a/b") == ("bkt", "a/b")
        st = S3Store(stub)
        st.put_bytes("s3a://bkt/x", b"v")
        assert st.get("s3://bkt/x") == b"v"

    def test_collect_stats_accepts_uri_paths(self, spark, tmp_path):
        import pyarrow as pa
        import pyarrow.parquet as pq

        from plan_spark.dataset.dataset import _collect_stats

        p = str(tmp_path / "f.parquet")
        pq.write_table(pa.table({"k": [1, 2, 3]}), p)
        rows_local, _, _ = _collect_stats(p)
        rows_uri, _, stats = _collect_stats("file://" + p)
        assert rows_local == rows_uri == 3
        assert stats["k"]["min"] == 1 and stats["k"]["max"] == 3
