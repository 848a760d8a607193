"""Regression tests for the round-10 ADVICE findings (fixed r11):

1. (medium) Engine._rewrite_quoted_idents honors backslash-escaped quotes
   — covered in tests/test_sql_quoting_property.py
   (test_backslash_escaped_quote_keeps_literal_boundary).
2. write_handler_marker is atomic: a reader racing dataset creation only
   ever observes absent-or-complete markers (detect_handler hard-raises
   on torn ones by design).
3. Verbatim driver rows always run the EMBEDDED spec text; a diverged
   reference .sql file raises instead of feeding unpinned external SQL
   through the front door while the oracle answers the pinned copy.
4. _MEM_OBJECTS is reset per dataset path at Dataset.create: a fresh mem
   dataset at a previously-used path never surfaces the prior
   incarnation's refs/claims.
"""

from __future__ import annotations

import json
import os
import threading

import pytest

from plan_spark.dataset.commit import (
    _MEM_LOCK,
    _MEM_OBJECTS,
    detect_handler,
    mem_reset,
    write_handler_marker,
)
from plan_spark.queries.common import verbatim_text


class TestMarkerAtomicity:
    def test_marker_written_via_replace(self, tmp_path):
        """Polling readers racing a loop of marker writes never observe a
        torn or empty marker — every read is absent or complete JSON."""
        d = str(tmp_path)
        marker = os.path.join(d, "_commit.json")
        stop = threading.Event()
        bad: list[str] = []

        def reader():
            while not stop.is_set():
                try:
                    with open(marker) as fh:
                        raw = fh.read()
                except FileNotFoundError:
                    continue
                try:
                    obj = json.loads(raw)
                    assert obj["handler"] in ("local", "cas", "mem")
                except Exception:
                    bad.append(raw)

        threads = [threading.Thread(target=reader) for _ in range(4)]
        for t in threads:
            t.start()
        for _ in range(300):
            write_handler_marker(d, "cas")
            write_handler_marker(d, "local")
        stop.set()
        for t in threads:
            t.join()
        assert bad == [], bad[:3]
        assert detect_handler(d).name == "local"
        # no stranded temp files
        assert [f for f in os.listdir(d) if ".tmp." in f] == []


class TestVerbatimPinning:
    def test_absent_file_returns_embedded(self, tmp_path):
        emb = "select 1 as a"
        assert verbatim_text(str(tmp_path / "nope.sql"), emb) == emb

    def test_matching_file_returns_embedded(self, tmp_path):
        emb = "select  1\nas a"
        f = tmp_path / "q.sql"
        f.write_text("select 1 as a\n")
        assert verbatim_text(str(f), emb) == emb

    def test_diverged_file_raises(self, tmp_path):
        f = tmp_path / "q.sql"
        f.write_text("select 2 as a")
        with pytest.raises(ValueError, match="diverged"):
            verbatim_text(str(f), "select 1 as a")

    def test_live_rows_are_pinned(self):
        """The three verbatim driver rows' embedded copies still match the
        reference's shipped files (normalized), so the pinning guard is
        non-vacuous AND currently green."""
        from plan_spark.queries.dataset_q import (
            _TPCH_Q1_VERBATIM,
            _TPCH_Q21_VERBATIM,
        )
        from plan_spark.queries.tpcds_probe import _TPCDS_Q51_VERBATIM

        for qfile, emb in (
            ("/root/reference/cases/tpch/query/q1.sql", _TPCH_Q1_VERBATIM),
            ("/root/reference/cases/tpch/query/q21.sql", _TPCH_Q21_VERBATIM),
            (
                "/root/reference/cases/tpcds/query/query51.sql",
                _TPCDS_Q51_VERBATIM,
            ),
        ):
            assert verbatim_text(qfile, emb) == emb


class TestMemNamespaceReset:
    def test_mem_reset_scopes_by_prefix(self):
        with _MEM_LOCK:
            _MEM_OBJECTS["/x/a/refs.json"] = (b"stale", 0.0)
            _MEM_OBJECTS["/x/a/_versions/00000001.manifest.json"] = (b"m", 0.0)
            _MEM_OBJECTS["/x/ab/refs.json"] = (b"keep", 0.0)
        mem_reset("/x/a")
        with _MEM_LOCK:
            assert "/x/a/refs.json" not in _MEM_OBJECTS
            assert "/x/a/_versions/00000001.manifest.json" not in _MEM_OBJECTS
            # sibling path sharing a string prefix but not a DIR prefix stays
            assert _MEM_OBJECTS.pop("/x/ab/refs.json") == (b"keep", 0.0)

    def test_fresh_mem_dataset_sees_no_stale_state(self, spark, tmp_path):
        """Create a mem dataset, tag a ref, wipe the POSIX footprint (as a
        test-session teardown would), then create a NEW mem dataset at the
        same path: the prior incarnation's refs must be gone."""
        import shutil

        from plan_spark.dataset.dataset import Dataset

        p = str(tmp_path / "ds")
        ds = Dataset.create(
            spark,
            p,
            spark.range(3).toDF("k"),
            commit_handler="mem",
        )
        ds.tag("v1", 1)
        assert ds._refs().get("v1") == 1
        shutil.rmtree(p)
        ds2 = Dataset.create(
            spark,
            p,
            spark.range(2).toDF("k"),
            commit_handler="mem",
        )
        assert "v1" not in ds2._refs()
        assert ds2.to_df().count() == 2
