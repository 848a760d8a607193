"""Regression tests for the round-9 ADVICE findings (all four fixed r10):

1. CasCommitHandler.update_json must BOUND contention (~8 s budget) and
   raise CasConflict when exhausted — same caller-visible contract as
   LocalCommitHandler, so _update_control's ConflictError promise holds
   on both handlers.
2. detect_handler must raise on a PRESENT-but-corrupt/unknown
   _commit.json marker (silent local fallback = mixed-protocol
   split-brain); absent marker still means pre-seam local.
3. Crashed-writer ``*.cas.<pid>.<tid>`` / ``*.tmp.<pid>.<tid>`` residue
   in dataset CONTROL dirs (root/_versions/_staged) is reclaimed by
   vacuum and cleanup_expired via the shared dead-pid-gated sweep.
4. (doc-level) update_json's API contract now states the
   no-create-from-absent invariant for deletable paths; the sweep regex
   also covers the cas temps.
"""

from __future__ import annotations

import json
import os
import subprocess

import pytest

from plan_spark.dataset.commit import (
    CasCommitHandler,
    CasConflict,
    LocalCommitHandler,
    detect_handler,
    write_handler_marker,
)
from plan_spark.dataset.dataset import Dataset


def _dead_pid() -> int:
    p = subprocess.Popen(["true"])
    p.wait()
    return p.pid


class TestCasRetryBudget:
    def test_cas_update_json_raises_after_budget(self, tmp_path, monkeypatch):
        h = CasCommitHandler()
        path = str(tmp_path / "hot.json")
        # force every conditional put to lose the ETag race
        monkeypatch.setattr(h, "_cas", lambda *a, **k: (_ for _ in ()).throw(CasConflict("x")))
        # compress the 8 s budget: each sleep advances a fake clock 1 s
        clock = {"t": 0.0}
        monkeypatch.setattr(
            "plan_spark.dataset.commit.time.monotonic", lambda: clock["t"]
        )
        monkeypatch.setattr(
            "plan_spark.dataset.commit.time.sleep",
            lambda s: clock.__setitem__("t", clock["t"] + 1.0),
        )
        with pytest.raises(CasConflict):
            h.update_json(path, lambda cur: {"n": 1})

    def test_local_update_json_raises_after_budget(self, tmp_path):
        path = str(tmp_path / "hot.json")
        import fcntl as _fcntl

        # hold the flock here; the contender must run in a CHILD process
        # (flock locks are per-open-file-description and re-acquirable
        # within one process). The child compresses the 8 s budget by
        # patching the module clock.
        fd = os.open(path + ".lock", os.O_CREAT | os.O_RDWR)
        _fcntl.flock(fd, _fcntl.LOCK_EX)
        try:
            code = (
                "import os, json\n"
                "from plan_spark.dataset.commit import LocalCommitHandler, CasConflict\n"
                "import plan_spark.dataset.commit as C\n"
                "clock={'t':0.0}\n"
                "C.time.monotonic=lambda: clock['t']\n"
                "C.time.sleep=lambda s: clock.__setitem__('t', clock['t']+1.0)\n"
                f"h=LocalCommitHandler()\n"
                f"try:\n"
                f"    h.update_json({path!r}, lambda cur: {{'n': 1}})\n"
                f"except CasConflict:\n"
                f"    print('BOUNDED')\n"
            )
            r = subprocess.run(
                ["python", "-c", code], cwd="/root/repo", capture_output=True, timeout=60
            )
            assert b"BOUNDED" in r.stdout, r.stderr.decode()[-500:]
        finally:
            os.close(fd)

    def test_cas_update_json_still_succeeds_uncontended(self, tmp_path):
        h = CasCommitHandler()
        path = str(tmp_path / "obj.json")
        out = h.update_json(path, lambda cur: {"n": (cur or {}).get("n", 0) + 1})
        assert out == {"n": 1}
        out = h.update_json(path, lambda cur: {"n": cur["n"] + 1})
        assert out == {"n": 2}


class TestDetectHandlerStrict:
    def test_absent_marker_defaults_local(self, tmp_path):
        assert detect_handler(str(tmp_path)).name == "local"

    def test_valid_markers_resolve(self, tmp_path):
        write_handler_marker(str(tmp_path), "cas")
        assert detect_handler(str(tmp_path)).name == "cas"
        write_handler_marker(str(tmp_path), "local")
        assert detect_handler(str(tmp_path)).name == "local"

    def test_corrupt_marker_raises(self, tmp_path):
        (tmp_path / "_commit.json").write_text("{not json")
        with pytest.raises(ValueError, match="commit-handler marker"):
            detect_handler(str(tmp_path))

    def test_unknown_handler_name_raises(self, tmp_path):
        (tmp_path / "_commit.json").write_text(json.dumps({"handler": "zk"}))
        with pytest.raises(ValueError, match="commit-handler marker"):
            detect_handler(str(tmp_path))

    def test_missing_key_raises(self, tmp_path):
        (tmp_path / "_commit.json").write_text(json.dumps({"proto": "cas"}))
        with pytest.raises(ValueError, match="commit-handler marker"):
            detect_handler(str(tmp_path))


class TestControlTmpSweep:
    @pytest.mark.parametrize("handler", ["local", "cas"])
    def test_vacuum_reclaims_dead_control_tmps(self, spark, tmp_path, handler):
        ds = Dataset.create(
            spark,
            str(tmp_path / "ds"),
            spark.range(4).toDF("id"),
            commit_handler=handler,
        )
        dead = _dead_pid()
        suffix = "cas" if handler == "cas" else "tmp"
        strands = [
            os.path.join(ds.path, f"_refs.json.{suffix}.{dead}.7"),
            os.path.join(ds._versions_dir, f"00000009.manifest.json.{suffix}.{dead}.7"),
        ]
        os.makedirs(os.path.join(ds.path, "_staged"), exist_ok=True)
        strands.append(os.path.join(ds.path, "_staged", f"s1.json.{suffix}.{dead}.7"))
        for p in strands:
            with open(p, "w") as fh:
                fh.write("{}")
        live = os.path.join(ds.path, f"_refs.json.{suffix}.{os.getpid()}.7")
        with open(live, "w") as fh:
            fh.write("{}")
        ds.vacuum(keep_versions=10, grace_seconds=0.0)
        for p in strands:
            assert not os.path.exists(p), f"dead residue survived: {p}"
        assert os.path.exists(live), "live writer's in-flight temp was yanked"
        os.remove(live)

    def test_cleanup_expired_also_sweeps(self, spark, tmp_path):
        ds = Dataset.create(spark, str(tmp_path / "ds"), spark.range(2).toDF("id"))
        dead = _dead_pid()
        stranded = os.path.join(ds._versions_dir, f"x.json.tmp.{dead}.1")
        with open(stranded, "w") as fh:
            fh.write("{}")
        ds.cleanup_expired()
        assert not os.path.exists(stranded)
