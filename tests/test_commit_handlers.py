"""Unit tests for the commit-handler seam (plan_spark/dataset/commit.py).

The seam mirrors the reference's CommitHandler abstraction
(pkg/storage2/commit.go:11-27 local-rename vs s3_commit.go ETag
conditional-put): both handlers must give identical protocol guarantees —
one winner per manifest version, lost-update-free control RMW, exclusive
claims — with the CAS handler building everything on compare-and-set
alone.
"""

from __future__ import annotations

import json
import os
import threading

import pytest

from plan_spark.dataset.commit import (
    CasCommitHandler,
    LocalCommitHandler,
    detect_handler,
    handler_named,
    write_handler_marker,
)

HANDLERS = [LocalCommitHandler, CasCommitHandler]
IDS = ["local", "cas"]


@pytest.fixture(params=HANDLERS, ids=IDS)
def handler(request):
    return request.param()


class TestCommit:
    def test_single_winner_per_version(self, handler, tmp_path):
        p = str(tmp_path / "00000002.manifest.json")
        handler.commit(p, '{"v": "winner"}')
        with pytest.raises(FileExistsError):
            handler.commit(p, '{"v": "loser"}')
        with open(p) as fh:
            assert json.load(fh)["v"] == "winner"

    def test_concurrent_committers_exactly_one_wins(self, handler, tmp_path):
        p = str(tmp_path / "00000003.manifest.json")
        wins, losses = [], []

        def run(i):
            try:
                handler.commit(p, json.dumps({"w": i}))
                wins.append(i)
            except FileExistsError:
                losses.append(i)

        ts = [threading.Thread(target=run, args=(i,)) for i in range(8)]
        [t.start() for t in ts]
        [t.join() for t in ts]
        assert len(wins) == 1 and len(losses) == 7
        with open(p) as fh:
            assert json.load(fh)["w"] == wins[0]


class TestUpdateJson:
    def test_rmw_from_absent(self, handler, tmp_path):
        p = str(tmp_path / "refs.json")
        out = handler.update_json(p, lambda cur: {**(cur or {}), "a": 1})
        assert out == {"a": 1}
        with open(p) as fh:
            assert json.load(fh) == {"a": 1}

    def test_no_lost_updates_under_contention(self, handler, tmp_path):
        p = str(tmp_path / "refs.json")
        handler.update_json(p, lambda cur: {})

        def bump(key):
            for _ in range(20):
                handler.update_json(
                    p, lambda cur: {**cur, key: cur.get(key, 0) + 1}
                )

        ts = [
            threading.Thread(target=bump, args=(f"k{i}",)) for i in range(6)
        ]
        [t.start() for t in ts]
        [t.join() for t in ts]
        with open(p) as fh:
            final = json.load(fh)
        assert final == {f"k{i}": 20 for i in range(6)}, final

    def test_mutate_exception_aborts_without_write(self, handler, tmp_path):
        p = str(tmp_path / "refs.json")
        handler.update_json(p, lambda cur: {"keep": True})

        def boom(cur):
            raise ValueError("no")

        with pytest.raises(ValueError):
            handler.update_json(p, boom)
        with open(p) as fh:
            assert json.load(fh) == {"keep": True}


class TestMarkers:
    def test_create_exclusive_single_holder(self, handler, tmp_path):
        p = str(tmp_path / "_REFRESHING")
        handler.create_exclusive(p, '{"ts": 1}')
        with pytest.raises(FileExistsError):
            handler.create_exclusive(p, '{"ts": 2}')
        handler.delete(p)
        handler.create_exclusive(p, '{"ts": 3}')  # free again after delete

    def test_delete_missing_raises(self, handler, tmp_path):
        with pytest.raises(FileNotFoundError):
            handler.delete(str(tmp_path / "nope"))


class TestDetection:
    def test_marker_round_trip(self, tmp_path):
        write_handler_marker(str(tmp_path), "cas")
        assert detect_handler(str(tmp_path)).name == "cas"
        write_handler_marker(str(tmp_path), "local")
        assert detect_handler(str(tmp_path)).name == "local"

    def test_no_marker_defaults_local(self, tmp_path):
        assert detect_handler(str(tmp_path)).name == "local"

    def test_unknown_name_rejected(self):
        # "s3" graduated to a real handler in r11 — probe a name that
        # stays unknown
        with pytest.raises(ValueError, match="unknown commit handler"):
            handler_named("gopher")


class TestCasOnly:
    """Semantics specific to the compare-and-set build."""

    def test_objects_stored_verbatim(self, tmp_path):
        # reads are plain GETs on any store: content must be at the path
        h = CasCommitHandler()
        p = str(tmp_path / "m.json")
        h.commit(p, '{"x": 1}')
        with open(p) as fh:
            assert json.load(fh) == {"x": 1}

    def test_update_retries_through_interleaved_writer(self, tmp_path):
        h = CasCommitHandler()
        p = str(tmp_path / "refs.json")
        h.update_json(p, lambda cur: {"n": 0})
        calls = {"n": 0}

        def mut(cur):
            calls["n"] += 1
            if calls["n"] == 1:
                # an interleaved writer lands between our read and our CAS:
                # the first attempt MUST fail its precondition and retry
                with open(p) as fh:
                    other = json.load(fh)
                other["intruder"] = True
                tmp = p + ".x"
                with open(tmp, "w") as fh:
                    json.dump(other, fh)
                os.replace(tmp, p)
            out = dict(cur)
            out["n"] = out["n"] + 1
            return out

        h.update_json(p, mut)
        assert calls["n"] == 2, "first CAS must have failed and retried"
        with open(p) as fh:
            final = json.load(fh)
        assert final["n"] == 1 and final["intruder"] is True
