"""Commit handlers: the seam between the dataset's commit PROTOCOL and the
storage system's atomic primitive.

Mirrors the reference's CommitHandler abstraction
(/root/reference/pkg/storage2/commit.go:11-27 — ResolveLatestVersion /
ResolveVersion / Commit, with LocalRenameCommitHandler and an
S3CommitHandler built on ETag conditional-put, s3_commit.go) and widens it
to the OTHER control-plane writes the reference leaves outside its handler
(refs, branch kinds, detached-stage claims, index-refresh claims): at
100 TB the warehouse lives on object storage, where every one of those
needs the store's conditional-put, not POSIX rename/flock/O_EXCL.

Two implementations:

- :class:`LocalCommitHandler` — today's local-filesystem primitives,
  verbatim: O_EXCL create decides commit winners, flock serializes
  read-modify-writes, temp+rename gives atomic replace.
- :class:`CasCommitHandler` — every operation built on ONE primitive,
  ``_cas(path, expected, new)`` (compare-and-set on full object content,
  create-if-absent when ``expected is ABSENT``) — the semantics of S3
  conditional PUT (If-None-Match / If-Match, reference s3_commit.go). The
  mock keeps objects as verbatim files on local disk so READS stay plain
  GETs (unconditional reads need no handler on any store); the store-wide
  lock inside ``_cas`` stands in for the store's internally-atomic
  conditional-put, exactly as S3's own consensus does.

Handler choice is recorded at dataset creation in ``<path>/_commit.json``
so every later ``Dataset.open`` — including crash-recovery child
processes — picks the same protocol.

Data files (parquet fragments, deletion sidecars, index runs) do NOT go
through the handler: they are immutable uniquely-named blobs whose writes
need no atomicity on any store. The commit protocol is what makes them
visible.
"""

from __future__ import annotations

import fcntl
import json
import os
import threading
import time
from collections.abc import Callable

# sentinel: "object must not exist" for _cas expected / "delete" for new
ABSENT = object()
DELETE = object()


class CasConflict(Exception):
    """The conditional write's precondition failed (ETag mismatch)."""


class CommitHandler:
    """Protocol-level atomic operations over small control objects.

    Paths are ordinary absolute file paths; objects are stored verbatim at
    those paths on every handler, so unconditional READS (manifest loads,
    refs reads, stage-payload reads, directory listings) never need the
    handler — matching S3, where GET/LIST are plain and only conditional
    PUT is special.
    """

    name = "abstract"

    # ---------------------------------------------------------- manifests
    def commit(self, path: str, text: str) -> None:
        """Atomically create ``path`` with ``text``; raise FileExistsError
        if the version already exists — the single primitive that decides
        optimistic-commit winners (reference commit.go:20 'only one writer
        can succeed for the same version')."""
        raise NotImplementedError

    # --------------------------------------------- serialized read-modify-write
    def update_json(self, path: str, mutate: Callable[[object], object]) -> object:
        """Serialized read-modify-write of a small JSON object.

        ``mutate`` receives the decoded object (None if absent) and returns
        the replacement (or raises to abort). Concurrent update_json calls
        on the same path NEVER lose an update: local = flock around the
        RMW; CAS = ETag retry loop. Returns the value written."""
        raise NotImplementedError

    # ----------------------------------------------------------- markers
    def create_exclusive(self, path: str, text: str = "") -> None:
        """Create-if-absent claim marker; raise FileExistsError if held."""
        raise NotImplementedError

    def delete(self, path: str) -> None:
        """Remove an object; FileNotFoundError propagates."""
        raise NotImplementedError


class LocalCommitHandler(CommitHandler):
    """The local-filesystem protocol (reference LocalRenameCommitHandler,
    commit.go:23-80): O_EXCL create, flock-serialized RMW, temp+rename."""

    name = "local"

    def commit(self, path: str, text: str) -> None:
        fd = os.open(path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        with os.fdopen(fd, "w") as fh:
            fh.write(text)

    def update_json(self, path: str, mutate: Callable[[object], object]) -> object:
        # flock on a persistent sibling lock file: the kernel releases it on
        # process death, so there is no staleness-reclaim protocol (every
        # create/getmtime/remove reclaim scheme has a TOCTOU window)
        lock = path + ".lock"
        fd = os.open(lock, os.O_CREAT | os.O_RDWR)
        try:
            for _ in range(800):
                try:
                    fcntl.flock(fd, fcntl.LOCK_EX | fcntl.LOCK_NB)
                    break
                except OSError:
                    time.sleep(0.01)
            else:
                raise CasConflict(f"{os.path.basename(path)} is locked; retry")
            cur = None
            if os.path.exists(path):
                with open(path) as fh:
                    cur = json.load(fh)
            new = mutate(cur)
            tmp = f"{path}.tmp.{os.getpid()}.{threading.get_ident()}"
            with open(tmp, "w") as fh:
                json.dump(new, fh, indent=1, sort_keys=True)
            os.replace(tmp, path)
            return new
        finally:
            os.close(fd)  # closing the fd releases the flock

    def create_exclusive(self, path: str, text: str = "") -> None:
        fd = os.open(path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        with os.fdopen(fd, "w") as fh:
            fh.write(text)

    def delete(self, path: str) -> None:
        os.remove(path)
        # reclaim the update_json flock sibling with the object it guarded
        # (per-stage payloads would otherwise strand one .lock file each —
        # unbounded directory growth). Safe despite the persistent-lock
        # rule: after the object is gone, any update_json racer — whichever
        # lock inode it lands on — reads None and can only abort; there is
        # no state left for two writers to lose.
        try:
            os.remove(path + ".lock")
        except OSError:
            pass


class CasCommitHandler(CommitHandler):
    """Every control-plane write built on compare-and-set alone — the
    object-store commit protocol (reference s3_commit.go ETag optimistic
    lock). ``_cas`` is the mock's single atomic primitive; a real S3
    backend would implement it with If-None-Match (create) / If-Match
    (replace, delete) conditional requests and nothing else."""

    name = "cas"

    def _store_lock(self, path: str):
        """The mock's stand-in for the store's internally-atomic
        conditional-put: one flock per directory, held only INSIDE a
        single _cas call (never across calls — the protocol above must
        work with no cross-call locking, which is the point)."""
        d = os.path.dirname(path)
        os.makedirs(d, exist_ok=True)
        return _FlockGuard(os.path.join(d, ".cas_store.lock"))

    def _cas(self, path: str, expected, new) -> None:
        """Compare-and-set: succeed iff current content == ``expected``
        (ABSENT = must not exist), then atomically install ``new``
        (DELETE = remove). Raises CasConflict on precondition failure."""
        with self._store_lock(path):
            try:
                with open(path, "rb") as fh:
                    cur = fh.read()
            except FileNotFoundError:
                cur = ABSENT
            if expected is ABSENT:
                if cur is not ABSENT:
                    raise CasConflict(f"{path} exists")
            elif cur is ABSENT or cur != expected:
                raise CasConflict(f"{path} changed under CAS")
            if new is DELETE:
                if cur is not ABSENT:
                    os.remove(path)
                return
            tmp = f"{path}.cas.{os.getpid()}.{threading.get_ident()}"
            with open(tmp, "wb") as fh:
                fh.write(new)
            os.replace(tmp, path)

    # ------------------------------------------------ protocol operations
    def commit(self, path: str, text: str) -> None:
        try:
            self._cas(path, ABSENT, text.encode())
        except CasConflict:
            raise FileExistsError(path) from None

    def update_json(self, path: str, mutate: Callable[[object], object]) -> object:
        while True:
            try:
                with open(path, "rb") as fh:
                    raw = fh.read()
                cur, expected = json.loads(raw), raw
            except FileNotFoundError:
                cur, expected = None, ABSENT
            new = mutate(cur)
            enc = json.dumps(new, indent=1, sort_keys=True).encode()
            try:
                self._cas(path, expected, enc)
                return new
            except CasConflict:
                time.sleep(0.002)  # another writer won the ETag race; retry

    def create_exclusive(self, path: str, text: str = "") -> None:
        try:
            self._cas(path, ABSENT, text.encode())
        except CasConflict:
            raise FileExistsError(path) from None

    def delete(self, path: str) -> None:
        while True:
            try:
                with open(path, "rb") as fh:
                    raw = fh.read()
            except FileNotFoundError:
                raise FileNotFoundError(path) from None
            try:
                self._cas(path, raw, DELETE)
                return
            except CasConflict:
                continue  # content moved under the conditional delete


class _FlockGuard:
    def __init__(self, lock_path: str):
        self._path = lock_path
        self._fd = None

    def __enter__(self):
        self._fd = os.open(self._path, os.O_CREAT | os.O_RDWR)
        fcntl.flock(self._fd, fcntl.LOCK_EX)
        return self

    def __exit__(self, *exc):
        fcntl.flock(self._fd, fcntl.LOCK_UN)
        os.close(self._fd)
        self._fd = None


_HANDLERS = {"local": LocalCommitHandler, "cas": CasCommitHandler}


def handler_named(name: str) -> CommitHandler:
    try:
        return _HANDLERS[name]()
    except KeyError:
        raise ValueError(
            f"unknown commit handler {name!r}; choose from {sorted(_HANDLERS)}"
        ) from None


def write_handler_marker(dataset_path: str, name: str) -> None:
    """Record the handler at creation so every later open — including
    crash-recovery child processes — speaks the same protocol."""
    with open(os.path.join(dataset_path, "_commit.json"), "w") as fh:
        json.dump({"handler": name}, fh)


def detect_handler(dataset_path: str) -> CommitHandler:
    try:
        with open(os.path.join(dataset_path, "_commit.json")) as fh:
            return handler_named(json.load(fh)["handler"])
    except (FileNotFoundError, ValueError, KeyError):
        return LocalCommitHandler()  # pre-seam datasets are local by def'n
