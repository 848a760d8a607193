"""Crash-point fault injection for the storage protocols.

Counterpart of the reference's fault-injection harness
(pkg/util/fault_inject.go): named fault POINTS are compiled into
the known-dangerous windows of the commit / detached-stage / ref-advance /
index-swap / vacuum sequences, and tests arm them to simulate a process
dying at exactly that instruction. The invariant under test is always the
same: REOPENING the dataset afterwards either recovers or refuses loudly —
never a silent wrong answer.

Two firing modes, because Python cleanup semantics differ from a real
crash:

- ``raise`` (default): ``fault_point`` raises :class:`InjectedCrash`, a
  BaseException, so no ``except Exception`` recovery path can absorb it.
  Faithful ONLY for windows with no enclosing compensating handlers (the
  index compact swaps are linear code); an enclosing ``finally``/
  ``except BaseException`` still runs, which a real crash would skip.
- ``exit``: ``os._exit(77)`` — no handlers, no ``finally``, no atexit.
  THE faithful crash image, but it kills the whole process, so tests use
  it from a small Spark-free child process (the staged-commit / ref /
  vacuum paths are pure file I/O; ``Dataset.open(None, path)`` works).

Arming is programmatic (:func:`arm_fault`) or env-keyed for child
processes: ``PLAN_SPARK_FAULT=<site>[:<nth>]`` arms one site at import
time (``nth`` = fire on the n-th hit, default 1), and
``PLAN_SPARK_FAULT_MODE=exit`` selects the crash-image mode.

Production cost: one truthiness check of an empty dict per fault point.
"""

from __future__ import annotations

import os
import threading


class InjectedCrash(BaseException):
    """The armed fault fired in ``raise`` mode. BaseException on purpose:
    generic ``except Exception`` recovery must never 'helpfully' absorb a
    simulated crash."""


_lock = threading.Lock()
# site -> (remaining hits before firing, mode). Mode is PER SITE so a test
# arming mixed modes ('a' raise + 'b' exit) gets the crash mechanism it
# asked for at each site, not whichever mode was armed last.
_armed: dict[str, tuple[int, str]] = {}


def arm_fault(site: str, nth: int = 1, mode: str = "raise") -> None:
    """Arm ``site`` to fire on its ``nth`` hit (then disarm itself)."""
    if mode not in ("raise", "exit"):
        raise ValueError(f"unknown fault mode {mode!r}")
    with _lock:
        _armed[site] = (nth, mode)


def clear_faults() -> None:
    with _lock:
        _armed.clear()


def fault_point(site: str) -> None:
    """Compiled into a dangerous window; no-op unless tests armed ``site``."""
    if not _armed:  # fast path — production is always here
        return
    with _lock:
        ent = _armed.get(site)
        if ent is None:
            return
        n, mode = ent
        if n > 1:
            _armed[site] = (n - 1, mode)
            return
        del _armed[site]
    if mode == "exit":
        os._exit(77)  # the crash image: no finally/except/atexit runs
    raise InjectedCrash(site)


def _arm_from_env() -> None:
    spec = os.environ.get("PLAN_SPARK_FAULT", "")
    if not spec:
        return
    site, _, nth = spec.partition(":")
    arm_fault(
        site,
        int(nth) if nth else 1,
        os.environ.get("PLAN_SPARK_FAULT_MODE", "raise"),
    )


_arm_from_env()
