"""Operator-scoped persist lifetime (VERDICT r04 "wrong" #3, r05 #2).

Multi-consumer operators (as-of join's union frame, the SAX symbol/code
frames, MinHash signature/candidate frames, dup-group labels) must persist
their intermediates or the lineage re-executes ~5× (measured; see
operators/dedup.minhash_dedup). But a persist can only be RELEASED after the
caller's consuming action, which the operator never sees — so operator-local
persists used to leak into whatever session a 50-query driver run keeps open,
accumulating blocks that evict hotter caches.

This module is the one documented place that owns that caller responsibility:

* operators call :func:`scoped_persist` instead of ``df.persist()`` — same
  storage semantics, plus registration in a scope keyed by the frame's OWN
  SparkSession (weak-keyed, so a stopped/garbage-collected session drops its
  entries rather than pinning them);
* every registry query entry (driver_queries._q) calls
  :func:`release_scoped` on ENTRY, so in a sequential multi-query run each
  query's blocks are dropped as soon as the next query starts — at most one
  query's scoped persists are ever live;
* harnesses that want tighter bounds (tools/check_oracles.py, bench.py) may
  additionally call :func:`release_scoped` (or ``clearCache``) at run EXIT so
  the last query's blocks don't outlive the run (ADVICE r05).

Scopes are PER-SESSION: releasing with session A live never touches frames
persisted under session B (two-session isolation is pytest-asserted in
tests/test_plans.py). Within one session, sequential consumption remains the
contract: this module is NOT thread-safe for interleaved queries on the same
session — if a caller interleaves two scoped operators and re-collects the
first afterwards, the recompute is correct but uncached. Unpersist never
invalidates results — Spark falls back to lineage.
"""

from __future__ import annotations

import logging
import weakref

from pyspark.sql import DataFrame

log = logging.getLogger(__name__)

# SparkSession (weak key) -> list of persisted JVM Dataset handles awaiting
# release. Weak keys: a session that is stopped and dropped by the caller must
# not be kept alive just because an operator once persisted under it. The
# VALUES are the py4j ``df._jdf`` handles, NOT the Python DataFrames: a
# DataFrame strongly references its own SparkSession (``df._session``), so
# DataFrame values would make every key reachable from its value and the
# WeakKeyDictionary could never evict anything (code-review r6; per the
# weakref docs, values that refer to keys prevent key collection). A
# JavaObject holds only a gateway-client + target id — no Python session ref.
_LIVE: "weakref.WeakKeyDictionary" = weakref.WeakKeyDictionary()


def _session_of(df: DataFrame):
    return df.sparkSession


def scoped_persist(df: DataFrame, level=None) -> DataFrame:
    """persist() + register for release at the next query boundary."""
    df = df.persist() if level is None else df.persist(level)
    _LIVE.setdefault(_session_of(df), []).append(df._jdf)
    return df


def register_scoped(df: DataFrame) -> DataFrame:
    """Register an ALREADY-persisted frame for release at the next boundary
    (for operators that manage persist/unpersist internally but return a
    persisted result, e.g. dup_groups' final label frame)."""
    _LIVE.setdefault(_session_of(df), []).append(df._jdf)
    return df


def release_scoped(session=None) -> int:
    """Unpersist every scoped frame of ``session`` (non-blocking); with no
    session given, release every tracked session's frames (harness run-exit
    hook). Returns how many frames were released."""
    sessions = [session] if session is not None else list(_LIVE.keys())
    n = 0
    for s in sessions:
        jdfs = _LIVE.pop(s, [])
        for jdf in jdfs:
            n += 1
            try:
                jdf.unpersist(False)
            except Exception as e:  # noqa: BLE001 — release must not raise
                # expected only when the owning session/context is already
                # stopped; anything else is logged, not swallowed silently
                # (ADVICE r05: the bare pass hid real unpersist failures)
                msg = str(e)
                if "stopped" not in msg and "Cannot call methods" not in msg:
                    log.warning("release_scoped: unpersist failed: %s", msg)
    return n
