"""Deferred-release registry for mid-plan persists.

Several operators persist an intermediate BOTH sides of a self-join (or a
count job and an enumerate job) consume — the persist is load-bearing for
plan dedup, and it cannot be dropped before the caller's terminal action
because the returned DataFrame's lineage reads it. That leaves the blocks
parked in executor storage after consumption: harmless for one query,
storage-pressure for a long session running hundreds (round-4 advice on
``dedup_near_minhash(collapse_exact)``).

The fix is the same shape ``bpe_train`` uses for its localCheckpoint
generations: REGISTER every such persist here, and let the session owner
call :func:`release_all` at its consumption boundary (bench.py does so
per query; services should call it per batch). The registry holds STRONG
references — the operator's own local went out of scope the moment it
returned, so a weak ref would be dead before the caller ever acted;
pinning the handle (a few hundred bytes) until the owner releases is
the contract. Releasing a frame whose blocks are already gone is a
no-op.

``spark.catalog.clearCache()`` is the blunter alternative (it drops ALL
cached frames, including ones the caller wants kept — e.g. a corpus
index serving ``dedup_near_minhash_incremental`` across batches);
``release_all`` only touches what the engine itself registered.
"""

from __future__ import annotations

import threading

__all__ = ["track", "release_all", "snapshot", "tracked_count"]

_lock = threading.Lock()
_tracked: list = []


def track(df):
    """Register a persisted DataFrame for deferred release; returns it
    unchanged (chainable around ``.persist()``).  Identity-deduped
    (r13 driver advice): memo re-arm paths call ``track`` on the same
    frame object after every ``clearCache()`` boundary — clearCache
    unpersists but does not drain ``_tracked``, so without the dedup
    the list grows one duplicate entry per re-arm until the next
    ``release_all``."""
    with _lock:
        if not any(t is df for t in _tracked):
            _tracked.append(df)
    return df


def tracked_count() -> int:
    with _lock:
        return len(_tracked)


def snapshot() -> list:
    """Copy of the currently tracked frames (identity list) — lets a
    plan-memoizing caller diff before/after an operator call to learn
    which internal persists that operator registered, so a memo hit can
    re-arm them after a release boundary."""
    with _lock:
        return _tracked[:]


def release_all(blocking: bool = False) -> int:
    """Unpersist every registered frame; returns how many were
    released. Best-effort — storage, never correctness."""
    with _lock:
        dfs = _tracked[:]
        _tracked.clear()
    n = 0
    for df in dfs:
        try:
            df.unpersist(blocking)
            n += 1
        except Exception:
            pass
    return n
