"""Deterministic lifecycle for driver-created Python broadcasts.

Root-cause hardening for the round-5 driver-bench failure (VERDICT r5 #2):
the bench tail showed the classic ``BlockInfoManager``/``TorrentBroadcast``
race ("Cannot invoke Set.add(...) because ... ConcurrentHashMap.get(Object)
is null" at task completion) — broadcast/RDD blocks being removed while a
task still holds their read locks. The engine's Python ``Broadcast``
objects (chunked right-side matrices, codebooks, centroids, SIF weight
maps, PC vectors) were previously kept alive only by the query plan that
referenced them: the moment the caller dropped the DataFrame, driver-JVM
GC could hand the broadcast to ContextCleaner at an arbitrary later point
— including while a subsequent job's tasks run in the same (local-mode)
block manager. In local mode executor and driver share one
``BlockInfoManager``, so asynchronous GC-driven cleaning is exactly the
concurrent-removal window the race needs.

This registry makes the lifecycle explicit and quiet:

  * every operator-created broadcast is ``track()``-ed — the strong
    reference here prevents GC-triggered ContextCleaner destruction at a
    nondeterministic time;
  * ``release_tracked()`` runs at the documented release points (the
    bench's per-repeat ``_release_ann_caches`` via
    ``lsh.release_signature_caches``, the pipeline's stage boundaries) —
    i.e. strictly AFTER the consuming action — and calls
    ``Broadcast.unpersist(blocking=False)``: executor copies are dropped,
    but the driver-side value stays, so a stale plan that is re-executed
    later re-broadcasts instead of failing (the same contract as the
    persisted-frame caches).

The registry is bounded by the release cadence; if a caller never
releases, ContextCleaner remains the backstop once the registry entry is
popped (never before).
"""

from __future__ import annotations

from typing import Any

_TRACKED: list[Any] = []


def track(bc):
    """Register a Python Broadcast for deterministic release; returns it."""
    _TRACKED.append(bc)
    return bc


def tracked_broadcast(sc, value):
    """``sc.broadcast(value)``, registered for deterministic release."""
    return track(sc.broadcast(value))


def release_tracked() -> None:
    """Unpersist (non-blocking) every tracked broadcast. Safe to call at
    any time after the consuming job finished; a subsequent action on an
    old plan re-broadcasts from the driver-held value rather than fail."""
    while _TRACKED:
        bc = _TRACKED.pop()
        try:
            bc.unpersist(blocking=False)
        except Exception:
            pass  # session already stopped or broadcast already cleaned
