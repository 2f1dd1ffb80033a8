"""Query-scoped persist tracking.

Several operators persist multiply-consumed frames INSIDE a query
(measured wins — see OPTIMIZATION_r09.md §persists), but a spec function
returns before its consuming action runs, so the spec itself can never
unpersist.  Left alone, a long-lived session accumulates every past
query's cached frames (MEMORY_AND_DISK: harmless at bench scale, real
memory pressure over a 100 TB session — r9 verdict item).

``track(df)`` registers a persisted frame; ``release()`` unpersists
everything registered so far.  The suite wraps every spec callable so
that *starting the next query* releases the previous query's frames —
each persist stays alive through its own query's action(s) under any
sequential driver, and the live set is bounded by ONE query's frames.
Unpersisting is non-blocking and only ever drops a cache (recompute
stays correct), so results are unaffected.
"""

from __future__ import annotations

_LIVE: list = []


def track(df):
    """Register a just-persisted DataFrame for release when the next
    query starts.  Returns ``df`` for call-site chaining."""
    _LIVE.append(df)
    return df


def release() -> None:
    """Unpersist every tracked frame (non-blocking, best-effort)."""
    while _LIVE:
        df = _LIVE.pop()
        try:
            df.unpersist()
        except Exception:  # noqa: BLE001 - session may be gone
            pass
