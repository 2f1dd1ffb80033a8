"""Model-based catalog testing: a random sequence of write /
apply_changes(upsert+delete) / consolidate operations executed against
both a TileTable and a plain Python dict model; after every step the
table's read() must equal the model, and every historical snapshot must
equal the model's recorded history (time travel through tombstones and
consolidation).  This is the state-machine coverage a versioned storage
layer needs beyond per-feature tests."""

from __future__ import annotations

import random

from tiledb_mariadb_spark.catalog import Attr, Dim, TileTable

KEYS = list(range(8))


def _read_state(t, at=None):
    return {r["k"]: r["v"] for r in t.read(at=at).collect()}


def test_random_op_sequences_match_model(spark, tmp_path):
    rng = random.Random(20260814)
    for trial in range(3):
        t = TileTable.create(
            spark,
            str(tmp_path / f"model_{trial}"),
            dimensions=[Dim("k", "int")],
            attributes=[Attr("v", "int")],
            overwrite=True,
        )
        model: dict[int, int] = {}
        history: dict[int, dict[int, int]] = {}  # ts -> state
        for _step in range(8):
            op = rng.choice(["write", "cdc", "cdc", "consolidate"])
            if op == "write":
                ks = rng.sample(KEYS, rng.randint(1, 4))
                rows = [(k, rng.randint(0, 99)) for k in ks]
                ver = t.write(spark.createDataFrame(rows, "k int, v int"))
                model.update(dict(rows))
                history[ver] = dict(model)
            elif op == "cdc":
                ups = [
                    (k, rng.randint(100, 199), "upsert")
                    for k in rng.sample(KEYS, rng.randint(0, 3))
                ]
                # delete only keys currently present (deleting an absent
                # coordinate is legal but a no-op in both worlds)
                present = list(model)
                dels = [
                    (k, None, "delete")
                    for k in rng.sample(present, min(2, len(present)))
                    if rng.random() < 0.7
                ]
                batch = ups + dels
                if not batch:
                    continue
                ver = t.apply_changes(
                    spark.createDataFrame(batch, "k int, v int, __op string")
                )
                for k, v, _ in ups:
                    model[k] = v
                for k, _, _ in dels:
                    model.pop(k, None)
                history[ver] = dict(model)
            else:
                if not t.schema.versions:
                    continue
                t.consolidate(keep_history=True)
                # keep_history preserves snapshots; latest state unchanged
            assert _read_state(t) == model, f"trial {trial} after {op}"
        # historical snapshots survive everything (consolidation was
        # keep_history=True so all timestamps remain addressable)
        for at, want in history.items():
            assert _read_state(t, at=at) == want, f"trial {trial} at={at}"
