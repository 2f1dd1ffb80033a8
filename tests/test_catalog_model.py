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


def test_subarray_equals_scan_filter_randomized(spark, tmp_path):
    """Pruned subarray reads must return EXACTLY the rows a full scan +
    filter returns, for random range combinations (file skipping that
    drops a boundary row is the worst storage bug there is)."""
    import random

    from pyspark.sql import functions as F

    rng = random.Random(99)
    t = TileTable.create(
        spark,
        str(tmp_path / "sub_fuzz"),
        dimensions=[Dim("x", "int"), Dim("y", "int")],
        attributes=[Attr("v", "bigint")],
        capacity=300,
    )
    t.write(
        spark.range(3000).select(
            (F.col("id") % 60).cast("int").alias("x"),
            (F.col("id") / 60).cast("int").alias("y"),
            F.col("id").alias("v"),
        )
    )
    full = t.read()
    for _ in range(6):
        xlo = rng.randint(0, 59); xhi = rng.randint(xlo, 59)
        ylo = rng.randint(0, 49); yhi = rng.randint(ylo, 49)
        got = sorted(
            tuple(r)
            for r in t.subarray({"x": (xlo, xhi), "y": (ylo, yhi)}).collect()
        )
        want = sorted(
            tuple(r)
            for r in full.filter(
                (F.col("x").between(xlo, xhi))
                & (F.col("y").between(ylo, yhi))
            ).collect()
        )
        assert got == want, (xlo, xhi, ylo, yhi)
        # boundary-inclusive: a degenerate single-cell range also works
        one = t.subarray({"x": (xlo, xlo), "y": (ylo, ylo)}).count()
        assert one <= 1 or one == full.filter(
            (F.col("x") == xlo) & (F.col("y") == ylo)
        ).count()
