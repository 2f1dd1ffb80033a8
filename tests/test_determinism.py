"""Re-execution determinism: operators whose plans involve physical-
layout-dependent primitives (range-partitioner sampling, per-partition
id arithmetic, collect_list ordering) must return the identical result
set on every run — at cluster scale these re-execute on task retry, and
a nondeterministic operator silently corrupts retried stages.
"""

from __future__ import annotations

import pytest

from tests.conftest import SF_DIR
from tiledb_mariadb_spark.suite import all_specs

RERUN_SPECS = [
    "q212_global_ordinal",   # repartitionByRange sampling + mid arithmetic
    "q224_equi_depth_hist",  # same, composed with bucketing
    "q186_epoch_shuffle",    # md5 shard assignment
    "q216_skyline",          # partition-local elimination
    "q230_vocab_encode",     # collect_list reassembly
]


@pytest.mark.parametrize("name", RERUN_SPECS)
def test_rerun_identical(spark, name):
    spec = all_specs()[name]
    a = sorted(map(tuple, spec.spark(spark, SF_DIR).collect()))
    b = sorted(map(tuple, spec.spark(spark, SF_DIR).collect()))
    assert a == b, f"{name} differs across reruns"
