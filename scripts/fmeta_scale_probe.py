"""Fragment-metadata consolidation scale probe (BASELINE.md source).

Measures the planning tier at high fragment counts, three ways:
no fold / with fold / POISONED (every per-fragment metadata file
renamed away — anything that still plans proves zero per-fragment
opens).  Also times the fold build itself and reports its size.

Usage: python scripts/fmeta_scale_probe.py [n_fragments]
"""

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tiledb_mariadb_spark.sources.tiledb_native import (  # noqa: E402
    _FMETA_CACHE,
    NativeAttr,
    NativeDim,
    _fragment_dirs,
    _schema_path,
    condition_ned,
    dim0_tile_weights,
    fragment_cell_count,
    parse_array_schema,
    window_ned,
)
from tiledb_mariadb_spark.sources.tiledb_native_write import (  # noqa: E402
    consolidate_fragment_meta,
    create_native_array,
    write_native_fragment,
)


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    arr = tempfile.mkdtemp(prefix="fmeta_probe_") + "/arr"
    create_native_array(
        arr,
        dims=[NativeDim("k", 1, 1, (0, 10**9), None)],
        attrs=[NativeAttr("v", 1, 1, False, None)],
    )
    t0 = time.time()
    for f in range(n):
        write_native_fragment(
            arr,
            {"k": list(range(f * 1000, f * 1000 + 50)), "v": [f] * 50},
            ts=f + 1,
            version=19,
        )
    print(f"wrote {n} fragments in {time.time() - t0:.1f}s")
    schema = parse_array_schema(_schema_path(arr))

    def probe(tag: str) -> None:
        _FMETA_CACHE.clear()
        t = time.time()
        frags = _fragment_dirs(arr)
        t_list = time.time() - t
        t = time.time()
        window_ned(arr)
        t_w = time.time() - t
        t = time.time()
        condition_ned(arr, [("v", "=", 10**6)])
        t_c = time.time() - t
        t = time.time()
        cells = sum(fragment_cell_count(f, schema) or 0 for f in frags)
        t_n = time.time() - t
        t = time.time()
        w = dim0_tile_weights(arr)
        t_tw = time.time() - t
        print(
            f"{tag}: list {t_list * 1000:.0f}ms  window_ned "
            f"{t_w * 1000:.0f}ms  condition_ned {t_c * 1000:.0f}ms  "
            f"count {t_n * 1000:.0f}ms  tile_weights {t_tw * 1000:.0f}ms "
            f"(cells={cells}, tiles={len(w) if w else None})"
        )

    probe("no fold   ")
    t0 = time.time()
    p = consolidate_fragment_meta(arr)
    print(
        f"fold build {time.time() - t0:.2f}s, "
        f"{os.path.getsize(p) // 1024} KiB"
    )
    probe("with fold ")
    for frag in _fragment_dirs(arr):
        fm = os.path.join(frag, "__fragment_metadata.tdb")
        os.rename(fm, fm + ".hidden")
    probe("poisoned  ")


if __name__ == "__main__":
    main()
