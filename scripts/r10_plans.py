#!/usr/bin/env python
"""Dump .explain("formatted") for headline queries to plans/r09/.

Usage: python scripts/r09_plans.py [before|after] [query ...]
Defaults to every bench.py HEADLINE query.  A query whose builder
executes eagerly (fixture ingest + collect inside the spec) still
returns its final DataFrame; we explain that.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import HEADLINE  # noqa: E402
from tiledb_mariadb_spark.session import get_spark  # noqa: E402
from tiledb_mariadb_spark.suite import all_specs  # noqa: E402


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:] or HEADLINE
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "plans", "r10")
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("r10-plan-dump")
    specs = all_specs()
    for name in names:
        if name not in specs:
            print(f"SKIP {name}: not registered")
            continue
        spark.sparkContext.setJobDescription(f"plan:{name}")
        try:
            df = specs[name].spark(spark, sf_dir)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            text = buf.getvalue()
        except Exception as exc:  # noqa: BLE001
            text = f"ERROR building {name}: {exc!r}\n"
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(text)
        print(f"wrote {path} ({len(text)} bytes)")


if __name__ == "__main__":
    main()
