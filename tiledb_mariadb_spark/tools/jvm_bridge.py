"""Subprocess bridge for the JVM aggregate-pushdown shim.

``java/TileDBAggDataSource.java`` (the DataSource V2 provider behind
``spark.read.format("tiledb_agg")``) launches this module to reach the
repo's pure-Python native decoder from the JVM:

- ``schema --uri U``: the array's Spark DDL as one JSON object;
- ``agg --uri U --aggs count;min:c;sum:c``: metadata-only aggregate
  values (count_native_array / attr_stats_native_array — the
  group_by_handler trust rules, ha_mytile.cc:607-715: never a guessed
  value, ``ok=false`` whenever the merged view could differ from
  per-fragment stats) as one JSON object;
- ``rows --uri U``: the full decoded table as JSON lines (the honest
  scan fallback when an aggregate cannot be proven from metadata).

Everything prints to stdout; errors exit nonzero with the reason on
stderr (the Java side surfaces both).
"""

from __future__ import annotations

import argparse
import json
import sys


def _json_cell(v):
    if hasattr(v, "item"):  # numpy scalar
        return v.item()
    raise TypeError(f"unsupported cell type {type(v).__name__}")


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="jvm_bridge")
    p.add_argument("cmd", choices=["schema", "agg", "rows", "splits"])
    p.add_argument("--uri", required=True)
    p.add_argument("--at", type=int, default=None)
    p.add_argument("--encryption-key", default=None)
    p.add_argument("--aggs", default="")
    p.add_argument("--ranges", default=None)  # JSON [[lo,hi],...] | null
    p.add_argument("--target-splits", type=int, default=16)
    a = p.parse_args(argv)

    from tiledb_mariadb_spark.sources.tiledb_array import (  # noqa: PLC0415
        NativeDecoderBackend,
    )
    from tiledb_mariadb_spark.sources.tiledb_native import (  # noqa: PLC0415
        attr_stats_native_array,
        count_native_array,
        open_encryption,
        read_native_array_range,
    )

    if a.encryption_key is not None:
        open_encryption(a.uri, a.encryption_key)

    if a.cmd == "schema":
        try:
            info = NativeDecoderBackend(
                encryption_key=a.encryption_key
            ).info(a.uri, at=a.at)
        except Exception as e:  # noqa: BLE001 - bridge boundary
            print(json.dumps({"ok": False, "reason": str(e)}))
            return 0
        ddl = ", ".join(
            f"{x.name} {x.dtype}" for x in list(info.dims) + list(info.attrs)
        )
        print(json.dumps({"ok": True, "ddl": ddl}))
        return 0

    if a.cmd == "agg":
        cnt = count_native_array(a.uri, at=a.at)
        st = attr_stats_native_array(a.uri, at=a.at)
        if cnt is None or st is None:
            print(json.dumps({"ok": False, "reason": "stats not provable"}))
            return 0
        vals = []
        for req in [r for r in a.aggs.split(";") if r]:
            if req == "count":
                vals.append(int(cnt))
                continue
            op, _, col = req.partition(":")
            s = st.get(col) or {}
            if op in ("min", "max"):
                if "min" not in s:
                    print(json.dumps(
                        {"ok": False, "reason": f"no min/max stat for {col}"}
                    ))
                    return 0
                v = s["min"] if op == "min" else s["max"]
            elif op == "sum":
                if "sum" not in s:
                    print(json.dumps(
                        {"ok": False, "reason": f"no sum stat for {col}"}
                    ))
                    return 0
                v = s["sum"]
            elif op == "avg":
                # AVG excludes NULLs: the sum stat is withheld whenever
                # the fragment holds one, so sum-present => no NULLs and
                # the global count is the AVG denominator
                if "sum" not in s or cnt == 0:
                    print(json.dumps(
                        {"ok": False, "reason": f"no avg stat for {col}"}
                    ))
                    return 0
                v = float(s["sum"]) / int(cnt)
            elif op == "countcol":
                # COUNT(col) counts non-NULL cells: the row count for
                # non-nullable fields, cnt - null_count for nullable
                # ones (a nullable field without the stat — e.g. an
                # enumerated attr, whose stats describe ordinals — is
                # refused, never guessed)
                from tiledb_mariadb_spark.sources.tiledb_native import (  # noqa: PLC0415
                    _schema_path,
                    parse_array_schema,
                )

                schema = parse_array_schema(_schema_path(a.uri))
                nullable = {x.name for x in schema.attrs if x.nullable}
                if col not in nullable and col in st:
                    v = int(cnt)
                elif "null_count" in s:
                    v = int(cnt) - int(s["null_count"])
                else:
                    print(json.dumps(
                        {"ok": False,
                         "reason": f"no null_count stat for {col}"}
                    ))
                    return 0
            else:
                print(json.dumps(
                    {"ok": False, "reason": f"unknown agg {op}"}
                ))
                return 0
            vals.append(_json_cell(v) if hasattr(v, "item") else v)
        print(json.dumps({"ok": True, "values": vals}, default=_json_cell))
        return 0

    if a.cmd == "splits":
        # split plan for the fallback scan (one JVM partition per
        # range — dim0 cuts, R-tree weights, string boundary keys, same
        # planner as read_array); single split when bounds aren't
        # JSON-expressible (bytes dims)
        from tiledb_mariadb_spark.sources.tiledb_array import (  # noqa: PLC0415
            plan_splits,
        )

        be = NativeDecoderBackend(encryption_key=a.encryption_key)
        try:
            info = be.info(a.uri, at=a.at)
            weights = be.split_weights(a.uri, at=a.at)
            skeys = None
            if not any(
                isinstance(b, int)
                for d in info.dims for b in (d.domain or (None, None))
            ):
                skeys = be.string_split_keys(a.uri, at=a.at)
            splits = plan_splits(
                info, None, a.target_splits,
                weights=weights, string_keys=skeys,
            )
            out = [[list(r) for r in s] for s in splits]
            print(json.dumps(
                {"ok": True, "splits": out}, default=_json_cell
            ))
        except (Exception, TypeError):  # noqa: BLE001 - bridge boundary
            print(json.dumps({"ok": True, "splits": [None]}))
        return 0

    # rows: the honest (split-parallel) scan fallback
    try:
        rng = None
        if a.ranges and a.ranges != "null":
            rng = [tuple(r) for r in json.loads(a.ranges)]
        _names, rows = read_native_array_range(a.uri, ranges=rng, at=a.at)
    except Exception as e:  # noqa: BLE001 - bridge boundary
        print(f"tiledb_agg rows bridge: {e}", file=sys.stderr)
        return 3
    w = sys.stdout.write
    for r in rows:
        try:
            w(json.dumps(list(r), default=_json_cell))
        except TypeError as e:
            print(
                f"tiledb_agg rows bridge: non-JSON cell ({e}); use the "
                "tiledb_native Python datasource for this array",
                file=sys.stderr,
            )
            return 3
        w("\n")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
