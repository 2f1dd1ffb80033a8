"""Plan-audit helpers: assert that the physical plan Catalyst produced is
the plan we want at scale — filters pushed into the parquet scan, small
dims broadcast, whole-stage codegen active.

This is the Spark-native analog of the reference's pushdown contract
(cond_push returning the residual, ha_mytile.h:453-474): instead of
trusting that predicates reached the storage layer, we inspect
`explain("formatted")` output programmatically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), "formatted"  # noqa: SLF001
    )


def pushed_filters(df: DataFrame) -> list[str]:
    """Extract PushedFilters entries from every scan node."""
    out = []
    for line in formatted_plan(df).splitlines():
        line = line.strip()
        if line.startswith("PushedFilters:"):
            body = line.split(":", 1)[1].strip()
            if body.startswith("[") and body.endswith("]"):
                body = body[1:-1]
            out.extend(p.strip() for p in body.split(",") if p.strip())
    return out


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in formatted_plan(df)

def has_sort_merge_join(df: DataFrame) -> bool:
    return "SortMergeJoin" in formatted_plan(df)


def codegen_stage_count(df: DataFrame) -> int:
    """Distinct whole-stage-codegen subtrees.  In AQE plans the formatted
    output annotates nodes with ``[codegen id : N]`` (only after the plan
    is finalized by execution)."""
    import re

    plan = formatted_plan(df)
    ids = set(re.findall(r"codegen id : (\d+)", plan))
    return len(ids) or plan.count("WholeStageCodegen")


def partition_filters(df: DataFrame) -> list[str]:
    """PartitionFilters entries from every scan node — evidence that a
    predicate on a partition column prunes directories before I/O."""
    out = []
    for line in formatted_plan(df).splitlines():
        line = line.strip()
        if line.startswith("PartitionFilters:"):
            body = line.split(":", 1)[1].strip()
            if body.startswith("[") and body.endswith("]"):
                body = body[1:-1]
            out.extend(p.strip() for p in body.split(",") if p.strip())
    return out


def read_schema_columns(df: DataFrame) -> list[str]:
    """Columns actually read from parquet (ReadSchema) — column pruning
    evidence."""
    cols: list[str] = []
    for line in formatted_plan(df).splitlines():
        line = line.strip()
        if line.startswith("ReadSchema:"):
            body = line.split("struct<", 1)
            if len(body) == 2:
                inner = body[1].rsplit(">", 1)[0]
                cols.extend(c.split(":")[0] for c in inner.split(",") if c)
    return cols
