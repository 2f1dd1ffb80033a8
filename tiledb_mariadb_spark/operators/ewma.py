"""Per-key EWMA (exponentially weighted moving average) — a grouped
recurrence s_i = α·x_i + (1-α)·s_{i-1} that no built-in window function
expresses (RANGE/ROWS frames can't carry state).  This is the canonical
use of the ``applyInPandas`` tier (SURVEY.md §2.5 — custom operators fall
back to grouped pandas only when Catalyst genuinely can't express the
semantics).

Determinism: the recurrence is evaluated EXPLICITLY, one step per row, as
``s = α*x + (1-α)*s_prev`` in float64 (not pandas ``ewm``, whose internal
normalization ``/(old_wt+new_wt)`` introduces an extra op whose rounding a
SQL oracle cannot mirror).  With this fixed op order, a DuckDB recursive
CTE computing the same three IEEE ops per step is bit-identical — and with
a dyadic α (0.5) both multiplies are EXACT, leaving one identically-rounded
add per step, which is how the q77 conformance spec is hash-verified.

Scale shape: one shuffle on the grouping key (the same exchange a
groupBy would do), then a per-group scalar recurrence inside Arrow
batches.  Groups stream through workers; memory is bounded by the largest
single group — the standard applyInPandas contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def ewma(
    df: DataFrame,
    key_col: str,
    order_col: str,
    value_col: str,
    alpha: float = 0.3,
) -> DataFrame:
    """(key, order, value, ewma) — rows ordered within each key."""
    import numpy as np  # noqa: PLC0415
    import pandas as pd  # noqa: PLC0415

    schema = (
        f"{key_col} bigint, {order_col} bigint, "
        f"{value_col} double, ewma double"
    )

    def per_group(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_col)
        x = pdf[value_col].to_numpy(dtype=np.float64)
        out = np.empty_like(x)
        s = 0.0
        for i, xi in enumerate(x):
            # exact op order: two multiplies + one add (see module doc)
            s = xi if i == 0 else alpha * xi + (1.0 - alpha) * s
            out[i] = s
        pdf = pdf[[key_col, order_col, value_col]].copy()
        pdf["ewma"] = out
        return pdf

    return df.select(key_col, order_col, value_col).groupBy(key_col).applyInPandas(
        per_group, schema=schema
    )


def ewma_py(values: list[float], alpha: float = 0.3) -> list[float]:
    """Reference recurrence for tests."""
    out: list[float] = []
    s = None
    for x in values:
        s = x if s is None else alpha * x + (1 - alpha) * s
        out.append(s)
    return out
