"""Per-key EWMA (exponentially weighted moving average) — a grouped
recurrence s_i = α·x_i + (1-α)·s_{i-1} that no built-in window function
expresses (RANGE/ROWS frames can't carry state).  This is the canonical
use of the ``applyInPandas`` tier (SURVEY.md §2.5 — custom operators fall
back to grouped pandas only when Catalyst genuinely can't express the
semantics).

Scale shape: one shuffle on the grouping key (the same exchange a
groupBy would do), then per-group vectorized numpy inside Arrow batches.
Groups stream through workers; memory is bounded by the largest single
group — the standard applyInPandas contract.
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
    import pandas as pd  # noqa: PLC0415

    schema = (
        f"{key_col} bigint, {order_col} bigint, "
        f"{value_col} double, ewma double"
    )

    def per_group(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_col)
        # pandas ewm with adjust=False IS the recurrence above
        pdf["ewma"] = pdf[value_col].ewm(alpha=alpha, adjust=False).mean()
        return pdf[[key_col, order_col, value_col, "ewma"]]

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
