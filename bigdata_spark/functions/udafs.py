"""Grouped-aggregate pandas UDFs (true UDAF surface).

NOTE: no ``from __future__ import annotations`` here — pandas_udf
infers the GROUPED_AGG variant from the live ``pd.Series -> scalar``
type hints, which postponed (stringified) annotations break."""

import pandas as pd

from pyspark.sql.functions import pandas_udf


@pandas_udf("double")
def mode_qty(v: pd.Series) -> float:
    """Per-group mode with a deterministic smallest-value tie-break;
    Arrow hands the whole group's values to one vectorized call.
    An all-null group (value_counts drops NaN) yields SQL NULL, the
    same as built-in aggregates over empty input."""
    counts = v.value_counts()
    if counts.empty:
        return None
    top = counts.max()
    return float(min(val for val, n in counts.items() if n == top))
