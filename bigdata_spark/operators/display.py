"""Compact head display (SURVEY §2.7 O5; reference
code/src/utilities.py:6-33): take(n) rows and render only the first and
last few columns with an ellipsis between — readable output for
wide (e.g. 141-column) tables without collecting the width."""

from __future__ import annotations

from pyspark.sql import DataFrame


def compact_head(
    df: DataFrame, n: int = 5, first_cols: int = 3, last_cols: int = 2
) -> str:
    """Driver-side formatted preview. Collects only ``n`` rows (take) —
    never the full table; column slicing happens on the driver over the
    already-bounded rows."""
    cols = df.columns
    if len(cols) <= first_cols + last_cols:
        shown, elided = list(cols), False
    else:
        shown, elided = cols[:first_cols] + cols[-last_cols:], True

    rows = df.select(*shown).take(n)
    table = [shown] + [[str(r[c]) for c in shown] for r in rows]
    widths = [max(len(row[i]) for row in table) for i in range(len(shown))]

    def fmt(vals: list[str]) -> str:
        cells = [v.ljust(w) for v, w in zip(vals, widths)]
        if elided:
            cells.insert(first_cols, "...")
        return " | ".join(cells)

    sep_vals = ["-" * w for w in widths]
    lines = [fmt(table[0]), fmt(sep_vals)] + [fmt(row) for row in table[1:]]
    if elided:
        lines.append(f"({len(cols)} columns, showing {len(shown)})")
    return "\n".join(lines)
