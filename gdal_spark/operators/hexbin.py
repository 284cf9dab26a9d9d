"""Hexagonal binning (H3-style planar hex cells) as pure Column math.

The baseline's north star names "H3/S2 cell encoding"; `kernels/s2.py`
implements the S2 scheme faithfully.  This module adds the hex-grid
side as PLANAR hexagonal binning — pointy-top axial/cube coordinates
with cube rounding (the public Red Blob Games / H3 planar-lattice
construction) — NOT geodesic H3 (no icosahedral projection or
aperture-7 hierarchy; documented analogue, exact within a projected
CRS, which is how hexbin layers are actually computed over
web-mercator data).

Implementation shape mirrors `operators/tmerc.py`: the bin assignment
is a chain of named scalar steps whose SQL text drives BOTH the Spark
plan (``F.expr`` fold, whole-stage codegen — zero UDFs over 10^12
rows) and the DuckDB oracle (CTE chain), so engine-vs-oracle formula
structure is identical by construction.  ``floor(x + 0.5)`` stands in
for round() so both engines share exact IEEE semantics.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame

from .tmerc import apply_steps, steps_to_cte  # noqa: F401  (re-export)

SQRT3_3 = math.sqrt(3.0) / 3.0


def hexbin_steps(x_col: str, y_col: str, size: float) -> list[tuple[str, str]]:
    """(name, sql_expr) steps computing pointy-top axial hex coords
    ``hexq``/``hexr`` (ints) and the cell center ``hexx``/``hexy``.

    size = hex circumradius in data units.  Fractional axial coords,
    then cube rounding: round each cube coordinate, reset the one
    with the largest rounding error so q + s + r == 0 holds.
    """
    return [
        # NO decimal-decimal arithmetic in shared text: Spark folds
        # "2.0 / 3.0" in DECIMAL (-> 0.666667) while DuckDB divides in
        # DOUBLE — a cross-engine divergence near cube-round
        # boundaries.  All constants are pre-folded Python doubles.
        ("cx", f"({SQRT3_3!r} * ({x_col}) - ({y_col}) / 3.0) / {size!r}"),
        ("cz", f"({y_col}) / {1.5 * size!r}"),
        ("cy", "-cx - cz"),
        ("rx", "floor(cx + 0.5)"),
        ("ry", "floor(cy + 0.5)"),
        ("rz", "floor(cz + 0.5)"),
        ("dx", "abs(rx - cx)"),
        ("dy", "abs(ry - cy)"),
        ("dz", "abs(rz - cz)"),
        ("hexq", "CAST(CASE WHEN dx > dy AND dx > dz THEN -ry - rz"
                 " ELSE rx END AS BIGINT)"),
        ("hexr", "CAST(CASE WHEN dx > dy AND dx > dz THEN rz"
                 " WHEN dy > dz THEN rz ELSE -rx - ry END AS BIGINT)"),
        # constants pre-folded in Python: DuckDB types adjacent numeric
        # literals as DECIMAL and overflows multiplying them.
        ("hexx", f"{size * math.sqrt(3.0)!r}"
                 " * (CAST(hexq AS DOUBLE) + CAST(hexr AS DOUBLE) / 2.0)"),
        ("hexy", f"{size * 1.5!r} * CAST(hexr AS DOUBLE)"),
    ]


def with_hex_cell(df: DataFrame, x_col: str, y_col: str,
                  size: float) -> DataFrame:
    """Append hex cell (hexq, hexr) + center (hexx, hexy) columns."""
    steps = hexbin_steps(x_col, y_col, size)
    return apply_steps(df, steps,
                       keep=[*df.columns, "hexq", "hexr", "hexx", "hexy"])


def hexbin_sql(base_sql: str, x_col: str, y_col: str, size: float,
               final_select: str) -> str:
    """Render the same steps as a DuckDB CTE chain (oracle side)."""
    return steps_to_cte(base_sql, hexbin_steps(x_col, y_col, size),
                        final_select)
