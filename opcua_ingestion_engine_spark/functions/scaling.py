"""Unit-scaling scalar functions (SURVEY.md §2.7 X1-X3).

Reference semantics (``Services/OpcSubscribeService.cs:565-576`` with params
``Models/OpcTemplates.cs:42-56``):

- ``slope_intercept``: ``round(v * slope + offset, 3)`` (defaults 1 / 0)
- ``point_slope``:     ``round((tmax-tmin)/(vmax-vmin) * (v - vmin) + tmin, 3)``
- any other mode:      identity passthrough (switch default)

Implemented as pure Column expressions — JVM-side, codegen'd, no UDF
(SURVEY.md §2.10). ``point_slope`` here takes the pre-reduced ``factor =
(tmax-tmin)/(vmax-vmin)`` and ``vmin``-relative form so callers can supply
exact DECIMAL parameters; the general four-parameter form is
``point_slope_params``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def slope_intercept(value: Column, slope: Column, offset: Column) -> Column:
    """X1 — OpcSubscribeService.cs:570-572."""
    return F.round(value * slope + offset, 3)


def point_slope(value: Column, factor: Column, target_min: Column) -> Column:
    """X2 (pre-reduced) — OpcSubscribeService.cs:573-575 with
    factor=(target_max-target_min)/(value_max-value_min), value_min=0."""
    return F.round(value * factor + target_min, 3)


def point_slope_params(
    value: Column,
    value_min: Column,
    value_max: Column,
    target_min: Column,
    target_max: Column,
) -> Column:
    """X2 (general form) — exact reference arithmetic order."""
    return F.round(
        (target_max - target_min) / (value_max - value_min) * (value - value_min) + target_min,
        3,
    )


def apply_scaling(
    value: Column,
    scale_mode: Column,
    slope: Column,
    offset: Column,
    factor: Column,
    target_min: Column,
) -> Column:
    """X3 scale-mode dispatch — OpcSubscribeService.cs:568-576.

    Unknown/None mode is identity passthrough (the C# ``switch`` default).
    Value arithmetic stays in the caller's type (use DECIMAL for oracle-exact
    results); result is cast to double.
    """
    return (
        F.when(scale_mode == "slope_intercept", slope_intercept(value, slope, offset))
        .when(scale_mode == "point_slope", point_slope(value, factor, target_min))
        .otherwise(value)
        .cast("double")
    )
