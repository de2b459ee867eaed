from .scaling import apply_scaling, point_slope, slope_intercept
from .timefmt import format_modvalues_ts

__all__ = ["slope_intercept", "point_slope", "apply_scaling", "format_modvalues_ts"]
