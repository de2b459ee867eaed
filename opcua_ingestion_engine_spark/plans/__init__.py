from .registry import QUERIES, oracle_sql, queries

# Importing these modules registers their queries as a side effect.
from . import reference_ops  # noqa: E402,F401
from . import relational_ext  # noqa: E402,F401
from . import llm_ops  # noqa: E402,F401
from . import config_ops  # noqa: E402,F401
from . import analytics  # noqa: E402,F401
from . import timeseries_ops  # noqa: E402,F401
from . import analytics_full  # noqa: E402,F401
from . import advanced_ops  # noqa: E402,F401
from . import telemetry_reports  # noqa: E402,F401

__all__ = ["QUERIES", "queries", "oracle_sql"]
