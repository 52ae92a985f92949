from . import udfs
from .aggs import AGG_REGISTRY, agg_expr, window_agg_expr

__all__ = ["AGG_REGISTRY", "agg_expr", "window_agg_expr", "udfs"]
