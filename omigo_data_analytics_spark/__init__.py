"""omigo_data_analytics_spark — a PySpark-native analytics engine with the
query and data-processing capabilities of CrowdStrike/omigo-data-analytics.

Built from scratch on the Spark DataFrame API (lazy Catalyst plans, Pandas
UDFs for the rare imperative path) rather than ported from the reference's
eager row-loop engine. See SURVEY.md for the capability map with
reference file:line citations.

Public surface:

    from omigo_data_analytics_spark import OmigoDF, get_spark
    odf = OmigoDF(spark.read.parquet(...))
    odf.eq_str("l_returnflag", "R").aggregate(["l_linestatus"], ["l_quantity"], ["sumfloat"])
"""

from .session import get_spark, prepare_session
from .core.dataframe import OmigoDF, from_spark
from .operators.viz import VisualDF, to_visual
from .sources import io as sources_io

__all__ = ["OmigoDF", "VisualDF", "from_spark", "get_spark",
           "prepare_session", "sources_io", "to_visual"]

__version__ = "0.1.0"
