from .dataframe import OmigoDF, from_spark

__all__ = ["OmigoDF", "from_spark"]
