from smartpipeline_spark.operators.relational import ORACLES, QUERIES
from smartpipeline_spark.operators import tpch  # noqa: F401  (registers q63-q74)

__all__ = ["QUERIES", "ORACLES"]
