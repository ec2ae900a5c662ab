from smartpipeline_spark.operators.relational import ORACLES, QUERIES

__all__ = ["QUERIES", "ORACLES"]
