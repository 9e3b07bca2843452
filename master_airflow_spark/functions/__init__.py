from master_airflow_spark.functions.exact import davg, dmul, dsum

__all__ = ["dsum", "davg", "dmul"]
