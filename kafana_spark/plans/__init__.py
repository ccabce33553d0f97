from kafana_spark.plans.declared import DECLARED_QUERIES, DECLARED_ORACLE  # noqa: F401
