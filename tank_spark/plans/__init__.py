"""Query plans: the registry mapping operator names -> (Spark builder,
DuckDB oracle SQL). The driver contract (__spark_entry__.py) is a thin view
over this registry.
"""
