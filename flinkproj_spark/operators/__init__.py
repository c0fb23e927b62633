"""Operator library.

Each module exposes
    QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]]
    ORACLE:  dict[str, str]        # DuckDB-runnable ANSI SQL twins

collected by `flinkproj_spark.registry` into the driver contract
(__spark_entry__.py). Query keys follow SURVEY.md §2's inventory.
"""
