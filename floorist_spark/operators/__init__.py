"""Operator catalog.

Each module exposes two dicts:

* ``QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]]`` — the
  Spark-first implementation of each operator (DataFrame API / Spark SQL).
* ``ORACLES: dict[str, str]`` — DuckDB-runnable ANSI SQL producing the same
  rows and column names, used by the driver's correctness gate. Keys missing
  from ORACLES are non-deterministic or non-SQL-expressible (rows-only check).

Key naming follows SURVEY.md §2 operator IDs (q01.. for the reference's SQL
surface, q11x.. for the delegated join/agg capability, x_.. for the
scale-extension operators).
"""
