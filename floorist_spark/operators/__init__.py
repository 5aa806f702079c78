"""Operator catalog.

Each module exposes two dicts:

* ``QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]]`` — the
  Spark-first implementation of each operator (DataFrame API / Spark SQL).
* ``ORACLES: dict[str, str]`` — DuckDB-runnable ANSI SQL producing the same
  rows and column names, used by the driver's correctness gate. Keys missing
  from ORACLES are non-deterministic or non-SQL-expressible (rows-only check).

``catalog.py`` is the single merged registry (also resolves floorplan
``catalog:<name>`` rows for the export engine). Key prefixes: ``q`` —
relational/SQL surface (SURVEY §2.2 + delegated capability), ``d`` — dedup,
``s`` — similarity search, ``t`` — text analysis, ``e`` — event analytics,
``m`` — multimodal; streaming operators live in
``floorist_spark.streaming``.
"""
