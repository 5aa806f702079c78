"""Data sources: JDBC (PostgreSQL parity, SURVEY §2 F2/F3) and the parquet
testdata scans live in ``floorist_spark.session``."""
