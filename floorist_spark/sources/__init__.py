"""Data sources: JDBC (PostgreSQL parity, SURVEY §2 F2/F3) and
format-dispatching file readers (parquet/ORC/CSV/JSON, ``files.py``);
the parquet testdata scans live in ``floorist_spark.session``."""
