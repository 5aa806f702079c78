"""Cross-engine expression fragments shared by the LLM-data-pipeline
operators (dedup / text / similarity). Each helper returns a pair of SQL
fragments — one in Spark SQL, one in DuckDB SQL — that compute
BIT-IDENTICAL values, so the driver's value-hash correctness gate can check
these operators exactly like the relational ones."""
