"""Operator modules. Each module exposes a ``REG`` QueryRegistry whose entries
are (spark_query, duckdb_oracle_sql) pairs consumed by __spark_entry__.py."""
