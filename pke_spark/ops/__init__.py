"""Query operators. Each module exposes Spark DataFrame builders and,
where SQL-expressible, a matching DuckDB oracle-SQL builder kept in
lockstep (the driver's correctness gate compares the two at sf0.01)."""
