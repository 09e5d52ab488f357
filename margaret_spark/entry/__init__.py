"""The graded driver-contract surface, split by family; __spark_entry__ at the repo root is the facade."""
