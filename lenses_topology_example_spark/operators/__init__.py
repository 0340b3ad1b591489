"""Batch operators. Each module exposes (spark, sf_dir) -> DataFrame
query callables that catalog.py aggregates for __spark_entry__.py."""
