"""Populated incrementally; see polars_spark/queries/__init__.py."""
