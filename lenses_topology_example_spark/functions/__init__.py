"""Reusable column-expression libraries (all JVM-side, no Python UDFs)."""
