"""Topology layer: dataflow-DAG introspection + runtime metrics."""
