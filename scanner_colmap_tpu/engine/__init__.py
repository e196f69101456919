"""Reconstruction engine: correspondence graph, incremental mapper, cluster
scheduling, and submodel merging — the control plane driving the jitted ops."""
