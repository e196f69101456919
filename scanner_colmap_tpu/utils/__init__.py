"""Utilities: config system, artifact store, COLMAP-binary interchange, logging."""
