"""Data model: geometry primitives, camera models, and reconstruction containers."""

from scanner_colmap_tpu.models import geometry, cameras, reconstruction  # noqa: F401
