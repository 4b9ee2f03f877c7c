"""Device-mesh parallelism for the render pipeline (the honest multi-chip
dimension of this framework — see ARCHITECTURE.md)."""
