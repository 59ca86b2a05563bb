"""Driver-facing query pipelines (used by __ray_entry__.py)."""
