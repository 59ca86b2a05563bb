"""map_batches stage callables (actor classes / functions) for Ray Data."""
