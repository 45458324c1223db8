"""Ray Data stage functions (batch fns for map_batches / map_groups)."""
