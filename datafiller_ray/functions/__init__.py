"""Pure-NumPy / pyarrow kernel functions (no Ray dependency).

Every kernel here is vectorized and stateless so it can run inside
``map_batches`` / ``map_groups`` without per-row Python loops in hot paths.
"""
