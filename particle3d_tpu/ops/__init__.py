"""Compute ops: force laws, dense/Pallas all-pairs, cell lists."""
