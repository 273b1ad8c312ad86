"""Multi-device scale-out: device meshes, data-parallel step functions, and
sharded collation. Collectives ride ICI via XLA (psum/pmean under shard_map)."""
