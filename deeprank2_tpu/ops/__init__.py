"""TPU compute primitives: segment aggregation, padded graph batching, pooling,
losses, optimizers. Everything here is shape-static and jit-safe."""
