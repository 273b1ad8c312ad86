"""deeprank2_tpu — a TPU-native (JAX/XLA/Pallas) deep-learning framework for mining
protein-protein interfaces and single-residue variants from PDB structures.

Re-designed from scratch for TPU hardware with the same capabilities as DeepRank2
(reference: /root/reference, DeepRank/deeprank-gnn-2 v3.1.0):

- array-first molecular core: structures are struct-of-arrays tables, graphs are
  COO/CSR index arrays + dense feature matrices,
- feature physics vectorized over edges/nodes (no per-node Python loops),
- models are pure functions over padded, statically-shaped batches under ``jax.jit``,
- GNN aggregation runs on segment-sum/SpMM primitives with Pallas TPU kernels,
- scale-out via ``jax.sharding`` device meshes (data- and edge-parallelism).
"""

__version__ = "0.1.0"


def __getattr__(name):
    """Lazy top-level conveniences (keeps `import deeprank2_tpu` light)."""
    if name in ("GraphDataset", "GridDataset", "save_hdf5_keys"):
        import deeprank2_tpu.dataset as _m

        return getattr(_m, name)
    if name == "Trainer":
        from deeprank2_tpu.trainer import Trainer

        return Trainer
    if name in ("Query", "QueryCollection", "ProteinProteinInterfaceQuery", "SingleResidueVariantQuery"):
        import deeprank2_tpu.query as _m

        return getattr(_m, name)
    msg = f"module {__name__!r} has no attribute {name!r}"
    raise AttributeError(msg)
