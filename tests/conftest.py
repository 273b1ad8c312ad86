"""Test configuration.

Tests run on CPU with a virtual 8-device mesh so multi-chip sharding is
exercised without TPU hardware (the TPU answer to "multi-node CI").
These env vars must be set before jax is imported anywhere.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

# This environment pre-sets JAX_PLATFORMS=axon (the TPU tunnel). Overriding the
# env var to "cpu" hangs plugin discovery; jax.config.update after import works.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from pathlib import Path  # noqa: E402

import pytest  # noqa: E402

# Fixture-data resolution order: explicit env override -> the full reference
# corpus (adds its pre-generated HDF5s and torch checkpoints for the interop
# tests) -> the vendored corpus in tests/data (self-contained: public PDBs,
# PSSMs, DSSP oracles; interop tests skip on it via `need()`).
VENDORED_DATA = Path(__file__).parent / "data"
_candidates = [
    *( [Path(os.environ["DEEPRANK2_TPU_TEST_DATA"])] if "DEEPRANK2_TPU_TEST_DATA" in os.environ else [] ),
    Path("/root/reference/tests/data"),
    VENDORED_DATA,
]
REFERENCE_DATA = next((c for c in _candidates if c.exists()), VENDORED_DATA)


def need(path: Path) -> Path:
    """Skip the calling test when an optional fixture file is absent (e.g.
    reference-generated HDF5s/checkpoints not in the vendored corpus)."""
    if not Path(path).exists():
        pytest.skip(f"optional fixture not available: {path}")
    return path


@pytest.fixture(scope="session")
def data_path() -> Path:
    if not REFERENCE_DATA.exists():
        pytest.skip(f"test data not found at {REFERENCE_DATA} (set DEEPRANK2_TPU_TEST_DATA)")
    return REFERENCE_DATA


@pytest.fixture(scope="session")
def srv_hdf5(tmp_path_factory, data_path) -> str:
    """A small homogeneous SRV residue dataset with binary + irmsd targets."""
    from deeprank2_tpu.molstruct.aminoacid import alanine, phenylalanine
    from deeprank2_tpu.query import QueryCollection, SingleResidueVariantQuery

    out = tmp_path_factory.mktemp("data") / "srv"
    qc = QueryCollection()
    for i, res in enumerate([27, 25, 20, 64, 89, 101, 118, 136]):
        qc.add(
            SingleResidueVariantQuery(
                pdb_path=str(data_path / "pdb" / "101M" / "101M.pdb"),
                resolution="residue",
                chain_ids="A",
                variant_residue_number=res,
                insertion_code=None,
                wildtype_amino_acid=alanine,
                variant_amino_acid=phenylalanine,
                pssm_paths={"A": str(data_path / "pssm" / "101M" / "101M.A.pdb.pssm")},
                targets={"binary": i % 2, "irmsd": float(i) + 0.5},
            )
        )
    paths = qc.process(prefix=str(out), feature_modules=["components", "contact", "conservation"], cpu_count=2)
    return paths[0]


@pytest.fixture(scope="session")
def grid_hdf5(tmp_path_factory, data_path) -> str:
    """A small grid dataset (10x10x10, fast gaussian)."""
    from deeprank2_tpu.molstruct.aminoacid import alanine, phenylalanine
    from deeprank2_tpu.query import QueryCollection, SingleResidueVariantQuery
    from deeprank2_tpu.utils.grid import GridSettings, MapMethod

    out = tmp_path_factory.mktemp("data") / "grid"
    qc = QueryCollection()
    for i, res in enumerate([27, 25, 20, 64]):
        qc.add(
            SingleResidueVariantQuery(
                pdb_path=str(data_path / "pdb" / "101M" / "101M.pdb"),
                resolution="residue",
                chain_ids="A",
                variant_residue_number=res,
                insertion_code=None,
                wildtype_amino_acid=alanine,
                variant_amino_acid=phenylalanine,
                targets={"binary": i % 2, "irmsd": float(i) + 0.5},
            )
        )
    paths = qc.process(
        prefix=str(out),
        feature_modules=["components", "contact"],
        cpu_count=2,
        grid_settings=GridSettings([10, 10, 10], [30.0, 30.0, 30.0]),
        grid_map_method=MapMethod.FAST_GAUSSIAN,
    )
    return paths[0]
