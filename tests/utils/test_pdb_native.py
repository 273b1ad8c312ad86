"""The C++ PDB parser must be bit-identical to the Python fallback."""

import numpy as np
import pytest

import deeprank2_tpu.csrc as csrc
from deeprank2_tpu.io.pdb import parse_pdb


@pytest.mark.parametrize("pdb", ["1CRN/1CRN", "1ATN/1ATN_1w", "101M/101M", "9api/9api"])
def test_native_parser_matches_python(data_path, pdb, monkeypatch) -> None:
    if csrc.load() is None:
        pytest.skip("native kernels unavailable (no compiler)")
    path = str(data_path / "pdb" / f"{pdb}.pdb")
    native = parse_pdb(path)
    monkeypatch.setattr(csrc, "load", lambda: None)
    python = parse_pdb(path)

    assert native.num_atoms == python.num_atoms
    assert native.num_residues == python.num_residues
    assert np.allclose(native.positions, python.positions)
    assert list(native.atom_names) == list(python.atom_names)
    assert np.array_equal(native.elements, python.elements)
    assert np.allclose(native.occupancies, python.occupancies)
    assert np.array_equal(native.atom_residue, python.atom_residue)
    assert np.array_equal(native.res_numbers, python.res_numbers)
    assert list(native.res_icodes) == list(python.res_icodes)
    assert np.array_equal(native.res_aa_ids, python.res_aa_ids)
    assert np.array_equal(native.res_chain, python.res_chain)
    assert native.chain_ids == python.chain_ids


def test_native_parser_missing_file() -> None:
    if csrc.load() is None:
        pytest.skip("native kernels unavailable (no compiler)")
    with pytest.raises(FileNotFoundError):
        parse_pdb("/nonexistent/file.pdb")


def test_parser_tolerates_malformed_lines(tmp_path) -> None:
    """Garbage lines are skipped, never crash the parser (both backends)."""
    from deeprank2_tpu.io.pdb import parse_pdb

    ok1 = "ATOM      1  CA  ALA A   1      11.104   6.134  -6.504  1.00  0.00           C"
    ok2 = "ATOM      2  CB  ALA A   1      12.104   6.134  -6.504  1.00  0.00           C"
    garbage = [
        "ATOM  incomplete",
        "ATOM      1  CA  ALA A   1      bad.xx  10.0  10.0  1.00 10.00           C",
        "\x00\xff binary noise",
        "A" * 500,
        "",
    ]
    for g in garbage:
        path = tmp_path / "fuzz.pdb"
        path.write_text(f"{ok1}\n{g}\n{ok2}\n")
        arrays = parse_pdb(str(path))
        assert arrays.num_atoms == 2
