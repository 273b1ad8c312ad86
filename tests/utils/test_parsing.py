"""Forcefield lookup oracles (values from the OPLS/allhdg topology data)."""

import numpy as np

from deeprank2_tpu.io.pdb import parse_pdb
from deeprank2_tpu.utils.parsing import forcefield as ff_mod


def test_known_charges() -> None:
    ff = ff_mod.atomic_forcefield
    assert ff._top_rows[("ALA", "CA")]["charge"] == 0.2
    assert ff._top_rows[("ALA", "N")]["charge"] == -0.57
    assert ff._top_rows[("ALA", "O")]["charge"] == -0.5
    assert ff._top_rows[("ARG", "NH1")]["type"] == "NC2"


def test_vdw_types() -> None:
    ff = ff_mod.atomic_forcefield
    p = ff._vanderwaals_parameters["CH1E"]
    assert p.epsilon_main > 0
    assert p.sigma_main > 0
    # 1-4 parameters differ from main for carbon types
    assert (p.epsilon_14, p.sigma_14) != (p.epsilon_main, p.sigma_main)


def test_assign_structure(data_path) -> None:
    arrays = parse_pdb(str(data_path / "pdb" / "101M" / "101M.pdb"))
    params = ff_mod.atomic_forcefield.assign(arrays)
    assert params["charge"].shape == (arrays.num_atoms,)
    # backbone N of a non-terminal residue: -0.57
    # (residue 0 of 101M is the N-terminus, patched; check residue 10 instead)
    r = arrays.find_residue("A", 10)
    start = arrays.res_atom_start[r]
    names = list(arrays.atom_names[start : start + arrays.res_atom_count[r]])
    n_idx = start + names.index("N")
    assert params["charge"][n_idx] == -0.57
    assert np.all(params["sig_main"] >= 0)


def test_terminal_patches(data_path) -> None:
    """N-terminal residues match the NTER class: patched N charge (-0.3), CA 0.31."""
    arrays = parse_pdb(str(data_path / "pdb" / "101M" / "101M.pdb"))
    ff = ff_mod.atomic_forcefield
    r0 = arrays.find_residue("A", 0)
    start = arrays.res_atom_start[r0]
    names = list(arrays.atom_names[start : start + arrays.res_atom_count[r0]])
    aa_code = "MET"
    cls = ff._find_matching_residue_class(aa_code, names)
    # 101M's deposited structure may or may not include the HT1-3 terminal
    # hydrogens; when present the NTER patch applies
    if "HT1" in names and "HT2" in names and "HT3" in names:
        assert cls == "NTER"
        charge, _ = ff._lookup(aa_code, "N", names)
        assert charge == -0.3
    else:
        assert cls is None


def test_patch_applies_to_named_atom_only() -> None:
    """A patch action changes only the atom it names (not the whole residue)."""
    ff = ff_mod.atomic_forcefield
    names = ["N", "HT1", "HT2", "HT3", "CA", "CB", "C", "O"]
    assert ff._find_matching_residue_class("ALA", names) == "NTER"
    charge_n, type_n = ff._lookup("ALA", "N", names)
    charge_cb, _ = ff._lookup("ALA", "CB", names)
    assert charge_n == -0.3
    assert type_n == "NH3"
    assert charge_cb == 0.0  # CB untouched by NTER patch
