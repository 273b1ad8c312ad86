"""Contact/neighborhood search tests (reference: tests/utils/test_buildgraph.py)."""

import numpy as np

from deeprank2_tpu.io.pdb import parse_pdb
from deeprank2_tpu.utils.buildgraph import get_contact_atoms, get_residue_contact_pairs, get_surrounding_residues


def test_contact_atoms(data_path) -> None:
    arrays = parse_pdb(str(data_path / "pdb" / "1ATN" / "1ATN_1w.pdb"))
    contacts = get_contact_atoms(arrays, ["A", "B"], 8.5)
    assert len(contacts) > 0
    # every contact atom has a partner on the other chain within the radius
    atom_chain = arrays.atom_chain
    chains = {arrays.chain_ids[c] for c in atom_chain[contacts]}
    assert chains == {"A", "B"}
    for a in contacts[:20]:
        other = np.flatnonzero(atom_chain != atom_chain[a])
        d = np.linalg.norm(arrays.positions[other] - arrays.positions[a], axis=1)
        assert d.min() <= 8.5 + 1e-9


def test_surrounding_residues(data_path) -> None:
    arrays = parse_pdb(str(data_path / "pdb" / "101M" / "101M.pdb"))
    center = arrays.find_residue("A", 25)
    residues = get_surrounding_residues(arrays, center, 10.0)
    assert center in residues
    assert 5 < len(residues) < arrays.num_residues
    # larger radius includes at least as many residues
    more = get_surrounding_residues(arrays, center, 15.0)
    assert set(residues) <= set(more)


def test_residue_contact_pairs(data_path) -> None:
    arrays = parse_pdb(str(data_path / "pdb" / "1ATN" / "1ATN_1w.pdb"))
    pairs = get_residue_contact_pairs(arrays, "A", "B", 5.5)
    assert len(pairs) > 0
    chain_a = arrays.chain_ids.index("A")
    chain_b = arrays.chain_ids.index("B")
    assert all(arrays.res_chain[r1] == chain_a and arrays.res_chain[r2] == chain_b for r1, r2 in pairs)


def test_get_structure_from_nmr_with_dna(data_path) -> None:
    """NMR multi-model PDB with DNA chains: first model only, DNA residues
    carry no amino acid (reference: tests/utils/test_buildgraph.py:37-46)."""
    from deeprank2_tpu.utils.buildgraph import get_structure

    structure = get_structure(str(data_path / "pdb" / "1A6B" / "1A6B.pdb"), "1A6B").to_structure()
    assert len(structure.chains) > 0
    assert structure.chains[0].residues[0].amino_acid is None  # DNA
