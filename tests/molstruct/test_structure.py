"""Structure model tests (incl. pickling across process boundaries, required by
the multiprocessing featurization fan-out — reference tests/molstruct/test_structure.py)."""

import pickle

import numpy as np

from deeprank2_tpu.io.pdb import parse_pdb
from deeprank2_tpu.molstruct.structure import AtomicElement


def test_structure_views(data_path) -> None:
    arrays = parse_pdb(str(data_path / "pdb" / "1CRN" / "1CRN.pdb"))
    structure = arrays.to_structure()
    assert structure.id == "1CRN"
    assert structure.has_chain("A")
    chain = structure.get_chain("A")
    assert chain.id == "A"
    assert len(chain.residues) == arrays.num_residues
    assert len(structure.get_atoms()) == arrays.num_atoms

    residue = chain.residues[0]
    assert residue.number == 1
    assert residue.amino_acid.three_letter_code == "THR"
    assert repr(residue) == "1CRN A 1"
    atom = residue.atoms[0]
    assert atom.name == "N"
    assert atom.element == AtomicElement.N
    assert repr(atom) == "1CRN A 1 N"


def test_residue_center(data_path) -> None:
    arrays = parse_pdb(str(data_path / "pdb" / "1CRN" / "1CRN.pdb"))
    residue = arrays.to_structure().get_chain("A").residues[0]
    names = [a.name for a in residue.atoms]
    center = residue.get_center()
    if "CB" in names:
        expected = residue.atoms[names.index("CB")].position
    elif "CA" in names:
        expected = residue.atoms[names.index("CA")].position
    else:
        expected = np.mean([a.position for a in residue.atoms], axis=0)
    assert np.allclose(center, expected)


def test_structure_pickles(data_path) -> None:
    """StructureArrays must survive pickling (process-pool requirement)."""
    arrays = parse_pdb(str(data_path / "pdb" / "1CRN" / "1CRN.pdb"))
    clone = pickle.loads(pickle.dumps(arrays))
    assert clone.num_atoms == arrays.num_atoms
    assert np.array_equal(clone.positions, arrays.positions)
    assert clone.chain_ids == arrays.chain_ids

    # residue equality semantics survive too
    r1 = arrays.residue_view(5)
    r2 = clone.residue_view(5)
    assert r1.number == r2.number
    assert r1.amino_acid == r2.amino_acid


def test_atom_equality(data_path) -> None:
    arrays = parse_pdb(str(data_path / "pdb" / "1CRN" / "1CRN.pdb"))
    a0 = arrays.atom_view(0)
    a0_again = arrays.atom_view(0)
    a1 = arrays.atom_view(1)
    assert a0 == a0_again
    assert a0 != a1


def test_pair_semantics() -> None:
    from deeprank2_tpu.molstruct.pair import Pair

    p1 = Pair("a", "b")
    p2 = Pair("b", "a")
    assert p1 == p2
    assert hash(p1) == hash(p2)
    assert {p1, p2} == {p1}
    assert list(iter(p1)) == ["a", "b"]
