"""Checks on the amino-acid vocabulary tables."""

import numpy as np

from deeprank2_tpu.molstruct.aminoacid import (
    AA_CHARGE,
    AA_ONEHOT_INDEX,
    amino_acids,
    amino_acids_by_code,
    amino_acids_by_letter,
    convert_aa_nomenclature,
)


def test_count_and_uniqueness() -> None:
    assert len(amino_acids) == 20
    assert len({aa.three_letter_code for aa in amino_acids}) == 20
    assert len({aa.one_letter_code for aa in amino_acids}) == 20
    # one-hot indices cover 0..19 exactly once
    assert sorted(AA_ONEHOT_INDEX.tolist()) == list(range(20))


def test_charges() -> None:
    """Positive residues +1, negative -1, rest 0."""
    for code in ("ARG", "LYS", "HIS"):
        assert amino_acids_by_code[code].charge == 1.0
    for code in ("ASP", "GLU"):
        assert amino_acids_by_code[code].charge == -1.0
    assert float(np.abs(AA_CHARGE).sum()) == 5.0


def test_onehot() -> None:
    for aa in amino_acids:
        onehot = aa.onehot
        assert onehot.shape == (20,)
        assert onehot.sum() == 1.0
        assert onehot[aa.index] == 1.0


def test_lookups() -> None:
    assert amino_acids_by_code["GLY"].name == "Glycine"
    assert amino_acids_by_letter["W"].three_letter_code == "TRP"


def test_convert_nomenclature() -> None:
    assert convert_aa_nomenclature("A", 3) == "ALA"
    assert convert_aa_nomenclature("ALA", 1) == "A"
    assert convert_aa_nomenclature("Alanine", 1) == "A"
    assert convert_aa_nomenclature("R") == "Arginine"
