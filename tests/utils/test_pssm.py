"""PSSM parsing tests (reference: tests/utils/test_pssmdata.py)."""

import numpy as np

from deeprank2_tpu.molstruct.aminoacid import amino_acids_by_letter
from deeprank2_tpu.utils.parsing.pssm import parse_pssm, pssm_profile_matrix


def test_parse_pssm(data_path) -> None:
    with open(data_path / "pssm" / "1ATN" / "1ATN.A.pdb.pssm", encoding="utf-8") as f:
        table = parse_pssm(f)
    row = table.get(401)
    assert row is not None
    # header row: 401 D ... D column value 6, IC 0.92
    asp = amino_acids_by_letter["D"]
    assert row.get_conservation(asp) == 6.0
    assert row.information_content == 0.92
    assert row.amino_acid == asp


def test_profile_matrix(data_path) -> None:
    with open(data_path / "pssm" / "1ATN" / "1ATN.A.pdb.pssm", encoding="utf-8") as f:
        table = parse_pssm(f)
    profiles, ic, found = pssm_profile_matrix(table, np.array([401, 402, 99999]), np.array([None, None, None], dtype=object))
    assert found.tolist() == [True, True, False]
    assert profiles.shape == (3, 20)
    # columns ordered by three-letter code: ALA ARG ASN ASP ...
    # residue 401 row: A=-2 R=-2 N=1 D=6
    assert profiles[0][:4].tolist() == [-2.0, -2.0, 1.0, 6.0]
    assert ic[0] == 0.92
