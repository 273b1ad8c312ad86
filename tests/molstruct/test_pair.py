"""Pair semantics (reference: tests/molstruct/test_pair.py)."""

from deeprank2_tpu.molstruct.pair import AtomicContact, Pair, ResidueContact


def test_order_independency() -> None:
    pair1 = Pair(1, 2)
    pair2 = Pair(2, 1)
    assert pair1 == pair2
    assert hash(pair1) == hash(pair2)
    # a different pair is not equal
    assert pair1 != Pair(1, 3)


def test_uniqueness() -> None:
    # unordered duplicates collapse in a set
    pairs = {Pair("a", "b"), Pair("b", "a"), Pair("a", "c")}
    assert len(pairs) == 2


def test_contact_accessors() -> None:
    rc = ResidueContact("r1", "r2")
    assert (rc.residue1, rc.residue2) == ("r1", "r2")
    ac = AtomicContact("a1", "a2")
    assert (ac.atom1, ac.atom2) == ("a1", "a2")
    assert ac == AtomicContact("a2", "a1")
    assert list(ac) == ["a1", "a2"]
