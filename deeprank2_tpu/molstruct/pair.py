"""Unordered pairs and contacts (reference: deeprank2/molstruct/pair.py).

The array-first graph (utils/graph.py) stores contacts as index arrays, so
these classes are not on the hot path; they are provided for API parity and
for user code that manipulates individual contacts.
"""

from __future__ import annotations

from abc import ABC
from typing import Any


class Pair:
    """A hashable, comparable set of two items where order doesn't matter."""

    def __init__(self, item1: Any, item2: Any):
        self.item1 = item1
        self.item2 = item2

    def __hash__(self) -> int:
        s1, s2 = str(self.item1), str(self.item2)
        return hash(s1 + s2) if s1 < s2 else hash(s2 + s1)

    def __eq__(self, other: object) -> bool:
        if isinstance(other, Pair):
            return (self.item1 == other.item1 and self.item2 == other.item2) or (
                self.item1 == other.item2 and self.item2 == other.item1
            )
        return NotImplemented

    def __iter__(self):
        return iter([self.item1, self.item2])

    def __repr__(self) -> str:
        return str(self.item1) + str(self.item2)


class Contact(Pair, ABC):
    """Parent of :class:`ResidueContact` and :class:`AtomicContact`."""


class ResidueContact(Contact):
    """A contact between two residues."""

    def __init__(self, residue1, residue2):
        super().__init__(residue1, residue2)

    @property
    def residue1(self):
        return self.item1

    @property
    def residue2(self):
        return self.item2


class AtomicContact(Contact):
    """A contact between two atoms."""

    def __init__(self, atom1, atom2):
        super().__init__(atom1, atom2)

    @property
    def atom1(self):
        return self.item1

    @property
    def atom2(self):
        return self.item2
