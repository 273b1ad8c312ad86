"""Shared helpers for feature tests."""

from __future__ import annotations

import numpy as np

from deeprank2_tpu.io.pdb import parse_pdb
from deeprank2_tpu.molstruct.structure import SingleResidueVariant, StructureArrays
from deeprank2_tpu.utils.buildgraph import get_contact_atoms, get_surrounding_residues
from deeprank2_tpu.utils.graph import Graph


def find_atom(arrays: StructureArrays, chain_id: str, residue_number: int, atom_name: str) -> int:
    """Atom index by (chain, residue number, atom name)."""
    chain_idx = arrays.chain_ids.index(chain_id)
    for a in range(arrays.num_atoms):
        r = arrays.atom_residue[a]
        if arrays.res_chain[r] == chain_idx and arrays.res_numbers[r] == residue_number and arrays.atom_names[a] == atom_name:
            return a
    msg = f"Not found: chain {chain_id} residue {residue_number} atom {atom_name}"
    raise ValueError(msg)


def single_atom_edge_graph(arrays: StructureArrays, atom1: int, atom2: int) -> Graph:
    """A graph with exactly one atomic edge, for physics oracle tests."""
    nodes = np.array([atom1, atom2], dtype=np.int64)
    return Graph(
        id="test",
        node_type="atom",
        arrays=arrays,
        node_indices=nodes,
        edge_index=np.array([[0, 1]], dtype=np.int64),
        node_atom_indices=nodes,
        node_atom_start=np.array([0, 1], dtype=np.int64),
        node_atom_count=np.array([1, 1], dtype=np.int64),
    )


def single_residue_edge_graph(arrays: StructureArrays, res1: int, res2: int) -> Graph:
    """A graph with exactly one residue edge (full residues), for oracle tests."""
    nodes = np.array([res1, res2], dtype=np.int64)
    atom_count = arrays.res_atom_count[nodes].astype(np.int64)
    atom_start = np.array([0, atom_count[0]], dtype=np.int64)
    atom_indices = np.concatenate(
        [np.arange(arrays.res_atom_start[r], arrays.res_atom_start[r] + arrays.res_atom_count[r]) for r in nodes]
    ).astype(np.int64)
    return Graph(
        id="test",
        node_type="residue",
        arrays=arrays,
        node_indices=nodes,
        edge_index=np.array([[0, 1]], dtype=np.int64),
        node_atom_indices=atom_indices,
        node_atom_start=atom_start,
        node_atom_count=atom_count,
    )


def build_testgraph(
    pdb_path: str,
    detail: str,
    influence_radius: float,
    max_edge_length: float,
    central_res: int | None = None,
    variant=None,
    chain_ids=None,
) -> tuple[Graph, SingleResidueVariant | None]:
    """Build a residue/atom graph the way the query pipeline would.

    PPI-style graph (two chains) when ``central_res`` is None, otherwise an
    SRV-style graph around the central residue.
    """
    arrays = parse_pdb(pdb_path)

    if central_res is None:
        if not chain_ids:
            chain_ids = (arrays.chain_ids[0], arrays.chain_ids[1])
        contact_atoms = get_contact_atoms(arrays, list(chain_ids), influence_radius)
        if detail == "atom":
            graph = Graph.build_graph(arrays, contact_atoms, "atom", "test", max_edge_length)
        else:
            residues = np.unique(arrays.atom_residue[contact_atoms])
            graph = Graph.build_graph(arrays, residues, "residue", "test", max_edge_length, atom_subset=contact_atoms)
        return graph, None

    chain_id = chain_ids if isinstance(chain_ids, str) else arrays.chain_ids[0]
    res_idx = arrays.find_residue(chain_id, central_res)
    assert res_idx >= 0
    srv = SingleResidueVariant(arrays.residue_view(res_idx), variant)
    residues = get_surrounding_residues(arrays, res_idx, influence_radius)
    if detail == "residue":
        graph = Graph.build_graph(arrays, residues, "residue", "test", max_edge_length)
    else:
        keep = residues[arrays.res_aa_ids[residues] >= 0]
        atoms = np.concatenate(
            [np.arange(arrays.res_atom_start[r], arrays.res_atom_start[r] + arrays.res_atom_count[r]) for r in keep]
        ).astype(np.int64)
        graph = Graph.build_graph(arrays, atoms, "atom", "test", max_edge_length)
    return graph, srv
