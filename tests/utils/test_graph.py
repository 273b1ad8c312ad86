"""Graph construction and HDF5 round-trip tests."""

import h5py
import numpy as np
import pytest

from deeprank2_tpu.domain import edgestorage as Efeat
from deeprank2_tpu.domain import nodestorage as Nfeat
from deeprank2_tpu.domain import targetstorage as targets
from deeprank2_tpu.io.pdb import parse_pdb
from deeprank2_tpu.utils.graph import Graph
from deeprank2_tpu.utils.grid import GridSettings, MapMethod


def test_build_graph_atoms(data_path) -> None:
    arrays = parse_pdb(str(data_path / "pdb" / "1CRN" / "1CRN.pdb"))
    graph = Graph.build_graph(arrays, np.arange(arrays.num_atoms), "atom", "test-1crn", 4.5)
    assert graph.num_nodes > 100
    assert graph.num_edges > graph.num_nodes
    # undirected unique edges (each unordered pair appears exactly once)
    ei = graph.edge_index
    assert np.all(ei[:, 0] != ei[:, 1])
    assert len(np.unique(np.sort(ei, axis=1), axis=0)) == len(ei)
    # edge distances respect the cutoff
    pos = graph.positions()
    d = np.linalg.norm(pos[ei[:, 0]] - pos[ei[:, 1]], axis=1)
    assert d.max() <= 4.5 + 1e-9


def test_build_graph_residues(data_path) -> None:
    arrays = parse_pdb(str(data_path / "pdb" / "1CRN" / "1CRN.pdb"))
    graph = Graph.build_graph(arrays, np.arange(arrays.num_residues), "residue", "test-1crn-res", 10.0)
    assert graph.node_type == "residue"
    assert graph.num_nodes <= arrays.num_residues
    assert graph.num_edges > 0
    # every node owns its full residue's atoms here
    assert graph.node_atom_count.sum() == arrays.res_atom_count[graph.node_indices].sum()


def test_graph_hdf5_roundtrip(tmp_path, data_path) -> None:
    arrays = parse_pdb(str(data_path / "pdb" / "1CRN" / "1CRN.pdb"))
    graph = Graph.build_graph(arrays, np.arange(arrays.num_residues), "residue", "entry0", 10.0)
    graph.node_features["testfeat"] = np.arange(graph.num_nodes, dtype=np.float64)
    graph.edge_features["edgefeat"] = np.ones(graph.num_edges)
    graph.targets["binary"] = 1

    path = str(tmp_path / "graph.hdf5")
    graph.write_to_hdf5(path)

    with h5py.File(path, "r") as f:
        entry = f["entry0"]
        node_group = entry[Nfeat.NODE]
        assert node_group[Nfeat.NAME].shape == (graph.num_nodes,)
        assert node_group[Nfeat.CHAINID][0].decode() == "A"
        assert np.array_equal(node_group["testfeat"][()], graph.node_features["testfeat"])
        assert node_group[Nfeat.POSITION].shape == (graph.num_nodes, 3)
        edge_group = entry[Efeat.EDGE]
        assert np.array_equal(edge_group[Efeat.INDEX][()], graph.edge_index)
        assert entry[targets.VALUES]["binary"][()] == 1


def test_graph_grid_roundtrip(tmp_path, data_path) -> None:
    arrays = parse_pdb(str(data_path / "pdb" / "1CRN" / "1CRN.pdb"))
    graph = Graph.build_graph(arrays, np.arange(arrays.num_residues), "residue", "entry0", 10.0)
    graph.node_features["f1"] = np.ones(graph.num_nodes)
    graph.targets["binary"] = 0
    graph.center = graph.positions().mean(axis=0)

    path = str(tmp_path / "grid.hdf5")
    settings = GridSettings([10, 10, 10], [30.0, 30.0, 30.0])
    graph.write_as_grid_to_hdf5(path, settings, MapMethod.FAST_GAUSSIAN)

    with h5py.File(path, "r") as f:
        entry = f["entry0"]
        assert entry["grid_points"]["x"].shape == (10,)
        mapped = entry["mapped_features"]
        assert "f1" in mapped
        data = mapped["f1"][()]
        assert data.shape == (10, 10, 10)
        assert data.sum() > 0
        # positions map too (as _position_000.. channels)
        assert "_position_000" in mapped


def test_gaussian_mapping_oracle(tmp_path) -> None:
    """A unit value at the grid center maps to exp(-distance) on grid points."""
    from deeprank2_tpu.utils.grid import Grid

    settings = GridSettings([8, 8, 8], [16.0, 16.0, 16.0])
    grid = Grid("g", [0.0, 0.0, 0.0], settings)
    point = np.array([[0.0, 0.0, 0.0]])
    grid.map_feature_batch(point, "v", np.array([2.0]), MapMethod.GAUSSIAN)
    data = grid.features["v"]
    # value at the nearest grid point: distance from (0,0,0) to nearest mesh point
    gx, gy, gz = np.meshgrid(grid.xs, grid.ys, grid.zs, indexing="ij")
    d = np.sqrt(gx**2 + gy**2 + gz**2)
    # rel=1e-5: the native kernel's -ffast-math exp (csrc/grid_kernels.cpp)
    # differs from IEEE exp by up to ~1.3e-6 relative
    assert data == pytest.approx(2.0 * np.exp(-d), rel=1e-5)


def test_augmentation_names(tmp_path, data_path) -> None:
    from deeprank2_tpu.utils.grid import Augmentation

    arrays = parse_pdb(str(data_path / "pdb" / "1CRN" / "1CRN.pdb"))
    graph = Graph.build_graph(arrays, np.arange(arrays.num_residues), "residue", "entry0", 10.0)
    graph.node_features["f1"] = np.ones(graph.num_nodes)
    path = str(tmp_path / "aug.hdf5")
    settings = GridSettings([6, 6, 6], [20.0, 20.0, 20.0])
    graph.write_as_grid_to_hdf5(path, settings, MapMethod.FAST_GAUSSIAN)
    graph.write_as_grid_to_hdf5(path, settings, MapMethod.FAST_GAUSSIAN, Augmentation(np.array([0, 0, 1.0]), 0.5))
    graph.write_as_grid_to_hdf5(path, settings, MapMethod.FAST_GAUSSIAN, Augmentation(np.array([0, 1.0, 0]), 0.25))
    with h5py.File(path, "r") as f:
        assert set(f.keys()) == {"entry0", "entry0_000", "entry0_001"}


def test_node_edge_views(data_path) -> None:
    """Node/Edge views expose the reference's per-node surface over the array graph."""
    arrays = parse_pdb(str(data_path / "pdb" / "1CRN" / "1CRN.pdb"))
    graph = Graph.build_graph(arrays, np.arange(arrays.num_residues), "residue", "views", 10.0)
    graph.node_features["f"] = np.arange(graph.num_nodes, dtype=np.float64)
    graph.edge_features["e"] = np.ones(graph.num_edges)

    node = graph.nodes[0]
    assert node.type == "residue"
    assert node.id.index == graph.node_indices[0]
    assert node.features["f"] == 0.0
    assert node.position.shape == (3,)
    assert not node.has_nan()

    edge = graph.edges[0]
    i, j = graph.edge_index[0]
    assert edge.id.residue1.index == graph.node_indices[i]
    assert edge.id.residue2.index == graph.node_indices[j]
    assert edge.features["e"] == 1.0
    np.testing.assert_allclose(edge.position1, graph.positions()[i])

    # multi-column feature rows are views into the columns: writes propagate
    graph.node_features["vec"] = np.zeros((graph.num_nodes, 2))
    node.features["vec"][...] = 42.0
    assert graph.node_features["vec"][0, 0] == 42.0

    atom_graph = Graph.build_graph(arrays, np.arange(arrays.num_atoms), "atom", "views-atom", 4.5)
    from deeprank2_tpu.molstruct.pair import AtomicContact

    assert atom_graph.nodes[0].id.name == arrays.atom_names[atom_graph.node_indices[0]]
    assert isinstance(atom_graph.edges[0].id, AtomicContact)


def test_graph_mutation_api(data_path) -> None:
    """Reference-style get/add node/edge + per-node add_feature (utils/graph.py:35-122)."""
    arrays = parse_pdb(str(data_path / "pdb" / "1CRN" / "1CRN.pdb"))
    # build over the first half of the residues so some residues are NOT nodes
    half = arrays.num_residues // 2
    graph = Graph.build_graph(arrays, np.arange(half), "residue", "mut", 10.0)
    graph.node_features["f"] = np.zeros(graph.num_nodes)
    graph.edge_features["e"] = np.zeros(graph.num_edges)
    n_nodes, n_edges = graph.num_nodes, graph.num_edges

    # get_node by Residue view; get_edge by Contact (unordered)
    node0 = graph.nodes[0]
    assert graph.get_node(node0.id).index == 0
    edge0 = graph.edges[0]
    from deeprank2_tpu.molstruct.pair import ResidueContact

    swapped = ResidueContact(edge0.id.item2, edge0.id.item1)
    assert graph.get_edge(swapped).index == 0

    # per-node / per-edge feature functions land in the column storage
    node0.add_feature("depth", lambda res: np.array([3.5]))
    assert graph.node_features["depth"].shape == (n_nodes,)
    assert graph.node_features["depth"][0] == 3.5
    node0.add_feature("vec2", lambda res: np.array([1.0, 2.0]))
    assert graph.node_features["vec2"].shape == (n_nodes, 2)
    with pytest.raises(ValueError, match="1-dimensional"):
        node0.add_feature("bad", lambda res: np.zeros((2, 2)))
    edge0.add_feature("w", lambda contact: 7.0)
    assert graph.edge_features["w"][0] == 7.0

    # add_node is idempotent and pads feature columns
    assert graph.add_node(node0.id).index == 0
    from deeprank2_tpu.molstruct.structure import Residue

    outside = Residue(arrays, arrays.num_residues - 1)
    with pytest.raises(KeyError):
        graph.get_node(outside)
    new_node = graph.add_node(outside)
    assert new_node.index == n_nodes
    assert graph.num_nodes == n_nodes + 1
    assert graph.node_features["f"].shape == (n_nodes + 1,)
    assert graph.node_atom_count[-1] == arrays.res_atom_count[outside.index]

    # add_edge connects existing nodes, pads edge columns, dedups
    contact = ResidueContact(node0.id, outside)
    new_edge = graph.add_edge(contact)
    assert new_edge.index == n_edges
    assert graph.add_edge(contact).index == n_edges
    assert graph.edge_features["e"].shape == (n_edges + 1,)
    assert graph.get_edge(contact).index == n_edges
