"""Grid mapping method tests (reference: tests/utils/test_grid.py)."""

import numpy as np
import pytest

from deeprank2_tpu.utils.grid import Grid, GridSettings, MapMethod, rotate_points


@pytest.fixture
def grid():
    return Grid("g", [0.0, 0.0, 0.0], GridSettings([8, 8, 8], [16.0, 16.0, 16.0]))


def test_mesh_geometry(grid) -> None:
    # box centered on the origin; spacing = size / count
    assert grid.xs[0] == pytest.approx(-8.0)
    assert grid.xs[1] - grid.xs[0] == pytest.approx(2.0)
    assert grid.shape == (8, 8, 8)


def test_gaussian_vs_fast_gaussian(grid) -> None:
    point = np.array([[0.5, -0.25, 1.0]])
    value = np.array([3.0])
    grid.map_feature_batch(point, "full", value, MapMethod.GAUSSIAN)
    grid.map_feature_batch(point, "fast", value, MapMethod.FAST_GAUSSIAN)
    full = grid.features["full"]
    fast = grid.features["fast"]
    # inside the 5 Å cutoff they agree; beyond, fast is zero
    gx, gy, gz = np.meshgrid(grid.xs, grid.ys, grid.zs, indexing="ij")
    d = np.sqrt((gx - 0.5) ** 2 + (gy + 0.25) ** 2 + (gz - 1.0) ** 2)
    assert np.allclose(fast[d < 5.0], full[d < 5.0])
    assert np.all(fast[d >= 5.0] == 0)
    assert np.any(full[d >= 5.0] > 0)


def test_gaussian_mass_conservation_ordering(grid) -> None:
    """A point closer to a grid node gives that node a larger value."""
    grid.map_feature_batch(np.array([[0.0, 0.0, 0.0]]), "v", np.array([1.0]), MapMethod.GAUSSIAN)
    data = grid.features["v"]
    center_idx = np.unravel_index(np.argmax(data), data.shape)
    gx, gy, gz = np.meshgrid(grid.xs, grid.ys, grid.zs, indexing="ij")
    d = np.sqrt(gx**2 + gy**2 + gz**2)
    assert center_idx == np.unravel_index(np.argmin(d), d.shape)


def test_bspline_local_support(grid) -> None:
    grid.map_feature_batch(np.array([[0.0, 0.0, 0.0]]), "b", np.array([1.0]), MapMethod.BSP_LINE)
    data = grid.features["b"]
    assert data.sum() > 0
    # cubic B-spline support is 2 grid units -> far corners are exactly zero
    assert data[0, 0, 0] == 0.0


def test_nearest_neighbours(grid) -> None:
    grid.map_feature_batch(np.array([[0.6, 0.6, 0.6]]), "n", np.array([2.0]), MapMethod.NEAREST_NEIGHBOURS)
    data = grid.features["n"]
    assert np.count_nonzero(data) <= 8
    assert data.sum() == pytest.approx(2.0)  # weights normalized per axis


def test_vector_feature_channels(grid) -> None:
    values = np.array([[1.0, 2.0, 3.0]])
    grid.map_feature_batch(np.zeros((1, 3)), "vec", values, MapMethod.FAST_GAUSSIAN)
    assert set(grid.features) == {"vec_000", "vec_001", "vec_002"}
    assert grid.features["vec_001"].max() == pytest.approx(2 * grid.features["vec_000"].max())


def test_accumulation(grid) -> None:
    point = np.zeros((1, 3))
    grid.map_feature_batch(point, "acc", np.array([1.0]), MapMethod.FAST_GAUSSIAN)
    once = grid.features["acc"].copy()
    grid.map_feature_batch(point, "acc", np.array([1.0]), MapMethod.FAST_GAUSSIAN)
    assert np.allclose(grid.features["acc"], 2 * once)


def test_rotate_points() -> None:
    points = np.array([[1.0, 0.0, 0.0]])
    out = rotate_points(points, np.array([0.0, 0.0, 1.0]), np.pi / 2, np.zeros(3))
    assert np.allclose(out, [[0.0, 1.0, 0.0]], atol=1e-12)
    # rotation about a non-origin center preserves distance to the center
    center = np.array([1.0, 2.0, 3.0])
    out2 = rotate_points(points, np.array([0.3, 0.5, 0.8]), 1.234, center)
    assert np.linalg.norm(out2 - center) == pytest.approx(np.linalg.norm(points - center))


def test_grid_orientation(data_path) -> None:
    """Grid axes/center must match the original DeepRank convention
    (back-compat oracle: reference tests/utils/test_grid.py:8-49 against
    its pre-generated original-deeprank-1ak4.hdf5)."""
    import h5py

    from deeprank2_tpu.query import ProteinProteinInterfaceQuery

    coord_error_margin = 1.0  # Angstrom
    from tests.conftest import need

    with h5py.File(str(need(data_path / "hdf5" / "original-deeprank-1ak4.hdf5")), "r") as f:
        grid_points = f["1AK4/grid_points"]
        target_xs = grid_points["x"][()]
        target_ys = grid_points["y"][()]
        target_zs = grid_points["z"][()]
        target_center = grid_points["center"][()]

    for resolution in ("residue", "atom"):
        query = ProteinProteinInterfaceQuery(
            pdb_path=str(data_path / "pdb" / "1ak4" / "1ak4.pdb"),
            resolution=resolution,
            chain_ids=["C", "D"],
            influence_radius=8.5,
            max_edge_length=8.5,
        )
        graph = query.build([])
        g = Grid("test_grid", graph.center, GridSettings([10, 10, 10], [30.0, 30.0, 30.0]))
        graph.map_to_grid(g, MapMethod.FAST_GAUSSIAN)
        assert np.all(np.abs(target_center - g.center) < coord_error_margin)
        for ours, target in ((g.xs, target_xs), (g.ys, target_ys), (g.zs, target_zs)):
            assert ours.shape == target.shape
            assert np.all(np.abs(ours - target) < coord_error_margin)
