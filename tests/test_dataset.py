"""Dataset layer tests (mirrors the reference's largest suite, tests/test_dataset.py):
feature selection, transforms/standardization, target filtering, subsets,
train-source inheritance, links, invalid inputs."""

import h5py
import numpy as np
import pytest

from deeprank2_tpu.dataset import GraphDataset, GridDataset, save_hdf5_keys
from deeprank2_tpu.domain import nodestorage as Nfeat


def test_all_features_default(srv_hdf5) -> None:
    ds = GraphDataset(hdf5_path=srv_hdf5, target="binary")
    assert len(ds.node_features) > 10
    assert len(ds.edge_features) == 5
    entry = ds.get(0)
    assert entry["x"].shape[1] > 20
    assert entry["edge_attr"].shape[1] == 5
    assert entry["edge_index"].shape[1] == 2
    assert entry["pos"].shape[1] == 3


def test_feature_selection(srv_hdf5) -> None:
    ds = GraphDataset(
        hdf5_path=srv_hdf5,
        target="binary",
        node_features=["res_type", "polarity"],
        edge_features=["distance"],
    )
    entry = ds.get(0)
    assert entry["x"].shape[1] == 24  # 20 one-hot + 4 polarity
    assert entry["edge_attr"].shape[1] == 1


def test_missing_feature_raises(srv_hdf5) -> None:
    with pytest.raises(ValueError, match="bsa"):
        GraphDataset(hdf5_path=srv_hdf5, target="binary", node_features=["bsa"])


def test_transform(srv_hdf5) -> None:
    ds_plain = GraphDataset(hdf5_path=srv_hdf5, target="binary", node_features=["res_mass"])
    ds_log = GraphDataset(
        hdf5_path=srv_hdf5,
        target="binary",
        node_features=["res_mass"],
        features_transform={"res_mass": {"transform": lambda t: np.log(t + 1)}},
    )
    plain = ds_plain.get(0)["x"]
    logged = ds_log.get(0)["x"]
    assert np.allclose(logged, np.log(plain + 1))


def test_transform_all(srv_hdf5) -> None:
    ds = GraphDataset(
        hdf5_path=srv_hdf5,
        target="binary",
        node_features=["res_mass", "res_size"],
        features_transform={"all": {"transform": lambda t: np.abs(t) + 1}},
    )
    assert np.all(ds.get(0)["x"] >= 1)


def test_standardization(srv_hdf5) -> None:
    ds = GraphDataset(
        hdf5_path=srv_hdf5,
        target="binary",
        node_features=["res_mass"],
        features_transform={"res_mass": {"standardize": True}},
    )
    assert ds.means is not None
    assert "res_mass" in ds.means
    vals = np.concatenate([ds.get(i)["x"][:, 0] for i in range(len(ds))])
    # standardized values should be roughly centered
    assert abs(vals.mean()) < 1.0


def test_invalid_transform_raises(srv_hdf5) -> None:
    ds = GraphDataset(
        hdf5_path=srv_hdf5,
        target="binary",
        node_features=["res_mass"],
        features_transform={"res_mass": {"transform": lambda t: np.log(-t)}},  # nan -> warning
    )
    with pytest.raises(ValueError, match="Invalid value"):
        ds.get(0)


def test_target_filter(srv_hdf5) -> None:
    ds_all = GraphDataset(hdf5_path=srv_hdf5, target="irmsd")
    ds_filtered = GraphDataset(hdf5_path=srv_hdf5, target="irmsd", target_filter={"irmsd": "<3"})
    assert 0 < len(ds_filtered) < len(ds_all)
    for i in range(len(ds_filtered)):
        assert ds_filtered.get(i)["y"] < 3


def test_target_filter_two_char_operators(srv_hdf5) -> None:
    """Regression: '<=' / '>=' / '!=' conditions work (the reference's chained
    str.replace corrupts them into a SyntaxError that silently drops the whole
    file — a documented divergence, grep 'reference bug')."""
    ds_all = GraphDataset(hdf5_path=srv_hdf5, target="irmsd")
    ds_le = GraphDataset(hdf5_path=srv_hdf5, target="irmsd", target_filter={"irmsd": "<=3"})
    assert 0 < len(ds_le) < len(ds_all)
    for i in range(len(ds_le)):
        assert ds_le.get(i)["y"] <= 3
    # compound conditions still work
    ds_band = GraphDataset(hdf5_path=srv_hdf5, target="irmsd", target_filter={"irmsd": ">=0 and <3"})
    assert len(ds_band) == len(GraphDataset(hdf5_path=srv_hdf5, target="irmsd", target_filter={"irmsd": "<3"}))


def test_grid_single_feature_string(grid_hdf5) -> None:
    """Regression: a single feature name as a bare string selects that
    feature's channels (previously resolved to zero features silently)."""
    from deeprank2_tpu.dataset import GridDataset

    ds_all = GridDataset(hdf5_path=grid_hdf5, target="binary")
    feat = ds_all.features[0].rsplit("_", 1)[0] if ds_all.features[0][-3:].isdigit() else ds_all.features[0]
    ds_one = GridDataset(hdf5_path=grid_hdf5, target="binary", features=feat)
    assert len(ds_one.features) > 0
    assert all(f == feat or f.startswith(feat + "_") for f in ds_one.features)
    x = ds_one.get(0)["x"]
    assert x.shape[0] == len(ds_one.features)


def test_subset(srv_hdf5) -> None:
    with h5py.File(srv_hdf5) as f:
        names = list(f.keys())[:3]
    ds = GraphDataset(hdf5_path=srv_hdf5, target="binary", subset=names)
    assert len(ds) == 3


def test_target_transform(srv_hdf5) -> None:
    ds = GraphDataset(hdf5_path=srv_hdf5, target="irmsd", target_transform=True)
    y = ds.get(1)["y"]
    assert 0 <= y <= 1


def test_target_transform_classif_raises(srv_hdf5) -> None:
    ds = GraphDataset(hdf5_path=srv_hdf5, target="binary", target_transform=True)
    with pytest.raises(ValueError, match="Sigmoid"):
        ds.get(0)


def test_task_inference(srv_hdf5) -> None:
    assert GraphDataset(hdf5_path=srv_hdf5, target="binary").task == "classif"
    assert GraphDataset(hdf5_path=srv_hdf5, target="irmsd").task == "regress"
    ds = GraphDataset(hdf5_path=srv_hdf5, target="binary")
    assert ds.classes == [0, 1]
    assert ds.classes_to_index == {0: 0, 1: 1}


def test_user_task_conflict_warns(srv_hdf5) -> None:
    with pytest.warns(UserWarning):
        ds = GraphDataset(hdf5_path=srv_hdf5, target="binary", task="regress")
    assert ds.task == "classif"


def test_inheritance_from_dataset(srv_hdf5) -> None:
    train = GraphDataset(
        hdf5_path=srv_hdf5,
        target="binary",
        node_features=["res_mass"],
        edge_features=["distance"],
    )
    val = GraphDataset(hdf5_path=srv_hdf5, train_source=train)
    assert val.node_features == ["res_mass"]
    assert val.edge_features == ["distance"]
    assert val.target == "binary"
    assert val.task == "classif"


def test_inheritance_standardization(srv_hdf5) -> None:
    train = GraphDataset(
        hdf5_path=srv_hdf5,
        target="binary",
        node_features=["res_mass"],
        features_transform={"res_mass": {"standardize": True}},
    )
    val = GraphDataset(hdf5_path=srv_hdf5, train_source=train)
    assert val.means == train.means
    assert val.devs == train.devs


def test_transform_standardize_combined(srv_hdf5) -> None:
    """transform + standardize on the same feature: means/devs are computed on
    the TRANSFORMED values and standardization applies after the transform
    (reference tests/test_dataset.py:989, dataset.py:448)."""
    transform = lambda t: np.log(t + 10)  # noqa: E731
    ds = GraphDataset(
        hdf5_path=srv_hdf5,
        target="binary",
        node_features=["res_mass"],
        features_transform={"res_mass": {"transform": transform, "standardize": True}},
    )
    raw = GraphDataset(hdf5_path=srv_hdf5, target="binary", node_features=["res_mass"])
    vals = np.concatenate([transform(raw.get(i)["x"][:, 0]) for i in range(len(raw))])
    # means/devs are rounded to 1 decimal (reference parity, dataset.py:448)
    mean, dev = round(float(vals.mean()), 1), round(float(vals.std()), 1)
    assert ds.means["res_mass"] == mean
    got = ds.get(0)["x"][:, 0]
    want = (transform(raw.get(0)["x"][:, 0]) - mean) / dev
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_grid_inheritance_from_dataset(grid_hdf5) -> None:
    """Grid val/test datasets force-inherit features/target/task from the
    train dataset (reference tests/test_dataset.py:241)."""
    train = GridDataset(hdf5_path=grid_hdf5, target="binary", features=["res_mass"])
    val = GridDataset(hdf5_path=grid_hdf5, train_source=train)
    assert val.features == train.features
    assert val.target == "binary"
    assert val.task == "classif"
    assert val.get(0)["x"].shape == train.get(0)["x"].shape


def test_no_target_dataset_graphdataset(tmp_path, srv_hdf5) -> None:
    """A dataset without the requested target loads with y=None when a
    train_source provides the config (test-time inference on unlabeled data,
    reference tests/test_dataset.py:1238); without train_source it errors."""
    import shutil

    no_target = str(tmp_path / "no_target.hdf5")
    shutil.copy(srv_hdf5, no_target)
    with h5py.File(no_target, "a") as f:
        for name in f:
            for t in list(f[name]["target_values"].keys()):
                del f[name][f"target_values/{t}"]

    train = GraphDataset(hdf5_path=srv_hdf5, target="binary")
    ds = GraphDataset(hdf5_path=no_target, train_source=train)
    assert ds.get(0)["y"] is None

    # no target set / target absent, training mode: error at dataset creation
    # (reference tests/test_dataset.py:1252-1260)
    with pytest.raises(ValueError):
        GraphDataset(hdf5_path=no_target)
    with pytest.raises(ValueError):
        GraphDataset(hdf5_path=no_target, target="binary")


def test_no_target_dataset_griddataset(tmp_path, grid_hdf5) -> None:
    import shutil

    no_target = str(tmp_path / "no_target_grid.hdf5")
    shutil.copy(grid_hdf5, no_target)
    with h5py.File(no_target, "a") as f:
        for name in f:
            for t in list(f[name]["target_values"].keys()):
                del f[name][f"target_values/{t}"]

    train = GridDataset(hdf5_path=grid_hdf5, target="binary")
    ds = GridDataset(hdf5_path=no_target, train_source=train)
    assert ds.get(0)["y"] is None


def test_invalid_train_source(srv_hdf5) -> None:
    with pytest.raises(TypeError):
        GraphDataset(hdf5_path=srv_hdf5, train_source=42)


def test_invalid_hdf5_path_type() -> None:
    with pytest.raises(TypeError):
        GraphDataset(hdf5_path=42, target="binary")


def test_save_hdf5_keys_external_links(tmp_path, srv_hdf5) -> None:
    with h5py.File(srv_hdf5) as f:
        names = list(f.keys())[:2]
    dest = str(tmp_path / "links.hdf5")
    save_hdf5_keys(srv_hdf5, names, dest)
    with h5py.File(dest) as f:
        assert set(f.keys()) == set(names)
        assert isinstance(f.get(names[0], getlink=True), h5py.ExternalLink)
    ds = GraphDataset(hdf5_path=dest, target="binary")
    assert len(ds) == 2
    assert ds.get(0)["x"] is not None


def test_save_hdf5_keys_hardcopy(tmp_path, srv_hdf5) -> None:
    with h5py.File(srv_hdf5) as f:
        names = list(f.keys())[:2]
    dest = str(tmp_path / "hard.hdf5")
    save_hdf5_keys(srv_hdf5, names, dest, hardcopy=True)
    with h5py.File(dest) as f:
        assert isinstance(f.get(names[0], getlink=True), h5py.HardLink)
    ds = GraphDataset(hdf5_path=dest, target="binary")
    assert len(ds) == 2


def test_hdf5_to_pandas(srv_hdf5) -> None:
    ds = GraphDataset(hdf5_path=srv_hdf5, target="binary", node_features=["res_mass", "polarity"])
    df = ds.hdf5_to_pandas()
    assert len(df) == len(ds)
    assert "res_mass" in df.columns
    assert "polarity_0" in df.columns  # multi-channel split


def test_save_hist(tmp_path, srv_hdf5) -> None:
    ds = GraphDataset(hdf5_path=srv_hdf5, target="binary", node_features=["res_mass"])
    fname = str(tmp_path / "hist.png")
    ds.save_hist(["res_mass"], fname=fname)
    import os

    assert os.path.getsize(fname) > 0


def test_grid_dataset(grid_hdf5) -> None:
    ds = GridDataset(hdf5_path=grid_hdf5, target="binary")
    entry = ds.get(0)
    assert entry["x"].ndim == 4
    assert entry["x"].shape[1:] == (10, 10, 10)
    assert entry["y"] in (0.0, 1.0)


def test_grid_feature_selection(grid_hdf5) -> None:
    ds = GridDataset(hdf5_path=grid_hdf5, target="binary", features=["res_mass"])
    assert ds.features == ["res_mass"]
    assert ds.get(0)["x"].shape[0] == 1


def test_grid_partial_feature_names(grid_hdf5) -> None:
    """Channel-suffixed names (polarity_003) select the whole feature."""
    ds = GridDataset(hdf5_path=grid_hdf5, target="binary", features=["polarity_003"])
    assert all(f.startswith("polarity_") for f in ds.features)
    assert len(ds.features) == 4


def test_grid_missing_feature_raises(grid_hdf5) -> None:
    with pytest.raises(ValueError, match="nonexistent"):
        GridDataset(hdf5_path=grid_hdf5, target="binary", features=["nonexistent"])


def test_empty_file_dropped(tmp_path, srv_hdf5) -> None:
    empty = str(tmp_path / "empty.hdf5")
    with h5py.File(empty, "w"):
        pass
    ds = GraphDataset(hdf5_path=[srv_hdf5, empty], target="binary")
    assert ds.hdf5_paths == [srv_hdf5]


def test_multi_file(tmp_path, srv_hdf5) -> None:
    import shutil

    second = str(tmp_path / "second.hdf5")
    shutil.copy(srv_hdf5, second)
    ds = GraphDataset(hdf5_path=[srv_hdf5, second], target="binary")
    single = GraphDataset(hdf5_path=srv_hdf5, target="binary")
    assert len(ds) == 2 * len(single)


def test_grid_target_filter(grid_hdf5) -> None:
    """Target filter conditions apply to grid datasets too (reference: test_filter_griddataset)."""
    from deeprank2_tpu.dataset import GridDataset

    ds_all = GridDataset(hdf5_path=grid_hdf5, target="irmsd", task="regress")
    ds_low = GridDataset(hdf5_path=grid_hdf5, target="irmsd", task="regress", target_filter={"irmsd": "<2"})
    assert 0 < len(ds_low) < len(ds_all)


def test_incompatible_train_source_type(srv_hdf5, grid_hdf5) -> None:
    """A grid dataset cannot inherit from a graph dataset and vice versa."""
    from deeprank2_tpu.dataset import GraphDataset, GridDataset

    graph_ds = GraphDataset(hdf5_path=srv_hdf5, target="binary")
    with pytest.raises(TypeError):
        GridDataset(hdf5_path=grid_hdf5, train_source=graph_ds)


def test_invalid_pretrained_path(srv_hdf5, tmp_path) -> None:
    bad = tmp_path / "not_a_model.pth.tar"
    bad.write_bytes(b"garbage")
    from deeprank2_tpu.dataset import GraphDataset

    with pytest.raises(ValueError):
        GraphDataset(hdf5_path=srv_hdf5, train_source=str(bad))
