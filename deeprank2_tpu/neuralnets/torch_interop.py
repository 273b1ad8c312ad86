"""Translate reference (PyTorch) model state_dicts into our parameter pytrees.

Lets models trained with the reference framework run here unchanged:
``Trainer(GINet, dataset_test=..., pretrained_model="reference_model.pth.tar")``.
Key layouts come from the reference module definitions (file:line cited per
family); ``torch.nn.Linear`` stores ``weight [out, in]`` — transposed into our
``w [in, out]`` — while raw ``nn.Parameter`` matrices and Conv3d kernels
(``[out, in, k, k, k]``, same as our ``nn.init_conv3d``) copy through.
"""

from __future__ import annotations

import numpy as np


def _lin(state: dict, prefix: str) -> dict:
    """torch Linear ``{prefix}.weight[ + .bias]`` -> ``{"w", ["b"]}``."""
    params = {"w": np.ascontiguousarray(np.asarray(state[f"{prefix}.weight"]).T)}
    if f"{prefix}.bias" in state:
        params["b"] = np.asarray(state[f"{prefix}.bias"])
    return params


def _vanilla(state: dict) -> dict:
    # reference neuralnets/gnn/vanilla_gnn.py:10-65 (_edge_mlp/_node_mlp are
    # single-Linear nn.Sequentials -> index 0)
    def layer(name):
        return {"edge_mlp": _lin(state, f"{name}._edge_mlp.0"), "node_mlp": _lin(state, f"{name}._node_mlp.0")}

    return {
        "external1": layer("_external1"),
        "external2": layer("_external2"),
        "graph_mlp": {"fc1": _lin(state, "_graph_mlp.0"), "fc2": _lin(state, "_graph_mlp.2")},
    }


def _ginet(state: dict) -> dict:
    # reference neuralnets/gnn/ginet.py:26-88 / ginet_nocluster.py (identical
    # parameter names); the dense variants share this pytree.
    def conv(name):
        return {
            "fc": _lin(state, f"{name}.fc"),
            "fc_edge_attr": _lin(state, f"{name}.fc_edge_attr"),
            "fc_attention": _lin(state, f"{name}.fc_attention"),
        }

    return {
        "conv1": conv("conv1"),
        "conv2": conv("conv2"),
        "conv1_ext": conv("conv1_ext"),
        "conv2_ext": conv("conv2_ext"),
        "fc1": _lin(state, "fc1"),
        "fc2": _lin(state, "fc2"),
    }


def _foutnet(state: dict) -> dict:
    # reference neuralnets/gnn/foutnet.py:28-95 (wc/wn are [in, out] Parameters)
    def conv(name):
        params = {"wc": np.asarray(state[f"{name}.wc"]), "wn": np.asarray(state[f"{name}.wn"])}
        if f"{name}.bias" in state:
            params["b"] = np.asarray(state[f"{name}.bias"])
        return params

    return {"conv1": conv("conv1"), "conv2": conv("conv2"), "fc1": _lin(state, "fc1"), "fc2": _lin(state, "fc2")}


def _sgat(state: dict) -> dict:
    # reference neuralnets/gnn/sgat.py:38-113 (weight is a [2*in, out] Parameter)
    def conv(name):
        params = {"weight": np.asarray(state[f"{name}.weight"])}
        if f"{name}.bias" in state:
            params["b"] = np.asarray(state[f"{name}.bias"])
        return params

    return {"conv1": conv("conv1"), "conv2": conv("conv2"), "fc1": _lin(state, "fc1"), "fc2": _lin(state, "fc2")}


def _cnn(state: dict) -> dict:
    # reference neuralnets/cnn/model3d.py:39-47,101-109 (Conv3d kernels share
    # our [out, in, k, k, k] layout; flatten order matches NCDHW .view)
    def conv(name):
        return {"w": np.asarray(state[f"{name}.weight"]), "b": np.asarray(state[f"{name}.bias"])}

    return {
        "conv000": conv("convlayer_000"),
        "conv002": conv("convlayer_002"),
        "fc000": _lin(state, "fclayer_000"),
        "fc001": _lin(state, "fclayer_001"),
    }


_TRANSLATORS = {
    "VanillaNetwork": _vanilla,
    "GINet": _ginet,
    "GINetDense": _ginet,
    "GINetClusteredDense": _ginet,
    "FoutNet": _foutnet,
    "FoutNetDense": _foutnet,
    "SGAT": _sgat,
    "SGATDense": _sgat,
    "CnnRegression": _cnn,
    "CnnClassification": _cnn,
}


def translate_state_dict(neuralnet_name: str, state: dict, template: dict | None = None) -> dict:
    """Convert a flat reference state_dict (numpy values) into our params.

    ``template`` (a freshly initialized params pytree) validates shapes when
    given.
    """
    translator = _TRANSLATORS.get(neuralnet_name)
    if translator is None:
        msg = (
            f"Cannot import a reference (PyTorch) checkpoint for {neuralnet_name}; "
            f"supported architectures: {sorted(_TRANSLATORS)}."
        )
        raise ValueError(msg)
    params = translator(state)
    if template is not None:
        _check_shapes(template, params, neuralnet_name)
    return params


def _check_shapes(template: dict, params: dict, name: str, path: str = "") -> None:
    for key, tval in template.items():
        where = f"{path}{key}"
        if key not in params:
            msg = f"reference checkpoint for {name} is missing parameter {where}"
            raise ValueError(msg)
        pval = params[key]
        if isinstance(tval, dict):
            _check_shapes(tval, pval, name, where + ".")
        elif tuple(np.shape(tval)) != tuple(np.shape(pval)):
            msg = f"reference checkpoint parameter {where} has shape {np.shape(pval)}, expected {np.shape(tval)}"
            raise ValueError(msg)
