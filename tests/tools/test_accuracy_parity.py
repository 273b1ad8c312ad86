"""Smoke test for the accuracy-parity harness (VERDICT r1 item 3): two
configs, two epochs, on the vendored corpus — asserts the JAX and torch-mirror
loss trajectories stay in lockstep and metrics agree. The full run is
`python -m deeprank2_tpu.tools.accuracy_parity` (recorded in PARITY.md)."""

import numpy as np
import pytest

import jax


@pytest.fixture(scope="module", autouse=True)
def _exact_f32():
    jax.config.update("jax_default_matmul_precision", "highest")
    yield
    jax.config.update("jax_default_matmul_precision", None)


def test_parity_harness_smoke(data_path, tmp_path) -> None:
    from deeprank2_tpu.tools.accuracy_parity import run_all

    reports = run_all(data_path, tmp_path, ["vanilla_srv_regress", "ginet_edgepart_ba"], epochs=2)
    assert len(reports) == 2
    for r in reports:
        assert r["max_loss_delta"] < 1e-3, r
        for k, v in r["metrics_jax"].items():
            tv = r["metrics_torch"][k]
            assert np.isclose(v, tv, rtol=1e-2, atol=1e-3), (r["config"], k, v, tv)


def test_metric_helpers() -> None:
    from deeprank2_tpu.tools.accuracy_parity import binary_auc, binary_mcc

    scores = np.array([0.9, 0.8, 0.3, 0.2])
    labels = np.array([1, 1, 0, 0])
    assert binary_auc(scores, labels) == 1.0
    assert binary_auc(scores, 1 - labels) == 0.0
    assert binary_auc(np.array([0.5, 0.5, 0.5, 0.5]), labels) == 0.5
    assert binary_mcc(np.array([1, 1, 0, 0]), labels) == 1.0
    assert binary_mcc(np.array([0, 0, 1, 1]), labels) == -1.0
