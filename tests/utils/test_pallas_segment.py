"""Correctness of the Pallas segment-sum kernel (interpret mode on CPU;
the TPU path is exercised by bench.py / perf runs)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jax.experimental.pallas import tpu as pltpu


def _oracle(msgs, rows, num_segments):
    out = np.zeros((num_segments, msgs.shape[1]), np.float32)
    for r, m in zip(rows, msgs):
        if 0 <= r < num_segments:
            out[r] += m
    return out


@pytest.mark.parametrize("seed", [0, 1])
def test_segment_sum_sorted_interpret(seed) -> None:
    from deeprank2_tpu.ops.pallas_segment import segment_sum_sorted

    rng = np.random.default_rng(seed)
    num_edges, num_segments, feat = 4096, 600, 32
    rows = np.sort(rng.integers(0, num_segments, size=num_edges)).astype(np.int32)
    rows[-64:] = num_segments + 7  # padded edges, OOB, sorted last
    msgs = rng.normal(size=(num_edges, feat)).astype(np.float32)

    try:
        with pltpu.force_tpu_interpret_mode():
            out = segment_sum_sorted(jnp.asarray(msgs), jnp.asarray(rows), num_segments)
            out = np.asarray(out)
    except Exception as e:  # pragma: no cover - interpreter support varies by version
        pytest.skip(f"pallas interpret mode unavailable here: {e}")

    assert np.allclose(out, _oracle(msgs, rows, num_segments), atol=1e-4)


def test_pallas_segment_sum_unsorted_interpret() -> None:
    from deeprank2_tpu.ops.pallas_segment import pallas_segment_sum

    rng = np.random.default_rng(3)
    num_edges, num_segments, feat = 2048, 300, 16
    rows = rng.integers(0, num_segments, size=num_edges).astype(np.int32)
    msgs = rng.normal(size=(num_edges, feat)).astype(np.float32)

    try:
        with pltpu.force_tpu_interpret_mode():
            out = np.asarray(pallas_segment_sum(jnp.asarray(msgs), jnp.asarray(rows), num_segments))
    except Exception as e:  # pragma: no cover
        pytest.skip(f"pallas interpret mode unavailable here: {e}")

    assert np.allclose(out, _oracle(msgs, rows, num_segments), atol=1e-4)


def test_model_forward_matches_with_pallas_backend() -> None:
    """GINet forward is identical with the Pallas segment backend (interpret mode)."""
    from deeprank2_tpu.neuralnets.gnn.ginet_nocluster import GINet
    from deeprank2_tpu.ops import segment
    from deeprank2_tpu.ops.batch import collate_graphs
    from deeprank2_tpu.ops.synthetic import synthetic_entries

    model = GINet(12, 2, 3)
    params = model.init(jax.random.PRNGKey(0))
    batch, _ = collate_graphs(synthetic_entries(2, 24, 12, 3), pad_graphs=2)

    ref = np.asarray(model.apply(params, batch))
    try:
        segment.set_segment_backend("pallas")
        # the backend only engages on TPU; force engagement via a fake default
        import unittest.mock as mock

        with mock.patch.object(jax, "default_backend", lambda: "tpu"), pltpu.force_tpu_interpret_mode():
            out = np.asarray(model.apply(params, batch))
    except Exception as e:  # pragma: no cover
        pytest.skip(f"pallas interpret mode unavailable here: {e}")
    finally:
        segment.set_segment_backend("xla")
    assert np.allclose(out, ref, atol=1e-4)


def test_set_segment_backend_validates() -> None:
    from deeprank2_tpu.ops import segment

    with pytest.raises(ValueError):
        segment.set_segment_backend("cuda")
