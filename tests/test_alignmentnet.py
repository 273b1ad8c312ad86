"""AlignmentGNN smoke + shape tests (reference: neuralnets/gnn/alignmentnet.py —
standalone research model with a nonstandard forward, not Trainer-compatible)."""

import numpy as np

import jax
import jax.numpy as jnp

from deeprank2_tpu.neuralnets.gnn.alignmentnet import AlignmentGNN


def _model():
    return AlignmentGNN(
        nmb_edge_attr=3,
        nmb_node_attr=7,
        nmb_output_features=4,
        nmb_hidden_attr=16,
        message_vector_length=8,
        nmb_mlp_neurons=16,
        nmb_gnn_layers=3,
        nmb_edge_projection=8,
    )


def _graph(rng, num_nodes=20, num_edges=60):
    edges = rng.integers(0, num_nodes, size=(2, num_edges))
    edge_attr = rng.normal(size=(num_edges, 3)).astype(np.float32)
    node_attr = rng.normal(size=(num_nodes, 7)).astype(np.float32)
    return jnp.asarray(edges), jnp.asarray(edge_attr), jnp.asarray(node_attr)


def test_forward_shapes_and_gradients() -> None:
    model = _model()
    params = model.init(jax.random.PRNGKey(0))
    edges, edge_attr, node_attr = _graph(np.random.default_rng(0))

    out, attention = model.forward(params, edges, edge_attr, node_attr)
    assert out.shape == (20, 4)
    assert attention.shape == (20, 1)
    assert np.isfinite(np.asarray(out)).all()
    # attention head is sigmoid-bounded
    att = np.asarray(attention)
    assert (att >= 0).all() and (att <= 1).all()

    def loss(p):
        o, _ = model.forward(p, edges, edge_attr, node_attr)
        return (o**2).mean()

    grads = jax.grad(loss)(params)
    from jax.flatten_util import ravel_pytree

    flat, _ = ravel_pytree(grads)
    assert np.isfinite(np.asarray(flat)).all()
    assert float(np.abs(np.asarray(flat)).max()) > 0


def test_forward_jittable() -> None:
    model = _model()
    params = model.init(jax.random.PRNGKey(1))
    edges, edge_attr, node_attr = _graph(np.random.default_rng(1))
    jitted = jax.jit(model.forward)
    out1, _ = jitted(params, edges, edge_attr, node_attr)
    out2, _ = model.forward(params, edges, edge_attr, node_attr)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), rtol=1e-5, atol=1e-6)
