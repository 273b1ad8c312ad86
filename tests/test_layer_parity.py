"""Per-layer numerical parity with the reference layer math.

Each reference conv layer's equation (SURVEY §2.1 / the papers) is
re-implemented here in torch, weights are shared with the JAX layers, and
activations must match to float tolerance on identical random graphs. This is
the BASELINE 'per-layer allclose' gate.
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp


@pytest.fixture
def graph():
    rng = np.random.default_rng(0)
    num_nodes, num_edges, feat, efeat = 30, 120, 11, 3
    x = rng.normal(size=(num_nodes, feat)).astype(np.float32)
    # mirrored directed edges like the dataset loader produces
    und = rng.integers(0, num_nodes, size=(num_edges // 2, 2))
    und = und[und[:, 0] != und[:, 1]]
    edges = np.concatenate([und, und[:, ::-1]]).T  # [2, E]
    ea = rng.normal(size=(edges.shape[1], efeat)).astype(np.float32)
    return x, edges.astype(np.int64), ea


def _batch_from(x, edges, ea):
    """A GraphBatch with exact sizes (no padding) for single-layer tests."""
    from deeprank2_tpu.ops.batch import GraphBatch

    num_nodes = x.shape[0]
    num_edges = edges.shape[1]
    return GraphBatch(
        x=jnp.asarray(x),
        edge_index=jnp.asarray(edges.astype(np.int32)),
        edge_attr=jnp.asarray(ea),
        pos=jnp.zeros((num_nodes, 3), jnp.float32),
        node_graph=jnp.zeros(num_nodes, jnp.int32),
        edge_mask=jnp.ones(num_edges, bool),
        node_mask=jnp.ones(num_nodes, bool),
        y=jnp.zeros(1),
        y_mask=jnp.ones(1, bool),
        cluster0=jnp.zeros(num_nodes, jnp.int32),
        cluster1=jnp.zeros(num_nodes, jnp.int32),
        num_graphs=1,
    )


def test_ginet_conv_parity(graph) -> None:
    """GINetConv: alpha = softmax_dim1(leaky_relu(W_a [Wx_row || Wx_col || W_e e]));
    out = scatter_sum(alpha * Wx_col, row). (reference ginet.py:40-60)"""
    from deeprank2_tpu.neuralnets.gnn.ginet import ginet_conv, init_ginet_conv

    x, edges, ea = graph
    out_dim = 7
    params = init_ginet_conv(jax.random.PRNGKey(1), x.shape[1], out_dim, ea.shape[1])
    out_jax = np.asarray(
        ginet_conv(params, jnp.asarray(x), jnp.asarray(edges), jnp.asarray(ea), jnp.ones(edges.shape[1], bool))
    )

    # torch re-implementation of the reference equation
    tx = torch.tensor(x)
    tw = torch.tensor(np.asarray(params["fc"]["w"]))
    twe = torch.tensor(np.asarray(params["fc_edge_attr"]["w"]))
    twa = torch.tensor(np.asarray(params["fc_attention"]["w"]))
    row, col = torch.tensor(edges)
    xrow = tx[row] @ tw
    xcol = tx[col] @ tw
    ed = torch.tensor(ea) @ twe
    alpha = torch.cat([xrow, xcol, ed], dim=1) @ twa
    alpha = torch.nn.functional.leaky_relu(alpha)
    alpha = torch.softmax(alpha, dim=1)  # [E,1] -> ones
    h = alpha * xcol
    out_torch = torch.zeros(x.shape[0], out_dim)
    out_torch.index_add_(0, row, h)

    assert np.allclose(out_jax, out_torch.numpy(), atol=1e-4)


def test_fout_layer_parity(graph) -> None:
    """FoutLayer: z = x Wc + mean_{j in N(i)} (x Wn)_j + b. (reference foutnet.py:48-68)"""
    from deeprank2_tpu.neuralnets.gnn.foutnet import fout_layer, init_fout_layer

    x, edges, ea = graph
    out_dim = 5
    params = init_fout_layer(jax.random.PRNGKey(2), x.shape[1], out_dim)
    out_jax = np.asarray(fout_layer(params, jnp.asarray(x), jnp.asarray(edges), jnp.ones(edges.shape[1], bool)))

    tx = torch.tensor(x)
    wc = torch.tensor(np.asarray(params["wc"]))
    wn = torch.tensor(np.asarray(params["wn"]))
    b = torch.tensor(np.asarray(params["b"]))
    alpha = tx @ wc
    beta = tx @ wn
    gamma = torch.zeros(x.shape[0], out_dim)
    edge_t = torch.tensor(edges)
    for n in range(x.shape[0]):
        index = edge_t[:, edge_t[0, :] == n][1, :]
        if len(index):  # (empty -> reference NaN; our segment-mean gives 0)
            gamma[n] = beta[index].mean(dim=0)
    out_torch = alpha + gamma + b

    has_neighbors = np.isin(np.arange(x.shape[0]), edges[0])
    assert np.allclose(out_jax[has_neighbors], out_torch.numpy()[has_neighbors], atol=1e-4)


def test_sgat_layer_parity(graph) -> None:
    """SGraphAttentionLayer: z_i = mean_j(e_ij * ([x_i || x_j] W)) + b with
    single-channel edge attr. (reference sgat.py:56-84)"""
    from deeprank2_tpu.neuralnets.gnn.sgat import init_sgat_layer, sgat_layer

    x, edges, ea = graph
    ea1 = ea[:, :1]  # single edge channel (broadcastable like the reference)
    out_dim = 6
    params = init_sgat_layer(jax.random.PRNGKey(3), x.shape[1], out_dim)
    out_jax = np.asarray(sgat_layer(params, jnp.asarray(x), jnp.asarray(edges), jnp.asarray(ea1), jnp.ones(edges.shape[1], bool)))

    tx = torch.tensor(x)
    w = torch.tensor(np.asarray(params["weight"]))
    b = torch.tensor(np.asarray(params["b"]))
    row, col = torch.tensor(edges)
    alpha = torch.cat([tx[row], tx[col]], dim=-1) @ w
    alpha = torch.tensor(ea1) * alpha
    out_t = torch.zeros(x.shape[0], out_dim)
    counts = torch.zeros(x.shape[0]).index_add_(0, row, torch.ones(len(row)))
    out_t = out_t.index_add_(0, row, alpha) / counts.clamp(min=1)[:, None]
    out_t = out_t + b

    has_neighbors = np.isin(np.arange(x.shape[0]), edges[0])
    assert np.allclose(out_jax[has_neighbors], out_t.numpy()[has_neighbors], atol=1e-4)


def test_vanilla_conv_parity(graph) -> None:
    """VanillaConv: messages = MLP([x_row || x_col || e]); node MLP over
    [x || scatter_sum(messages, row)]. (reference vanilla_gnn.py:26-38)"""
    from deeprank2_tpu.neuralnets.gnn.vanilla_gnn import MESSAGE_SIZE, VanillaNetwork

    x, edges, ea = graph
    model = VanillaNetwork(x.shape[1], 2, ea.shape[1])
    params = model.init(jax.random.PRNGKey(4))
    batch = _batch_from(x, edges, ea)
    out_jax = np.asarray(model._conv(params["external1"], batch.x, batch))

    p = params["external1"]
    we = torch.tensor(np.asarray(p["edge_mlp"]["w"]))
    be = torch.tensor(np.asarray(p["edge_mlp"]["b"]))
    wn = torch.tensor(np.asarray(p["node_mlp"]["w"]))
    bn = torch.tensor(np.asarray(p["node_mlp"]["b"]))
    tx = torch.tensor(x)
    row, col = torch.tensor(edges)
    message_input = torch.cat([tx[row], tx[col], torch.tensor(ea)], dim=1)
    messages = torch.relu(message_input @ we + be)
    sums = torch.zeros(x.shape[0], MESSAGE_SIZE).index_add_(0, row, messages)
    out_torch = torch.relu(torch.cat([tx, sums], dim=1) @ wn + bn)

    assert np.allclose(out_jax, out_torch.numpy(), atol=1e-4)


def test_cnn_conv_parity() -> None:
    """Conv3d + MaxPool3d stack matches torch's on identical weights."""
    from deeprank2_tpu.neuralnets.cnn.model3d import CnnRegression
    from deeprank2_tpu.ops.batch import GridBatch

    rng = np.random.default_rng(5)
    x = rng.normal(size=(2, 3, 10, 10, 10)).astype(np.float32)
    model = CnnRegression(3, (10, 10, 10))
    params = model.init(jax.random.PRNGKey(6))
    batch = GridBatch(x=jnp.asarray(x), y=jnp.zeros(2), y_mask=jnp.ones(2, bool))
    out_jax = np.asarray(model.apply(params, batch))

    tconv1 = torch.nn.Conv3d(3, 4, 2)
    tconv1.weight.data = torch.tensor(np.asarray(params["conv000"]["w"]))
    tconv1.bias.data = torch.tensor(np.asarray(params["conv000"]["b"]))
    tconv2 = torch.nn.Conv3d(4, 5, 2)
    tconv2.weight.data = torch.tensor(np.asarray(params["conv002"]["w"]))
    tconv2.bias.data = torch.tensor(np.asarray(params["conv002"]["b"]))
    pool = torch.nn.MaxPool3d(2)
    with torch.no_grad():
        h = pool(torch.relu(tconv1(torch.tensor(x))))
        h = pool(torch.relu(tconv2(h)))
        h = h.reshape(2, -1)
        h = torch.relu(h @ torch.tensor(np.asarray(params["fc000"]["w"])) + torch.tensor(np.asarray(params["fc000"]["b"])))
        out_torch = h @ torch.tensor(np.asarray(params["fc001"]["w"])) + torch.tensor(np.asarray(params["fc001"]["b"]))

    assert np.allclose(out_jax, out_torch.numpy(), atol=1e-3)


def test_ginet_dense_matches_coo() -> None:
    """GINetDense (block-dense MXU path) == no-cluster GINet (COO path):
    same params, same graphs, equal outputs and equal parameter gradients."""
    from deeprank2_tpu.neuralnets.gnn.ginet_dense import GINetDense
    from deeprank2_tpu.neuralnets.gnn.ginet_nocluster import GINet
    from deeprank2_tpu.ops.batch import collate_graphs, collate_graphs_dense
    from deeprank2_tpu.ops.synthetic import synthetic_entries

    entries = synthetic_entries(6, 20, feat_dim=11, edge_dim=3, seed=3)
    coo_batch, _ = collate_graphs(entries)
    dense_batch, _ = collate_graphs_dense(entries)

    coo_model = GINet(11, 2, 3)
    dense_model = GINetDense(11, 2, 3)
    params = coo_model.init(jax.random.PRNGKey(0))

    out_coo = coo_model.apply(params, coo_batch)
    out_dense = dense_model.apply(params, dense_batch)
    np.testing.assert_allclose(np.asarray(out_coo), np.asarray(out_dense), rtol=2e-4, atol=1e-5)

    def loss_coo(p):
        return (coo_model.apply(p, coo_batch) ** 2).sum()

    def loss_dense(p):
        return (dense_model.apply(p, dense_batch) ** 2).sum()

    from jax.flatten_util import ravel_pytree

    g_coo = jax.grad(loss_coo)(params)
    g_dense = jax.grad(loss_dense)(params)
    flat_coo, _ = ravel_pytree(g_coo)
    flat_dense, _ = ravel_pytree(g_dense)
    np.testing.assert_allclose(np.asarray(flat_coo), np.asarray(flat_dense), rtol=2e-3, atol=1e-4)


@pytest.mark.parametrize("family", ["ginet", "fout", "sgat"])
def test_clustered_dense_matches_coo(family) -> None:
    """Dense clustered pipelines (one-hot C^T A C pooling) == COO community
    pooling: same params, same graphs + preclusters, equal outputs."""
    from deeprank2_tpu.ops.batch import collate_graphs, collate_graphs_dense
    from deeprank2_tpu.ops.synthetic import synthetic_entries

    entries = synthetic_entries(5, 24, feat_dim=9, edge_dim=1, seed=11)
    coo_batch, _ = collate_graphs(entries)
    dense_batch, _ = collate_graphs_dense(entries, with_clusters=True, with_edge_weights=True)

    if family == "ginet":
        from deeprank2_tpu.neuralnets.gnn.ginet import GINet as Coo
        from deeprank2_tpu.neuralnets.gnn.ginet_dense import GINetClusteredDense as Dense
    elif family == "fout":
        from deeprank2_tpu.neuralnets.gnn.foutnet import FoutNet as Coo
        from deeprank2_tpu.neuralnets.gnn.foutnet import FoutNetDense as Dense
    else:
        from deeprank2_tpu.neuralnets.gnn.sgat import SGAT as Coo
        from deeprank2_tpu.neuralnets.gnn.sgat import SGATDense as Dense

    coo_model = Coo(9, 2, 1)
    dense_model = Dense(9, 2, 1)
    params = coo_model.init(jax.random.PRNGKey(0))
    out_coo = np.asarray(coo_model.apply(params, coo_batch))
    out_dense = np.asarray(dense_model.apply(params, dense_batch))
    np.testing.assert_allclose(out_coo, out_dense, rtol=2e-4, atol=1e-5)
