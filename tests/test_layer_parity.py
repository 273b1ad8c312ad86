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


def test_ginet_dense_bf16_tracks_f32() -> None:
    """GINetDense(compute_dtype=bfloat16) stays within bf16 tolerance of the
    f32 tower, forward and gradients (the training default on TPU)."""
    from jax.flatten_util import ravel_pytree

    from deeprank2_tpu.neuralnets.gnn.ginet_dense import GINetDense
    from deeprank2_tpu.ops.batch import collate_graphs_dense
    from deeprank2_tpu.ops.synthetic import synthetic_entries

    entries = synthetic_entries(6, 20, feat_dim=11, edge_dim=3, seed=5)
    batch, _ = collate_graphs_dense(entries)

    f32_model = GINetDense(11, 2, 3)
    bf16_model = GINetDense(11, 2, 3, compute_dtype=jnp.bfloat16)
    params = f32_model.init(jax.random.PRNGKey(0))

    out_f32 = np.asarray(f32_model.apply(params, batch))
    out_bf16 = np.asarray(bf16_model.apply(params, batch))
    assert out_bf16.dtype == out_f32.dtype  # output stays f32 (pooling upcast)
    scale = max(1.0, float(np.abs(out_f32).max()))
    np.testing.assert_allclose(out_bf16, out_f32, atol=2e-2 * scale)

    g_f32, _ = ravel_pytree(jax.grad(lambda p: (f32_model.apply(p, batch) ** 2).sum())(params))
    g_bf16, _ = ravel_pytree(jax.grad(lambda p: (bf16_model.apply(p, batch) ** 2).sum())(params))
    g_f32, g_bf16 = np.asarray(g_f32), np.asarray(g_bf16)
    gscale = max(1.0, float(np.abs(g_f32).max()))
    np.testing.assert_allclose(g_bf16, g_f32, atol=4e-2 * gscale)


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


def _torch_ginet_params(params) -> dict:
    """Torch leaf tensors sharing the JAX GINet-nocluster weights (the
    attention/edge weights are omitted: their gradient is identically zero —
    see ginet.py 'reference bug' — so they never move except by decay)."""
    tp = {}
    for tower in ("conv1", "conv2", "conv1_ext", "conv2_ext"):
        tp[tower] = torch.tensor(np.asarray(params[tower]["fc"]["w"]), requires_grad=True)
    for fc in ("fc1", "fc2"):
        tp[fc + ".w"] = torch.tensor(np.asarray(params[fc]["w"]), requires_grad=True)
        tp[fc + ".b"] = torch.tensor(np.asarray(params[fc]["b"]), requires_grad=True)
    return tp


def _torch_ginet_loss(tp: dict, batch) -> torch.Tensor:
    """Reference GINet-nocluster forward + CrossEntropy on a collated batch,
    in torch (mirrors ginet_nocluster.py:84-111 with attention == 1.0)."""
    x = torch.tensor(np.asarray(batch.x))
    row = torch.tensor(np.asarray(batch.edge_index[0]).astype(np.int64))
    col = torch.tensor(np.asarray(batch.edge_index[1]).astype(np.int64))
    emask = torch.tensor(np.asarray(batch.edge_mask))
    nmask = torch.tensor(np.asarray(batch.node_mask))
    ngraph = torch.tensor(np.asarray(batch.node_graph).astype(np.int64))
    num_v = x.shape[0]
    G = batch.num_graphs

    def conv(w, h):
        fcx = h @ w
        msg = fcx[torch.clamp(col, max=num_v - 1)] * emask[:, None]
        out = torch.zeros(num_v, w.shape[1], dtype=h.dtype)
        out.index_add_(0, torch.clamp(row, max=num_v - 1), msg * (row < num_v)[:, None])
        return out

    def tower(w1, w2):
        h = torch.relu(conv(w1, x))
        h = torch.relu(conv(w2, h))
        h = h * nmask[:, None]
        sums = torch.zeros(G, h.shape[1], dtype=h.dtype)
        sums.index_add_(0, torch.clamp(ngraph, max=G - 1), h * (ngraph < G)[:, None])
        counts = torch.zeros(G, dtype=h.dtype)
        counts.index_add_(0, torch.clamp(ngraph, max=G - 1), nmask.to(h.dtype) * (ngraph < G))
        return sums / counts.clamp(min=1.0)[:, None]

    emb = torch.cat([tower(tp["conv1"], tp["conv2"]), tower(tp["conv1_ext"], tp["conv2_ext"])], dim=1)
    h = torch.relu(emb @ tp["fc1.w"] + tp["fc1.b"])
    logits = h @ tp["fc2.w"] + tp["fc2.b"]
    y = torch.tensor(np.asarray(batch.y).astype(np.int64))
    return torch.nn.functional.cross_entropy(logits, y)


def test_full_train_step_parity() -> None:
    """One complete training step (forward, CrossEntropy loss, backward, Adam
    with L2 weight decay) matches a torch re-implementation of the reference
    pipeline: identical updated parameters to float tolerance."""
    from deeprank2_tpu.neuralnets.gnn.ginet_nocluster import GINet
    from deeprank2_tpu.ops.batch import collate_graphs
    from deeprank2_tpu.ops.losses import CrossEntropyLoss
    from deeprank2_tpu.ops.optim import Adam
    from deeprank2_tpu.ops.synthetic import synthetic_entries

    entries = synthetic_entries(4, 16, feat_dim=6, edge_dim=2, seed=21)
    # exact-size batch (no padding): pad_graphs=None and bucketing still pads
    # nodes/edges, but masks make that equivalent; targets 0/1
    batch, _ = collate_graphs(entries)
    model = GINet(6, 2, 2)
    params = model.init(jax.random.PRNGKey(3))
    loss_fn = CrossEntropyLoss()
    optimizer = Adam(lr=1e-3, weight_decay=1e-5)
    opt_state = optimizer.init(params)

    def compute(p):
        pred = model.apply(p, batch, training=False)
        return loss_fn(pred, batch.y.astype(jnp.int32), batch.y_mask)

    loss_jax, grads = jax.value_and_grad(compute)(params)
    new_params, _ = optimizer.step(params, grads, opt_state)

    # ---- torch mirror ----
    tp = _torch_ginet_params(params)
    loss_torch = _torch_ginet_loss(tp, batch)
    assert abs(float(loss_jax) - float(loss_torch.detach())) < 1e-5

    opt = torch.optim.Adam(tp.values(), lr=1e-3, weight_decay=1e-5)
    opt.zero_grad()
    loss_torch.backward()
    opt.step()

    for tower_name in ("conv1", "conv2", "conv1_ext", "conv2_ext"):
        np.testing.assert_allclose(
            np.asarray(new_params[tower_name]["fc"]["w"]), tp[tower_name].detach().numpy(), rtol=1e-4, atol=1e-6
        )
    for fc in ("fc1", "fc2"):
        np.testing.assert_allclose(np.asarray(new_params[fc]["w"]), tp[fc + ".w"].detach().numpy(), rtol=1e-4, atol=1e-6)
        np.testing.assert_allclose(np.asarray(new_params[fc]["b"]), tp[fc + ".b"].detach().numpy(), rtol=1e-4, atol=1e-6)


def test_multi_epoch_train_parity(srv_hdf5) -> None:
    """Three epochs x two batches of REAL featurized data (101M SRV residue
    graphs, components/contact/conservation features): the JAX training loop
    and the torch mirror of the reference pipeline produce the same loss at
    every step and the same final parameters — Adam moments evolving in
    lockstep across steps. In-environment stand-in for the Zenodo benchmark
    accuracy-parity runs (ROADMAP item 1; the sets themselves are
    unreachable from this box)."""
    from deeprank2_tpu.dataset import GraphDataset
    from deeprank2_tpu.neuralnets.gnn.ginet_nocluster import GINet
    from deeprank2_tpu.ops.batch import collate_graphs
    from deeprank2_tpu.ops.losses import CrossEntropyLoss
    from deeprank2_tpu.ops.optim import Adam

    # standardized node features (reference dataset.py:448 _compute_mean_std
    # path) keep activations O(1) so the two f32 trajectories stay comparable.
    # The set avoids one-hot channels (their per-channel dev can round to 0.0
    # -> division by zero, a reference behavior) and substring-colliding
    # names ("polarity" also matches the "diff_polarity_NNN" mean keys in the
    # reference's `if feat in mean_key` lookup, reproduced here).
    feats = ["res_charge", "res_size", "res_mass", "res_pI", "pssm", "info_content"]
    ds = GraphDataset(
        hdf5_path=srv_hdf5,
        target="binary",
        task="classif",
        node_features=feats,
        features_transform={f: {"standardize": True} for f in feats},
    )
    entries = [ds.get(i) for i in range(len(ds))]
    batches = [collate_graphs(entries[i : i + 4])[0] for i in range(0, len(entries), 4)]
    assert len(batches) >= 2  # multiple optimizer steps per epoch

    model = GINet(batches[0].x.shape[1], 2, batches[0].edge_attr.shape[1])
    params = model.init(jax.random.PRNGKey(11))
    loss_fn = CrossEntropyLoss()
    optimizer = Adam(lr=1e-3, weight_decay=1e-5)
    opt_state = optimizer.init(params)

    tp = _torch_ginet_params(params)
    opt = torch.optim.Adam(tp.values(), lr=1e-3, weight_decay=1e-5)

    @jax.jit
    def step(p, s, batch):
        def compute(p):
            pred = model.apply(p, batch, training=False)
            return loss_fn(pred, batch.y.astype(jnp.int32), batch.y_mask)

        loss, grads = jax.value_and_grad(compute)(p)
        p, s = optimizer.step(p, grads, s)
        return p, s, loss

    for _epoch in range(3):
        for batch in batches:
            params, opt_state, loss_jax = step(params, opt_state, batch)
            loss_torch = _torch_ginet_loss(tp, batch)
            opt.zero_grad()
            loss_torch.backward()
            opt.step()
            # relative tolerance: losses can exceed 1 in the first steps
            loss_torch_val = float(loss_torch.detach())
            assert abs(float(loss_jax) - loss_torch_val) < 1e-4 * max(1.0, abs(loss_torch_val))

    for tower_name in ("conv1", "conv2", "conv1_ext", "conv2_ext"):
        np.testing.assert_allclose(
            np.asarray(params[tower_name]["fc"]["w"]), tp[tower_name].detach().numpy(), rtol=5e-4, atol=1e-5
        )
    for fc in ("fc1", "fc2"):
        np.testing.assert_allclose(np.asarray(params[fc]["w"]), tp[fc + ".w"].detach().numpy(), rtol=5e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(params[fc]["b"]), tp[fc + ".b"].detach().numpy(), rtol=5e-4, atol=1e-5)


def _torch_clustered_ginet_loss(tp: dict, entries: list[dict]) -> torch.Tensor:
    """Reference clustered-GINet forward + CrossEntropy in torch, built the
    reference's way — compact (unpadded) concatenated batch, community pooling
    after conv1, max_pool_x on depth-1 clusters after conv2, per-graph mean
    (mirrors ginet.py:90-125 with attention == 1.0). Parity vs our padded
    static-shape pipeline is the point of the comparison."""
    num_graphs = len(entries)
    xs, rows, cols, c0_list, c1_list, graph_of_c0 = [], [], [], [], [], []
    v_off = c0_off = c1_off = 0
    ys = []
    for g, e in enumerate(entries):
        v = e["x"].shape[0]
        xs.append(np.asarray(e["x"], dtype=np.float32))
        und = np.asarray(e["edge_index"], dtype=np.int64)
        rows.append(np.concatenate([und[:, 0], und[:, 1]]) + v_off)
        cols.append(np.concatenate([und[:, 1], und[:, 0]]) + v_off)
        c0 = np.asarray(e["cluster0"], dtype=np.int64)
        c1 = np.asarray(e["cluster1"], dtype=np.int64)
        n_c0, n_c1 = int(c0.max()) + 1, int(c1.max()) + 1
        assert len(c1) == n_c0  # cluster1 is indexed by depth-0 cluster id
        c0_list.append(c0 + c0_off)
        c1_list.append(c1 + c1_off)
        graph_of_c0.append(np.full(n_c0, g))
        ys.append(e["y"])
        v_off, c0_off, c1_off = v_off + v, c0_off + n_c0, c1_off + n_c1

    x = torch.tensor(np.concatenate(xs))
    row = torch.tensor(np.concatenate(rows))
    col = torch.tensor(np.concatenate(cols))
    c0 = torch.tensor(np.concatenate(c0_list))
    c1 = torch.tensor(np.concatenate(c1_list))
    graph_c0 = torch.tensor(np.concatenate(graph_of_c0))
    num_c0, num_c1 = c0_off, c1_off

    # pooled (depth-0) edges: cluster pairs, self-loops dropped, deduped
    # (PyG pool_edge/coalesce semantics; attrs don't matter — attention == 1)
    pc_i, pc_j = c0[row].numpy(), c0[col].numpy()
    keep = pc_i != pc_j
    pooled = np.unique(np.stack([pc_i[keep], pc_j[keep]], axis=1), axis=0)
    prow = torch.tensor(pooled[:, 0])
    pcol = torch.tensor(pooled[:, 1])

    def conv(w, h, r, c, num_v):
        fcx = h @ w
        out = torch.zeros(num_v, w.shape[1], dtype=h.dtype)
        return out.index_add_(0, r, fcx[c])

    def scatter_amax(src, idx, num):
        out = torch.full((num, src.shape[1]), -torch.inf, dtype=src.dtype)
        return out.index_reduce_(0, idx, src, "amax", include_self=False)

    def tower(w1, w2):
        h = torch.relu(conv(w1, x, row, col, x.shape[0]))
        hp = scatter_amax(h, c0, num_c0)  # community pooling: max features
        h2 = torch.relu(conv(w2, hp, prow, pcol, num_c0))
        hq = scatter_amax(h2, c1, num_c1)  # depth-1 max_pool_x
        graph_c1 = torch.full((num_c1,), 0, dtype=torch.int64)
        graph_c1.index_copy_(0, c1, graph_c0)
        sums = torch.zeros(num_graphs, hq.shape[1], dtype=hq.dtype).index_add_(0, graph_c1, hq)
        counts = torch.zeros(num_graphs, dtype=hq.dtype).index_add_(0, graph_c1, torch.ones(num_c1))
        return sums / counts.clamp(min=1.0)[:, None]

    emb = torch.cat([tower(tp["conv1"], tp["conv2"]), tower(tp["conv1_ext"], tp["conv2_ext"])], dim=1)
    h = torch.relu(emb @ tp["fc1.w"] + tp["fc1.b"])
    logits = h @ tp["fc2.w"] + tp["fc2.b"]
    y = torch.tensor(np.asarray(ys, dtype=np.int64))
    return torch.nn.functional.cross_entropy(logits, y)


def test_multi_epoch_clustered_train_parity(srv_hdf5) -> None:
    """Three epochs x two batches through the CLUSTERED GINet path — MCL
    community pooling computed exactly as Trainer._precluster does
    (reference trainer.py:319-348), real featurized 101M SRV graphs — track a
    torch mirror of the reference pipeline (ginet.py:90-125) step for step to
    identical final parameters."""
    from deeprank2_tpu.dataset import GraphDataset
    from deeprank2_tpu.neuralnets.gnn.ginet import GINet
    from deeprank2_tpu.ops.batch import collate_graphs
    from deeprank2_tpu.ops.losses import CrossEntropyLoss
    from deeprank2_tpu.ops.optim import Adam
    from deeprank2_tpu.utils.community_pooling import community_detection, community_pooling_host

    feats = ["res_charge", "res_size", "res_mass", "res_pI", "pssm", "info_content"]
    ds = GraphDataset(
        hdf5_path=srv_hdf5,
        target="binary",
        task="classif",
        node_features=feats,
        features_transform={f: {"standardize": True} for f in feats},
    )
    entries = [ds.get(i) for i in range(len(ds))]
    for e in entries:  # what Trainer._precluster writes per entry
        num_nodes = e["x"].shape[0]
        e["cluster0"] = community_detection(e["edge_index"], num_nodes, method="mcl")
        pooled_edges, num_clusters = community_pooling_host(e["cluster0"], e["edge_index"])
        e["cluster1"] = community_detection(pooled_edges, num_clusters, method="mcl")

    chunks = [entries[i : i + 4] for i in range(0, len(entries), 4)]
    batches = [collate_graphs(chunk)[0] for chunk in chunks]
    assert len(batches) >= 2

    model = GINet(batches[0].x.shape[1], 2, batches[0].edge_attr.shape[1])
    params = model.init(jax.random.PRNGKey(13))
    loss_fn = CrossEntropyLoss()
    optimizer = Adam(lr=1e-3, weight_decay=1e-5)
    opt_state = optimizer.init(params)

    tp = _torch_ginet_params(params)
    opt = torch.optim.Adam(tp.values(), lr=1e-3, weight_decay=1e-5)

    @jax.jit
    def step(p, s, batch):
        def compute(p):
            pred = model.apply(p, batch, training=False)
            return loss_fn(pred, batch.y.astype(jnp.int32), batch.y_mask)

        loss, grads = jax.value_and_grad(compute)(p)
        p, s = optimizer.step(p, grads, s)
        return p, s, loss

    for _epoch in range(3):
        for batch, chunk in zip(batches, chunks, strict=True):
            params, opt_state, loss_jax = step(params, opt_state, batch)
            loss_torch = _torch_clustered_ginet_loss(tp, chunk)
            opt.zero_grad()
            loss_torch.backward()
            opt.step()
            loss_torch_val = float(loss_torch.detach())
            assert abs(float(loss_jax) - loss_torch_val) < 1e-4 * max(1.0, abs(loss_torch_val))

    for tower_name in ("conv1", "conv2", "conv1_ext", "conv2_ext"):
        np.testing.assert_allclose(
            np.asarray(params[tower_name]["fc"]["w"]), tp[tower_name].detach().numpy(), rtol=5e-4, atol=1e-5
        )
    for fc in ("fc1", "fc2"):
        np.testing.assert_allclose(np.asarray(params[fc]["w"]), tp[fc + ".w"].detach().numpy(), rtol=5e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(params[fc]["b"]), tp[fc + ".b"].detach().numpy(), rtol=5e-4, atol=1e-5)


def test_multi_epoch_cnn_train_parity(grid_hdf5) -> None:
    """Three epochs x two batches of CnnClassification on real mapped grids:
    the JAX training loop tracks a torch mirror of the reference CNN
    (cnn/model3d.py:88) step for step to identical final parameters."""
    from deeprank2_tpu.dataset import GridDataset
    from deeprank2_tpu.neuralnets.cnn.model3d import CnnClassification
    from deeprank2_tpu.ops.batch import collate_grids
    from deeprank2_tpu.ops.losses import CrossEntropyLoss
    from deeprank2_tpu.ops.optim import Adam

    ds = GridDataset(hdf5_path=grid_hdf5, target="binary", task="classif")
    entries = [ds.get(i) for i in range(len(ds))]
    # standardize grids globally so activations are O(1)
    all_x = np.stack([e["x"] for e in entries])
    mean, dev = all_x.mean(), max(all_x.std(), 1e-6)
    for e in entries:
        e["x"] = (e["x"] - mean) / dev
    batches = [collate_grids(entries[i : i + 2])[0] for i in range(0, len(entries), 2)]
    assert len(batches) >= 2

    num_features = entries[0]["x"].shape[0]
    box = entries[0]["x"].shape[1:]
    model = CnnClassification(num_features, box)
    params = model.init(jax.random.PRNGKey(17))
    loss_fn = CrossEntropyLoss()
    optimizer = Adam(lr=1e-3, weight_decay=1e-5)
    opt_state = optimizer.init(params)

    tp = {
        "conv000.w": torch.tensor(np.asarray(params["conv000"]["w"]), requires_grad=True),
        "conv000.b": torch.tensor(np.asarray(params["conv000"]["b"]), requires_grad=True),
        "conv002.w": torch.tensor(np.asarray(params["conv002"]["w"]), requires_grad=True),
        "conv002.b": torch.tensor(np.asarray(params["conv002"]["b"]), requires_grad=True),
        "fc000.w": torch.tensor(np.asarray(params["fc000"]["w"]), requires_grad=True),
        "fc000.b": torch.tensor(np.asarray(params["fc000"]["b"]), requires_grad=True),
        "fc001.w": torch.tensor(np.asarray(params["fc001"]["w"]), requires_grad=True),
        "fc001.b": torch.tensor(np.asarray(params["fc001"]["b"]), requires_grad=True),
    }
    opt = torch.optim.Adam(tp.values(), lr=1e-3, weight_decay=1e-5)

    def torch_loss(batch):
        x = torch.tensor(np.asarray(batch.x))
        pool = torch.nn.functional.max_pool3d
        h = torch.relu(torch.nn.functional.conv3d(x, tp["conv000.w"], tp["conv000.b"]))
        h = pool(h, 2)
        h = torch.relu(torch.nn.functional.conv3d(h, tp["conv002.w"], tp["conv002.b"]))
        h = pool(h, 2)
        h = h.reshape(h.shape[0], -1)
        h = torch.relu(h @ tp["fc000.w"] + tp["fc000.b"])
        logits = h @ tp["fc001.w"] + tp["fc001.b"]
        y = torch.tensor(np.asarray(batch.y).astype(np.int64))
        return torch.nn.functional.cross_entropy(logits, y)

    @jax.jit
    def step(p, s, batch):
        def compute(p):
            pred = model.apply(p, batch, training=False)
            return loss_fn(pred, batch.y.astype(jnp.int32), batch.y_mask)

        loss, grads = jax.value_and_grad(compute)(p)
        p, s = optimizer.step(p, grads, s)
        return p, s, loss

    for _epoch in range(3):
        for batch in batches:
            params, opt_state, loss_jax = step(params, opt_state, batch)
            loss_torch = torch_loss(batch)
            opt.zero_grad()
            loss_torch.backward()
            opt.step()
            loss_torch_val = float(loss_torch.detach())
            assert abs(float(loss_jax) - loss_torch_val) < 1e-4 * max(1.0, abs(loss_torch_val))

    for name, leaf in [("conv000", "w"), ("conv000", "b"), ("conv002", "w"), ("conv002", "b"), ("fc000", "w"), ("fc000", "b"), ("fc001", "w"), ("fc001", "b")]:
        np.testing.assert_allclose(
            np.asarray(params[name][leaf]), tp[f"{name}.{leaf}"].detach().numpy(), rtol=5e-4, atol=1e-5
        )


def test_multi_epoch_blocked_vs_coo_train_parity(srv_hdf5) -> None:
    """Three epochs x multiple batches of REAL featurized data: the
    blocked-edge VanillaNetwork and the COO VanillaNetwork train in lockstep
    from identical parameters — same loss at every optimizer step, same
    final parameters (accumulated-drift check for the fast path's custom
    VJP through Adam moments)."""
    from deeprank2_tpu.dataset import GraphDataset
    from deeprank2_tpu.neuralnets.gnn.vanilla_gnn import VanillaNetwork, VanillaNetworkBlocked
    from deeprank2_tpu.ops.batch import collate_graphs, collate_graphs_blocked
    from deeprank2_tpu.ops.losses import CrossEntropyLoss
    from deeprank2_tpu.ops.optim import Adam

    feats = ["res_charge", "res_size", "res_mass", "res_pI", "pssm", "info_content"]
    ds = GraphDataset(
        hdf5_path=srv_hdf5,
        target="binary",
        task="classif",
        node_features=feats,
        features_transform={f: {"standardize": True} for f in feats},
    )
    entries = [ds.get(i) for i in range(len(ds))]
    coo_batches = [collate_graphs(entries[i : i + 4])[0] for i in range(0, len(entries), 4)]
    blk_batches = [collate_graphs_blocked(entries[i : i + 4])[0] for i in range(0, len(entries), 4)]
    assert len(coo_batches) >= 2

    feat_dim = coo_batches[0].x.shape[1]
    edge_dim = coo_batches[0].edge_attr.shape[1]
    model_coo = VanillaNetwork(feat_dim, 2, edge_dim)
    model_blk = VanillaNetworkBlocked(feat_dim, 2, edge_dim)
    params0 = model_coo.init(jax.random.PRNGKey(13))
    loss_fn = CrossEntropyLoss()
    optimizer = Adam(lr=1e-3, weight_decay=1e-5)

    def make_step(model):
        @jax.jit
        def step(p, s, batch):
            def compute(p):
                pred = model.apply(p, batch, training=False)
                return loss_fn(pred, batch.y.astype(jnp.int32), batch.y_mask)

            loss, grads = jax.value_and_grad(compute)(p)
            p, s = optimizer.step(p, grads, s)
            return p, s, loss

        return step

    step_coo, step_blk = make_step(model_coo), make_step(model_blk)
    p_coo = p_blk = params0
    s_coo = optimizer.init(params0)
    s_blk = optimizer.init(params0)
    for _epoch in range(3):
        for cb, bb in zip(coo_batches, blk_batches):
            p_coo, s_coo, loss_coo = step_coo(p_coo, s_coo, cb)
            p_blk, s_blk, loss_blk = step_blk(p_blk, s_blk, bb)
            np.testing.assert_allclose(float(loss_blk), float(loss_coo), rtol=2e-4)

    from jax.flatten_util import ravel_pytree

    flat_coo, _ = ravel_pytree(p_coo)
    flat_blk, _ = ravel_pytree(p_blk)
    np.testing.assert_allclose(np.asarray(flat_blk), np.asarray(flat_coo), rtol=5e-3, atol=2e-4)
