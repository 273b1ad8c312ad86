"""Oracle tests: the five formerly-stubbed losses vs their torch.nn
counterparts (reference whitelist: deeprank2/domain/losstypes.py:1-41)."""

import numpy as np
import pytest
import torch

from deeprank2_tpu.ops.losses import (
    CosineEmbeddingLoss,
    CTCLoss,
    MarginRankingLoss,
    MultiLabelMarginLoss,
    TripletMarginLoss,
)

RNG = np.random.default_rng(42)


def test_multilabel_margin() -> None:
    pred = RNG.normal(size=(5, 7)).astype(np.float32)
    # rows of positive class ids terminated by -1
    target = np.full((5, 7), -1, dtype=np.int64)
    target[0, :3] = [1, 4, 6]
    target[1, :1] = [0]
    target[2, :7] = [0, 1, 2, 3, 4, 5, 6]
    target[3, :2] = [6, 2]
    target[4, :4] = [3, 3, 0, 5]  # duplicates allowed by torch
    expected = torch.nn.MultiLabelMarginLoss()(torch.from_numpy(pred), torch.from_numpy(target))
    got = float(MultiLabelMarginLoss()(pred, target))
    assert got == pytest.approx(float(expected), rel=1e-5)


def test_cosine_embedding() -> None:
    x1 = RNG.normal(size=(8, 16)).astype(np.float32)
    x2 = RNG.normal(size=(8, 16)).astype(np.float32)
    y = RNG.choice([-1, 1], size=8).astype(np.int64)
    for margin in (0.0, 0.3):
        expected = torch.nn.CosineEmbeddingLoss(margin=margin)(torch.from_numpy(x1), torch.from_numpy(x2), torch.from_numpy(y))
        got = float(CosineEmbeddingLoss(margin=margin)(x1, x2, y))
        assert got == pytest.approx(float(expected), rel=1e-5)


def test_margin_ranking() -> None:
    x1 = RNG.normal(size=12).astype(np.float32)
    x2 = RNG.normal(size=12).astype(np.float32)
    y = RNG.choice([-1, 1], size=12).astype(np.float32)
    for margin in (0.0, 0.5):
        expected = torch.nn.MarginRankingLoss(margin=margin)(torch.from_numpy(x1), torch.from_numpy(x2), torch.from_numpy(y))
        got = float(MarginRankingLoss(margin=margin)(x1, x2, y))
        assert got == pytest.approx(float(expected), rel=1e-5)


@pytest.mark.parametrize("swap", [False, True])
def test_triplet_margin(swap: bool) -> None:
    a = RNG.normal(size=(6, 10)).astype(np.float32)
    p = RNG.normal(size=(6, 10)).astype(np.float32)
    n = RNG.normal(size=(6, 10)).astype(np.float32)
    expected = torch.nn.TripletMarginLoss(margin=1.0, swap=swap)(torch.from_numpy(a), torch.from_numpy(p), torch.from_numpy(n))
    got = float(TripletMarginLoss(margin=1.0, swap=swap)(a, p, n))
    assert got == pytest.approx(float(expected), rel=1e-5)


def test_ctc() -> None:
    t_max, batch, n_classes, l_max = 20, 4, 6, 7
    logits = RNG.normal(size=(t_max, batch, n_classes)).astype(np.float32)
    log_probs = torch.from_numpy(logits).log_softmax(-1)
    targets = RNG.integers(1, n_classes, size=(batch, l_max)).astype(np.int64)
    targets[2, 2:5] = targets[2, 1]  # repeated labels exercise the skip rule
    input_lengths = np.array([20, 17, 14, 12], dtype=np.int64)
    target_lengths = np.array([7, 5, 6, 3], dtype=np.int64)
    expected = torch.nn.CTCLoss(blank=0)(
        log_probs,
        torch.from_numpy(targets),
        torch.from_numpy(input_lengths),
        torch.from_numpy(target_lengths),
    )
    got = float(CTCLoss(blank=0)(log_probs.numpy(), targets, input_lengths, target_lengths))
    assert got == pytest.approx(float(expected), rel=1e-4)


def test_masked_mean_drops_padded_samples() -> None:
    x1 = RNG.normal(size=(4, 8)).astype(np.float32)
    x2 = RNG.normal(size=(4, 8)).astype(np.float32)
    y = np.array([1, -1, 1, -1], dtype=np.int64)
    mask = np.array([1, 1, 0, 0], dtype=np.float32)
    expected = torch.nn.CosineEmbeddingLoss()(torch.from_numpy(x1[:2]), torch.from_numpy(x2[:2]), torch.from_numpy(y[:2]))
    got = float(CosineEmbeddingLoss()(x1, x2, y, mask=mask))
    assert got == pytest.approx(float(expected), rel=1e-5)
