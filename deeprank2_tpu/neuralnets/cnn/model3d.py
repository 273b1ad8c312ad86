"""3D CNNs on grid-mapped features (reference: neuralnets/cnn/model3d.py).

Architecture parity: Conv3d(F->4, k2) relu -> MaxPool3d(2) -> Conv3d(4->5, k2)
relu -> MaxPool3d(2) -> FC(84) relu -> FC(out). Convs lower to XLA
``conv_general_dilated`` (MXU path). The flattened FC input size is computed
analytically instead of the reference's dummy forward probe.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from deeprank2_tpu.neuralnets import nn
from deeprank2_tpu.ops.batch import GridBatch


def _after_conv_pool(dim: int, ksize: int = 2, pool: int = 2) -> int:
    return (dim - (ksize - 1)) // pool


class _Cnn3dBase:
    needs_clusters = False

    def __init__(self, num_features: int, box_shape: tuple[int, int, int], output_shape: int):
        self.num_features = num_features
        self.box_shape = tuple(box_shape)
        self.output_shape = output_shape
        dims = [_after_conv_pool(_after_conv_pool(d)) for d in self.box_shape]
        self.flat_size = 5 * dims[0] * dims[1] * dims[2]

    def init(self, rng: jax.Array) -> dict:
        keys = jax.random.split(rng, 4)
        return {
            "conv000": nn.init_conv3d(keys[0], self.num_features, 4, 2),
            "conv002": nn.init_conv3d(keys[1], 4, 5, 2),
            "fc000": nn.init_linear(keys[2], self.flat_size, 84),
            "fc001": nn.init_linear(keys[3], 84, self.output_shape),
        }

    def apply(self, params: dict, batch: GridBatch, training: bool = False, rng: jax.Array | None = None) -> jnp.ndarray:
        x = batch.x  # [N, C, W, H, D]
        x = nn.relu(nn.conv3d(params["conv000"], x))
        x = nn.max_pool3d(x, 2)
        x = nn.relu(nn.conv3d(params["conv002"], x))
        x = nn.max_pool3d(x, 2)
        x = x.reshape(x.shape[0], -1)
        x = nn.relu(nn.linear(params["fc000"], x))
        return nn.linear(params["fc001"], x)


class CnnRegression(_Cnn3dBase):
    """3D CNN predicting one continuous value per grid."""

    def __init__(self, num_features: int, box_shape: tuple[int, int, int]):
        super().__init__(num_features, box_shape, 1)


class CnnClassification(_Cnn3dBase):
    """3D CNN predicting two-class logits per grid."""

    def __init__(self, num_features: int, box_shape: tuple[int, int, int]):
        super().__init__(num_features, box_shape, 2)
