"""slot_group_max: interpret-mode kernel oracle + semantics guards."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deeprank2_tpu.ops.pallas_slotpool import SLOT, TILE, _xla_fwd, slot_group_max


def _case(seed=0, feat=19, vp=2 * TILE):
    rng = np.random.default_rng(seed)
    h = np.abs(rng.standard_normal((feat, vp)).astype(np.float32))
    mask = (rng.random(vp) > 0.1).astype(np.float32)
    # exact ties inside one group + an all-zero (empty-ish) group
    h[:, 100:108] = 0.0
    h[3, 200] = h[3, 201] = h[3, 202] = 5.0
    h = h * mask[None, :]
    return jnp.asarray(h), jnp.asarray(mask.reshape(1, vp))


def test_xla_path_matches_member_semantics():
    """The fallback equals member_max_pool run on the 8-lane groups."""
    from deeprank2_tpu.ops.pooling import member_max_pool

    h, mask_row = _case()
    vp = h.shape[1]
    pooled = slot_group_max(h, mask_row)
    members = np.arange(vp, dtype=np.int32).reshape(vp // SLOT, SLOT)
    # member matrix uses OOB padding for masked lanes
    members = np.where(np.asarray(mask_row[0]).reshape(-1, SLOT) > 0, members, vp).astype(np.int32)
    cluster = np.repeat(np.arange(vp // SLOT, dtype=np.int32), SLOT)
    ref = member_max_pool(h.T, jnp.asarray(members), jnp.asarray(cluster)).T
    np.testing.assert_allclose(np.asarray(pooled), np.asarray(ref), rtol=0, atol=0)

    g_k = jax.grad(lambda x: (slot_group_max(x, mask_row) ** 2).sum())(h)
    g_r = jax.grad(lambda x: (member_max_pool(x.T, jnp.asarray(members), jnp.asarray(cluster)).T ** 2).sum())(h)
    np.testing.assert_allclose(np.asarray(g_k), np.asarray(g_r), rtol=0, atol=0)


def test_interpret_kernel_matches_oracle():
    """The Mosaic kernel (interpret mode) is bit-exact vs the XLA oracle,
    forward and backward, including ties and zero-max groups."""
    h, mask_row = _case()
    ref_p = _xla_fwd(h, mask_row)
    p = slot_group_max(h, mask_row, interpret=True)
    np.testing.assert_array_equal(np.asarray(p), np.asarray(ref_p))

    w = jnp.asarray(np.random.default_rng(1).standard_normal(ref_p.shape).astype(np.float32))

    def loss(x, interpret):
        return (slot_group_max(x, mask_row, interpret=interpret) * w).sum()

    g_int = jax.grad(lambda x: loss(x, True))(h)
    g_ref = jax.grad(lambda x: loss(x, False))(h)
    np.testing.assert_array_equal(np.asarray(g_int), np.asarray(g_ref))


def test_gradient_winners_exclude_padding():
    """A group whose max is 0 with padded lanes: every VALID max lane gets
    the full cotangent (round-5 summed-winner convention — zero-max lanes
    are relu-dead in every model use), padded lanes get none."""
    vp = TILE
    h = np.zeros((1, vp), np.float32)
    mask = np.zeros(vp, np.float32)
    mask[:4] = 1.0  # group 0: 4 valid lanes, all zero; 4 padded
    mask_row = jnp.asarray(mask.reshape(1, vp))
    g = jax.grad(lambda x: slot_group_max(x, mask_row).sum())(jnp.asarray(h))
    got = np.asarray(g)[0, :8]
    np.testing.assert_allclose(got, [1.0, 1.0, 1.0, 1.0, 0, 0, 0, 0], atol=0)


@pytest.mark.parametrize("feat", [7, 32])
def test_interpret_shapes(feat):
    h, mask_row = _case(feat=feat, vp=TILE)
    p = slot_group_max(h, mask_row, interpret=True)
    ref = _xla_fwd(h, mask_row)
    np.testing.assert_array_equal(np.asarray(p), np.asarray(ref))


@pytest.mark.parametrize("vp", [TILE + 512, 3 * TILE - 8])
def test_interpret_ragged_width(vp):
    """Widths that do not divide the 1024-lane block: the final block reads
    past the array; containment must keep outputs and gradients exact."""
    h, mask_row = _case(vp=vp)
    ref_p = _xla_fwd(h, mask_row)
    p = slot_group_max(h, mask_row, interpret=True)
    np.testing.assert_array_equal(np.asarray(p), np.asarray(ref_p))

    import jax

    w = jnp.asarray(np.random.default_rng(1).standard_normal(ref_p.shape).astype(np.float32))
    g_int = jax.grad(lambda x: (slot_group_max(x, mask_row, interpret=True) * w).sum())(h)
    g_ref = jax.grad(lambda x: (slot_group_max(x, mask_row) * w).sum())(h)
    np.testing.assert_array_equal(np.asarray(g_int), np.asarray(g_ref))


@pytest.mark.parametrize("slot", [2, 4])
def test_generalized_stride_interpret(slot):
    """The stride-2/4 variants (mixed-layout size-class regions): interpret
    kernel vs the XLA oracle, fwd and bwd."""
    h, mask_row = _case(vp=2 * TILE)
    ref_p = _xla_fwd(h, mask_row, slot)
    p = slot_group_max(h, mask_row, interpret=True, slot=slot)
    np.testing.assert_array_equal(np.asarray(p), np.asarray(ref_p))

    w = jnp.asarray(np.random.default_rng(2).standard_normal(ref_p.shape).astype(np.float32))
    g_int = jax.grad(lambda x: (slot_group_max(x, mask_row, interpret=True, slot=slot) * w).sum())(h)
    g_ref = jax.grad(lambda x: (slot_group_max(x, mask_row, slot=slot) * w).sum())(h)
    np.testing.assert_array_equal(np.asarray(g_int), np.asarray(g_ref))
