"""Single-block tower attention kernel vs the jnp numerics of record."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vidi_tpu.ops import basic
from vidi_tpu.ops.pallas import tower_attention as ta

ta.INTERPRET = True


def _ref(q, k, v, scale):
    logits = jnp.einsum("bthd,bshd->bhts", q, k,
                        preferred_element_type=jnp.float32) * scale
    probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    return jnp.einsum("bhts,bshd->bthd", probs, v,
                      preferred_element_type=jnp.float32).astype(q.dtype)


@pytest.mark.parametrize("t,h,d", [
    (37, 2, 64),    # packed path (2 heads / 128 lanes), odd T
    (40, 3, 128),   # packed path (1 head / block)
    (37, 2, 24),    # generic path (24 doesn't tile 128), T padded to 40
    (37, 2, 16),    # generic path: d tiles 128 but dm=32 < 128 (tiny config)
    (33, 3, 64),    # generic path: dm=192 not a multiple of 128
])
def test_tower_attention_matches_reference(t, h, d):
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((2, t, h, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((2, t, h, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((2, t, h, d)), jnp.float32)
    got = ta.tower_attention(q, k, v, d**-0.5)
    want = _ref(q, k, v, d**-0.5)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_tower_attention_grad_matches_reference():
    """The custom VJP (jnp recompute) must equal autodiff of the reference."""
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.standard_normal((1, 16, 2, 64)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((1, 16, 2, 64)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((1, 16, 2, 64)), jnp.float32)

    def loss_kernel(q, k, v):
        return jnp.sum(ta.tower_attention(q, k, v, 0.125) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(_ref(q, k, v, 0.125) ** 2)

    gk = jax.grad(loss_kernel, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gk, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4)


def test_mha_use_flash_routes_to_tower_kernel():
    """mha(use_flash=True) at tower shapes must match the XLA path."""
    rng = np.random.default_rng(2)
    q = jnp.asarray(rng.standard_normal((2, 37, 128)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((2, 37, 128)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((2, 37, 128)), jnp.float32)
    got = basic.mha(q, k, v, 2, use_flash=True)
    want = basic.mha(q, k, v, 2, use_flash=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_fits_budget():
    assert ta.fits(729, 64, 16)   # SigLIP: packed, 2 heads/block
    assert ta._packed_ok(729, 64, 16 * 64)
    assert ta.fits(729, 72, 16)   # so400m: fullwidth lane-slice
    assert ta._fullwidth_ok(729, 16, 72)
    assert ta._packed_ok(1500, 64, 12 * 64)  # Whisper: packed (24M budget)
    assert ta.fits(1500, 64, 12)
    assert not ta.fits(4000, 64, 16)    # long sequences -> flash kernel
    # dm that doesn't tile 128 lanes must NOT take the packed path (the
    # grid would be empty / leave tail heads unwritten on a real chip)
    assert not ta._packed_ok(37, 16, 32)     # tiny config: h=2 d=16
    assert not ta._packed_ok(33, 64, 192)    # dm % 128 != 0
    assert ta.fits(37, 16, 2)                # ...but generic still serves it
