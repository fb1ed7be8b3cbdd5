"""Flash-attention kernel vs the jnp reference ops (interpret mode on CPU)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vidi_tpu.ops.pallas import flash_attention as fa
from vidi_tpu.ops.attention import cross_attention, self_attention

fa.INTERPRET = True  # CPU test mesh — run kernels interpreted


def _inputs(B=1, T=160, S=288, HQ=4, HK=2, D=128, seed=0):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.standard_normal((B, T, HQ, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, S, HK, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, S, HK, D)), jnp.float32)
    mask = np.ones((B, S), bool)
    mask[0, -37:] = False
    return q, k, v, jnp.asarray(mask)


@pytest.mark.parametrize("softcap", [None, 50.0])
def test_flash_cross_attention_matches_reference(softcap):
    q, k, v, mask = _inputs()
    scale = 0.11
    got = fa.flash_attention(q, k, v, mask, scale, False, None, softcap,
                             128, 128)
    want = cross_attention(q, k, v, kv_valid=mask, scale=scale, softcap=softcap)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-3, atol=2e-3)


@pytest.mark.parametrize("window", [None, 64])
def test_flash_causal_matches_reference(window):
    q, k, v, mask = _inputs(T=288, S=288, seed=1)
    B, S = mask.shape
    pos = jnp.broadcast_to(jnp.arange(S), (B, S))
    scale = 0.125
    got = fa.flash_attention(q, k, v, mask, scale, True, window, 30.0, 128, 128)
    want = self_attention(q, k, v, q_positions=pos, kv_positions=pos,
                          kv_valid=mask, scale=scale, sliding_window=window,
                          softcap=30.0)
    valid = np.asarray(mask)[0]
    np.testing.assert_allclose(np.asarray(got)[0, valid],
                               np.asarray(want)[0, valid],
                               rtol=2e-3, atol=2e-3)


def test_flash_gradients_match_autodiff():
    q, k, v, mask = _inputs(T=128, S=160, seed=2)
    scale = 0.1

    def loss_flash(q, k, v):
        o = fa.flash_attention(q, k, v, mask, scale, False, None, 50.0, 128, 128)
        return jnp.sum(o * o)

    def loss_ref(q, k, v):
        o = cross_attention(q, k, v, kv_valid=mask, scale=scale, softcap=50.0)
        return jnp.sum(o * o)

    g1 = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-3, atol=5e-3)


def test_flash_unaligned_lengths_padded_correctly():
    """T/S not multiples of the block size."""
    q, k, v, mask = _inputs(T=97, S=203, seed=3)
    scale = 0.17
    got = fa.flash_attention(q, k, v, mask, scale, False, None, None, 128, 128)
    want = cross_attention(q, k, v, kv_valid=mask, scale=scale)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-3, atol=2e-3)


def _packed_row(T, seg_lens):
    """segment ids [1..n] over seg_lens, 0-padded to T; restarting positions."""
    segs = np.zeros(T, np.int32)
    pos = np.zeros(T, np.int32)
    cur = 0
    for s, n in enumerate(seg_lens, start=1):
        segs[cur:cur + n] = s
        pos[cur:cur + n] = np.arange(n)
        cur += n
    return segs, pos


@pytest.mark.parametrize("window", [None, 48])
def test_flash_segment_ids_match_reference(window):
    """Packed block-diagonal causal attention == jnp segment-mask path."""
    T = 288
    q, k, v, _ = _inputs(T=T, S=T, seed=5)
    segs, pos = _packed_row(T, [130, 100, 20])  # 38 pad columns
    mask = jnp.asarray(segs != 0)[None]
    segs_j = jnp.asarray(segs)[None]
    pos_j = jnp.asarray(pos)[None]
    scale = 0.125
    got = fa.flash_attention(q, k, v, mask, scale, True, window, 30.0,
                             128, 128, segs_j, segs_j)
    want = self_attention(q, k, v, q_positions=pos_j, kv_positions=pos_j,
                          kv_valid=mask, scale=scale, sliding_window=window,
                          softcap=30.0, q_segment_ids=segs_j,
                          kv_segment_ids=segs_j)
    valid = segs != 0
    np.testing.assert_allclose(np.asarray(got)[0, valid],
                               np.asarray(want)[0, valid],
                               rtol=2e-3, atol=2e-3)


@pytest.mark.slow  # heavy integration; fast gate keeps a representative
def test_flash_segment_gradients_match_autodiff():
    T = 256
    q, k, v, _ = _inputs(T=T, S=T, seed=6)
    segs, pos = _packed_row(T, [120, 90, 46])
    mask = jnp.asarray(segs != 0)[None]
    segs_j = jnp.asarray(segs)[None]
    pos_j = jnp.asarray(pos)[None]
    scale = 0.1
    valid = jnp.asarray(segs != 0)[None, :, None, None]

    def loss_flash(q, k, v):
        o = fa.flash_attention(q, k, v, mask, scale, True, None, 30.0,
                               128, 128, segs_j, segs_j)
        return jnp.sum(jnp.where(valid, o, 0.0) ** 2)

    def loss_ref(q, k, v):
        o = self_attention(q, k, v, q_positions=pos_j, kv_positions=pos_j,
                           kv_valid=mask, scale=scale, softcap=30.0,
                           q_segment_ids=segs_j, kv_segment_ids=segs_j)
        return jnp.sum(jnp.where(valid, o, 0.0) ** 2)

    g1 = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-3, atol=5e-3)


def test_packed_forward_flash_matches_jnp():
    """Full Dattn forward on a packed row: kernel path == jnp segment path."""
    from vidi_tpu.core.config import DattnConfig
    from vidi_tpu.models import dattn, decoder
    from vidi_tpu.train.packing import pack_rows
    from vidi_tpu.constants import IGNORE_INDEX

    cfg = DattnConfig.tiny()
    params = dattn.init_params(jax.random.PRNGKey(0), cfg, jnp.float32)
    rng = np.random.default_rng(7)
    samples = []
    for n in [7, 4, 6, 3]:
        ids = rng.integers(3, cfg.text.vocab_size, n).astype(np.int32)
        samples.append({"input_ids": ids, "labels": ids.copy()})
    packed = pack_rows(samples, seq_len=11)

    def fwd(use_flash):
        embeds = decoder.embed_tokens(
            params["text"], jnp.asarray(packed["input_ids"]), cfg.text)
        h, _ = dattn.forward(
            params, cfg, embeds, jnp.asarray(packed["text_mask"]),
            jnp.asarray(packed["positions"]),
            text_segs=jnp.asarray(packed["segment_ids"]),
            use_flash=use_flash)
        return np.asarray(h)

    h_jnp = fwd(False)
    h_flash = fwd(True)
    valid = packed["segment_ids"] != 0
    np.testing.assert_allclose(h_flash[valid], h_jnp[valid],
                               rtol=5e-3, atol=5e-3)


def test_model_forward_flash_matches_jnp():
    """Full Dattn forward: flash path == jnp path (tiny config, fp32)."""
    from vidi_tpu.core.config import DattnConfig
    from vidi_tpu.models import dattn, decoder

    cfg = DattnConfig.tiny()
    params = dattn.init_params(jax.random.PRNGKey(0), cfg, jnp.float32)
    B, T = 1, 16
    rng = np.random.default_rng(4)
    ids = jnp.asarray(rng.integers(0, cfg.text.vocab_size, (B, T)))
    mask = jnp.ones((B, T), bool)
    pos = jnp.broadcast_to(jnp.arange(T, dtype=jnp.int32), (B, T))
    img = jax.random.normal(jax.random.PRNGKey(1), (B, 160, cfg.text.hidden_size)) * 0.1
    img_mask = jnp.asarray(np.arange(160)[None] < 150)
    embeds = decoder.embed_tokens(params["text"], ids, cfg.text)

    h_jnp, _ = dattn.forward(params, cfg, embeds, mask, pos,
                             img=img, img_mask=img_mask)
    h_flash, _ = dattn.forward(params, cfg, embeds, mask, pos,
                               img=img, img_mask=img_mask, use_flash=True)
    np.testing.assert_allclose(np.asarray(h_flash), np.asarray(h_jnp),
                               rtol=5e-3, atol=5e-3)


def test_tower_attention_fullwidth_matches_reference():
    """head_dim=72 (SigLIP-so400m) routes to the fullwidth lane-slice path."""
    from vidi_tpu.ops.pallas import tower_attention as ta

    rng = np.random.default_rng(11)
    b, t, h, d = 2, 40, 4, 72
    assert not ta._packed_ok(t, d, h * d) and ta._fullwidth_ok(t, h, d)
    q = jnp.asarray(rng.standard_normal((b, t, h, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, t, h, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, t, h, d)), jnp.float32)
    prev = ta.INTERPRET
    ta.INTERPRET = True
    try:
        got = np.asarray(ta.tower_attention(q, k, v, d**-0.5))
    finally:
        ta.INTERPRET = prev
    want = np.asarray(ta._reference_mha(q, k, v, d**-0.5))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)
