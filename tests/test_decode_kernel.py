"""Decode-attention + fused-RMSNorm Pallas kernels vs jnp references
(interpret mode on the CPU test mesh)."""
import numpy as np
import jax
import jax.numpy as jnp

import vidi_tpu.ops.pallas.decode_attention as da
import vidi_tpu.ops.pallas.fused_rmsnorm as fr

da.INTERPRET = True
fr.INTERPRET = True

from vidi_tpu.core.config import DattnConfig
from vidi_tpu.ops.attention import cross_attention, self_attention
from vidi_tpu.ops.norms import gemma_rms_norm
import pytest


def _qkv(b=2, s=96, hq=8, hk=4, d=32, seed=0):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.standard_normal((b, hq, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, s, hk, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, s, hk, d)), jnp.float32)
    mask = jnp.asarray(rng.random((b, s)) > 0.3)
    return q, k, v, mask


def _native(x):
    """[B, S, Hk, D] -> cache-native [B, Hk, S, D]."""
    return jnp.transpose(x, (0, 2, 1, 3))


def test_decode_attention_matches_cross_attention():
    q, k, v, mask = _qkv()
    got = np.asarray(da.decode_attention(q, _native(k), _native(v), mask, 0.125, softcap=50.0))
    want = np.asarray(cross_attention(q[:, None], k, v, kv_valid=mask,
                                      scale=0.125, softcap=50.0))[:, 0]
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_decode_attention_sliding_window():
    b, s = 2, 96
    q, k, v, _ = _qkv(b=b, s=s)
    cur_len = jnp.asarray([40, 80], jnp.int32)
    kv_pos = jnp.broadcast_to(jnp.arange(s)[None], (b, s))
    valid = kv_pos <= cur_len[:, None]
    window = 16
    got = np.asarray(da.decode_attention(
        q, _native(k), _native(v), valid, 0.125, window=window, q_pos=cur_len))
    want = np.asarray(self_attention(
        q[:, None], k, v, q_positions=cur_len[:, None], kv_positions=kv_pos,
        kv_valid=valid, scale=0.125, sliding_window=window))[:, 0]
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_decode_attention_window_disabled_by_negative_qpos():
    """The traced-flag trick: a huge negative q_pos must behave as no-window."""
    q, k, v, mask = _qkv()
    got = np.asarray(da.decode_attention(
        q, _native(k), _native(v), mask, 0.125, window=16,
        q_pos=jnp.full((2,), -(1 << 30), jnp.int32)))
    want = np.asarray(da.decode_attention(q, _native(k), _native(v), mask, 0.125))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


@pytest.mark.slow  # heavy integration; fast gate keeps a representative
def test_decode_step_flash_matches_plain():
    cfg = DattnConfig.tiny()
    from vidi_tpu.models import dattn, decoder

    params = dattn.init_params(jax.random.PRNGKey(0), cfg, jnp.float32)
    rng = np.random.default_rng(0)
    b, t = 1, 8
    ids = jnp.asarray(rng.integers(3, cfg.text.vocab_size, (b, t)), jnp.int32)
    mask = jnp.ones((b, t), bool)
    positions = jnp.arange(t, dtype=jnp.int32)[None]
    sz = cfg.vision.image_size
    img_feats, img_mask = dattn.encode_video_images(
        params, cfg, jnp.asarray(rng.standard_normal((b, 2, sz, sz, 3)),
                                 jnp.float32),
        jnp.asarray([2], jnp.int32), (4, 4))

    embeds = decoder.embed_tokens(params["text"], ids, cfg.text)
    _, caches = dattn.forward(params, cfg, embeds, mask, positions,
                              img=img_feats, img_mask=img_mask,
                              return_caches=True)
    pad = 4
    caches = caches._replace(
        text_k=jnp.pad(caches.text_k, ((0, 0), (0, 0), (0, 0), (0, pad), (0, 0))),
        text_v=jnp.pad(caches.text_v, ((0, 0), (0, 0), (0, 0), (0, pad), (0, 0))))

    tok = decoder.embed_tokens(params["text"],
                               jnp.asarray([[5]], jnp.int32), cfg.text)
    cur = jnp.asarray([t], jnp.int32)
    logits_plain, _ = dattn.decode_step(params, cfg, tok, cur, caches,
                                        img_mask=img_mask)
    logits_flash, _ = dattn.decode_step(params, cfg, tok, cur, caches,
                                        img_mask=img_mask, use_flash=True)
    np.testing.assert_allclose(np.asarray(logits_flash),
                               np.asarray(logits_plain), rtol=5e-4, atol=5e-4)


def test_fused_rms_norm_matches_gemma_norm():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((3, 17, 64)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((64,)) * 0.1, jnp.float32)
    got = np.asarray(fr.fused_rms_norm(x, w, eps=1e-6, plus_one=True))
    want = np.asarray(gemma_rms_norm(x, w, 1e-6))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)
