"""Speculative decoding: verify_step numerics + the output-invariance
contract (greedy speculative output == greedy generate() for ANY draft).

The reference has no speculative path (its HF generate decodes one token per
forward, gemma.py:603-687); these tests pin the beyond-reference mechanism to
the jnp numerics of record instead.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vidi_tpu.core.config import DattnConfig, TextConfig
from vidi_tpu.models import dattn, decoder
from vidi_tpu.infer.generate import generate, speculative_generate


def _mm_inputs(cfg, key, B, S_img=12, S_aud=7):
    d = cfg.text.hidden_size
    ks = jax.random.split(key, 2)
    img = jax.random.normal(ks[0], (B, S_img, d), jnp.float32) * 0.1
    aud = jax.random.normal(ks[1], (B, S_aud, d), jnp.float32) * 0.1
    img_mask = np.ones((B, S_img), bool)
    img_mask[-1, -4:] = False
    aud_mask = np.ones((B, S_aud), bool)
    aud_mask[0, -2:] = False
    return img, jnp.asarray(img_mask), aud, jnp.asarray(aud_mask)


def _draft_cfg(cfg):
    """A smaller draft sharing the vocab (half the layers, no sliding)."""
    t = dataclasses.replace(cfg.text, num_layers=2, hidden_size=32,
                            num_heads=2, num_kv_heads=1, head_dim=8,
                            intermediate_size=64)
    return dataclasses.replace(cfg, text=t)


def test_verify_step_matches_sequential_decode():
    """verify_step over a W-token window must reproduce W sequential
    decode_step calls: same logits (teacher-forced) and same cache contents
    over the valid region — the numerics-of-record check for the window
    write + in-window causal masking."""
    cfg = DattnConfig.tiny()
    key = jax.random.PRNGKey(0)
    params = dattn.init_params(key, cfg, jnp.float32)
    B, T_prompt, W = 2, 5, 4
    rng = np.random.default_rng(1)
    ids = jnp.asarray(rng.integers(3, cfg.text.vocab_size, (B, T_prompt)))
    window = jnp.asarray(rng.integers(3, cfg.text.vocab_size, (B, W)))
    mask = jnp.ones((B, T_prompt), bool)
    pos = jnp.broadcast_to(jnp.arange(T_prompt, dtype=jnp.int32), (B, T_prompt))
    img, img_mask, aud, aud_mask = _mm_inputs(cfg, key, B)

    embeds = decoder.embed_tokens(params["text"], ids, cfg.text)
    _, caches = dattn.forward(params, cfg, embeds, mask, pos,
                              img=img, img_mask=img_mask,
                              aud=aud, aud_mask=aud_mask, return_caches=True)
    pad = ((0, 0), (0, 0), (0, 0), (0, W + 2), (0, 0))
    caches = caches._replace(text_k=jnp.pad(caches.text_k, pad),
                             text_v=jnp.pad(caches.text_v, pad))

    # sequential decode (the existing, oracle-tested path)
    seq_caches = caches
    cur = jnp.full((B,), T_prompt, jnp.int32)
    seq_logits = []
    for i in range(W):
        emb = decoder.embed_tokens(params["text"], window[:, i:i + 1], cfg.text)
        lg, seq_caches = dattn.decode_step(
            params, cfg, emb, cur + i, seq_caches,
            img_mask=img_mask, aud_mask=aud_mask)
        seq_logits.append(np.asarray(lg))

    # one verify window
    w_emb = decoder.embed_tokens(params["text"], window, cfg.text)
    v_logits, v_caches = dattn.verify_step(
        params, cfg, w_emb, cur, caches,
        img_mask=img_mask, aud_mask=aud_mask)
    v_logits = np.asarray(v_logits)

    for i in range(W):
        np.testing.assert_allclose(v_logits[:, i], seq_logits[i],
                                   rtol=2e-3, atol=2e-3)
    # caches agree over the valid region (both wrote slots T_prompt..+W)
    s_valid = T_prompt + W
    np.testing.assert_allclose(
        np.asarray(v_caches.text_k)[:, :, :, :s_valid],
        np.asarray(seq_caches.text_k)[:, :, :, :s_valid], rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(v_caches.text_v)[:, :, :, :s_valid],
        np.asarray(seq_caches.text_v)[:, :, :, :s_valid], rtol=1e-5, atol=1e-5)


@pytest.mark.slow  # three spec_k compiles of the full loop (~90 s CPU)
def test_speculative_matches_greedy_any_draft():
    """The invariance contract: greedy speculative output == greedy
    generate() regardless of draft quality. Independent random draft =>
    near-zero acceptance; the output must still be identical."""
    cfg = DattnConfig.tiny()
    params = dattn.init_params(jax.random.PRNGKey(0), cfg, jnp.float32)
    dcfg = _draft_cfg(cfg)
    draft = dattn.init_params(jax.random.PRNGKey(9), dcfg, jnp.float32)

    rng = np.random.default_rng(5)
    B, T = 2, 8
    ids = np.asarray(rng.integers(3, cfg.text.vocab_size, (B, T)), np.int32)
    mask = np.zeros((B, T), bool)
    mask[0, :4] = True  # mixed prompt lengths
    mask[1, :8] = True
    ids[0, 4:] = 0
    ids, mask = jnp.asarray(ids), jnp.asarray(mask)
    key = jax.random.PRNGKey(3)
    img, img_mask, aud, aud_mask = _mm_inputs(cfg, key, B)
    kw = dict(max_new_tokens=12, eos_id=2)

    want = generate(params, cfg, ids, mask, img=img, img_mask=img_mask,
                    aud=aud, aud_mask=aud_mask, **kw)
    for k in (1, 3, 4):
        got = speculative_generate(
            params, cfg, draft, dcfg, ids, mask, img=img, img_mask=img_mask,
            aud=aud, aud_mask=aud_mask, spec_k=k, **kw)
        np.testing.assert_array_equal(np.asarray(got.tokens),
                                      np.asarray(want.tokens), f"spec_k={k}")
        np.testing.assert_array_equal(np.asarray(got.lengths),
                                      np.asarray(want.lengths))
        assert (np.asarray(got.n_accepted) <= np.asarray(got.n_drafted)).all()
        assert int(got.n_target_steps) >= 1


def test_speculative_self_draft_accepts_and_saves_steps():
    """Draft == target: every proposal matches, so each verify commits
    spec_k+1 tokens and the loop needs ~max_new/(spec_k+1) target passes."""
    cfg = DattnConfig.tiny()
    params = dattn.init_params(jax.random.PRNGKey(0), cfg, jnp.float32)
    rng = np.random.default_rng(11)
    B, T, K, N = 1, 6, 3, 12
    ids = jnp.asarray(rng.integers(3, cfg.text.vocab_size, (B, T)))
    mask = jnp.ones((B, T), bool)

    want = generate(params, cfg, ids, mask, max_new_tokens=N, eos_id=2)
    got = speculative_generate(params, cfg, params, cfg, ids, mask,
                               spec_k=K, max_new_tokens=N, eos_id=2)
    np.testing.assert_array_equal(np.asarray(got.tokens),
                                  np.asarray(want.tokens))
    emitted = int(want.lengths[0])
    steps = int(got.n_target_steps)
    assert steps <= -(-emitted // (K + 1)) + 1, (steps, emitted)
    assert int(got.n_accepted[0]) >= emitted - steps - 1


@pytest.mark.slow  # two spec_k compiles of the ngram loop
def test_speculative_ngram_matches_greedy():
    """Prompt-lookup (draft_params=None) mode: output must equal greedy
    generate() — matches or misses in the history only move throughput."""
    cfg = DattnConfig.tiny()
    params = dattn.init_params(jax.random.PRNGKey(0), cfg, jnp.float32)
    rng = np.random.default_rng(8)
    B, T = 2, 10
    ids = np.asarray(rng.integers(3, cfg.text.vocab_size, (B, T)), np.int32)
    mask = np.zeros((B, T), bool)
    mask[0, :5] = True
    mask[1, :10] = True
    ids[0, 5:] = 0
    ids, mask = jnp.asarray(ids), jnp.asarray(mask)
    key = jax.random.PRNGKey(6)
    img, img_mask, aud, aud_mask = _mm_inputs(cfg, key, B)
    kw = dict(max_new_tokens=16, eos_id=2)

    want = generate(params, cfg, ids, mask, img=img, img_mask=img_mask,
                    aud=aud, aud_mask=aud_mask, **kw)
    for k in (2, 4):
        got = speculative_generate(
            params, cfg, None, None, ids, mask, img=img, img_mask=img_mask,
            aud=aud, aud_mask=aud_mask, spec_k=k, **kw)
        np.testing.assert_array_equal(np.asarray(got.tokens),
                                      np.asarray(want.tokens), f"spec_k={k}")
        np.testing.assert_array_equal(np.asarray(got.lengths),
                                      np.asarray(want.lengths))


def test_speculative_ngram_accepts_on_repetition():
    """An output that repeats a 2-gram pattern must be drafted from the
    lookup and accepted: fewer target passes than emitted tokens. Tiny
    greedy models loop (the smoke's 89%-self-acceptance effect), so any
    prompt works; assert the mechanism actually saved passes."""
    cfg = DattnConfig.tiny()
    params = dattn.init_params(jax.random.PRNGKey(0), cfg, jnp.float32)
    rng = np.random.default_rng(13)
    B, T, N = 1, 6, 24
    ids = jnp.asarray(rng.integers(3, cfg.text.vocab_size, (B, T)))
    mask = jnp.ones((B, T), bool)

    want = generate(params, cfg, ids, mask, max_new_tokens=N, eos_id=2)
    got = speculative_generate(params, cfg, None, None, ids, mask,
                               spec_k=4, max_new_tokens=N, eos_id=2)
    np.testing.assert_array_equal(np.asarray(got.tokens),
                                  np.asarray(want.tokens))
    emitted = int(want.lengths[0])
    if emitted >= 12:  # looping output: lookup must pay
        assert int(got.n_target_steps) < emitted, (
            int(got.n_target_steps), emitted)
        assert int(got.n_accepted[0]) > 0


def test_speculative_with_quantized_caches():
    """Speculative decode composes with int8 modality KV caches (the
    recommended int8kv config): verify_step reads the quantized caches
    through the same dattn_layer path as decode_step, and the identical-
    output contract holds against quantized greedy generate()."""
    cfg = DattnConfig.tiny()
    params = dattn.init_params(jax.random.PRNGKey(0), cfg, jnp.float32)
    rng = np.random.default_rng(21)
    B, T = 1, 6
    ids = jnp.asarray(rng.integers(3, cfg.text.vocab_size, (B, T)))
    mask = jnp.ones((B, T), bool)
    img, img_mask, aud, aud_mask = _mm_inputs(cfg, jax.random.PRNGKey(5), B)
    kw = dict(img=img, img_mask=img_mask, aud=aud, aud_mask=aud_mask,
              max_new_tokens=10, eos_id=2, quantize_caches=True)

    want = generate(params, cfg, ids, mask, **kw)
    got = speculative_generate(params, cfg, None, None, ids, mask,
                               spec_k=3, **kw)
    np.testing.assert_array_equal(np.asarray(got.tokens),
                                  np.asarray(want.tokens))


@pytest.mark.slow
def test_speculative_with_media_caches():
    """Speculative decode composes with shared-media serving
    (media_prefill + batch-1 caches serving multiple query rows)."""
    cfg = DattnConfig.tiny()
    params = dattn.init_params(jax.random.PRNGKey(0), cfg, jnp.float32)
    dcfg = _draft_cfg(cfg)
    draft = dattn.init_params(jax.random.PRNGKey(7), dcfg, jnp.float32)
    rng = np.random.default_rng(2)
    B, T = 2, 6
    ids = jnp.asarray(rng.integers(3, cfg.text.vocab_size, (B, T)))
    mask = jnp.ones((B, T), bool)
    key = jax.random.PRNGKey(4)
    img, img_mask, aud, aud_mask = _mm_inputs(cfg, key, 1)
    media = dattn.media_prefill(params, cfg, img=img, img_mask=img_mask,
                                aud=aud, aud_mask=aud_mask)
    kw = dict(max_new_tokens=8, eos_id=2, img_mask=img_mask,
              aud_mask=aud_mask, media_caches=media)

    want = generate(params, cfg, ids, mask, **kw)
    got = speculative_generate(params, cfg, draft, dcfg, ids, mask,
                               spec_k=2, **kw)
    np.testing.assert_array_equal(np.asarray(got.tokens),
                                  np.asarray(want.tokens))
