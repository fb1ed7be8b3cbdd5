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


def _exact_marginals(params, cfg, ids, warp, eos_id, n_pos):
    """Analytic per-position output marginals of sampled generate() for a
    batch-1 text-only prompt: chain law over the warped support, teacher-
    forced forwards enumerating every prefix (tiny vocab makes this exact).
    Accounts for eos absorption (tokens after eos are eos padding)."""
    from vidi_tpu.infer.generate import _warp_logits
    V = cfg.text.vocab_size
    T = ids.shape[1]

    def last_probs(batch_ids):
        b, t = batch_ids.shape
        mask = jnp.ones((b, t), bool)
        pos = jnp.broadcast_to(jnp.arange(t, dtype=jnp.int32), (b, t))
        emb = decoder.embed_tokens(params["text"], batch_ids, cfg.text)
        h, _ = dattn.forward(params, cfg, emb, mask, pos)
        logits = decoder.lm_logits(params["text"], h[:, -1], cfg.text)
        w = _warp_logits(jnp.asarray(logits, jnp.float32), *warp)
        return np.asarray(jax.nn.softmax(w, axis=-1), np.float64)

    marginals = []
    # prefixes: list of (token_tuple, prob); absorbed: prob mass already at eos
    prefixes = [((), 1.0)]
    absorbed = 0.0
    for _ in range(n_pos):
        batch = np.concatenate(
            [np.concatenate([np.asarray(ids), np.asarray([pfx], np.int32)],
                            axis=1) if pfx else np.asarray(ids)
             for pfx, _ in prefixes], axis=0)
        probs = last_probs(jnp.asarray(batch))  # [n_prefix, V]
        m = np.zeros(V)
        m[eos_id] += absorbed
        nxt = []
        for (pfx, w), p in zip(prefixes, probs):
            m += w * p
            for y in np.nonzero(p > 1e-9)[0]:
                if y == eos_id:
                    absorbed += w * p[y]
                else:
                    nxt.append((pfx + (int(y),), w * p[y]))
        marginals.append(m)
        prefixes = nxt
    return marginals


@pytest.mark.slow  # two vmapped spec compiles + enumeration forwards
def test_speculative_sampling_exact_distribution():
    """Rejection-sampling speculative decoding must leave the OUTPUT
    DISTRIBUTION exactly the warped target's, for both draft sources:
    compare empirical per-position marginals over 4096 seeded runs against
    the analytic chain law (enumerated over the warped support). A wrong
    acceptance/residual rule shifts bins by O(acceptance_gap), far outside
    the 5-sigma statistical band."""
    cfg = DattnConfig.tiny()
    params = dattn.init_params(jax.random.PRNGKey(0), cfg, jnp.float32)
    # a CLOSE draft (target + small perturbation) so both the accept and the
    # reject/residual branches carry real probability mass
    noise = jax.random.PRNGKey(77)
    draft = jax.tree_util.tree_map(
        lambda x: x + 0.03 * jax.random.normal(noise, x.shape, x.dtype)
        if jnp.issubdtype(x.dtype, jnp.floating) else x, params)

    rng = np.random.default_rng(3)
    T, NPOS, NS = 6, 2, 4096
    ids = jnp.asarray(rng.integers(3, cfg.text.vocab_size, (1, T)))
    mask = jnp.ones((1, T), bool)
    warp = (1.3, 8, 0.95)  # temperature, top_k, top_p
    eos = 2

    want = _exact_marginals(params, cfg, ids, warp, eos, NPOS)
    keys = jax.random.split(jax.random.PRNGKey(1234), NS)

    for name, (dp, dc) in (("model", (draft, cfg)), ("ngram", (None, None))):
        runner = jax.vmap(lambda k: speculative_generate(
            params, cfg, dp, dc, ids, mask, spec_k=1, max_new_tokens=NPOS,
            eos_id=eos, temperature=warp[0], top_k=warp[1], top_p=warp[2],
            rng=k))
        res = runner(keys)
        toks = np.asarray(res.tokens)[:, 0]  # [NS, NPOS]
        if name == "model":
            # the close draft must actually exercise the accept branch
            assert int(np.asarray(res.n_accepted).sum()) > NS // 10
        for pos in range(NPOS):
            f = np.bincount(toks[:, pos],
                            minlength=cfg.text.vocab_size) / NS
            m = want[pos]
            tol = 5 * np.sqrt(m * (1 - m) / NS) + 2 / NS
            bad = np.abs(f - m) > tol
            assert not bad.any(), (
                f"{name} pos {pos}: bins {np.nonzero(bad)[0][:5]} "
                f"emp {f[bad][:5]} vs exact {m[bad][:5]}")


def test_speculative_sampling_self_draft_accepts():
    """Draft == target with the same warping: acceptance prob is
    min(1, p/q) = 1, so (numerical noise aside) every proposal commits and
    the loop needs ~max_new/(spec_k+1) target passes — the sampling-mode
    analogue of the greedy self-draft test."""
    cfg = DattnConfig.tiny()
    params = dattn.init_params(jax.random.PRNGKey(0), cfg, jnp.float32)
    rng = np.random.default_rng(17)
    ids = jnp.asarray(rng.integers(3, cfg.text.vocab_size, (1, 6)))
    mask = jnp.ones((1, 6), bool)
    got = speculative_generate(
        params, cfg, params, cfg, ids, mask, spec_k=3, max_new_tokens=12,
        eos_id=2, temperature=0.9, top_k=0, top_p=1.0,
        rng=jax.random.PRNGKey(5))
    drafted = max(int(got.n_drafted.sum()), 1)
    assert int(got.n_accepted.sum()) / drafted > 0.9, (
        int(got.n_accepted.sum()), drafted)


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
