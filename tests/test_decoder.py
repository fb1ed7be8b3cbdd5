"""Decoder backbone + Dattn composition tests."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp
import torch

from vidi_tpu.core.config import DattnConfig, TextConfig
from vidi_tpu.infer.convert import convert_text
from vidi_tpu.models import dattn, decoder


def _tiny_text_cfg():
    return TextConfig(
        arch="gemma2", vocab_size=128, hidden_size=32, num_layers=3,
        num_heads=4, num_kv_heads=2, head_dim=8, intermediate_size=64,
        sliding_window=8, attn_softcap=50.0, final_softcap=30.0,
        query_scale=8.0**-0.5, embed_scale=True, hidden_act="gelu_tanh",
        double_norms=True, tie_word_embeddings=True,
    )


def test_gemma2_text_matches_hf():
    """Text-only Dattn forward must reproduce HF Gemma2ForCausalLM logits."""
    from transformers import Gemma2Config, Gemma2ForCausalLM

    hf_cfg = Gemma2Config(
        vocab_size=128, hidden_size=32, intermediate_size=64,
        num_hidden_layers=3, num_attention_heads=4, num_key_value_heads=2,
        head_dim=8, sliding_window=8, query_pre_attn_scalar=8,
        attn_logit_softcapping=50.0, final_logit_softcapping=30.0,
        attn_implementation="eager",
    )
    torch.manual_seed(0)
    hf = Gemma2ForCausalLM(hf_cfg).eval()

    tcfg = _tiny_text_cfg()
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    params = convert_text(sd, tcfg, dtype=jnp.float32)

    B, T = 2, 11
    ids = np.random.default_rng(0).integers(0, 128, (B, T))
    mask = np.ones((B, T), bool)
    mask[1, -3:] = False
    pos = np.maximum(np.cumsum(mask, 1) - 1, 0).astype(np.int32)

    cfg = DattnConfig(text=tcfg)
    embeds = decoder.embed_tokens(params, jnp.asarray(ids), tcfg)
    h, _ = dattn.forward(
        {"text": params}, cfg, embeds,
        jnp.asarray(mask), jnp.asarray(pos),
    )
    got = np.asarray(decoder.lm_logits(params, h, tcfg))

    with torch.no_grad():
        out = hf(torch.tensor(ids), attention_mask=torch.tensor(mask))
    want = out.logits.numpy()
    # compare only valid positions (HF pads differently)
    np.testing.assert_allclose(got[mask], want[mask], rtol=3e-4, atol=3e-4)


def test_mistral_text_matches_hf():
    from transformers import MistralConfig, MistralForCausalLM

    hf_cfg = MistralConfig(
        vocab_size=128, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=8, sliding_window=None, rope_theta=10000.0, rms_norm_eps=1e-5,
        attn_implementation="eager",
    )
    torch.manual_seed(1)
    hf = MistralForCausalLM(hf_cfg).eval()

    tcfg = TextConfig(
        arch="mistral", vocab_size=128, hidden_size=32, num_layers=2,
        num_heads=4, num_kv_heads=2, head_dim=8, intermediate_size=64,
        rope_theta=10000.0, rms_norm_eps=1e-5, sliding_window=None,
        attn_softcap=None, final_softcap=None, embed_scale=False,
        hidden_act="silu", double_norms=False, tie_word_embeddings=False,
    )
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    params = convert_text(sd, tcfg, dtype=jnp.float32)

    B, T = 2, 7
    ids = np.random.default_rng(2).integers(0, 128, (B, T))
    mask = np.ones((B, T), bool)
    pos = np.maximum(np.cumsum(mask, 1) - 1, 0).astype(np.int32)

    cfg = DattnConfig(text=tcfg)
    embeds = decoder.embed_tokens(params, jnp.asarray(ids), tcfg)
    h, _ = dattn.forward({"text": params}, cfg, embeds,
                         jnp.asarray(mask), jnp.asarray(pos))
    got = np.asarray(decoder.lm_logits(params, h, tcfg))
    with torch.no_grad():
        want = hf(torch.tensor(ids)).logits.numpy()
    np.testing.assert_allclose(got, want, rtol=3e-4, atol=3e-4)


def _tiny_mm_inputs(cfg, key, B=2, T=9, S_img=12, S_aud=7):
    d = cfg.text.hidden_size
    ks = jax.random.split(key, 4)
    embeds = jax.random.normal(ks[0], (B, T, d), jnp.float32) * 0.1
    img = jax.random.normal(ks[1], (B, S_img, d), jnp.float32) * 0.1
    aud = jax.random.normal(ks[2], (B, S_aud, d), jnp.float32) * 0.1
    img_mask = np.ones((B, S_img), bool)
    img_mask[1, -4:] = False
    aud_mask = np.ones((B, S_aud), bool)
    aud_mask[0, -2:] = False
    return embeds, img, aud, jnp.asarray(img_mask), jnp.asarray(aud_mask)


def test_prefill_decode_matches_full_forward():
    """Greedy decode over caches must equal teacher-forced full forward."""
    cfg = DattnConfig.tiny()
    key = jax.random.PRNGKey(0)
    params = dattn.init_params(key, cfg, jnp.float32)
    B, T_prompt, T_extra = 2, 6, 3
    T = T_prompt + T_extra
    ids = np.random.default_rng(3).integers(0, cfg.text.vocab_size, (B, T))
    mask = np.ones((B, T), bool)
    pos = np.arange(T, dtype=np.int32)[None].repeat(B, 0)
    embeds, img, aud, img_mask, aud_mask = _tiny_mm_inputs(cfg, key, B, T)
    embeds = decoder.embed_tokens(params["text"], jnp.asarray(ids), cfg.text)

    # Full teacher-forced forward
    h_full, _ = dattn.forward(
        params, cfg, embeds, jnp.asarray(mask), jnp.asarray(pos),
        img=img, img_mask=img_mask, aud=aud, aud_mask=aud_mask)
    logits_full = np.asarray(
        decoder.lm_logits(params["text"], h_full, cfg.text))

    # Prefill prompt, then decode the remaining tokens one at a time.
    h_pre, caches = dattn.forward(
        params, cfg, embeds[:, :T_prompt],
        jnp.asarray(mask[:, :T_prompt]), jnp.asarray(pos[:, :T_prompt]),
        img=img, img_mask=img_mask, aud=aud, aud_mask=aud_mask,
        return_caches=True)
    np.testing.assert_allclose(
        np.asarray(h_pre), np.asarray(h_full[:, :T_prompt]), rtol=2e-4, atol=2e-4)

    # Pad text cache to full length
    s_max = T
    pad = s_max - T_prompt
    caches = caches._replace(  # [L, B, Hk, S, D]
        text_k=jnp.pad(caches.text_k, ((0, 0), (0, 0), (0, 0), (0, pad), (0, 0))),
        text_v=jnp.pad(caches.text_v, ((0, 0), (0, 0), (0, 0), (0, pad), (0, 0))),
    )
    cur = jnp.full((B,), T_prompt, jnp.int32)
    for step in range(T_extra):
        tok = jnp.asarray(ids[:, T_prompt + step: T_prompt + step + 1])
        emb = decoder.embed_tokens(params["text"], tok, cfg.text)
        logits, caches = dattn.decode_step(
            params, cfg, emb, cur, caches, img_mask=img_mask, aud_mask=aud_mask)
        want = logits_full[:, T_prompt + step]
        np.testing.assert_allclose(np.asarray(logits), want, rtol=2e-3, atol=2e-3)
        cur = cur + 1


def test_absent_modality_streams_are_noops():
    """Samples with empty modality masks must match a text-only forward."""
    cfg = DattnConfig.tiny()
    params = dattn.init_params(jax.random.PRNGKey(1), cfg, jnp.float32)
    B, T = 2, 5
    key = jax.random.PRNGKey(2)
    embeds = jax.random.normal(key, (B, T, cfg.text.hidden_size)) * 0.1
    mask = jnp.ones((B, T), bool)
    pos = jnp.broadcast_to(jnp.arange(T, dtype=jnp.int32), (B, T))

    img = jax.random.normal(key, (B, 6, cfg.text.hidden_size))
    img_mask = jnp.zeros((B, 6), bool)  # nobody has an image
    h_mm, _ = dattn.forward(params, cfg, embeds, mask, pos,
                            img=img, img_mask=img_mask)
    h_text, _ = dattn.forward(params, cfg, embeds, mask, pos)
    np.testing.assert_allclose(np.asarray(h_mm), np.asarray(h_text),
                               rtol=1e-5, atol=1e-5)


def test_encode_video_images_shapes_and_mask():
    cfg = DattnConfig.tiny()
    params = dattn.init_params(jax.random.PRNGKey(0), cfg, jnp.float32)
    B, N = 2, 5
    imgs = jax.random.normal(
        jax.random.PRNGKey(1), (B, N, cfg.vision.image_size, cfg.vision.image_size, 3))
    counts = jnp.asarray([5, 3], jnp.int32)
    from vidi_tpu.models.adapters import budget_hw
    hw = budget_hw(B * N, cfg.mm_image_pool_size, cfg.vision.num_patches_per_side)
    feats, mask = dattn.encode_video_images(params, cfg, imgs, counts, hw)
    h2 = (cfg.vision.num_patches_per_side + 1) // cfg.mm_image_pool_size
    assert feats.shape == (B, N * h2 * h2, cfg.text.hidden_size)
    m = np.asarray(mask)
    assert m[0].all()
    assert m[1, : 3 * h2 * h2].all() and not m[1, 3 * h2 * h2:].any()
    # masked positions are exactly zero
    assert np.abs(np.asarray(feats)[1, 3 * h2 * h2:]).max() == 0.0


def test_encode_video_audios_sizes():
    cfg = DattnConfig.tiny()
    params = dattn.init_params(jax.random.PRNGKey(0), cfg, jnp.float32)
    B, W = 2, 2
    mels = jax.random.normal(
        jax.random.PRNGKey(1), (B, W, cfg.audio.num_mel_bins, cfg.audio.nb_max_frames))
    sizes = jnp.asarray([4000, 3000], jnp.int32)  # mel frames
    feats, mask = dattn.encode_video_audios(params, cfg, mels, sizes)
    pool = cfg.mm_audio_pool_size
    # enc frames = floor(size * 1500/3000); tokens = enc // pool
    want0 = (4000 // 2) // pool
    want1 = (3000 // 2) // pool
    m = np.asarray(mask)
    assert m[0].sum() == want0 and m[1].sum() == want1
    assert feats.shape[1] == W * cfg.audio.max_source_positions // pool


def test_generate_batched_mixed_lengths():
    """B=2 with different prompt lengths: each sample decodes from its own
    last real token; eos stops samples independently."""
    cfg = DattnConfig.tiny()
    params = dattn.init_params(jax.random.PRNGKey(0), cfg, jnp.float32)
    rng = np.random.default_rng(7)
    b, t = 2, 10
    ids = np.asarray(rng.integers(3, cfg.text.vocab_size, (b, t)), np.int32)
    mask = np.zeros((b, t), bool)
    mask[0, :4] = True   # short prompt
    mask[1, :10] = True  # full prompt
    ids[0, 4:] = 0

    from vidi_tpu.infer.generate import generate
    res = generate(params, cfg, jnp.asarray(ids), jnp.asarray(mask),
                   max_new_tokens=5, eos_id=2)
    assert res.tokens.shape == (2, 5)
    assert res.lengths.shape == (2,)
    assert (np.asarray(res.lengths) >= 1).all()

    # single-sample run of sample 0 must match its batched result
    res0 = generate(params, cfg, jnp.asarray(ids[:1, :4]),
                    jnp.asarray(mask[:1, :4]), max_new_tokens=5, eos_id=2)
    n = min(int(res.lengths[0]), int(res0.lengths[0]))
    np.testing.assert_array_equal(np.asarray(res.tokens[0, :n]),
                                  np.asarray(res0.tokens[0, :n]))


@pytest.mark.slow
def test_shared_media_caches_match_per_row_prefill():
    """media_prefill + generate(media_caches=...): one batch-1 stream prefill
    shared by q query rows must reproduce the plain path (which redoes the
    stream per row) — hidden states and greedy tokens, bf16/fp32 exact-math
    equivalent (the stream never reads text, gemma.py:176-201)."""
    from vidi_tpu.infer.generate import generate

    cfg = DattnConfig.tiny()
    params = dattn.init_params(jax.random.PRNGKey(0), cfg, jnp.float32)
    rng = np.random.default_rng(13)
    q_rows, t = 3, 7
    d = cfg.text.hidden_size
    ids = np.asarray(rng.integers(3, cfg.text.vocab_size, (q_rows, t)), np.int32)
    mask = np.ones((q_rows, t), bool)
    img = jnp.asarray(rng.standard_normal((1, 24, d)) * 0.1, jnp.float32)
    img_mask = jnp.asarray(np.arange(24)[None] < 20)
    aud = jnp.asarray(rng.standard_normal((1, 12, d)) * 0.1, jnp.float32)
    aud_mask = jnp.ones((1, 12), bool)

    for quant in (False, True):
        media = dattn.media_prefill(params, cfg, img=img, img_mask=img_mask,
                                    aud=aud, aud_mask=aud_mask,
                                    quantize_caches=quant)
        shared = generate(params, cfg, jnp.asarray(ids), jnp.asarray(mask),
                          img_mask=img_mask, aud_mask=aud_mask,
                          max_new_tokens=5, eos_id=2, media_caches=media)
        bcast = lambda a: jnp.broadcast_to(a, (q_rows,) + a.shape[1:])
        plain = generate(params, cfg, jnp.asarray(ids), jnp.asarray(mask),
                         img=bcast(img), img_mask=bcast(img_mask),
                         aud=bcast(aud), aud_mask=bcast(aud_mask),
                         max_new_tokens=5, eos_id=2, quantize_caches=quant)
        np.testing.assert_array_equal(np.asarray(shared.tokens),
                                      np.asarray(plain.tokens),
                                      err_msg=f"quant={quant}")

    # hidden-state check: text prefill against caches == forward's h
    from vidi_tpu.models import decoder as dec
    media = dattn.media_prefill(params, cfg, img=img, img_mask=img_mask,
                                aud=aud, aud_mask=aud_mask)
    positions = jnp.broadcast_to(jnp.arange(t, dtype=jnp.int32), (q_rows, t))
    embeds = dec.embed_tokens(params["text"], jnp.asarray(ids), cfg.text)
    h_shared, caches = dattn.text_prefill_with_caches(
        params, cfg, embeds, jnp.asarray(mask), positions, media,
        img_mask=img_mask, aud_mask=aud_mask)
    h_plain, _ = dattn.forward(
        params, cfg, embeds, jnp.asarray(mask), positions,
        img=jnp.broadcast_to(img, (q_rows,) + img.shape[1:]),
        img_mask=jnp.broadcast_to(img_mask, (q_rows, 24)),
        aud=jnp.broadcast_to(aud, (q_rows,) + aud.shape[1:]),
        aud_mask=jnp.broadcast_to(aud_mask, (q_rows, 12)))
    np.testing.assert_allclose(np.asarray(h_shared), np.asarray(h_plain),
                               rtol=2e-5, atol=2e-5)
    assert caches.text_k.shape[1] == q_rows  # fresh per-row text cache
    assert caches.img_k.shape[1] == 1        # shared media cache, batch 1

    # flash route: the cache reads tile in VMEM instead of materializing
    # O(T*S) dense logits (the production TPU path for shared-media serving)
    from vidi_tpu.ops.pallas import flash_attention as fa
    prev = fa.INTERPRET
    fa.INTERPRET = True
    try:
        h_flash, _ = dattn.text_prefill_with_caches(
            params, cfg, embeds, jnp.asarray(mask), positions, media,
            img_mask=img_mask, aud_mask=aud_mask, use_flash=True)
    finally:
        fa.INTERPRET = prev
    np.testing.assert_allclose(np.asarray(h_flash), np.asarray(h_shared),
                               rtol=2e-5, atol=2e-5)


def test_generate_keyword_stop():
    """In-loop keyword stopping (reference KeywordsStoppingCriteria,
    img_utils.py:326-358): decode halts as soon as the output ends with a
    stop keyword; the tokens up to and including the keyword are identical
    to an unstopped run."""
    from vidi_tpu.infer.generate import generate

    cfg = DattnConfig.tiny()
    params = dattn.init_params(jax.random.PRNGKey(0), cfg, jnp.float32)
    rng = np.random.default_rng(11)
    ids = np.asarray(rng.integers(3, cfg.text.vocab_size, (1, 6)), np.int32)
    mask = np.ones((1, 6), bool)

    # free-running reference (eos_id chosen so it never fires)
    free = generate(params, cfg, jnp.asarray(ids), jnp.asarray(mask),
                    max_new_tokens=12, eos_id=1)
    toks = np.asarray(free.tokens[0])
    assert int(free.lengths[0]) == 12  # really ran the full 12 steps

    # 2-token stop keyword at its FIRST occurrence: the earliest j with
    # (toks[j-1], toks[j]) is where decode must halt; tokens before it match
    # the free run and everything after is eos padding
    kw = (int(toks[0]), int(toks[1]))
    j = next(i for i in range(1, 12)
             if (int(toks[i - 1]), int(toks[i])) == kw)
    stopped = generate(params, cfg, jnp.asarray(ids), jnp.asarray(mask),
                       max_new_tokens=12, eos_id=1, stop_sequences=(kw,))
    np.testing.assert_array_equal(np.asarray(stopped.tokens[0, :j + 1]),
                                  toks[:j + 1])
    np.testing.assert_array_equal(np.asarray(stopped.tokens[0, j + 1:]), 1)

    # a keyword that never occurs must not stop anything
    never = generate(params, cfg, jnp.asarray(ids), jnp.asarray(mask),
                     max_new_tokens=12, eos_id=1,
                     stop_sequences=((int(toks[0]), 2),))
    np.testing.assert_array_equal(np.asarray(never.tokens[0]), toks)

    # single-token keyword matching the FIRST (prefill-argmax) token stops
    # before any decode step runs
    first = generate(params, cfg, jnp.asarray(ids), jnp.asarray(mask),
                     max_new_tokens=12, eos_id=1,
                     stop_sequences=((int(toks[0]),),))
    np.testing.assert_array_equal(np.asarray(first.tokens[0, 1:]), 1)


def test_warp_logits_matches_numpy_reference():
    """_warp_logits == HF's temperature -> top-k -> top-p warper stack
    (transformers LogitsProcessorList the reference's generate inherits,
    gemma.py:603-655), checked against a direct numpy re-derivation."""
    from vidi_tpu.infer.generate import _warp_logits

    rng = np.random.default_rng(0)
    logits = rng.standard_normal((3, 17)).astype(np.float32)
    temperature, top_k, top_p = 0.7, 5, 0.8

    out = np.asarray(_warp_logits(jnp.asarray(logits), temperature, top_k,
                                  top_p))

    ref = logits / temperature
    # top-k: mask everything below the kth best
    kth = np.sort(ref, axis=-1)[:, -top_k][:, None]
    ref = np.where(ref < kth, -np.inf, ref)
    # top-p on the survivors: keep the smallest descending-prob prefix
    # reaching top_p (first token always kept)
    for r in range(ref.shape[0]):
        order = np.argsort(-ref[r])
        probs = np.exp(ref[r][order] - np.max(ref[r][order]))
        probs = probs / probs.sum()
        cum = np.cumsum(probs)
        keep = (cum - probs) < top_p
        keep[0] = True
        drop = order[~keep]
        ref[r][drop] = -np.inf

    finite = np.isfinite(ref)
    np.testing.assert_array_equal(np.isfinite(out), finite)
    np.testing.assert_allclose(out[finite], ref[finite], rtol=1e-6)

    # ties at the nucleus boundary (softcap-saturated logits): exact
    # sorted-prefix semantics must keep only the prefix COUNT, not every
    # tied token (a threshold compare would keep all 6 here)
    tied = np.full((1, 6), 30.0, np.float32)
    out_t = np.asarray(_warp_logits(jnp.asarray(tied), 1.0, 0, 0.5))
    assert np.isfinite(out_t).sum() == 3, out_t  # ceil(0.5 * 6)


def test_generate_sampling_greedy_limits_and_determinism():
    """temperature->0 == greedy; top_k=1 == greedy at any temperature; a
    seeded sampling run is reproducible and (at high temperature) actually
    diverges from greedy."""
    from vidi_tpu.infer.generate import generate

    cfg = DattnConfig.tiny()
    params = dattn.init_params(jax.random.PRNGKey(0), cfg, jnp.float32)
    rng = np.random.default_rng(3)
    ids = jnp.asarray(rng.integers(3, cfg.text.vocab_size, (1, 6)), jnp.int32)
    mask = jnp.ones((1, 6), bool)
    kw = dict(max_new_tokens=8, eos_id=1)

    greedy = np.asarray(generate(params, cfg, ids, mask, **kw).tokens)
    cold = np.asarray(generate(params, cfg, ids, mask, temperature=1e-4,
                               rng=jax.random.PRNGKey(0), **kw).tokens)
    np.testing.assert_array_equal(cold, greedy)

    topk1 = np.asarray(generate(params, cfg, ids, mask, temperature=5.0,
                                top_k=1, rng=jax.random.PRNGKey(0),
                                **kw).tokens)
    np.testing.assert_array_equal(topk1, greedy)

    hot_a = np.asarray(generate(params, cfg, ids, mask, temperature=8.0,
                                top_p=0.95, rng=jax.random.PRNGKey(5),
                                **kw).tokens)
    hot_b = np.asarray(generate(params, cfg, ids, mask, temperature=8.0,
                                top_p=0.95, rng=jax.random.PRNGKey(5),
                                **kw).tokens)
    np.testing.assert_array_equal(hot_a, hot_b)
    hot_c = np.asarray(generate(params, cfg, ids, mask, temperature=8.0,
                                top_p=0.95, rng=jax.random.PRNGKey(6),
                                **kw).tokens)
    assert not (np.array_equal(hot_a, greedy)
                and np.array_equal(hot_c, greedy)), (
        "tiny-vocab sampling at temperature 8 should diverge from greedy "
        "for at least one of two seeds")


def test_beam_generate_k1_matches_greedy_and_shared_caches():
    """num_beams=1 beam search == greedy generate (token-for-token); the
    media_caches (shared batch-1 stream) beam path matches the raw-features
    beam path; eos-as-argmax finishes all beams at length 1."""
    from vidi_tpu.infer.generate import beam_generate, generate

    cfg = DattnConfig.tiny()
    params = dattn.init_params(jax.random.PRNGKey(0), cfg, jnp.float32)
    rng = np.random.default_rng(11)
    ids = jnp.asarray(rng.integers(3, cfg.text.vocab_size, (1, 6)), jnp.int32)
    mask = jnp.ones((1, 6), bool)
    d = cfg.text.hidden_size
    img = jnp.asarray(rng.standard_normal((1, 24, d)) * 0.1, jnp.float32)
    im = jnp.ones((1, 24), bool)
    kw = dict(img_mask=im, max_new_tokens=6, eos_id=1)

    greedy = generate(params, cfg, ids, mask, img=img, **kw)
    beam1 = beam_generate(params, cfg, ids, mask, img=img, num_beams=1, **kw)
    np.testing.assert_array_equal(np.asarray(beam1.tokens),
                                  np.asarray(greedy.tokens))
    np.testing.assert_array_equal(np.asarray(beam1.lengths),
                                  np.asarray(greedy.lengths))

    # beams over shared media caches == beams over raw features
    media = dattn.media_prefill(params, cfg, img=img, img_mask=im)
    beam4 = beam_generate(params, cfg, ids, mask, img=img, num_beams=4, **kw)
    beam4m = beam_generate(params, cfg, ids, mask, media_caches=media,
                           num_beams=4, **kw)
    np.testing.assert_array_equal(np.asarray(beam4.tokens),
                                  np.asarray(beam4m.tokens))

    # eos == the prefill argmax: every beam finishes immediately
    first = int(np.asarray(greedy.tokens)[0, 0])
    insta = beam_generate(params, cfg, ids, mask, img=img, num_beams=3,
                          img_mask=im, max_new_tokens=6, eos_id=first)
    assert int(np.asarray(insta.lengths)[0]) == 1


def test_beam_generate_batched_matches_per_query():
    """Batched beam search (B queries x K beams, beams row-major by query
    riding the group fold in _xattn_block) == per-query beam_generate calls,
    for BOTH per-row media and a shared batch-1 media cache. Softcap is
    squashed so the search genuinely branches."""
    import dataclasses

    from vidi_tpu.infer.generate import beam_generate

    base = DattnConfig.tiny()
    cfg = dataclasses.replace(
        base, text=dataclasses.replace(base.text, final_softcap=0.02))
    params = dattn.init_params(jax.random.PRNGKey(3), cfg, jnp.float32)
    rng = np.random.default_rng(9)
    B, T, K = 2, 6, 3
    ids = jnp.asarray(rng.integers(3, cfg.text.vocab_size, (B, T)), jnp.int32)
    mask = jnp.ones((B, T), bool)
    d = cfg.text.hidden_size
    img = jnp.asarray(rng.standard_normal((B, 20, d)) * 0.1, jnp.float32)
    im = jnp.ones((B, 20), bool)
    kw = dict(max_new_tokens=5, eos_id=1, num_beams=K)

    # per-row media features
    want = [beam_generate(params, cfg, ids[r:r + 1], mask[r:r + 1],
                          img=img[r:r + 1], img_mask=im[r:r + 1], **kw)
            for r in range(B)]
    got = beam_generate(params, cfg, ids, mask, img=img, img_mask=im, **kw)
    for r in range(B):
        np.testing.assert_array_equal(np.asarray(got.tokens)[r],
                                      np.asarray(want[r].tokens)[0], f"row {r}")
        assert int(got.lengths[r]) == int(want[r].lengths[0])

    # shared batch-1 media cache (same video, B query rows)
    media = dattn.media_prefill(params, cfg, img=img[:1], img_mask=im[:1])
    want_m = [beam_generate(params, cfg, ids[r:r + 1], mask[r:r + 1],
                            media_caches=media, img_mask=im[:1], **kw)
              for r in range(B)]
    got_m = beam_generate(params, cfg, ids, mask, media_caches=media,
                          img_mask=im[:1], **kw)
    for r in range(B):
        np.testing.assert_array_equal(np.asarray(got_m.tokens)[r],
                                      np.asarray(want_m[r].tokens)[0])


def test_beam_generate_batched_quantized_caches():
    """Batched beams over per-row INT8 media caches (the int8kv serving
    config): the quantized read path must group-fold exactly like bf16 —
    batched == per-query, row for row."""
    import dataclasses

    from vidi_tpu.infer.generate import beam_generate

    base = DattnConfig.tiny()
    cfg = dataclasses.replace(
        base, text=dataclasses.replace(base.text, final_softcap=0.02))
    params = dattn.init_params(jax.random.PRNGKey(3), cfg, jnp.float32)
    rng = np.random.default_rng(23)
    B, T, K = 2, 6, 2
    ids = jnp.asarray(rng.integers(3, cfg.text.vocab_size, (B, T)), jnp.int32)
    mask = jnp.ones((B, T), bool)
    d = cfg.text.hidden_size
    img = jnp.asarray(rng.standard_normal((B, 16, d)) * 0.1, jnp.float32)
    im = jnp.ones((B, 16), bool)
    kw = dict(max_new_tokens=4, eos_id=1, num_beams=K, quantize_caches=True)

    want = [beam_generate(params, cfg, ids[r:r + 1], mask[r:r + 1],
                          img=img[r:r + 1], img_mask=im[r:r + 1], **kw)
            for r in range(B)]
    got = beam_generate(params, cfg, ids, mask, img=img, img_mask=im, **kw)
    for r in range(B):
        np.testing.assert_array_equal(np.asarray(got.tokens)[r],
                                      np.asarray(want[r].tokens)[0], f"row {r}")


@pytest.mark.slow
def test_beam_generate_matches_numpy_oracle():
    """beam_generate == a numpy re-implementation of the same static
    frozen-beam algorithm driven by TEACHER-FORCED conditional log-probs
    (each oracle step reruns dattn.forward on prompt+prefix — the
    decode-cache path and the search bookkeeping are checked together).
    final_softcap is squashed so the distribution is flat enough that the
    search genuinely branches (unsquashed random tiny models degenerate to
    one repeated token and beam == greedy vacuously)."""
    import dataclasses

    from vidi_tpu.infer.generate import beam_generate

    base = DattnConfig.tiny()
    cfg = dataclasses.replace(
        base, text=dataclasses.replace(base.text, final_softcap=0.02))
    params = dattn.init_params(jax.random.PRNGKey(3), cfg, jnp.float32)
    rng = np.random.default_rng(5)
    t0, n_new, K, eos = 4, 4, 3, 1
    ids = np.asarray(rng.integers(3, cfg.text.vocab_size, (1, t0)), np.int32)
    mask = jnp.ones((1, t0), bool)

    def cond_logp(prefix):
        """log P(. | prompt + prefix) teacher-forced, fp32."""
        full = jnp.asarray(np.concatenate([ids[0], prefix])[None], jnp.int32)
        m = jnp.ones_like(full, bool)
        pos = jnp.maximum(jnp.cumsum(m, axis=1) - 1, 0).astype(jnp.int32)
        embeds = decoder.embed_tokens(params["text"], full, cfg.text)
        h, _ = dattn.forward(params, cfg, embeds, m, pos)
        logits = decoder.lm_logits(params["text"], h[:, -1], cfg.text)[0]
        return np.asarray(jax.nn.log_softmax(logits.astype(jnp.float32)))

    # ---- numpy frozen-beam oracle (same semantics as beam_generate)
    v = cfg.text.vocab_size
    lp0 = cond_logp(np.zeros((0,), np.int32))
    order = np.argsort(-lp0, kind="stable")[:K]
    scores = lp0[order]
    beams = [[int(tk)] for tk in order]
    done = [int(tk) == eos for tk in order]
    lengths = [1] * K
    frozen = np.full((v,), -np.inf)
    frozen[eos] = 0.0
    for step in range(1, n_new):
        if all(done):
            break
        rows = np.stack([frozen if done[i]
                         else cond_logp(np.asarray(beams[i], np.int32))
                         for i in range(K)])
        total = scores[:, None] + rows
        flat = total.reshape(-1)
        pick = np.argsort(-flat, kind="stable")[:K]
        parents, toks = pick // v, pick % v
        beams = [beams[p] + [int(tk)] for p, tk in zip(parents, toks)]
        new_done, new_len = [], []
        for p, tk in zip(parents, toks):
            was = done[p]
            new_done.append(was or int(tk) == eos)
            new_len.append(lengths[p] if was else step + 1)
        scores, done, lengths = flat[pick], new_done, new_len
    lengths = [l if d else n_new for l, d in zip(lengths, done)]
    final = scores / np.asarray(lengths, np.float64)
    if any(done):
        final = np.where(done, final, -np.inf)
    best = int(np.argmax(final))
    want = beams[best] + [eos] * (n_new - len(beams[best]))

    got = beam_generate(params, cfg, jnp.asarray(ids), mask,
                        max_new_tokens=n_new, eos_id=eos, num_beams=K)
    np.testing.assert_array_equal(np.asarray(got.tokens)[0], want)
    assert int(got.lengths[0]) == lengths[best]

    # non-vacuous: the search must actually have branched across parents
    greedy_chain = [int(np.argmax(lp0))]
    for _ in range(1, n_new):
        greedy_chain.append(int(np.argmax(
            cond_logp(np.asarray(greedy_chain, np.int32)))))
    assert want[:n_new] != greedy_chain or len(set(want)) > 1


@pytest.mark.slow
def test_media_prefill_chunked_matches_media_prefill():
    """media_prefill_chunked (chunk-major, layers-inner — the >2 h
    single-chip memory path) must produce cache-identical output to
    media_prefill's layer-major scan, bf16-exact, including int8 cache
    quantization and a non-dividing tail chunk; and generate() over the
    chunked caches must emit the same tokens."""
    from vidi_tpu.infer.generate import generate

    cfg = DattnConfig.tiny()
    params = dattn.init_params(jax.random.PRNGKey(0), cfg, jnp.float32)
    rng = np.random.default_rng(9)
    d = cfg.text.hidden_size
    img = jnp.asarray(rng.standard_normal((1, 37, d)) * 0.1, jnp.float32)
    aud = jnp.asarray(rng.standard_normal((1, 14, d)) * 0.1, jnp.float32)
    im, am = jnp.ones((1, 37), bool), jnp.ones((1, 14), bool)

    want = dattn.media_prefill(params, cfg, img=img, img_mask=im,
                               aud=aud, aud_mask=am)
    got = dattn.media_prefill_chunked(params, cfg, img=img, aud=aud,
                                      chunk_tokens=16)  # 37 = 2*16 + tail 5
    for name in ("img_k", "img_v", "aud_k", "aud_v"):
        np.testing.assert_allclose(np.asarray(getattr(got, name)),
                                   np.asarray(getattr(want, name)),
                                   rtol=0, atol=0, err_msg=name)

    wq = dattn.media_prefill(params, cfg, img=img, img_mask=im,
                             quantize_caches=True)
    gq = dattn.media_prefill_chunked(params, cfg, img=img, chunk_tokens=16,
                                     quantize_caches=True)
    for name in ("img_k", "img_v"):
        a, b = getattr(gq, name), getattr(wq, name)
        for key in a:
            np.testing.assert_allclose(np.asarray(a[key]),
                                       np.asarray(b[key]), rtol=0, atol=0,
                                       err_msg=f"{name}.{key}")

    ids = jnp.asarray(rng.integers(3, cfg.text.vocab_size, (1, 5)), jnp.int32)
    mask = jnp.ones((1, 5), bool)
    r_want = generate(params, cfg, ids, mask, img_mask=im, aud_mask=am,
                      media_caches=want, max_new_tokens=5, eos_id=1)
    r_got = generate(params, cfg, ids, mask, img_mask=im, aud_mask=am,
                     media_caches=got, max_new_tokens=5, eos_id=1)
    np.testing.assert_array_equal(np.asarray(r_got.tokens),
                                  np.asarray(r_want.tokens))
