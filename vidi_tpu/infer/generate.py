"""Generation with fixed-shape caches under one jitted while_loop.

Replaces the reference's HF generate() plumbing
(reference: Vidi1.5_9B/vidi/model/lmm/dattn/gemma.py:603-687): prefill fills
the three KV caches, then a lax.while_loop decodes up to `max_new_tokens`,
stopping early when every sample has emitted `eos_id`. Greedy by default
(do_sample=False, max_new 1024, eos 107 — eval/inference.py:40-50);
temperature/top-k/top-p sampling (the HF GenerationMixin warper stack the
reference inherits) runs inside the same loop when temperature > 0.

Shapes are static: prompt length and max_new_tokens define the text-cache
size, so the compiled program is reused across calls with the same buckets.
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from vidi_tpu.core.config import DattnConfig
from vidi_tpu.models import dattn, decoder


class GenerateResult(NamedTuple):
    tokens: jnp.ndarray   # [B, max_new] int32 (eos included; padded with eos)
    lengths: jnp.ndarray  # [B] int32 — tokens emitted incl. eos


class SpecGenerateResult(NamedTuple):
    tokens: jnp.ndarray     # [B, max_new] int32 (eos included; padded with eos)
    lengths: jnp.ndarray    # [B] int32 — tokens emitted incl. eos
    n_target_steps: jnp.ndarray  # scalar int32 — verify forwards run
    n_drafted: jnp.ndarray  # [B] int32 — draft tokens proposed
    n_accepted: jnp.ndarray  # [B] int32 — draft tokens accepted


def tokenize_stop_keywords(keywords, tokenizer) -> tuple:
    """Keyword strings -> hashable token-id tuples for `stop_sequences`
    (the reference's keyword_ids prep incl. the bos strip,
    img_utils.py:328-340)."""
    out = []
    for kw in keywords:
        ids = list(tokenizer(kw).input_ids)
        if len(ids) > 1 and ids[0] == getattr(tokenizer, "bos_token_id", None):
            ids = ids[1:]
        if ids:
            out.append(tuple(int(t) for t in ids))
    return tuple(out)


def _prefill(params, cfg, prompt_ids, prompt_mask, img, img_mask, aud,
             aud_mask, *, max_new_tokens, mm_chunks, use_flash,
             quantize_caches, media_caches):
    """Shared prefill for generate()/beam_generate(): run the full forward
    (or the text-only prefill against precomputed media caches), then pad
    the text cache S axis with max_new_tokens decode slots. Returns
    (hidden [B, T, d], caches, prompt lens [B])."""
    tcfg = cfg.text
    lens = jnp.sum(prompt_mask.astype(jnp.int32), axis=1)  # [B]
    positions = jnp.maximum(jnp.cumsum(prompt_mask, axis=1) - 1, 0).astype(jnp.int32)

    embeds = decoder.embed_tokens(params["text"], prompt_ids, tcfg)
    if media_caches is not None:
        assert img is None and aud is None, (
            "media_caches replaces raw img/aud features (masks still apply)")
        h, caches = dattn.text_prefill_with_caches(
            params, cfg, embeds, prompt_mask, positions, media_caches,
            img_mask=img_mask, aud_mask=aud_mask, use_flash=use_flash)
    else:
        h, caches = dattn.forward(
            params, cfg, embeds, prompt_mask, positions,
            img=img, img_mask=img_mask, aud=aud, aud_mask=aud_mask,
            mm_chunks=mm_chunks, return_caches=True, use_flash=use_flash,
            quantize_caches=quantize_caches,
        )
    pad = max_new_tokens
    caches = caches._replace(  # [L, B, Hk, S, D]: grow S for decode slots
        text_k=jnp.pad(caches.text_k, ((0, 0), (0, 0), (0, 0), (0, pad), (0, 0))),
        text_v=jnp.pad(caches.text_v, ((0, 0), (0, 0), (0, 0), (0, pad), (0, 0))),
    )
    return h, caches, lens


def _warp_logits(logits: jnp.ndarray, temperature: float, top_k: int,
                 top_p: float) -> jnp.ndarray:
    """HF GenerationMixin's logits-warper stack (temperature -> top-k ->
    top-p, applied sequentially on [B, V] fp32 logits; reference generate()
    inherits it — gemma.py:603-655 via transformers LogitsProcessorList).
    top-p keeps the smallest prefix of descending-sorted probabilities whose
    cumsum reaches top_p (the first token is always kept), scattered back to
    vocab order by sorted index — exact prefix semantics even when logits
    TIE at the nucleus boundary (realistic under Gemma2's final_softcap:
    tanh saturates many logits to exactly the cap), where a threshold
    compare would keep every tied token and exceed the requested mass."""
    if temperature != 1.0:
        logits = logits / jnp.asarray(temperature, logits.dtype)
    if top_k > 0 and top_k < logits.shape[-1]:
        kth = jax.lax.top_k(logits, top_k)[0][:, -1:]
        logits = jnp.where(logits < kth, -jnp.inf, logits)
    if top_p < 1.0:
        sort_idx = jnp.argsort(-logits, axis=-1)
        sorted_desc = jnp.take_along_axis(logits, sort_idx, axis=-1)
        probs = jax.nn.softmax(sorted_desc, axis=-1)
        cum = jnp.cumsum(probs, axis=-1)
        # keep while the mass BEFORE this token is < top_p (so the token
        # that crosses the threshold is included, like HF's shift-right;
        # the first column is always kept since cum - probs == 0 there)
        keep_sorted = (cum - probs) < top_p
        rows = jnp.arange(logits.shape[0])[:, None]
        keep = jnp.zeros_like(keep_sorted).at[rows, sort_idx].set(keep_sorted)
        logits = jnp.where(keep, logits, -jnp.inf)
    return logits


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "max_new_tokens", "eos_id", "mm_chunks", "use_flash",
                     "use_flash_decode", "quantize_caches", "stop_sequences",
                     "temperature", "top_k", "top_p"),
)
def generate(
    params,
    cfg: DattnConfig,
    prompt_ids: jnp.ndarray,    # [B, T] right-padded
    prompt_mask: jnp.ndarray,   # [B, T] bool
    img: Optional[jnp.ndarray] = None,
    img_mask: Optional[jnp.ndarray] = None,
    aud: Optional[jnp.ndarray] = None,
    aud_mask: Optional[jnp.ndarray] = None,
    *,
    max_new_tokens: int = 1024,
    eos_id: int = 107,
    mm_chunks: int = 1,
    use_flash: bool = False,
    # decode keeps XLA's attention by default: measured 4.2 ms/step vs the
    # Pallas decode kernel's 10 ms at hour-long KV (57.6k tokens) on v5e —
    # XLA pipelines the bandwidth-bound cache reads better at B=1
    use_flash_decode: bool = False,
    # int8 per-token modality KV caches: halves their HBM footprint and the
    # decode read bandwidth (the caches are written once at prefill)
    quantize_caches: bool = False,
    # in-loop keyword stopping (reference KeywordsStoppingCriteria,
    # img_utils.py:326-358): tuple of tokenized stop keywords; a sample is
    # done as soon as its output ends with any of them, so decode steps past
    # a multi-token stop keyword aren't wasted. The keyword tokens stay in
    # the output (the host still runs truncate_at_keywords on the text).
    stop_sequences: tuple = (),
    # shared-media serving: precomputed per-layer stream caches from
    # dattn.media_prefill (batch 1) serve ALL B query rows — the stream
    # prefill (the dominant prefill cost at hour scale) runs once per video
    # instead of once per query, and the caches are never replicated per
    # row. Pass img_mask/aud_mask (cache-batch) for validity; img/aud must
    # be None.
    media_caches=None,
    # sampling (HF GenerationMixin surface the reference's generate inherits,
    # gemma.py:603-655): temperature=0 -> greedy (the reference drivers'
    # do_sample=False default, eval/inference.py:40-50); temperature>0
    # samples from the warped distribution (temperature -> top-k -> top-p)
    # inside the same jitted while_loop, seeded by `rng`.
    temperature: float = 0.0,
    top_k: int = 0,
    top_p: float = 1.0,
    rng: Optional[jnp.ndarray] = None,
) -> GenerateResult:
    h, caches, lens = _prefill(
        params, cfg, prompt_ids, prompt_mask, img, img_mask, aud, aud_mask,
        max_new_tokens=max_new_tokens, mm_chunks=mm_chunks,
        use_flash=use_flash, quantize_caches=quantize_caches,
        media_caches=media_caches)
    tcfg = cfg.text
    b, t = prompt_ids.shape

    do_sample = temperature > 0.0
    if do_sample and rng is None:
        rng = jax.random.PRNGKey(0)

    def select(logits, step):
        """Next-token choice from [B, V] fp32 logits at decode `step`."""
        if not do_sample:
            return jnp.argmax(logits, axis=-1).astype(jnp.int32)
        warped = _warp_logits(logits, temperature, top_k, top_p)
        key = jax.random.fold_in(rng, step)
        return jax.random.categorical(key, warped, axis=-1).astype(jnp.int32)

    h_last = h[jnp.arange(b), jnp.maximum(lens - 1, 0)]  # [B, d]
    logits0 = decoder.lm_logits(params["text"], h_last, tcfg)
    tok0 = select(logits0, jnp.asarray(0))

    tokens0 = jnp.full((b, max_new_tokens), eos_id, jnp.int32)
    tokens0 = tokens0.at[:, 0].set(tok0)
    done0 = tok0 == eos_id

    stops = [jnp.asarray(kw, jnp.int32) for kw in stop_sequences
             if 0 < len(kw) <= max_new_tokens]

    def _keyword_done(tokens, step):
        """[B] — whether each row's output ending at `step` matches a stop
        keyword (suffix compare via clamped dynamic_slice)."""
        hit = jnp.zeros((tokens.shape[0],), bool)
        for kw in stops:
            m = kw.shape[0]
            seg = jax.lax.dynamic_slice_in_dim(tokens, step - m + 1, m, axis=1)
            hit = jnp.logical_or(
                hit, jnp.logical_and(jnp.all(seg == kw, axis=1),
                                     step + 1 >= m))
        return hit

    if stops:
        done0 = jnp.logical_or(done0, _keyword_done(tokens0, jnp.asarray(0)))

    def cond(state):
        step, _, _, done, _, _ = state
        return jnp.logical_and(step < max_new_tokens, ~jnp.all(done))

    def body(state):
        step, tokens, cur_tok, done, cur_len, caches = state
        emb = decoder.embed_tokens(params["text"], cur_tok[:, None], tcfg)
        logits, caches = dattn.decode_step(
            params, cfg, emb, cur_len, caches,
            img_mask=img_mask, aud_mask=aud_mask, use_flash=use_flash_decode,
        )
        nxt = select(logits, step)
        nxt = jnp.where(done, eos_id, nxt)
        tokens = jax.lax.cond(
            step < max_new_tokens,
            lambda tk: tk.at[:, step].set(nxt),
            lambda tk: tk,
            tokens,
        )
        done = jnp.logical_or(done, nxt == eos_id)
        if stops:
            done = jnp.logical_or(done, _keyword_done(tokens, step))
        return step + 1, tokens, nxt, done, cur_len + 1, caches

    state = (jnp.asarray(1), tokens0, tok0, done0, lens, caches)
    _, tokens, _, done, cur_len, _ = jax.lax.while_loop(cond, body, state)

    is_eos = tokens == eos_id
    first_eos = jnp.argmax(is_eos, axis=1)
    lengths = jnp.where(jnp.any(is_eos, axis=1), first_eos + 1, max_new_tokens)
    return GenerateResult(tokens=tokens, lengths=lengths)


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "draft_cfg", "max_new_tokens", "eos_id", "spec_k",
                     "mm_chunks", "use_flash", "use_flash_decode",
                     "quantize_caches", "temperature", "top_k", "top_p"),
)
def speculative_generate(
    params,
    cfg: DattnConfig,
    draft_params,
    draft_cfg: DattnConfig,
    prompt_ids: jnp.ndarray,    # [B, T] right-padded
    prompt_mask: jnp.ndarray,   # [B, T] bool
    img: Optional[jnp.ndarray] = None,
    img_mask: Optional[jnp.ndarray] = None,
    aud: Optional[jnp.ndarray] = None,
    aud_mask: Optional[jnp.ndarray] = None,
    *,
    max_new_tokens: int = 1024,
    eos_id: int = 107,
    spec_k: int = 4,
    mm_chunks: int = 1,
    use_flash: bool = False,
    use_flash_decode: bool = False,
    quantize_caches: bool = False,
    media_caches=None,
    # rejection-sampling speculative decoding (Leviathan et al. 2023 /
    # Chen et al. 2023): with temperature > 0 the output DISTRIBUTION is
    # exactly sampled `generate()`'s (temperature -> top-k -> top-p warped),
    # for any draft. temperature=0 keeps the exact-greedy path below.
    temperature: float = 0.0,
    top_k: int = 0,
    top_p: float = 1.0,
    rng: Optional[jnp.ndarray] = None,
) -> SpecGenerateResult:
    """Greedy speculative decoding: a small text-only draft model proposes
    `spec_k` tokens autoregressively, the target verifies the whole window in
    ONE `dattn.verify_step` forward, and the longest matching prefix commits
    together with the target's own next token (1..spec_k+1 tokens per target
    pass). Output is IDENTICAL to greedy `generate()` for ANY draft — draft
    quality only moves throughput (tested: `test_speculative_matches_greedy`).

    Beyond the reference (its HF generate decodes one token per forward,
    gemma.py:603-687): batch-1 decode is HBM-bound streaming weights + caches,
    so the W-token verify costs ~one decode step and the speedup is
    ~(accepted+1) per verify minus the (cheap, text-only) draft steps.

    The draft shares the tokenizer/vocab but sees no media: it drafts from
    the text prefix alone (format/boilerplate tokens — for TR-style outputs
    most tokens are digits and separators). Rollback on rejection is free:
    fixed-shape caches mean "don't advance cur_len"; stale slots sit beyond
    the validity mask and are overwritten by the next window.

    `draft_params=None` switches the draft source to prompt-lookup (n-gram)
    drafting — no draft model at all: the K proposals are the tokens that
    followed the most recent earlier occurrence of the current trailing
    2-gram in prompt+generated history (vLLM/HF "prompt lookup decoding").
    The lookup is one vectorized compare over the history buffer per verify
    round (~free next to a decode step), and the same invariance holds:
    output == greedy generate(), always. Pays off wherever output repeats
    its own or the prompt's phrasing — span lists, JSON/boilerplate, VQA
    answers that echo the question.

    With ``temperature > 0`` the acceptance switches to speculative
    SAMPLING: the draft samples x_j ~ q_j from its own warped distribution
    (q_j = delta(x_j) for the deterministic n-gram draft), the target
    accepts x_j with probability min(1, p_j(x_j)/q_j(x_j)), and on the
    first rejection resamples from norm(max(p_j - q_j, 0)) (for a delta
    draft: p_j with x_j removed, renormalized — total law exactly p_j).
    A fully-accepted window commits a bonus token sampled from p_K. The
    emitted sequence is distributed EXACTLY as sampled `generate()` with
    the same temperature/top_k/top_p warping, for any draft (tested
    statistically in test_speculative.py).
    """
    tcfg = cfg.text
    b, t = prompt_ids.shape
    K = spec_k
    use_ngram = draft_params is None
    do_sample = temperature > 0.0
    if do_sample and rng is None:
        rng = jax.random.PRNGKey(0)

    # target prefill (pad text cache with room for the last verify window,
    # which may run with cur_len == lens + max_new - 1)
    h, caches, lens = _prefill(
        params, cfg, prompt_ids, prompt_mask, img, img_mask, aud, aud_mask,
        max_new_tokens=max_new_tokens + K + 1, mm_chunks=mm_chunks,
        use_flash=use_flash, quantize_caches=quantize_caches,
        media_caches=media_caches)

    if use_ngram:
        # prompt-lookup drafting: per-row contiguous token history
        # [prompt tokens 0..lens) | generated tokens lens..lens+out_len).
        # -1 padding never matches a real token id.
        hist = jnp.where(prompt_mask, prompt_ids,
                         -jnp.ones_like(prompt_ids)).astype(jnp.int32)
        hist = jnp.pad(hist, ((0, 0), (0, max_new_tokens)),
                       constant_values=-1)
        dstate = hist
    else:
        # draft prefill: text-only forward over the same prompt
        positions = jnp.maximum(jnp.cumsum(prompt_mask, axis=1) - 1,
                                0).astype(jnp.int32)
        d_embeds = decoder.embed_tokens(draft_params["text"], prompt_ids,
                                        draft_cfg.text)
        _, dcaches = dattn.forward(
            draft_params, draft_cfg, d_embeds, prompt_mask, positions,
            return_caches=True, use_flash=use_flash)
        pad = max_new_tokens + K + 1
        dcaches = dcaches._replace(
            text_k=jnp.pad(dcaches.text_k,
                           ((0, 0), (0, 0), (0, 0), (0, pad), (0, 0))),
            text_v=jnp.pad(dcaches.text_v,
                           ((0, 0), (0, 0), (0, 0), (0, pad), (0, 0))))
        dstate = dcaches

    h_last = h[jnp.arange(b), jnp.maximum(lens - 1, 0)]  # [B, d]
    logits0 = decoder.lm_logits(params["text"], h_last, tcfg)
    if do_sample:
        w0 = _warp_logits(logits0.astype(jnp.float32), temperature, top_k,
                          top_p)
        tok0 = jax.random.categorical(
            jax.random.fold_in(rng, 2**31 - 1), w0, axis=-1).astype(jnp.int32)
    else:
        tok0 = jnp.argmax(logits0, axis=-1).astype(jnp.int32)

    tokens0 = jnp.full((b, max_new_tokens), eos_id, jnp.int32)
    tokens0 = tokens0.at[:, 0].set(tok0)
    done0 = tok0 == eos_id
    rows = jnp.arange(b)
    iota = jnp.arange(K + 1, dtype=jnp.int32)
    if use_ngram:
        dstate = dstate.at[rows, lens].set(tok0)

    def cond(state):
        done = state[2]
        return ~jnp.all(done)

    def body(state):
        (tokens, cur_tok, done, out_len, cur_len, dlen, caches, dstate,
         steps, drafted, accepted) = state
        if do_sample:
            key = jax.random.fold_in(rng, steps)

        if use_ngram:
            # --- draft: most recent earlier occurrence of the trailing
            # 2-gram (g1, g2) in the history; propose the K tokens after it.
            # One vectorized compare over the buffer — no model forward.
            hist = dstate
            hl = lens + out_len                 # [B] valid history length
            g1 = hist[rows, jnp.maximum(hl - 2, 0)]
            g2 = hist[rows, jnp.maximum(hl - 1, 0)]
            wpos = jnp.arange(hist.shape[1] - 1, dtype=jnp.int32)
            hit = (hist[:, :-1] == g1[:, None]) & (hist[:, 1:] == g2[:, None])
            # strictly before the trailing occurrence itself
            hit &= wpos[None, :] < (hl - 2)[:, None]
            p = jnp.max(jnp.where(hit, wpos[None, :], -1), axis=1)  # [B]
            found = p >= 0
            start = jnp.where(found, p + 2, 0)
            drafts = jax.vmap(
                lambda row, s: jax.lax.dynamic_slice(row, (s,), (max(K, 1),))
            )(hist, start)[:, :K]
            # unfound rows / unwritten (-1) continuation: any invalid id —
            # the verify pass rejects it and commits the target's own token
            drafts = jnp.where(found[:, None], drafts, -1)
            new_drafted = jnp.where(done | ~found, 0, K)
        else:
            # --- draft: K+1 autoregressive steps (the extra step writes the
            # last proposal's KV so a fully-accepted window leaves the draft
            # cache complete); proposals d_0..d_{K-1}. Sampling mode draws
            # x_j ~ q_j from the draft's own warped distribution and keeps
            # q_j for the acceptance/residual rule below.
            drafts = []
            qs = []
            x = cur_tok
            dc = dstate
            for j in range(K + 1):
                emb = decoder.embed_tokens(draft_params["text"], x[:, None],
                                           draft_cfg.text)
                dlogits, dc = dattn.decode_step(draft_params, draft_cfg, emb,
                                                dlen + j, dc)
                if j < K:
                    if do_sample:
                        wd = _warp_logits(dlogits.astype(jnp.float32),
                                          temperature, top_k, top_p)
                        x = jax.random.categorical(
                            jax.random.fold_in(key, j), wd,
                            axis=-1).astype(jnp.int32)
                        qs.append(jax.nn.softmax(wd, axis=-1))
                    else:
                        x = jnp.argmax(dlogits, axis=-1).astype(jnp.int32)
                    drafts.append(x)
            drafts = (jnp.stack(drafts, axis=1) if K
                      else jnp.zeros((b, 0), jnp.int32))
            new_drafted = jnp.where(done, 0, K)

        # --- verify the window [cur_tok, d_0..d_{K-1}] in one target pass
        window = jnp.concatenate([cur_tok[:, None], drafts], axis=1)
        w_emb = decoder.embed_tokens(params["text"], window, tcfg)
        vlogits, caches = dattn.verify_step(
            params, cfg, w_emb, cur_len, caches,
            img_mask=img_mask, aud_mask=aud_mask, use_flash=use_flash_decode)

        if do_sample:
            # speculative sampling: accept x_j w.p. min(1, p_j(x_j)/q_j(x_j))
            # (u*q < p avoids the division); on the first rejection commit a
            # sample from norm(max(p_j - q_j, 0)) — for the deterministic
            # n-gram draft q_j = delta(x_j), so the residual is p_j with x_j
            # removed (total law exactly p_j). A fully-accepted window
            # commits a bonus token sampled from p_K.
            v = vlogits.shape[-1]
            wp = _warp_logits(
                vlogits.astype(jnp.float32).reshape(b * (K + 1), v),
                temperature, top_k, top_p).reshape(b, K + 1, v)
            p = jax.nn.softmax(wp, axis=-1)                   # [B, K+1, V]
            dsafe = jnp.clip(drafts, 0, v - 1)
            px = jnp.take_along_axis(p[:, :K], dsafe[..., None],
                                     axis=-1)[..., 0]         # [B, K]
            # invalid n-gram proposals (id -1) have target prob 0 -> reject
            px = jnp.where(drafts >= 0, px, 0.0)
            if use_ngram:
                qx = jnp.ones_like(px)
                onehot = jax.nn.one_hot(dsafe, v, dtype=p.dtype)
                onehot = onehot * (drafts >= 0)[..., None].astype(p.dtype)
                resid = p[:, :K] * (1.0 - onehot)
            else:
                q = (jnp.stack(qs, axis=1) if K
                     else jnp.zeros((b, 0, v), jnp.float32))  # [B, K, V]
                qx = jnp.take_along_axis(q, dsafe[..., None],
                                         axis=-1)[..., 0]
                resid = jnp.maximum(p[:, :K] - q, 0.0)
            u = jax.random.uniform(jax.random.fold_in(key, 1000), (b, K))
            accept = u * qx < px
            n = jnp.sum(jnp.cumprod(accept.astype(jnp.int32), axis=1),
                        axis=1)
            resid = jnp.concatenate([resid, p[:, K:]], axis=1)
            # an all-zero resid row (p == q pointwise) is never selected:
            # p==q means acceptance prob 1 at that position
            r = jax.random.categorical(
                jax.random.fold_in(key, 1001), jnp.log(resid),
                axis=-1).astype(jnp.int32)                    # [B, K+1]
            c = jnp.where(iota[None, :] < n[:, None],
                          jnp.pad(drafts, ((0, 0), (0, 1))), r)
        else:
            g = jnp.argmax(vlogits, axis=-1).astype(jnp.int32)  # [B, K+1]
            # longest matching prefix; commits = d_0..d_{n-1}, then g_n
            match = drafts == g[:, :K]
            n = jnp.sum(jnp.cumprod(match.astype(jnp.int32), axis=1), axis=1)
            c = jnp.where(iota[None, :] < n[:, None],
                          jnp.pad(drafts, ((0, 0), (0, 1))), g)  # [B, K+1]

        # cap commits at the first eos, then at the output buffer
        is_eos_c = c == eos_id
        first_e = jnp.argmax(is_eos_c, axis=1)
        e = jnp.where(jnp.any(is_eos_c, axis=1), first_e, n)
        m = jnp.minimum(e, n) + 1
        m = jnp.where(done, 0, jnp.minimum(m, max_new_tokens - out_len))

        # scatter the m committed tokens at out_len (OOB indices dropped)
        idx = jnp.where(iota[None, :] < m[:, None], out_len[:, None] + iota,
                        max_new_tokens)
        tokens = tokens.at[rows[:, None], idx].set(c, mode="drop")

        eos_in_commit = jnp.any(is_eos_c & (iota[None, :] < m[:, None]), axis=1)
        new_done = done | eos_in_commit | (out_len + m >= max_new_tokens)
        cur_tok = jnp.where(m > 0, c[rows, jnp.maximum(m - 1, 0)], cur_tok)
        if use_ngram:
            # append the committed tokens to the lookup history
            hidx = jnp.where(iota[None, :] < m[:, None],
                             (lens + out_len)[:, None] + iota, hist.shape[1])
            new_dstate = hist.at[rows[:, None], hidx].set(c, mode="drop")
        else:
            new_dstate = dc
        return (tokens, cur_tok, new_done, out_len + m, cur_len + m, dlen + m,
                caches, new_dstate,
                steps + 1, drafted + new_drafted,
                accepted + jnp.minimum(n, m))

    state = (tokens0, tok0, done0, jnp.ones((b,), jnp.int32),
             lens, lens, caches, dstate, jnp.asarray(0, jnp.int32),
             jnp.zeros((b,), jnp.int32), jnp.zeros((b,), jnp.int32))
    (tokens, _, _, _, _, _, _, _, steps, drafted, accepted) = (
        jax.lax.while_loop(cond, body, state))

    is_eos = tokens == eos_id
    first_eos = jnp.argmax(is_eos, axis=1)
    lengths = jnp.where(jnp.any(is_eos, axis=1), first_eos + 1, max_new_tokens)
    return SpecGenerateResult(tokens=tokens, lengths=lengths,
                              n_target_steps=steps, n_drafted=drafted,
                              n_accepted=accepted)


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "max_new_tokens", "eos_id", "mm_chunks",
                     "use_flash", "use_flash_decode", "quantize_caches",
                     "num_beams", "length_penalty"),
)
def beam_generate(
    params,
    cfg: DattnConfig,
    prompt_ids: jnp.ndarray,    # [B, T] right-padded
    prompt_mask: jnp.ndarray,   # [B, T] bool
    img: Optional[jnp.ndarray] = None,
    img_mask: Optional[jnp.ndarray] = None,
    aud: Optional[jnp.ndarray] = None,
    aud_mask: Optional[jnp.ndarray] = None,
    *,
    max_new_tokens: int = 1024,
    eos_id: int = 107,
    num_beams: int = 4,
    length_penalty: float = 1.0,
    mm_chunks: int = 1,
    use_flash: bool = False,
    use_flash_decode: bool = False,
    quantize_caches: bool = False,
    media_caches=None,
) -> GenerateResult:
    """Static beam search (the `num_beams` surface of the HF generate the
    reference inherits, gemma.py:603-655), jitted end-to-end, batched over
    B independent queries (each keeps its own K-beam frontier).

    The prefill runs ONCE; only the text caches replicate num_beams ways
    ([L, B*K, Hk, S, D], beams row-major by query) and reorder (gather on
    the beam axis) each step — the huge modality caches stay batch-1 (or
    batch-B for per-row media) and every beam reads its query's cache
    through the generalized group fold in _xattn_block, so beam search over
    an hour-long video costs K small text caches, not K stream prefills.

    Finished beams are frozen in place (their only continuation is eos at
    zero added log-prob) rather than moved to a separate hypothesis list —
    the standard static-shape formulation (t5x/flaxformer); scores are
    summed log-probs, length-normalized by len**length_penalty at the final
    selection like HF's BeamHypotheses. Returns each query's best beam."""
    tcfg = cfg.text
    b, t = prompt_ids.shape
    K = num_beams

    h, caches, lens = _prefill(
        params, cfg, prompt_ids, prompt_mask, img, img_mask, aud, aud_mask,
        max_new_tokens=max_new_tokens, mm_chunks=mm_chunks,
        use_flash=use_flash, quantize_caches=quantize_caches,
        media_caches=media_caches)

    rows = jnp.arange(b)
    h_last = h[rows, jnp.maximum(lens - 1, 0)]              # [B, d]
    logits0 = decoder.lm_logits(params["text"], h_last, tcfg)  # [B, V]
    v = logits0.shape[-1]
    logp0 = jax.nn.log_softmax(logits0.astype(jnp.float32))
    scores0, toks0 = jax.lax.top_k(logp0, K)                # [B, K] each
    toks0 = toks0.astype(jnp.int32)

    # per-beam text caches, row-major by query (beams of query b occupy
    # rows [b*K, (b+1)*K) — the layout the group fold expects); modality
    # caches stay batch-1/batch-B (shared/group fold)
    caches = caches._replace(
        text_k=jnp.repeat(caches.text_k, K, axis=1),
        text_v=jnp.repeat(caches.text_v, K, axis=1))

    tokens0 = jnp.full((b * K, max_new_tokens), eos_id, jnp.int32)
    tokens0 = tokens0.at[:, 0].set(toks0.reshape(-1))
    done0 = toks0 == eos_id                                 # [B, K]
    lengths0 = jnp.ones((b, K), jnp.int32)
    cur_len0 = jnp.repeat(lens, K)                          # [B*K]

    # a finished beam's only continuation: eos at zero added log-prob
    frozen_row = jnp.full((v,), -jnp.inf, jnp.float32).at[eos_id].set(0.0)

    def cond(state):
        step, _, _, _, done, _, _, _ = state
        return jnp.logical_and(step < max_new_tokens, ~jnp.all(done))

    def body(state):
        step, tokens, scores, cur_tok, done, lengths, cur_len, caches = state
        emb = decoder.embed_tokens(params["text"], cur_tok[:, None], tcfg)
        logits, caches = dattn.decode_step(
            params, cfg, emb, cur_len, caches,
            img_mask=img_mask, aud_mask=aud_mask, use_flash=use_flash_decode)
        logp = jax.nn.log_softmax(
            logits.astype(jnp.float32)).reshape(b, K, v)
        logp = jnp.where(done[..., None], frozen_row[None, None], logp)
        total = scores[..., None] + logp                    # [B, K, V]
        new_scores, idx = jax.lax.top_k(total.reshape(b, K * v), K)
        parent = (idx // v).astype(jnp.int32)               # [B, K] in-row
        tok = (idx % v).astype(jnp.int32)                   # [B, K]
        gparent = (rows[:, None] * K + parent).reshape(-1)  # [B*K] global

        tokens = jax.lax.cond(
            step < max_new_tokens,
            lambda tk: tk[gparent].at[:, step].set(tok.reshape(-1)),
            lambda tk: tk[gparent],
            tokens,
        )
        caches = caches._replace(text_k=caches.text_k[:, gparent],
                                 text_v=caches.text_v[:, gparent])
        was_done = done[rows[:, None], parent]              # [B, K]
        done = jnp.logical_or(was_done, tok == eos_id)
        lengths = jnp.where(was_done, lengths[rows[:, None], parent],
                            (step + 1).astype(jnp.int32))
        return (step + 1, tokens, new_scores, tok.reshape(-1), done,
                lengths, cur_len + 1, caches)

    state = (jnp.asarray(1), tokens0, scores0, toks0.reshape(-1), done0,
             lengths0, cur_len0, caches)
    _, tokens, scores, _, done, lengths, _, _ = jax.lax.while_loop(
        cond, body, state)

    lengths = jnp.where(done, lengths, max_new_tokens)      # [B, K]
    norm = jnp.asarray(lengths, jnp.float32) ** length_penalty
    # prefer finished hypotheses (HF BeamHypotheses only holds finished
    # ones; unfinished beams compete only when nothing finished)
    any_done = jnp.any(done, axis=1, keepdims=True)         # [B, 1]
    final = jnp.where(any_done, jnp.where(done, scores / norm, -jnp.inf),
                      scores / norm)
    best = jnp.argmax(final, axis=1)                        # [B]
    return GenerateResult(
        tokens=tokens.reshape(b, K, max_new_tokens)[rows, best],
        lengths=lengths[rows, best])
