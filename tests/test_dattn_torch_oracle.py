"""Eager-torch oracle for the FULL Dattn layer and generate loop.

Round-1 verdict item 1: the text backbone and towers have external (HF)
oracles, but the flagship composition — per-layer T2V/T2A cross-attention +
diagonal stream update + three-cache generate plumbing — was only validated
against this repo's own jnp ops. This file transcribes the reference's math
into an independent eager-PyTorch oracle built on HF Gemma2/Mistral modules:

- layer composition          reference gemma.py:125-244 / mistral.py:119-274
- sqrt(d) normalizer on text AND modality embeds       gemma.py:353-356
- empty-modality mask quirk (all-True mask, zeroed out) gemma.py:180-192
- attn/final logit softcaps                             gemma.py:90,566-569
- three-cache generate plumbing                         gemma.py:603-687

Weights flow to the JAX side through the production converter
(infer/convert.py convert_text), so a divergence in softcap, sqrt(d),
diagonal-update, or mask semantics on either side fails these tests.
"""
import numpy as np
import jax
import jax.numpy as jnp
import torch

from vidi_tpu.core.config import DattnConfig, TextConfig
from vidi_tpu.infer.convert import convert_text
from vidi_tpu.infer.generate import generate
from vidi_tpu.models import dattn, decoder


def _repeat_kv(x: torch.Tensor, g: int) -> torch.Tensor:
    """[B, Hk, S, D] -> [B, Hk*g, S, D] (transformers repeat_kv semantics)."""
    b, hk, s, d = x.shape
    return x[:, :, None].expand(b, hk, g, s, d).reshape(b, hk * g, s, d)


def _apply_rope(x: torch.Tensor, cos: torch.Tensor, sin: torch.Tensor):
    """x [B, H, T, D]; cos/sin [B, T, D] (HF rotate-half convention)."""
    c, s = cos[:, None], sin[:, None]
    d2 = x.shape[-1] // 2
    rot = torch.cat([-x[..., d2:], x[..., :d2]], dim=-1)
    return x * c + rot * s


class DattnOracle:
    """Eager transcription of the reference Dattn decoder, both archs.

    arch="gemma2": double norms, softcaps, sqrt(d) embed scaling, sliding
    window on even layers (gemma.py:104), diag update post-norms o_proj(v)
    (gemma.py:195-202), hidden = res + post_norm(t2t+t2v+t2a) (gemma.py:236).
    arch="mistral": single norms, no caps/scaling, diag adds raw o_proj(v)
    (mistral.py:223-229), hidden = res + t2t + t2v + t2a (mistral.py:268).
    """

    def __init__(self, hf, arch: str):
        self.hf = hf
        self.arch = arch
        self.cfg = hf.config
        if arch == "gemma2":
            self.scale = self.cfg.query_pre_attn_scalar ** -0.5
            self.attn_cap = self.cfg.attn_logit_softcapping
            self.final_cap = self.cfg.final_logit_softcapping
        else:
            self.scale = self.cfg.head_dim ** -0.5
            self.attn_cap = self.final_cap = None

    # -- primitives --------------------------------------------------------
    def _attn(self, q, k, v, mask):
        """q [B,H,T,D], k/v [B,H,S,D], mask bool broadcastable [.,.,T,S]."""
        logits = torch.matmul(q, k.transpose(-2, -1)) * self.scale
        if self.attn_cap is not None:
            logits = torch.tanh(logits / self.attn_cap) * self.attn_cap
        logits = logits.masked_fill(~mask, float("-inf"))
        p = torch.softmax(logits.float(), dim=-1).to(v.dtype)
        return torch.matmul(p, v)

    def _heads(self, lin, x, n):
        b, t, _ = x.shape
        return lin(x).view(b, t, n, -1).transpose(1, 2)  # [B, n, T, Dh]

    def _merge(self, x):
        b, h, t, d = x.shape
        return x.transpose(1, 2).reshape(b, t, h * d)

    def _feed_forward(self, layer, x):
        res = x
        if self.arch == "gemma2":  # gemma.py:116-123
            h = layer.pre_feedforward_layernorm(x)
            h = layer.mlp(h)
            h = layer.post_feedforward_layernorm(h)
        else:  # mistral.py:131-137
            h = layer.mlp(layer.post_attention_layernorm(x))
        return res + h

    def _is_sliding(self, idx):
        return self.arch == "gemma2" and idx % 2 == 0  # gemma.py:104

    # -- cross attention + diagonal update (gemma.py:49-96, 164-202) -------
    def _xattn(self, layer, hn, stream, kv_mask, cached=None):
        attn = layer.self_attn
        g = self.cfg.num_attention_heads // self.cfg.num_key_value_heads
        q = self._heads(attn.q_proj, hn, self.cfg.num_attention_heads)
        if cached is None:
            sn = layer.input_layernorm(stream)  # gemma.py:184-185
            k = self._heads(attn.k_proj, sn, self.cfg.num_key_value_heads)
            v = self._heads(attn.v_proj, sn, self.cfg.num_key_value_heads)
        else:
            k, v = cached
        has = kv_mask.sum(-1) != 0
        eff = kv_mask.clone()
        eff[~has] = True  # gemma.py:180-182: empty samples attend everywhere
        kr, vr = _repeat_kv(k, g), _repeat_kv(v, g)
        out = self._attn(q, kr, vr, eff[:, None, None, :])
        out = attn.o_proj(self._merge(out))
        out = out * has[:, None, None]  # ...then get zeroed (gemma.py:192)
        new_stream = None
        if cached is None:
            # diagonal update over the GQA-repeated values (gemma.py:195-202)
            dv = attn.o_proj(vr.transpose(1, 2).flatten(2, 3))
            if self.arch == "gemma2":
                dv = layer.post_attention_layernorm(dv)
            new_stream = self._feed_forward(layer, stream + dv)
        return out, new_stream, (k, v)

    # -- prefill (gemma.py:267-424 + 125-244) ------------------------------
    def prefill(self, ids, img, aud, img_mask, aud_mask):
        m = self.hf.model
        b, t = ids.shape
        h = m.embed_tokens(ids)
        if self.arch == "gemma2":  # gemma.py:353-356
            normalizer = torch.tensor(self.cfg.hidden_size ** 0.5, dtype=h.dtype)
            h = h * normalizer
            img = img * normalizer
            aud = aud * normalizer
        pos = torch.arange(t)[None].expand(b, t)
        cos, sin = m.rotary_emb(h, pos)
        i = torch.arange(t)
        causal = i[None, :] <= i[:, None]
        masks = {False: causal}
        if self.arch == "gemma2":
            masks[True] = causal & ((i[:, None] - i[None, :])
                                    < self.cfg.sliding_window)
        caches = []
        for idx, layer in enumerate(m.layers):
            res = h
            hn = layer.input_layernorm(h)
            q = self._heads(layer.self_attn.q_proj, hn,
                            self.cfg.num_attention_heads)
            k = self._heads(layer.self_attn.k_proj, hn,
                            self.cfg.num_key_value_heads)
            v = self._heads(layer.self_attn.v_proj, hn,
                            self.cfg.num_key_value_heads)
            q, k = _apply_rope(q, cos, sin), _apply_rope(k, cos, sin)
            g = self.cfg.num_attention_heads // self.cfg.num_key_value_heads
            t2t = self._attn(q, _repeat_kv(k, g), _repeat_kv(v, g),
                             masks[self._is_sliding(idx)][None, None])
            t2t = layer.self_attn.o_proj(self._merge(t2t))
            t2v, img, ikv = self._xattn(layer, hn, img, img_mask)
            t2a, aud, akv = self._xattn(layer, hn, aud, aud_mask)
            out = t2t + t2v + t2a
            if self.arch == "gemma2":  # gemma.py:236-237
                h = res + layer.post_attention_layernorm(out)
            else:  # mistral.py:268
                h = res + out
            h = self._feed_forward(layer, h)
            caches.append({"text": (k, v), "img": ikv, "aud": akv})
        h = m.norm(h)
        logits = self.hf.lm_head(h)
        if self.final_cap is not None:  # gemma.py:566-569
            logits = torch.tanh(logits / self.final_cap) * self.final_cap
        return logits, caches

    # -- decode (three-cache plumbing, gemma.py:603-687) -------------------
    def decode_step(self, tok, pos, caches, img_mask, aud_mask):
        m = self.hf.model
        b = tok.shape[0]
        h = m.embed_tokens(tok[:, None])
        if self.arch == "gemma2":
            h = h * torch.tensor(self.cfg.hidden_size ** 0.5, dtype=h.dtype)
        pos_ids = torch.full((b, 1), pos, dtype=torch.long)
        cos, sin = m.rotary_emb(h, pos_ids)
        for idx, layer in enumerate(m.layers):
            res = h
            hn = layer.input_layernorm(h)
            q = self._heads(layer.self_attn.q_proj, hn,
                            self.cfg.num_attention_heads)
            k = self._heads(layer.self_attn.k_proj, hn,
                            self.cfg.num_key_value_heads)
            v = self._heads(layer.self_attn.v_proj, hn,
                            self.cfg.num_key_value_heads)
            q, k = _apply_rope(q, cos, sin), _apply_rope(k, cos, sin)
            tk, tv = caches[idx]["text"]
            tk = torch.cat([tk, k], dim=2)
            tv = torch.cat([tv, v], dim=2)
            caches[idx]["text"] = (tk, tv)
            s = tk.shape[2]
            kpos = torch.arange(s)
            allowed = torch.ones(s, dtype=torch.bool)
            if self._is_sliding(idx):
                allowed = (pos - kpos) < self.cfg.sliding_window
            g = self.cfg.num_attention_heads // self.cfg.num_key_value_heads
            t2t = self._attn(q, _repeat_kv(tk, g), _repeat_kv(tv, g),
                             allowed[None, None, None, :])
            t2t = layer.self_attn.o_proj(self._merge(t2t))
            t2v, _, _ = self._xattn(layer, hn, None, img_mask,
                                    cached=caches[idx]["img"])
            t2a, _, _ = self._xattn(layer, hn, None, aud_mask,
                                    cached=caches[idx]["aud"])
            out = t2t + t2v + t2a
            if self.arch == "gemma2":
                h = res + layer.post_attention_layernorm(out)
            else:
                h = res + out
            h = self._feed_forward(layer, h)
        h = m.norm(h)
        logits = self.hf.lm_head(h[:, 0])
        if self.final_cap is not None:
            logits = torch.tanh(logits / self.final_cap) * self.final_cap
        return logits

    def greedy(self, ids, img, aud, img_mask, aud_mask, max_new, eos_id):
        """Greedy generate with eos padding (matches infer/generate.py
        semantics, which transcribe eval/inference.py:40-50 greedy)."""
        logits, caches = self.prefill(ids, img, aud, img_mask, aud_mask)
        b, t = ids.shape
        tok = logits[:, -1].argmax(-1)
        tokens = torch.full((b, max_new), eos_id, dtype=torch.long)
        tokens[:, 0] = tok
        done = tok == eos_id
        for step in range(1, max_new):
            if bool(done.all()):
                break
            logits = self.decode_step(tok, t + step - 1, caches,
                                      img_mask, aud_mask)
            tok = logits.argmax(-1)
            tok = torch.where(done, torch.full_like(tok, eos_id), tok)
            tokens[:, step] = tok
            done = done | (tok == eos_id)
        return tokens


# ---------------------------------------------------------------------------
# fixtures
# ---------------------------------------------------------------------------

def _gemma_pair():
    from transformers import Gemma2Config, Gemma2ForCausalLM

    hf_cfg = Gemma2Config(
        vocab_size=128, hidden_size=32, intermediate_size=64,
        num_hidden_layers=3, num_attention_heads=4, num_key_value_heads=2,
        head_dim=8, sliding_window=4, query_pre_attn_scalar=8,
        attn_logit_softcapping=50.0, final_logit_softcapping=30.0,
        attn_implementation="eager",
    )
    torch.manual_seed(11)
    hf = Gemma2ForCausalLM(hf_cfg).eval()
    tcfg = TextConfig(
        arch="gemma2", vocab_size=128, hidden_size=32, num_layers=3,
        num_heads=4, num_kv_heads=2, head_dim=8, intermediate_size=64,
        sliding_window=4, attn_softcap=50.0, final_softcap=30.0,
        query_scale=8.0 ** -0.5, embed_scale=True, hidden_act="gelu_tanh",
        double_norms=True, tie_word_embeddings=True,
    )
    return hf, tcfg


def _mistral_pair():
    from transformers import MistralConfig, MistralForCausalLM

    hf_cfg = MistralConfig(
        vocab_size=128, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=8, sliding_window=None, rope_theta=10000.0,
        rms_norm_eps=1e-5, attn_implementation="eager",
    )
    torch.manual_seed(13)
    hf = MistralForCausalLM(hf_cfg).eval()
    tcfg = TextConfig(
        arch="mistral", vocab_size=128, hidden_size=32, num_layers=2,
        num_heads=4, num_kv_heads=2, head_dim=8, intermediate_size=64,
        rope_theta=10000.0, rms_norm_eps=1e-5, sliding_window=None,
        attn_softcap=None, final_softcap=None, embed_scale=False,
        hidden_act="silu", double_norms=False, tie_word_embeddings=False,
    )
    return hf, tcfg


def _mm_batch(seed, b=3, t=9, s_img=12, s_aud=7, d=32, vocab=128):
    """Batch with full / ragged / EMPTY-image modality rows — the empty row
    exercises the gemma.py:180-192 all-True-then-zero mask quirk."""
    rng = np.random.default_rng(seed)
    ids = rng.integers(0, vocab, (b, t))
    img = (rng.standard_normal((b, s_img, d)) * 0.1).astype(np.float32)
    aud = (rng.standard_normal((b, s_aud, d)) * 0.1).astype(np.float32)
    img_mask = np.ones((b, s_img), bool)
    img_mask[1, -4:] = False      # ragged
    img_mask[2, :] = False        # EMPTY modality in the batch
    aud_mask = np.ones((b, s_aud), bool)
    aud_mask[0, -2:] = False
    return ids, img, aud, img_mask, aud_mask


def _jax_prefill_logits(params, tcfg, ids, img, aud, img_mask, aud_mask):
    cfg = DattnConfig(text=tcfg)
    b, t = ids.shape
    mask = jnp.ones((b, t), bool)
    pos = jnp.broadcast_to(jnp.arange(t, dtype=jnp.int32), (b, t))
    embeds = decoder.embed_tokens(params, jnp.asarray(ids), tcfg)
    h, _ = dattn.forward(
        {"text": params}, cfg, embeds, mask, pos,
        img=jnp.asarray(img), img_mask=jnp.asarray(img_mask),
        aud=jnp.asarray(aud), aud_mask=jnp.asarray(aud_mask))
    return np.asarray(decoder.lm_logits(params, h, tcfg))


# ---------------------------------------------------------------------------
# tests
# ---------------------------------------------------------------------------

def test_gemma2_dattn_prefill_matches_torch_oracle():
    hf, tcfg = _gemma_pair()
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    params = convert_text(sd, tcfg, dtype=jnp.float32)
    ids, img, aud, img_mask, aud_mask = _mm_batch(21)

    oracle = DattnOracle(hf, "gemma2")
    with torch.no_grad():
        want, _ = oracle.prefill(
            torch.tensor(ids), torch.tensor(img), torch.tensor(aud),
            torch.tensor(img_mask), torch.tensor(aud_mask))
    got = _jax_prefill_logits(params, tcfg, ids, img, aud, img_mask, aud_mask)
    np.testing.assert_allclose(got, want.numpy(), rtol=3e-4, atol=3e-4)


def test_mistral_dattn_prefill_matches_torch_oracle():
    hf, tcfg = _mistral_pair()
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    params = convert_text(sd, tcfg, dtype=jnp.float32)
    ids, img, aud, img_mask, aud_mask = _mm_batch(22)

    oracle = DattnOracle(hf, "mistral")
    with torch.no_grad():
        want, _ = oracle.prefill(
            torch.tensor(ids), torch.tensor(img), torch.tensor(aud),
            torch.tensor(img_mask), torch.tensor(aud_mask))
    got = _jax_prefill_logits(params, tcfg, ids, img, aud, img_mask, aud_mask)
    np.testing.assert_allclose(got, want.numpy(), rtol=3e-4, atol=3e-4)


def test_gemma2_dattn_generate_matches_torch_oracle():
    """Greedy token sequences through the three-cache decode plumbing must
    match the oracle exactly (prompt long enough that the sliding window
    engages during decode)."""
    hf, tcfg = _gemma_pair()
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    params = convert_text(sd, tcfg, dtype=jnp.float32)
    ids, img, aud, img_mask, aud_mask = _mm_batch(23)
    max_new, eos = 6, 3

    oracle = DattnOracle(hf, "gemma2")
    with torch.no_grad():
        want = oracle.greedy(
            torch.tensor(ids), torch.tensor(img), torch.tensor(aud),
            torch.tensor(img_mask), torch.tensor(aud_mask), max_new, eos)

    cfg = DattnConfig(text=tcfg)
    b, t = ids.shape
    res = generate({"text": params}, cfg, jnp.asarray(ids),
                   jnp.ones((b, t), bool),
                   img=jnp.asarray(img), img_mask=jnp.asarray(img_mask),
                   aud=jnp.asarray(aud), aud_mask=jnp.asarray(aud_mask),
                   max_new_tokens=max_new, eos_id=eos)
    np.testing.assert_array_equal(np.asarray(res.tokens), want.numpy())


def test_mistral_dattn_generate_matches_torch_oracle():
    hf, tcfg = _mistral_pair()
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    params = convert_text(sd, tcfg, dtype=jnp.float32)
    ids, img, aud, img_mask, aud_mask = _mm_batch(24)
    max_new, eos = 5, 3

    oracle = DattnOracle(hf, "mistral")
    with torch.no_grad():
        want = oracle.greedy(
            torch.tensor(ids), torch.tensor(img), torch.tensor(aud),
            torch.tensor(img_mask), torch.tensor(aud_mask), max_new, eos)

    cfg = DattnConfig(text=tcfg)
    b, t = ids.shape
    res = generate({"text": params}, cfg, jnp.asarray(ids),
                   jnp.ones((b, t), bool),
                   img=jnp.asarray(img), img_mask=jnp.asarray(img_mask),
                   aud=jnp.asarray(aud), aud_mask=jnp.asarray(aud_mask),
                   max_new_tokens=max_new, eos_id=eos)
    np.testing.assert_array_equal(np.asarray(res.tokens), want.numpy())
