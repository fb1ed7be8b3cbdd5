"""Text-decoder backbone ops (Gemma2 / Mistral), functional JAX.

One arch-generic implementation driven by TextConfig:
- `double_norms=True`  -> Gemma2 layer: pre+post norms around both the
  attention block and the FFN block, logit softcaps, sqrt(d) embed scaling,
  alternating sliding-window layers
  (reference: Vidi1.5_9B/vidi/model/lmm/dattn/gemma.py:99-123,267-424).
- `double_norms=False` -> Mistral layer: classic 2-norm pre-norm
  (reference: Vidi_7B/model/lmm/dattn/mistral.py).

Per-layer params are stacked [L, ...] for lax.scan. No biases anywhere.
"""
from __future__ import annotations

import math
from typing import Dict

import jax
import jax.numpy as jnp

from vidi_tpu.core.config import TextConfig
from vidi_tpu.ops.basic import gelu_tanh
from vidi_tpu.ops.norms import gemma_rms_norm, mistral_rms_norm
from vidi_tpu.infer.quantize import embed_lookup, is_quantized, qdot, tied_logits

Params = Dict


def norm(x, weight, cfg: TextConfig):
    if cfg.arch == "gemma2":
        return gemma_rms_norm(x, weight, cfg.rms_norm_eps)
    return mistral_rms_norm(x, weight, cfg.rms_norm_eps)


def activation(x, cfg: TextConfig):
    if cfg.hidden_act == "gelu_tanh":
        return gelu_tanh(x)
    return jax.nn.silu(x)


def init_params(key, cfg: TextConfig, dtype=jnp.bfloat16) -> Params:
    d, ff, L = cfg.hidden_size, cfg.intermediate_size, cfg.num_layers
    hq, hk, dh = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    keys = jax.random.split(key, 10)

    def nrm(k, shape, scale):
        return (jax.random.normal(k, shape) * scale).astype(dtype)

    layers = {
        "input_ln": jnp.zeros((L, d), dtype) if cfg.arch == "gemma2" else jnp.ones((L, d), dtype),
        "post_attn_ln": jnp.zeros((L, d), dtype) if cfg.arch == "gemma2" else jnp.ones((L, d), dtype),
        "q_w": nrm(keys[0], (L, d, hq * dh), d**-0.5),
        "k_w": nrm(keys[1], (L, d, hk * dh), d**-0.5),
        "v_w": nrm(keys[2], (L, d, hk * dh), d**-0.5),
        "o_w": nrm(keys[3], (L, hq * dh, d), (hq * dh) ** -0.5),
        "gate_w": nrm(keys[4], (L, d, ff), d**-0.5),
        "up_w": nrm(keys[5], (L, d, ff), d**-0.5),
        "down_w": nrm(keys[6], (L, ff, d), ff**-0.5),
    }
    if cfg.double_norms:
        layers["pre_ffn_ln"] = jnp.zeros((L, d), dtype)
        layers["post_ffn_ln"] = jnp.zeros((L, d), dtype)
    params = {
        "embed": nrm(keys[7], (cfg.vocab_size, d), 1.0),
        "final_ln": jnp.zeros((d,), dtype) if cfg.arch == "gemma2" else jnp.ones((d,), dtype),
        "layers": layers,
    }
    if not cfg.tie_word_embeddings:
        params["lm_head"] = nrm(keys[8], (d, cfg.vocab_size), d**-0.5)
    return params


def split_heads(x: jnp.ndarray, n_heads: int, head_dim: int) -> jnp.ndarray:
    b, t, _ = x.shape
    return x.reshape(b, t, n_heads, head_dim)


def merge_heads(x: jnp.ndarray) -> jnp.ndarray:
    b, t, h, d = x.shape
    return x.reshape(b, t, h * d)


def mlp(lp: Params, x: jnp.ndarray, cfg: TextConfig, act_spec=None) -> jnp.ndarray:
    """`act_spec`: optional sharding spec for the [.., ff] hidden — the FFN
    intermediate axis goes on "model" (TP), matching gate_w/up_w's output-dim
    sharding so the down_w contraction is a local partial sum + psum."""
    from vidi_tpu.parallel.sharding import constrain
    from vidi_tpu.infer import quantize as _qz
    if (_qz.w8a8_min_tokens is not None
            and math.prod(x.shape[:-1]) >= _qz.w8a8_min_tokens):
        from vidi_tpu.ops.pallas.quant_matmul import gated_mlp_ok, quant_gated_mlp
        # gated_mlp_ok returns False on multi-device meshes, so taking the
        # fused route with a non-None act_spec only ever skips a no-op
        # constrain (single-device mesh); production ffn_block callers
        # (dattn.py:682,787) now reach it under VIDI_QMM_MLP=1
        if gated_mlp_ok(lp, x):
            # fused W8A8 prefill FFN (opt-in, VIDI_QMM_MLP=1)
            return quant_gated_mlp(x, lp["gate_w"], lp["up_w"],
                                   lp["down_w"], cfg.hidden_act)
    gate = qdot(x, lp["gate_w"])
    up = qdot(x, lp["up_w"])
    if act_spec is not None:
        gate = constrain(gate, *act_spec)
        up = constrain(up, *act_spec)
    return qdot(activation(gate, cfg) * up, lp["down_w"])


def ffn_block(lp: Params, x: jnp.ndarray, cfg: TextConfig, act_spec=None) -> jnp.ndarray:
    """Gemma2: res + post_ffn_norm(mlp(pre_ffn_norm(x)))  (gemma.py:116-123)
    Mistral: res + mlp(post_attn_norm(x))."""
    res = x
    if cfg.double_norms:
        h = norm(x, lp["pre_ffn_ln"], cfg)
        h = mlp(lp, h, cfg, act_spec)
        h = norm(h, lp["post_ffn_ln"], cfg)
    else:
        h = mlp(lp, norm(x, lp["post_attn_ln"], cfg), cfg, act_spec)
    return res + h


def embed_tokens(params: Params, ids: jnp.ndarray, cfg: TextConfig) -> jnp.ndarray:
    return embed_lookup(params["embed"], ids)


def lm_logits(params: Params, hidden: jnp.ndarray, cfg: TextConfig) -> jnp.ndarray:
    if cfg.tie_word_embeddings:
        logits = tied_logits(hidden, params["embed"])
        if cfg.final_softcap is not None:
            logits = jnp.tanh(logits / cfg.final_softcap) * cfg.final_softcap
        return logits
    w = params["lm_head"]
    if is_quantized(w):
        return _quantized_logits(hidden, w, cfg)
    logits = jnp.dot(hidden, w, preferred_element_type=jnp.float32)
    if cfg.final_softcap is not None:
        logits = jnp.tanh(logits / cfg.final_softcap) * cfg.final_softcap
    return logits


def _quantized_logits(hidden, w, cfg: TextConfig):
    logits = qdot(hidden, w).astype(jnp.float32)
    if cfg.final_softcap is not None:
        logits = jnp.tanh(logits / cfg.final_softcap) * cfg.final_softcap
    return logits
