"""Whisper audio tower (encoder only), functional JAX.

The reference builds only the WhisperEncoder — the decoder is never
constructed (reference: Vidi1.5_9B/vidi/model/mm_audio/whisper.py:15-31).
Input is 30-s windows of 128-bin log-mel features [B, n_mels, 3000]; output
is [B, 1500, d_model].

Structure (HF whisper-large-v3): conv1(k3,s1,p1) + gelu, conv2(k3,s2,p1) +
gelu, + fixed sinusoidal positions, then pre-norm transformer layers (k_proj
has no bias) and a final layer norm. Exact (erf) GELU throughout.

Layers are stacked [L, ...] and run under one `lax.scan`.
"""
from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from vidi_tpu.core.config import AudioConfig
from vidi_tpu.ops.basic import dense, gelu_exact, layer_norm, mha

Params = Dict


def sinusoidal_positions(length: int, d: int) -> np.ndarray:
    """Whisper's sinusoid table: [sin | cos] split halves (not interleaved)."""
    half = d // 2
    log_timescale = np.log(10000.0) / (half - 1)
    inv = np.exp(-log_timescale * np.arange(half, dtype=np.float32))
    ang = np.arange(length, dtype=np.float32)[:, None] * inv[None, :]
    return np.concatenate([np.sin(ang), np.cos(ang)], axis=1).astype(np.float32)


def init_params(key, cfg: AudioConfig, dtype=jnp.float32) -> Params:
    d, ff, L = cfg.d_model, cfg.ffn_dim, cfg.num_layers
    keys = jax.random.split(key, 8)

    def nrm(k, shape, scale):
        return (jax.random.normal(k, shape) * scale).astype(dtype)

    layers = {
        "ln1_scale": jnp.ones((L, d), dtype),
        "ln1_bias": jnp.zeros((L, d), dtype),
        "q_w": nrm(keys[0], (L, d, d), d**-0.5),
        "q_b": jnp.zeros((L, d), dtype),
        "k_w": nrm(keys[1], (L, d, d), d**-0.5),  # no bias in HF whisper k_proj
        "v_w": nrm(keys[2], (L, d, d), d**-0.5),
        "v_b": jnp.zeros((L, d), dtype),
        "o_w": nrm(keys[3], (L, d, d), d**-0.5),
        "o_b": jnp.zeros((L, d), dtype),
        "ln2_scale": jnp.ones((L, d), dtype),
        "ln2_bias": jnp.zeros((L, d), dtype),
        "fc1_w": nrm(keys[4], (L, d, ff), d**-0.5),
        "fc1_b": jnp.zeros((L, ff), dtype),
        "fc2_w": nrm(keys[5], (L, ff, d), ff**-0.5),
        "fc2_b": jnp.zeros((L, d), dtype),
    }
    return {
        "conv1_w": nrm(keys[6], (cfg.d_model, cfg.num_mel_bins, 3), 0.02),  # [O, I, K]
        "conv1_b": jnp.zeros((d,), dtype),
        "conv2_w": nrm(keys[7], (cfg.d_model, cfg.d_model, 3), 0.02),
        "conv2_b": jnp.zeros((d,), dtype),
        "pos_embed": jnp.asarray(
            sinusoidal_positions(cfg.max_source_positions, d), dtype
        ),
        "final_ln_scale": jnp.ones((d,), dtype),
        "final_ln_bias": jnp.zeros((d,), dtype),
        "layers": layers,
    }


def _conv1d(x: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray, stride: int) -> jnp.ndarray:
    """x [B, T, C_in], w [O, I, K] (HF conv layout), 'same'-ish padding=1."""
    out = jax.lax.conv_general_dilated(
        x, jnp.transpose(w, (2, 1, 0)),  # -> [K, I, O]
        window_strides=(stride,),
        padding=((1, 1),),
        dimension_numbers=("NWC", "WIO", "NWC"),
    )
    return out + b


def _encoder_layer(x, lp, num_heads, use_flash=False):
    from vidi_tpu.ops.pallas import fused_tower_layer as ftl
    if ftl.use_fused(lp):
        q, k, v = ftl.ln_qkv(x, lp, eps=1e-5)  # whisper k_proj has no bias
        attn = mha(q, k, v, num_heads, use_flash=use_flash)
        x = ftl.o_residual(attn, x, lp)
        return ftl.ln_ffn(x, lp, eps=1e-5, hidden_act="gelu")
    res = x
    h = layer_norm(x, lp["ln1_scale"], lp["ln1_bias"], eps=1e-5)
    q = dense(h, lp["q_w"], lp["q_b"])
    k = dense(h, lp["k_w"])
    v = dense(h, lp["v_w"], lp["v_b"])
    h = dense(mha(q, k, v, num_heads, use_flash=use_flash),
              lp["o_w"], lp["o_b"])
    x = res + h
    res = x
    h = layer_norm(x, lp["ln2_scale"], lp["ln2_bias"], eps=1e-5)
    h = dense(gelu_exact(dense(h, lp["fc1_w"], lp["fc1_b"])), lp["fc2_w"], lp["fc2_b"])
    return res + h


def forward(params: Params, mel: jnp.ndarray, cfg: AudioConfig,
            remat: bool = False, use_flash: bool = False) -> jnp.ndarray:
    """mel [B, n_mels, 3000] (HF feature-extractor layout) -> [B, 1500, d]."""
    x = jnp.transpose(mel, (0, 2, 1)).astype(params["conv1_w"].dtype)  # [B, T, n_mels]
    x = gelu_exact(_conv1d(x, params["conv1_w"], params["conv1_b"], 1))
    x = gelu_exact(_conv1d(x, params["conv2_w"], params["conv2_b"], 2))
    x = x + params["pos_embed"][: x.shape[1]].astype(x.dtype)

    def body(h, lp):
        return _encoder_layer(h, lp, cfg.num_heads, use_flash), None

    if remat:
        body = jax.checkpoint(body)
    x, _ = jax.lax.scan(body, x, params["layers"])
    return layer_norm(x, params["final_ln_scale"], params["final_ln_bias"], eps=1e-5)
