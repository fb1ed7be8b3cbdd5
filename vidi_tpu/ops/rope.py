"""Rotary position embeddings (HF half-rotation layout).

Gemma2/Mistral both use the "rotate_half" convention: the head dim is split
into two halves; rotated = (x*cos) + (rotate_half(x)*sin) with
rotate_half(x) = concat(-x2, x1). Frequencies are computed in fp32
(matches transformers' Gemma2RotaryEmbedding referenced at
Vidi1.5_9B/vidi/model/lmm/dattn/gemma.py:261,348).
"""
from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp


def rope_cos_sin(
    positions: jnp.ndarray,  # [B, T] or [T] int
    head_dim: int,
    theta: float,
    dtype=jnp.float32,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns cos/sin tables of shape positions.shape + [head_dim]."""
    inv_freq = 1.0 / (
        theta ** (jnp.arange(0, head_dim, 2, dtype=jnp.float32) / head_dim)
    )  # [D/2]
    freqs = positions.astype(jnp.float32)[..., None] * inv_freq  # [..., D/2]
    emb = jnp.concatenate([freqs, freqs], axis=-1)  # [..., D]
    return jnp.cos(emb).astype(dtype), jnp.sin(emb).astype(dtype)


def _rotate_half(x: jnp.ndarray) -> jnp.ndarray:
    half = x.shape[-1] // 2
    x1, x2 = x[..., :half], x[..., half:]
    return jnp.concatenate([-x2, x1], axis=-1)


def apply_rope(
    x: jnp.ndarray,  # [B, T, H, D]
    cos: jnp.ndarray,  # [B, T, D] or [T, D]
    sin: jnp.ndarray,
) -> jnp.ndarray:
    if cos.ndim == x.ndim - 1:  # add head axis
        cos = cos[..., None, :]
        sin = sin[..., None, :]
    xf = x.astype(jnp.float32)
    out = xf * cos.astype(jnp.float32) + _rotate_half(xf) * sin.astype(jnp.float32)
    return out.astype(x.dtype)
