"""RMS normalization ops.

Replaces the reference's fp32 rms_norm / RMSNorm pair
(reference: Vidi1.5_9B/vidi/model/mm_layer/norm.py:8-25) and Gemma2RMSNorm.
XLA fuses these into surrounding ops, which is what liger's Triton RMSNorm
bought the reference on GPU (reference: gemma.py:692-694).
"""
from __future__ import annotations

import jax.numpy as jnp
from jax import lax


def rms_norm(x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """Weightless RMS norm, computed in fp32 and cast back (norm.py:8-15)."""
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    return (xf * lax.rsqrt(var + eps)).astype(x.dtype)


def scaled_rms_norm(x: jnp.ndarray, weight: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """weight * rms_norm(x) — the mm-adapter RMSNorm (norm.py:18-25)."""
    return (weight * rms_norm(x, eps)).astype(x.dtype)


def gemma_rms_norm(x: jnp.ndarray, weight: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    """Gemma-style (1 + w) * rms_norm(x), fp32 internals."""
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    normed = xf * lax.rsqrt(var + eps)
    return (normed * (1.0 + weight.astype(jnp.float32))).astype(x.dtype)


def mistral_rms_norm(x: jnp.ndarray, weight: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """Llama/Mistral-style w * rms_norm(x)."""
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    normed = xf * lax.rsqrt(var + eps)
    return (weight.astype(jnp.float32) * normed).astype(x.dtype)
