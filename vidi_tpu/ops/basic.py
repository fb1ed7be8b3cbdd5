"""Small shared building blocks for the encoder towers."""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def layer_norm(x: jnp.ndarray, scale: jnp.ndarray, bias: jnp.ndarray,
               eps: float = 1e-6) -> jnp.ndarray:
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    out = (xf - mean) * jax.lax.rsqrt(var + eps)
    return (out * scale + bias).astype(x.dtype)


def dense(x: jnp.ndarray, w, b: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """x @ w (+ b). w is [in, out], or an int8 dict from infer/quantize.py —
    then the matmul runs int8 x int8 on the MXU with dynamic activation
    scales (2x the bf16 rate; the towers' --load-8bit-towers mode)."""
    if isinstance(w, dict):
        from vidi_tpu.infer.quantize import dynamic_qdense
        return dynamic_qdense(x, w, b)
    y = jnp.dot(x, w, preferred_element_type=x.dtype)
    if b is not None:
        y = y + b
    return y


def mha(
    q: jnp.ndarray,  # [B, T, D]
    k: jnp.ndarray,  # [B, S, D]
    v: jnp.ndarray,  # [B, S, D]
    num_heads: int,
    scale: Optional[float] = None,
    use_flash: bool = False,
) -> jnp.ndarray:
    """Plain full-head attention for encoder towers (no mask, non-causal).

    `use_flash` routes through a Pallas kernel so the fp32 [B,H,T,S] logits
    never round-trip HBM (the dominant cost of the long-video encode path,
    SURVEY.md §3.3 hot loop #1): the single-block tower_attention kernel when
    the whole sequence fits VMEM (measured 3.8 ms vs XLA's 10.3 ms per
    120 SigLIP frames per layer), the multi-block flash kernel otherwise.
    """
    b, t, d = q.shape
    s = k.shape[1]
    hd = d // num_heads
    if scale is None:
        scale = hd**-0.5
    qh = q.reshape(b, t, num_heads, hd)
    kh = k.reshape(b, s, num_heads, hd)
    vh = v.reshape(b, s, num_heads, hd)
    if use_flash:
        from vidi_tpu.ops.pallas import tower_attention as ta
        if t == s and ta.fits(t, hd, num_heads):
            return ta.tower_attention(qh, kh, vh, scale).reshape(b, t, d)
        from vidi_tpu.ops.pallas.flash_attention import flash_attention
        out = flash_attention(qh, kh, vh, None, scale, False, None, None)
        return out.reshape(b, t, d)
    logits = jnp.einsum("bthd,bshd->bhts", qh, kh,
                        preferred_element_type=jnp.float32) * scale
    probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    out = jnp.einsum("bhts,bshd->bthd", probs, vh,
                     preferred_element_type=jnp.float32).astype(q.dtype)
    return out.reshape(b, t, d)


def gelu_tanh(x: jnp.ndarray) -> jnp.ndarray:
    """gelu_pytorch_tanh (SigLIP / Gemma2 / Whisper-adjacent activations)."""
    return jax.nn.gelu(x, approximate=True)


def gelu_exact(x: jnp.ndarray) -> jnp.ndarray:
    return jax.nn.gelu(x, approximate=False)


def quick_gelu(x: jnp.ndarray) -> jnp.ndarray:
    """x * sigmoid(1.702 x) — CLIP's activation."""
    return x * jax.nn.sigmoid(1.702 * x)


def tower_act(x: jnp.ndarray, hidden_act: str) -> jnp.ndarray:
    if hidden_act == "quick_gelu":
        return quick_gelu(x)
    if hidden_act == "gelu_tanh":
        return gelu_tanh(x)
    return gelu_exact(x)
