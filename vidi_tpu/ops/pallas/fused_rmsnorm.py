"""Pallas fused RMSNorm (SURVEY.md §7 kernel (d) — the liger-kernel analog).

XLA already fuses rms_norm chains well; this kernel exists for the cases
where it does not (norm sandwiched between two custom kernels breaks the
fusion window) and as the explicit counterpart of the reference's
liger-kernel patch (reference: Vidi1.5_9B/vidi/model/lmm/dattn/gemma.py:692-694,
which swaps HF's Gemma2 RMSNorm for a fused Triton one).

fp32 statistics, one read of x: y = x * rsqrt(mean(x^2) + eps) * (w [+ 1]).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

INTERPRET = False
DEFAULT_BLOCK_ROWS = 256


def _kernel(x_ref, w_ref, o_ref, *, eps, plus_one):
    x = x_ref[...].astype(jnp.float32)
    var = jnp.mean(x * x, axis=-1, keepdims=True)
    y = x * jax.lax.rsqrt(var + eps)
    w = w_ref[...].astype(jnp.float32)
    if plus_one:  # gemma convention: weight stored as (scale - 1)
        w = w + 1.0
    o_ref[...] = (y * w).astype(o_ref.dtype)


def fused_rms_norm(x: jnp.ndarray, weight: jnp.ndarray, eps: float = 1e-6,
                   plus_one: bool = True,
                   block_rows: int = DEFAULT_BLOCK_ROWS) -> jnp.ndarray:
    """x [..., D] * rsqrt(mean(x^2)+eps) * (weight [+1]). fp32 math."""
    orig_shape = x.shape
    d = x.shape[-1]
    x2 = x.reshape(-1, d)
    n = x2.shape[0]
    br = min(block_rows, max(n, 8))
    pad = (-n) % br
    if pad:
        x2 = jnp.pad(x2, ((0, pad), (0, 0)))
    grid = (x2.shape[0] // br,)

    out = pl.pallas_call(
        functools.partial(_kernel, eps=eps, plus_one=plus_one),
        grid=grid,
        in_specs=[
            pl.BlockSpec((br, d), lambda i: (i, 0)),
            pl.BlockSpec((d,), lambda i: (0,)),
        ],
        out_specs=pl.BlockSpec((br, d), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct(x2.shape, x.dtype),
        interpret=INTERPRET,
    )(x2, weight)
    return out[:n].reshape(orig_shape)
