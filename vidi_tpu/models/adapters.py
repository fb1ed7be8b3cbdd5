"""Multimodal adapter modules ("mm_rand" — the default-trainable params).

TPU-native, NHWC-layout re-implementations of:
- Conv2DPool: pad 27->28, optional bilinear budget-resize, space_to_depth(2)
  (reference: Vidi1.5_9B/vidi/model/mm_vision/pool.py:23-32,
   vidi/utils.py:134-150).
- resize_by_tokens: long-video token-budget rule
  (reference: vidi/utils.py:152-171).
- MLP projector "mlpNx_gelu" (reference: vidi/model/mm_layer/mlp.py:10-30) —
  exact (erf) GELU as in torch nn.GELU.
- LearnablePosEmbd: fractional sinusoidal anchors + fp32 MLP with train-time
  jitter (reference: vidi/model/mm_vision/pos.py:11-65).
- Audio pool Conv1d(k=5, s=5, no bias) (reference: multimodal.py:85-88),
  expressed as a reshaped matmul so it lands on the MXU.

All functions are pure; params are nested dicts of jnp arrays.
"""
from __future__ import annotations

import math
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from vidi_tpu.ops.norms import rms_norm

Params = Dict[str, jnp.ndarray]


# ---------------------------------------------------------------------------
# space_to_depth / pooling
# ---------------------------------------------------------------------------

def space_to_depth(x: jnp.ndarray, m: int = 2) -> jnp.ndarray:
    """[N, H, W, C] -> [N, H/m, W/m, C*m*m] with channel index c*m*m + i*m + j.

    The channel ordering matches the reference's NCHW permute
    (vidi/utils.py:144-149) so converted projector weights apply unchanged.
    """
    n, h, w, c = x.shape
    assert h % m == 0 and w % m == 0, (h, w, m)
    x = x.reshape(n, h // m, m, w // m, m, c)
    x = x.transpose(0, 1, 3, 5, 2, 4)  # [N, H/m, W/m, C, m, m]
    return x.reshape(n, h // m, w // m, c * m * m)


def resize_by_tokens(num_frames: int, padded_side: int, max_tokens: int) -> Tuple[int, int]:
    """Token-budget spatial size (static, host-side). vidi/utils.py:152-171."""
    ratio = math.sqrt(max_tokens / (num_frames * padded_side * padded_side))
    temp = int(padded_side * ratio)
    new = max(10, temp - temp % 2)
    return new, new


def budget_hw(num_frames: int, pool_size: int, side: int = 27,
              max_tokens_base: int = 60000) -> Tuple[int, int]:
    """Chooses the pooled-input spatial size for a video of `num_frames`.

    Mirrors multimodal.py:175-180: token count is estimated on the padded
    (side+1) grid; if over budget, downscale; else keep the padded 28x28.
    """
    padded = side + 1
    n_tokens = num_frames * padded * padded
    max_tokens = max_tokens_base * pool_size * pool_size
    if n_tokens > max_tokens:
        return resize_by_tokens(num_frames, padded, max_tokens)
    return padded, padded


def conv2d_pool(
    feats: jnp.ndarray,  # [N, S, S, C] patch features (S = 27 for SigLIP-384)
    hw: Tuple[int, int],
    merge: int = 2,
) -> jnp.ndarray:
    """Pad right/bottom by 1, optional bilinear resize, space_to_depth merge."""
    n, s, _, c = feats.shape
    x = jnp.pad(feats, ((0, 0), (0, 1), (0, 1), (0, 0)))
    if hw[0] != s + 1 or hw[1] != s + 1:
        # half-pixel-center bilinear == torch F.interpolate(align_corners=False)
        x = jax.image.resize(x, (n, hw[0], hw[1], c), method="bilinear", antialias=False)
    return space_to_depth(x, merge)


def _align_corners_matrix(n_out: int, n_in: int) -> jnp.ndarray:
    """Dense [n_out, n_in] interpolation matrix for bilinear resize with
    torch align_corners=True semantics: out[i] samples at i*(n_in-1)/(n_out-1).
    Expressed as a matmul so both resize axes land on the MXU."""
    if n_out == 1:
        pos = jnp.zeros((1,), jnp.float32)
    else:
        pos = jnp.arange(n_out, dtype=jnp.float32) * ((n_in - 1) / (n_out - 1))
    lo = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, n_in - 1)
    hi = jnp.minimum(lo + 1, n_in - 1)
    frac = pos - lo.astype(jnp.float32)
    eye = jnp.eye(n_in, dtype=jnp.float32)
    return eye[lo] * (1.0 - frac)[:, None] + eye[hi] * frac[:, None]


def bilinear_align_corners(x: jnp.ndarray, out_hw: Tuple[int, int]) -> jnp.ndarray:
    """[N, H, W, C] -> [N, out_h, out_w, C], torch F.interpolate(mode='bilinear',
    align_corners=True) semantics (reference: Vidi_7B/model/mm_vision/pool.py:22-25)."""
    ah = _align_corners_matrix(out_hw[0], x.shape[1]).astype(jnp.float32)
    aw = _align_corners_matrix(out_hw[1], x.shape[2]).astype(jnp.float32)
    xf = x.astype(jnp.float32)
    y = jnp.einsum("oh,nhwc->nowc", ah, xf)
    y = jnp.einsum("pw,nowc->nopc", aw, y)
    return y.astype(x.dtype)


def init_conv2d_pool_v1(key, d: int, s_in: int, s_out: int, dtype=jnp.float32) -> Params:
    """7B Conv2DPool: Conv2d(d, d, kernel=ceil(s_in/s_out), no bias), then
    bilinear align_corners resize to (s_out, s_out) (Vidi_7B pool.py:6-26)."""
    k = math.ceil(s_in / s_out)
    scale = (d * k * k) ** -0.5
    w = jax.random.normal(key, (d, d, k, k)) * scale  # torch layout [O, I, KH, KW]
    return {"w": w.astype(dtype)}


def conv2d_pool_v1(params: Params, feats: jnp.ndarray, s_out: int) -> jnp.ndarray:
    """[N, S, S, C] -> [N, s_out, s_out, C]: VALID conv (stride 1) + bilinear
    align-corners resize — the Vidi_7B pooling path."""
    w = params["w"]
    y = jax.lax.conv_general_dilated(
        feats.astype(w.dtype), w, window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NHWC", "OIHW", "NHWC"),
    )
    return bilinear_align_corners(y, (s_out, s_out)).astype(feats.dtype)


# ---------------------------------------------------------------------------
# MLP projector
# ---------------------------------------------------------------------------

def init_mlp_projector(key, d_in: int, d_out: int, depth: int = 2,
                       dtype=jnp.float32) -> Params:
    params = {}
    dims = [d_in] + [d_out] * depth
    for i in range(depth):
        key, sub = jax.random.split(key)
        params[f"w{i}"] = (
            jax.random.normal(sub, (dims[i], dims[i + 1])) * (dims[i] ** -0.5)
        ).astype(dtype)
        params[f"b{i}"] = jnp.zeros((dims[i + 1],), dtype)
    return params


def mlp_projector(params: Params, x: jnp.ndarray, depth: int = 2) -> jnp.ndarray:
    for i in range(depth):
        x = x @ params[f"w{i}"] + params[f"b{i}"]
        if i < depth - 1:
            x = jax.nn.gelu(x, approximate=False)
    return x


# ---------------------------------------------------------------------------
# Fractional sinusoidal learnable positional embedding
# ---------------------------------------------------------------------------

def init_pos_embed(key, d: int, dtype=jnp.float32) -> Params:
    k1, k2 = jax.random.split(key)
    # fp32 MLP regardless of model dtype (pos.py:36-38 uses dtype=torch.float32)
    del dtype
    return {
        "w0": (jax.random.normal(k1, (d, d)) * (d**-0.5)).astype(jnp.float32),
        "b0": jnp.zeros((d,), jnp.float32),
        "w1": (jax.random.normal(k2, (d, d)) * (d**-0.5)).astype(jnp.float32),
        "b1": jnp.zeros((d,), jnp.float32),
    }


def _fractional_sinusoid(p: jnp.ndarray, d: int) -> jnp.ndarray:
    """Interleaved sin/cos table: pe[..., 0::2]=sin, pe[..., 1::2]=cos
    (pos.py:11-24). p may have any shape; output is [*p.shape, d]."""
    div = jnp.exp(jnp.arange(0, d, 2, dtype=jnp.float32) * (-math.log(10000.0) / d))
    ang = p.astype(jnp.float32)[..., None] * div  # [..., d/2]
    pe = jnp.stack([jnp.sin(ang), jnp.cos(ang)], axis=-1)  # [..., d/2, 2]
    return pe.reshape(*p.shape, d)


def pos_mlp(params: Params, frac: jnp.ndarray, d: int,
            out_dtype=jnp.float32) -> jnp.ndarray:
    """The pos-embed MLP applied to pre-normalized fractional anchor
    positions of ANY shape -> [*frac.shape, d]. Lets callers with dynamic
    per-sample geometry (batched anyres grids) compute embeddings pointwise
    instead of materializing a static-length table (pos.py:40-65)."""
    pe = _fractional_sinusoid(frac, d)
    h = jnp.dot(pe, params["w0"]) + params["b0"]
    h = jax.nn.gelu(h, approximate=False)
    h = jnp.dot(h, params["w1"]) + params["b1"]
    return h.astype(out_dtype)


def pos_embed(
    params: Params,
    length: int,
    n_anchors: int,
    d: int,
    *,
    out_dtype=jnp.float32,
    noise_rng: Optional[jax.Array] = None,
) -> jnp.ndarray:
    """Positional table [length, d] (pos.py:40-65).

    Positions arange(length) are normalized onto [0, n_anchors-1]; when
    `noise_rng` is given (training), Gaussian jitter clamped to +-0.45 is
    added before normalization.
    """
    p = jnp.arange(length, dtype=jnp.float32)
    if noise_rng is not None and length > 1:
        noise = jnp.clip(jax.random.normal(noise_rng, (length,)) * 0.45, -0.45, 0.45)
        p = jnp.clip(p + noise, 0.0, length - 1.0)
    denom = max(length - 1, 1)
    p = p / denom * (n_anchors - 1)
    pe = _fractional_sinusoid(p, d)
    h = jnp.dot(pe, params["w0"]) + params["b0"]
    h = jax.nn.gelu(h, approximate=False)
    h = jnp.dot(h, params["w1"]) + params["b1"]
    return h.astype(out_dtype)


def add_pos(x: jnp.ndarray, pe: jnp.ndarray, axis: int, eps: float = 1e-5) -> jnp.ndarray:
    """x + rms_norm(pe) broadcast along `axis` (multimodal.py:194-197)."""
    pe = rms_norm(pe, eps).astype(x.dtype)
    shape = [1] * (x.ndim - 1) + [pe.shape[-1]]
    shape[axis] = pe.shape[0]
    return x + pe.reshape(shape)


# ---------------------------------------------------------------------------
# Audio pooling conv (k = s = pool, no bias) as an MXU matmul
# ---------------------------------------------------------------------------

def init_audio_pool(key, d_in: int, d_out: int, pool: int, dtype=jnp.float32) -> Params:
    scale = (d_in * pool) ** -0.5
    w = jax.random.normal(key, (d_out, d_in, pool)) * scale  # conv layout [O, I, K]
    return {"w": w.astype(dtype)}


def audio_pool(params: Params, x: jnp.ndarray, pool: int) -> jnp.ndarray:
    """[B, T, d_in] -> [B, T//pool, d_out]; trailing remainder dropped."""
    b, t, c = x.shape
    t_out = t // pool
    x = x[:, : t_out * pool].reshape(b, t_out, pool, c)
    return jnp.einsum(
        "btkc,ock->bto", x, params["w"], preferred_element_type=jnp.float32
    ).astype(x.dtype)


# ---------------------------------------------------------------------------
# RMSNorm with learnable scale (mm adapters)
# ---------------------------------------------------------------------------

def init_rms_norm(d: int, std: float = 1.0, dtype=jnp.float32) -> Params:
    return {"weight": jnp.full((d,), std, dtype)}
