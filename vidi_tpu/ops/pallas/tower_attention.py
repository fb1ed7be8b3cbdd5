"""Single-block Pallas attention for the encoder towers.

The tower hot loop (SigLIP at 729 tokens/frame, Whisper at 1500/window —
SURVEY.md §3.3 hot loop #1) is non-causal, maskless, and short enough that
one (frame, head)'s entire attention fits in VMEM. XLA's fused-softmax
attention materializes the fp32 [H, T, T] logits in HBM between the two
matmuls (~38 MB per SigLIP frame-layer, ~1.6 TB over an hour-long video); the
multi-block flash kernel (flash_attention.py) avoids that but pays online-
softmax bookkeeping that measured SLOWER than XLA at 729 tokens (0.34 s vs
0.24 s / 120 frames). This kernel does neither: whole-sequence logits in
VMEM, one plain softmax, no running max/sum.

Three layouts:
- packed (the fast path): when a whole number of heads tiles the 128-lane
  register width (head_dim ∈ {128, 64, 32, ...}), the kernel reads the
  [B, T, D_model] projection output DIRECTLY — grid (B, D_model/128), each
  step slicing its g = 128/head_dim heads out of a [T, 128] block. No
  transposes, no sequence padding (block dim T equals the array dim, allowed
  by the Mosaic tiling rule even when T % 8 != 0).
- fullwidth: head dims that DON'T tile 128 (SigLIP-so400m's 16 heads x 72 =
  1152 lanes) read the whole [T, H*D] block per frame — grid (B,) — and
  statically lane-slice each head inside the kernel (raised Mosaic VMEM
  limit). Measured at so400m geometry (120 frames, T=729): 3.89 ms vs the
  generic path's 11.94 and XLA's 13.96 per layer — 3.1x.
- generic: fallback for anything else; transposes to [B, H, T, D] and pads
  T to a multiple of 8.

Training-safe: the custom VJP recomputes attention with plain jnp ops, so
the (normally frozen — reference train.py:155-159) towers still differentiate
when train_vis/train_aud are enabled.

Replaces flash-attn's tower use (the reference wires flash-attn into SigLIP/
Whisper via HF attn_implementation, Vidi1.5_9B/vidi/model/builder.py:51).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vidi_tpu.ops.pallas.flash_attention import MASK_VALUE

# Set True to run in interpreter mode (CPU tests flip this).
INTERPRET = False

# fp32 score buffers must fit VMEM next to the q/k/v/o blocks; both kernels
# raise the Mosaic scoped-VMEM limit (v5e has 128M) to admit Whisper-length
# (T=1500) sequences — validated on chip: packed T=1500 H=20 5.95 ms,
# H=12 3.52 ms / 40 windows / layer vs XLA's 13.05 (H=12).
_VMEM_SCORE_BUDGET = 24 * 2**20
_VMEM_LIMIT = 64 * 2**20
_FULLWIDTH_VMEM_LIMIT = 100 * 2**20
_FULLWIDTH_VMEM_BUDGET = 72 * 2**20
# Mosaic keeps per-head score temps live across the unrolled head loop;
# h * score_bytes past this spilled to >128M at T=1500 H=20 on chip.
_FULLWIDTH_SPILL_BUDGET = 48 * 2**20


def _exp_scaled(s, scale):
    """exp(s*scale - rowmax(s*scale)) with `scale` folded into the exp's
    fused multiply-subtract (max commutes with the positive scale): one
    [T, T] VPU pass instead of a scale pass + a subtract pass. Returns the
    UN-normalized probs + the row normalizer — dividing the [T, d] output
    by z replaces a [T, T] divide with a [T, d] one (measured with both
    folds: 3.38 -> 3.10 ms / 120 SigLIP frames / layer on v5e)."""
    m = jnp.max(s, axis=1, keepdims=True)
    p = jnp.exp(s * scale - m * scale)
    return p, jnp.sum(p, axis=1, keepdims=True)


def _packed_kernel(q_ref, k_ref, v_ref, o_ref, *, scale, d):
    q = q_ref[0]  # [T, 128] — 128/d heads side by side
    k = k_ref[0]
    v = v_ref[0]
    outs = []
    for h in range(128 // d):
        sl = slice(h * d, (h + 1) * d)
        s = jax.lax.dot_general(
            q[:, sl], k[:, sl], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        p, z = _exp_scaled(s, scale)
        o = jax.lax.dot(p.astype(v.dtype), v[:, sl],
                        preferred_element_type=jnp.float32)
        outs.append(o / z)
    o_ref[0] = jnp.concatenate(outs, axis=1).astype(o_ref.dtype)


def _fullwidth_kernel(q_ref, k_ref, v_ref, o_ref, *, scale, h, d):
    for i in range(h):
        sl = slice(i * d, (i + 1) * d)
        q = q_ref[0, :, sl]  # static lane slice of the [T, H*d] block
        k = k_ref[0, :, sl]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        p, z = _exp_scaled(s, scale)
        o = jax.lax.dot(p.astype(q.dtype), v_ref[0, :, sl],
                        preferred_element_type=jnp.float32)
        o_ref[0, :, sl] = (o / z).astype(o_ref.dtype)


def tower_attention_fullwidth(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                              h: int, d: int, scale: float) -> jnp.ndarray:
    """q/k/v [B, T, Dm] flat head-major (Dm = H*d) -> [B, T, Dm]."""
    b, t, dm = q.shape
    spec = pl.BlockSpec((1, t, dm), lambda i: (i, 0, 0))
    return pl.pallas_call(
        functools.partial(_fullwidth_kernel, scale=scale, h=h, d=d),
        grid=(b,),
        in_specs=[spec] * 3,
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((b, t, dm), q.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_FULLWIDTH_VMEM_LIMIT),
        interpret=INTERPRET,
    )(q, k, v)


def _generic_kernel(q_ref, k_ref, v_ref, o_ref, *, scale, t_real):
    q = q_ref[0, 0]  # [Tp, D]
    k = k_ref[0, 0]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    cols = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    s = jnp.where(cols < t_real, s, MASK_VALUE)  # pad KV columns
    p, z = _exp_scaled(s, scale)
    o = jax.lax.dot(p.astype(v_ref.dtype), v_ref[0, 0],
                    preferred_element_type=jnp.float32)
    o_ref[0, 0] = (o / z).astype(o_ref.dtype)


def _packed_ok(t: int, d: int, dm: int) -> bool:
    # dm = h*d must tile the 128-lane blocks exactly: grid is (b, dm // 128),
    # so dm < 128 would give an empty grid (no output written) and
    # dm % 128 != 0 would leave the tail heads unwritten — silent garbage on
    # a real chip (interpret mode doesn't catch it). Tiny configs (e.g.
    # --random-weights tiny, h=2 d=16 -> dm=32) fall through to the
    # generic per-head kernel instead.
    return (128 % d == 0 and dm % 128 == 0
            and (128 // d) * 4 * t * t <= _VMEM_SCORE_BUDGET)


def _fullwidth_ok(t: int, h: int, d: int) -> bool:
    if 128 % d == 0:
        return False  # aligned head dims take the packed path
    # 4 [T, H*d] bf16 blocks + ~3 [T, T] fp32 score/exp/prob temps
    est = 4 * 2 * t * h * d + 3 * 4 * t * t
    return (est <= _FULLWIDTH_VMEM_BUDGET
            and h * 4 * t * t <= _FULLWIDTH_SPILL_BUDGET)


def fits(t: int, d: int, h: int = 1) -> bool:
    """Whether a T-token tower sequence fits some path's VMEM budget."""
    return (_packed_ok(t, d, h * d) or _fullwidth_ok(t, h, d)
            or 4 * t * t <= _VMEM_SCORE_BUDGET)


def tower_attention_packed(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                           d: int, scale: float) -> jnp.ndarray:
    """q/k/v [B, T, Dm] flat head-major (Dm = H*d) -> [B, T, Dm]."""
    b, t, dm = q.shape
    spec = pl.BlockSpec((1, t, 128), lambda i, j: (i, 0, j))
    return pl.pallas_call(
        functools.partial(_packed_kernel, scale=scale, d=d),
        grid=(b, dm // 128),
        in_specs=[spec] * 3,
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((b, t, dm), q.dtype),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=INTERPRET,
    )(q, k, v)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def tower_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                    scale: float) -> jnp.ndarray:
    """Non-causal maskless MHA. q/k/v [B, T, H, D] -> [B, T, H, D].

    Dispatches to the packed no-transpose kernel when head_dim tiles 128
    (reshapes in/out are free — the layout is already [B, T, H*D]-contiguous);
    otherwise the generic per-head kernel. The backward pass recomputes
    attention with plain jnp ops (same math, so the cotangents are exact);
    towers are frozen in the reference recipe so this path is rarely hot.
    """
    b, t, h, d = q.shape
    if _packed_ok(t, d, h * d):
        out = tower_attention_packed(
            q.reshape(b, t, h * d), k.reshape(b, t, h * d),
            v.reshape(b, t, h * d), d, scale)
        return out.reshape(b, t, h, d)
    if _fullwidth_ok(t, h, d):
        out = tower_attention_fullwidth(
            q.reshape(b, t, h * d), k.reshape(b, t, h * d),
            v.reshape(b, t, h * d), h, d, scale)
        return out.reshape(b, t, h, d)

    tp = -(-t // 8) * 8

    def prep(x):
        x = jnp.transpose(x, (0, 2, 1, 3))  # [B, H, T, D]
        if tp != t:
            x = jnp.pad(x, ((0, 0), (0, 0), (0, tp - t), (0, 0)))
        return x

    out = pl.pallas_call(
        functools.partial(_generic_kernel, scale=scale, t_real=t),
        grid=(b, h),
        in_specs=[pl.BlockSpec((1, 1, tp, d), lambda i, j: (i, j, 0, 0))] * 3,
        out_specs=pl.BlockSpec((1, 1, tp, d), lambda i, j: (i, j, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, h, tp, d), q.dtype),
        interpret=INTERPRET,
    )(prep(q), prep(k), prep(v))
    return jnp.transpose(out[:, :, :t], (0, 2, 1, 3))


def _reference_mha(q, k, v, scale):
    """Differentiable jnp twin (matches ops.basic.mha numerics)."""
    logits = jnp.einsum("bthd,bshd->bhts", q, k,
                        preferred_element_type=jnp.float32) * scale
    probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    return jnp.einsum("bhts,bshd->bthd", probs, v,
                      preferred_element_type=jnp.float32).astype(q.dtype)


def _ta_fwd(q, k, v, scale):
    return tower_attention(q, k, v, scale), (q, k, v)


def _ta_bwd(scale, res, g):
    q, k, v = res
    _, vjp = jax.vjp(lambda q_, k_, v_: _reference_mha(q_, k_, v_, scale),
                     q, k, v)
    return vjp(g)


tower_attention.defvjp(_ta_fwd, _ta_bwd)
