"""Fused int8 encoder-tower layer kernels (LN + quantize + matmul epilogues).

Why: dynamic-activation int8 towers (--load-8bit-towers) only bought 8% over
bf16 (encode 3.76 -> 3.46 s / 3600 frames) even though the int8 MXU rate is
2x bf16 (399 vs 194 T/s measured): the jnp form runs the per-matmul
rescale/requantize epilogue (fp32, O(M*N)) as separate XLA fusions that
serialize against the MXU. The earlier single-matmul Pallas kernel
(quant_matmul.py) LOST in-tower because six opaque calls per layer redid the
shared q/k/v quantize and forced HBM round-trips at every boundary. This
module is the fix CLAUDE.md gates the int8-tower revisit on: kernels at the
LAYER-piece level, so each quantize happens once, every epilogue
(rescale/bias/activation/requantize/residual) runs on VMEM tiles pipelined
against the next tile's int8 dot, and only bf16 activations cross HBM —
exactly the boundaries the bf16 path has.

Three kernels per encoder layer (SigLIP/CLIP/Whisper all share the layout,
reference: Vidi1.5_9B/vidi/model/mm_vision/siglip.py:21-48,
Vidi1.5_9B/vidi/model/mm_audio/whisper.py:15-31):

  ln_qkv      x -> LN1 -> quantize once -> 3 int8 dots -> q, k, v
  o_residual  attn -> quantize -> int8 dot -> + residual
  ln_ffn      x -> LN2 -> quantize -> int8 dot -> +b -> act -> requantize
                 -> int8 dot -> +b -> + residual

Numerics mirror the jnp dynamic_qdense path (infer/quantize.py) including
its bf16 rounding points: LN output casts to the activation dtype before
quantization, matmul results cast before the bias add, the activation runs
in the activation dtype. Tests compare in interpret mode on CPU
(tests/test_quant_fused.py); jnp stays the numerics of record.

FFN dims that don't tile the 128-lane constraint (SigLIP so400m ff=4304)
are zero-padded to the next multiple of 128 at quantization time
(infer/quantize.py pads fc1/fc2) — padded columns carry zero weight/bias, so
gelu(0)=0 contributes nothing and both the jnp and fused paths are exact.

Weights stay VMEM-resident across the grid (constant index maps), so each
x tile is read once and the kernels are MXU-bound by construction. Blocks
index the UNFLATTENED [B, T, d] activations: collapsing (B, T) is a real
relayout (not a bitcast) whenever T doesn't tile the (8, 128) sublane
layout — profiled at ~3.5 ms per reshape at so400m scale.

MEASURED on the v5e chip (prof_tower_fused pattern, N=8):
  SigLIP so400m, 120 frames: 371.6 ms fused vs 560.8 bf16 / 415.8 jnp-int8
    (1.51x bf16, 1.12x jnp)
  Whisper large T=1500, B=4: 56.8 ms fused vs 82.1 bf16 / 63.0 jnp-int8
    (1.44x bf16, 1.11x jnp)
Default ON for quantized towers (VIDI_TOWER_FUSED=0 reverts to jnp).
Fused-vs-jnp on-chip max rel err ~2-3e-2: dynamic int8 requantization is
scale-sensitive (a 1-ulp bf16 LN difference moves a row's amax and re-rounds
the whole row), same order as the jnp path's own run-to-run int8 noise.
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Flipped by CPU tests to run kernels in interpreter mode.
INTERPRET = False

_BM = int(os.environ.get("VIDI_FUSED_BM", "512"))
# weights stay resident + double-buffered x/out tiles; the default 16 MB
# scoped limit OOMs the FFN kernel (w1+w2 alone are 9.6 MB at so400m)
_VMEM_LIMIT = 100 * 2**20


def _cparams(grid):
    return pltpu.CompilerParams(
        dimension_semantics=("parallel",) * len(grid),
        vmem_limit_bytes=_VMEM_LIMIT)


def _ln_f32(x, scale, bias, eps):
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps) * scale + bias


def _quantize_rows(x):
    """Per-row symmetric int8 — THE numerics-of-record rule, shared with the
    jnp path (plain jnp ops, safe inside kernel bodies)."""
    from vidi_tpu.infer.quantize import quantize_act
    return quantize_act(x)


def _qdot(xq, sx, w_ref, s_ref, b_ref, out_dtype):
    """int8 dot + rescale + fp32 bias, then ONE cast to out_dtype — matches
    dynamic_qdense's promotion (fp32 bias + bf16 matmul -> fp32), so the
    fused path takes no extra bf16 rounding per projection."""
    y = jax.lax.dot(xq, w_ref[...], preferred_element_type=jnp.int32)
    y = y.astype(jnp.float32) * sx * s_ref[...] + b_ref[...].astype(jnp.float32)
    return y.astype(out_dtype)


def _act(x, hidden_act):
    if hidden_act == "quick_gelu":
        return x * jax.nn.sigmoid(1.702 * x)
    if hidden_act == "gelu_tanh":
        return jax.nn.gelu(x, approximate=True)
    # exact gelu needs erf, which Mosaic can't lower on TC kernels (verified
    # on-chip: NotImplementedError for both erf and erfc). Abramowitz-Stegun
    # 7.1.26 polynomial instead: |err| <= 1.5e-7 in f32, invisible after the
    # bf16 cast (bf16 ulp at 1.0 is ~8e-3).
    xf = x.astype(jnp.float32)
    z = xf * (2.0 ** -0.5)
    az = jnp.abs(z)
    t = 1.0 / (1.0 + 0.3275911 * az)
    poly = t * (0.254829592 + t * (-0.284496736 + t * (
        1.421413741 + t * (-1.453152027 + t * 1.061405429))))
    erf = jnp.sign(z) * (1.0 - poly * jnp.exp(-az * az))
    return (xf * 0.5 * (1.0 + erf)).astype(x.dtype)


# --------------------------------------------------------------------------
# Kernels
# --------------------------------------------------------------------------

def _ln_qkv_kernel(x_ref, lns_ref, lnb_ref,
                   wq_ref, sq_ref, bq_ref,
                   wk_ref, sk_ref, bk_ref,
                   wv_ref, sv_ref, bv_ref,
                   q_ref, k_ref, v_ref, *, eps):
    dt = x_ref.dtype
    h = _ln_f32(x_ref[0].astype(jnp.float32), lns_ref[...], lnb_ref[...], eps)
    hq, sx = _quantize_rows(h.astype(dt).astype(jnp.float32))
    q_ref[0] = _qdot(hq, sx, wq_ref, sq_ref, bq_ref, dt)
    k_ref[0] = _qdot(hq, sx, wk_ref, sk_ref, bk_ref, dt)
    v_ref[0] = _qdot(hq, sx, wv_ref, sv_ref, bv_ref, dt)


def _o_residual_kernel(a_ref, res_ref, wo_ref, so_ref, bo_ref, o_ref):
    dt = a_ref.dtype
    aq, sx = _quantize_rows(a_ref[0].astype(jnp.float32))
    o_ref[0] = res_ref[0] + _qdot(aq, sx, wo_ref, so_ref, bo_ref, dt)


def _ln_ffn_kernel(x_ref, lns_ref, lnb_ref,
                   w1_ref, s1_ref, b1_ref,
                   w2_ref, s2_ref, b2_ref,
                   o_ref, *, eps, hidden_act):
    dt = x_ref.dtype
    h = _ln_f32(x_ref[0].astype(jnp.float32), lns_ref[...], lnb_ref[...], eps)
    hq, sx = _quantize_rows(h.astype(dt).astype(jnp.float32))
    a = _act(_qdot(hq, sx, w1_ref, s1_ref, b1_ref, dt), hidden_act)
    aq, sx2 = _quantize_rows(a.astype(jnp.float32))
    o_ref[0] = x_ref[0] + _qdot(aq, sx2, w2_ref, s2_ref, b2_ref, dt)


# --------------------------------------------------------------------------
# Wrappers
# --------------------------------------------------------------------------

def _row2d(a, n):
    return a.reshape(1, n).astype(jnp.float32)


# Row-block cap. Blocks are (1, bt, d) slices of the UNFLATTENED [B, T, d]
# activations: flattening (B, T) when T doesn't tile the (8, 128) sublane
# layout (SigLIP T=729) is a real relayout on TPU, and the six of them cost
# ~5.2 ms/layer at 120 frames (profiled) — more than the kernels saved.
_BT_FULL = 2048


def _as3d(x):
    if x.ndim == 2:
        return x[None], x.shape
    if x.ndim == 3:
        return x, x.shape
    b = 1
    for sdim in x.shape[:-2]:
        b *= sdim
    return x.reshape(b, *x.shape[-2:]), x.shape


def _tgrid(b, t):
    bt = t if t <= _BT_FULL else min(_BM, t)
    return bt, (b, -(-t // bt))


def _wsb(w, n):
    """(int8 [K,N], scale [1,N]) from a quantized dict."""
    return w["qi8"], _row2d(w["scale"], n)


def ln_qkv(x, lp, eps):
    """x [..., T, d] -> (q, k, v), LN1 + shared quantize + three int8 dots."""
    x3, shape = _as3d(x)
    b, t, d = x3.shape
    bt, grid = _tgrid(b, t)
    zeros = jnp.zeros((d,), jnp.float32)
    row = pl.BlockSpec((1, d), lambda i, j: (0, 0))
    wspec = pl.BlockSpec((d, d), lambda i, j: (0, 0))
    xspec = pl.BlockSpec((1, bt, d), lambda i, j: (i, j, 0))
    args = [x3,
            _row2d(lp["ln1_scale"].astype(jnp.float32), d),
            _row2d(lp["ln1_bias"].astype(jnp.float32), d)]
    in_specs = [xspec, row, row]
    for key, bkey in (("q_w", "q_b"), ("k_w", "k_b"), ("v_w", "v_b")):
        wq, ws = _wsb(lp[key], d)
        args += [wq, ws, _row2d(lp.get(bkey, zeros), d)]
        in_specs += [wspec, row, row]
    out = pl.pallas_call(
        functools.partial(_ln_qkv_kernel, eps=eps),
        grid=grid,
        in_specs=in_specs,
        out_specs=[xspec] * 3,
        out_shape=[jax.ShapeDtypeStruct((b, t, d), x.dtype)] * 3,
        compiler_params=_cparams(grid),
        interpret=INTERPRET,
    )(*args)
    return tuple(o.reshape(shape) for o in out)


def o_residual(attn, residual, lp):
    """residual + attn @ o_w (quantized), fused quantize/rescale/add."""
    a3, shape = _as3d(attn)
    b, t, d = a3.shape
    bt, grid = _tgrid(b, t)
    wq, ws = _wsb(lp["o_w"], d)
    xspec = pl.BlockSpec((1, bt, d), lambda i, j: (i, j, 0))
    row = pl.BlockSpec((1, d), lambda i, j: (0, 0))
    out = pl.pallas_call(
        _o_residual_kernel,
        grid=grid,
        in_specs=[xspec, xspec,
                  pl.BlockSpec((d, d), lambda i, j: (0, 0)), row, row],
        out_specs=xspec,
        out_shape=jax.ShapeDtypeStruct((b, t, d), attn.dtype),
        compiler_params=_cparams(grid),
        interpret=INTERPRET,
    )(a3, residual.reshape(b, t, d), wq, ws, _row2d(lp["o_b"], d))
    return out.reshape(shape)


def ln_ffn(x, lp, eps, hidden_act):
    """x + FFN(LN2(x)) with both matmuls int8 and the whole epilogue fused."""
    x3, shape = _as3d(x)
    b, t, d = x3.shape
    ffp = lp["fc1_w"]["qi8"].shape[-1]  # padded at quantization time
    bt, grid = _tgrid(b, t)
    w1, s1 = _wsb(lp["fc1_w"], ffp)
    w2, s2 = _wsb(lp["fc2_w"], d)
    xspec = pl.BlockSpec((1, bt, d), lambda i, j: (i, j, 0))
    rowd = pl.BlockSpec((1, d), lambda i, j: (0, 0))
    rowf = pl.BlockSpec((1, ffp), lambda i, j: (0, 0))
    out = pl.pallas_call(
        functools.partial(_ln_ffn_kernel, eps=eps, hidden_act=hidden_act),
        grid=grid,
        in_specs=[xspec, rowd, rowd,
                  pl.BlockSpec((d, ffp), lambda i, j: (0, 0)), rowf, rowf,
                  pl.BlockSpec((ffp, d), lambda i, j: (0, 0)), rowd, rowd],
        out_specs=xspec,
        out_shape=jax.ShapeDtypeStruct((b, t, d), x.dtype),
        compiler_params=_cparams(grid),
        interpret=INTERPRET,
    )(x3,
      _row2d(lp["ln2_scale"].astype(jnp.float32), d),
      _row2d(lp["ln2_bias"].astype(jnp.float32), d),
      w1, s1, _row2d(lp["fc1_b"], ffp),
      w2, s2, _row2d(lp["fc2_b"], d))
    return out.reshape(shape)


def use_fused(lp) -> bool:
    """Route an encoder layer here when its matmuls are int8 dicts, the dims
    tile the TPU lane constraint, and we're on a real backend (or testing in
    interpret mode).

    Multi-device meshes fall back to the jnp path: GSPMD cannot partition an
    opaque pallas_call, so under the frame-parallel tower fan-out (frames
    sharded over ("data","seq")) it would all-gather every operand per
    device — the sharding-preserving jnp form is strictly better there."""
    if os.environ.get("VIDI_TOWER_FUSED", "1") == "0":
        return False
    if not (INTERPRET or jax.default_backend() != "cpu"):
        return False
    from vidi_tpu.parallel.sharding import get_mesh
    mesh = get_mesh()
    if mesh is not None and mesh.size > 1:
        return False
    if not (isinstance(lp.get("q_w"), dict) and "qi8" in lp["q_w"]
            and isinstance(lp.get("fc1_w"), dict) and "qi8" in lp["fc1_w"]):
        return False
    d = lp["q_w"]["qi8"].shape[-1]
    ffp = lp["fc1_w"]["qi8"].shape[-1]
    return d % 128 == 0 and ffp % 128 == 0
