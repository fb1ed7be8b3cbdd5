"""Weight-only int8 quantization for the text decoder.

The reference optionally loads 8/4-bit via bitsandbytes
(reference: Vidi1.5_9B/vidi/model/builder.py:30-39). The TPU equivalent is
weight-only int8 with per-output-channel symmetric scales: weights are stored
int8 in HBM (halving decode's weight traffic — decode is HBM-bound) and
dequantized on the fly; XLA fuses the int8->bf16 convert + scale into the
matmul read. It is also what fits Vidi1.5-9B (~18 GB bf16) on a 16 GB chip:
int8 layers + bf16 embed/norms ≈ 10 GB.

Only stacked layer matmul weights quantize (ndim >= 3 under text/layers and
the [in, out] tower weights); norms, biases, embeddings, and the fp32
pos-embed MLPs stay in their original dtype.
"""
from __future__ import annotations

import math
import os
from typing import Dict, Sequence

import jax
import jax.numpy as jnp

QUANT_KEY = "qi8"
QUANT4_KEY = "qi4"
# int4 groups along the contraction dim (the reference's bnb nf4 uses
# blockwise-64 double quantization, builder.py:32-39; symmetric int4 with
# per-(group, out-channel) fp32 scales is the TPU-friendly analog — the
# unpack (two arithmetic shifts) + scale fuses into the matmul read).
INT4_GROUP = 64


def is_quantized(w) -> bool:
    return isinstance(w, dict) and (QUANT_KEY in w or QUANT4_KEY in w)


def quantize_weight(w: jnp.ndarray) -> Dict[str, jnp.ndarray]:
    """[..., in, out] float -> {qi8 int8, scale f32 [..., 1, out]}."""
    wf = w.astype(jnp.float32)
    amax = jnp.max(jnp.abs(wf), axis=-2, keepdims=True)
    scale = jnp.where(amax > 0, amax / 127.0, 1.0)
    q = jnp.clip(jnp.round(wf / scale), -127, 127).astype(jnp.int8)
    return {QUANT_KEY: q, "scale": scale.astype(jnp.float32)}


def dequantize_weight(wq: Dict[str, jnp.ndarray], dtype=jnp.bfloat16) -> jnp.ndarray:
    return (wq[QUANT_KEY].astype(jnp.float32) * wq["scale"]).astype(dtype)


def quantize_weight4(w: jnp.ndarray, group: int = INT4_GROUP):
    """[..., in, out] float -> {qi4 packed int8 [..., in/2, out],
    scale f32 [..., in/group, 1, out]} — symmetric int4 (±7), group-wise
    along the contraction dim. Two consecutive in-rows pack into one byte
    (row 2i -> low nibble, 2i+1 -> high). Falls back to int8 when the
    contraction dim doesn't tile the group."""
    din = w.shape[-2]
    if din % group or din % 2:
        return quantize_weight(w)
    lead, dout = w.shape[:-2], w.shape[-1]
    wf = w.astype(jnp.float32).reshape(*lead, din // group, group, dout)
    amax = jnp.max(jnp.abs(wf), axis=-2, keepdims=True)
    scale = jnp.where(amax > 0, amax / 7.0, 1.0)
    q = jnp.clip(jnp.round(wf / scale), -7, 7).astype(jnp.int8)
    q = q.reshape(*lead, din, dout)
    lo, hi = q[..., 0::2, :], q[..., 1::2, :]
    packed = jnp.bitwise_or(jnp.bitwise_and(lo, 0xF), jnp.left_shift(hi, 4))
    return {QUANT4_KEY: packed, "scale": scale.astype(jnp.float32)}


def dequantize_weight4(wq: Dict[str, jnp.ndarray], dtype=jnp.bfloat16) -> jnp.ndarray:
    packed = wq[QUANT4_KEY]
    scale = wq["scale"]
    lead, dout = packed.shape[:-2], packed.shape[-1]
    din = packed.shape[-2] * 2
    # arithmetic shifts sign-extend the nibbles (int8 is signed in XLA)
    lo = jnp.right_shift(jnp.left_shift(packed, 4), 4)
    hi = jnp.right_shift(packed, 4)
    q = jnp.stack([lo, hi], axis=-2).reshape(*lead, din, dout)
    n_groups = scale.shape[-3]
    qf = q.astype(jnp.float32).reshape(*lead, n_groups, din // n_groups, dout)
    return (qf * scale).reshape(*lead, din, dout).astype(dtype)


# When set (opt-in, e.g. `--w8a8` on the inference CLI), qdot switches from
# weight-only dequantization to dynamic int8 activation quantization for
# matmuls with at least this many tokens. Token counts are static under jit,
# so the routing happens at trace time: prefill's modality-stream matmuls
# (~budgeted 240k video tokens through k/v projections and the diagonal
# o_proj+FFN update) run int8 x int8 on the MXU at 2x the bf16 rate, while
# decode (1 token/step, HBM-bound) keeps the weight-only form.
w8a8_min_tokens = None


def qdot(x: jnp.ndarray, w) -> jnp.ndarray:
    """x @ w where w is a float array or a quantized dict.

    Per-output-channel scales commute with the contraction, so the scale is
    applied to the (much smaller) output: x @ (q * s) == (x @ q) * s.
    """
    if not is_quantized(w):
        return jnp.dot(x, w)
    if QUANT4_KEY in w:
        # group scales vary along the contraction, so dequantize-then-dot
        # (XLA streams the packed int4 from HBM and fuses unpack+scale)
        return jnp.dot(x, dequantize_weight4(w, x.dtype))
    if (w8a8_min_tokens is not None
            and math.prod(x.shape[:-1]) >= w8a8_min_tokens):
        return dynamic_qdense(x, w)
    y = jnp.dot(x, w[QUANT_KEY].astype(x.dtype))
    return y * w["scale"].reshape(w["scale"].shape[-1]).astype(y.dtype)


_TEXT_QUANT_KEYS = ("q_w", "k_w", "v_w", "o_w", "gate_w", "up_w", "down_w")
# SigLIP/CLIP and Whisper encoder layers share this naming (models/siglip.py,
# models/whisper.py) — the matmuls carrying ~97% of the tower FLOPs.
_TOWER_QUANT_KEYS = ("q_w", "k_w", "v_w", "o_w", "fc1_w", "fc2_w")


def quantize_act(x: jnp.ndarray):
    """Dynamic per-row (per-token) symmetric int8 activation quantization.

    Returns (xq int8, sx f32 [..., 1]). The scale commutes with the
    contraction, so int8 matmul results rescale exactly: x ~= xq * sx.
    """
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    sx = jnp.where(amax > 0, amax / 127.0, 1.0)
    xq = jnp.clip(jnp.round(xf / sx), -127, 127).astype(jnp.int8)
    return xq, sx


def dynamic_qdense(x: jnp.ndarray, wq: Dict, bias=None) -> jnp.ndarray:
    """x @ wq with dynamic per-row activation quantization.

    Unlike the weight-only `qdot` (which dequantizes into a bf16 matmul —
    right for HBM-bound decode), this quantizes the activations on the fly so
    the contraction runs int8 x int8 -> int32 on the MXU at 2x the bf16 rate
    (measured 390 TOP/s vs 196 TFLOP/s on v5e) — right for the FLOP-bound
    encoder towers. Scales: per-row (token) for x, per-column for w; both
    commute with the contraction. This is the TPU form of bitsandbytes'
    load_in_8bit int8 linears (reference: vidi/model/builder.py:30-39).
    """
    if jax.default_backend() != "cpu" and os.environ.get("VIDI_QMM") == "pallas":
        # Fused Pallas kernel (ops/pallas/quant_matmul.py): wins ISOLATED
        # chained matmuls (328 T/s vs 160 jnp-int8 vs 198 bf16 at the
        # 768<->3072 pair, M=81648 on v5e) but LOSES inside the tower layer
        # (175 vs 104 ms / 113 frames / 12 layers): XLA CSEs the shared
        # q/k/v quantize and fuses LN->quantize->dot in the jnp form,
        # while 6 opaque pallas calls per layer redo the quantize in-kernel
        # and force HBM materialization around each call. Opt-in only.
        from vidi_tpu.ops.pallas.quant_matmul import quant_matmul
        return quant_matmul(x, wq[QUANT_KEY], wq["scale"][..., 0, :], bias)
    xq, sx = quantize_act(x)
    y = jnp.dot(xq, wq[QUANT_KEY], preferred_element_type=jnp.int32)
    y = y.astype(jnp.float32) * sx * wq["scale"][..., 0, :]  # [out] per layer
    y = y.astype(x.dtype)
    if bias is not None:
        y = y + bias
    return y


def quantize_tower_params(tower_params: Dict) -> Dict:
    """Quantize a tower's stacked [L, in, out] encoder matmuls.

    FFN intermediate dims that don't tile the TPU's 128-lane constraint
    (SigLIP so400m ff=4304) are zero-padded to the next multiple of 128 so
    the fused Pallas layer kernels (ops/pallas/fused_tower_layer.py) can run.
    Padded columns carry zero weight and bias: gelu(0) = 0 contributes
    nothing to fc2, so the jnp fallback path is numerically unchanged too.
    """
    out = dict(tower_params)
    layers = dict(tower_params["layers"])
    ff = layers["fc1_w"].shape[-1] if "fc1_w" in layers else 0
    pad = (-ff) % 128
    if pad and "fc1_w" in layers and "fc2_w" in layers:
        layers["fc1_w"] = jnp.pad(layers["fc1_w"], ((0, 0), (0, 0), (0, pad)))
        layers["fc2_w"] = jnp.pad(layers["fc2_w"], ((0, 0), (0, pad), (0, 0)))
        if "fc1_b" in layers:
            layers["fc1_b"] = jnp.pad(layers["fc1_b"], ((0, 0), (0, pad)))
    for k in _TOWER_QUANT_KEYS:
        if k in layers:
            layers[k] = quantize_weight(layers[k])
    out["layers"] = layers
    return out


def quantize_embedding(w: jnp.ndarray) -> Dict[str, jnp.ndarray]:
    """[V, d] embedding -> {qi8, scale [V, 1]} per-ROW symmetric. Rows are
    both the lookup unit and (tied lm_head) the output channels, so the
    scale commutes in both uses."""
    wf = w.astype(jnp.float32)
    amax = jnp.max(jnp.abs(wf), axis=-1, keepdims=True)
    scale = jnp.where(amax > 0, amax / 127.0, 1.0)
    q = jnp.clip(jnp.round(wf / scale), -127, 127).astype(jnp.int8)
    return {QUANT_KEY: q, "scale": scale.astype(jnp.float32)}


def embed_lookup(embed, ids: jnp.ndarray, dtype=jnp.bfloat16) -> jnp.ndarray:
    if not is_quantized(embed):
        return embed[ids]
    rows = embed[QUANT_KEY][ids].astype(jnp.float32) * embed["scale"][ids]
    return rows.astype(dtype)


def tied_logits(hidden: jnp.ndarray, embed) -> jnp.ndarray:
    """hidden @ embed.T with a possibly-quantized [V, d] embedding (fp32)."""
    if not is_quantized(embed):
        return jnp.dot(hidden, embed.T, preferred_element_type=jnp.float32)
    logits = jnp.dot(hidden, embed[QUANT_KEY].T.astype(hidden.dtype),
                     preferred_element_type=jnp.float32)
    return logits * embed["scale"][:, 0]


def quantize_text_params(text_params: Dict, quantize_embed: bool = False,
                         bits: int = 8) -> Dict:
    """Quantize the stacked decoder layer weights; everything else unchanged.

    bits=4 packs the layer matmuls (and lm_head) to group-wise int4 — the
    reference's bnb load_4bit analog (builder.py:32-39), freeing ~5 GB of
    HBM on the 9B vs int8."""
    qw = quantize_weight4 if bits == 4 else quantize_weight
    out = dict(text_params)
    layers = dict(text_params["layers"])
    for k in _TEXT_QUANT_KEYS:
        if k in layers:
            layers[k] = qw(layers[k])
    out["layers"] = layers
    if "lm_head" in out:
        out["lm_head"] = qw(out["lm_head"])
    if quantize_embed:
        out["embed"] = quantize_embedding(out["embed"])
    return out


def quantize_params(params: Dict, modules: Sequence[str] = ("text",),
                    quantize_embed: bool = False, bits: int = 8) -> Dict:
    """Quantize selected modules of a full Dattn param tree.

    "text" -> weight-only int8/int4 (HBM-bound decode); "vision"/"audio" ->
    int8 towers with dynamic activation quantization (FLOP-bound encode,
    2x MXU)."""
    out = dict(params)
    if "text" in modules:
        out["text"] = quantize_text_params(params["text"], quantize_embed,
                                           bits=bits)
    for tower in ("vision", "audio"):
        if tower in modules and tower in params:
            out[tower] = quantize_tower_params(params[tower])
    return out


def quantize_cache(x: jnp.ndarray) -> Dict[str, jnp.ndarray]:
    """KV cache [..., S, D] -> {qi8 int8, scale f32 [..., S, 1]} per-token
    symmetric. The modality caches are written once at prefill and read every
    decode step — int8 halves their HBM footprint and read bandwidth; XLA
    fuses the dequant into the attention reads."""
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    scale = jnp.where(amax > 0, amax / 127.0, 1.0)
    q = jnp.clip(jnp.round(xf / scale), -127, 127).astype(jnp.int8)
    return {QUANT_KEY: q, "scale": scale.astype(jnp.float32)}


def dequantize_cache(xq, dtype=jnp.bfloat16) -> jnp.ndarray:
    if not is_quantized(xq):
        return xq
    return (xq[QUANT_KEY].astype(jnp.float32) * xq["scale"]).astype(dtype)


def quantized_bytes(params: Dict) -> int:
    """Total parameter bytes (for memory reporting)."""
    total = 0
    for leaf in jax.tree.leaves(params):
        total += leaf.size * leaf.dtype.itemsize
    return total
