"""HF checkpoint -> vidi_tpu param pytree conversion.

Works from any flat mapping `name -> numpy array` (a torch state_dict with
tensors converted, or safetensors shards). torch Linear weights are [out, in]
and are transposed to our [in, out]; per-layer tensors are stacked onto a
leading [L, ...] axis for `lax.scan`.

This is the parity-critical piece called out in SURVEY.md §7 (hard part #5):
Gemma2-9B + SigLIP2 + Whisper + all mm_rand_* modules.
"""
from __future__ import annotations

from typing import Callable, Dict, Mapping

import jax.numpy as jnp
import numpy as np

from vidi_tpu.core.config import AudioConfig, DattnConfig, TextConfig, VisionConfig

Array = np.ndarray
StateDict = Mapping[str, Array]


def _getter(sd: StateDict, prefix: str) -> Callable[[str], Array]:
    def get(name: str) -> Array:
        return np.asarray(sd[prefix + name])
    return get


def _stack(get, names_fmt: str, n: int, transpose: bool = False) -> np.ndarray:
    arrs = [get(names_fmt.format(i)) for i in range(n)]
    if transpose:
        arrs = [a.T for a in arrs]
    return np.stack(arrs, axis=0)


def convert_siglip(sd: StateDict, cfg: VisionConfig, dtype=jnp.float32,
                   prefix: str = "vision_model.") -> Dict:
    """SiglipVisionModel state_dict -> siglip.init_params layout."""
    get = _getter(sd, prefix)
    L = cfg.num_layers
    pw = get("embeddings.patch_embedding.weight")  # [O, C, KH, KW]
    params = {
        "patch_w": pw.reshape(pw.shape[0], -1).T,  # [C*KH*KW, O]
        "patch_b": get("embeddings.patch_embedding.bias"),
        "pos_embed": get("embeddings.position_embedding.weight"),
        "layers": {
            "ln1_scale": _stack(get, "encoder.layers.{}.layer_norm1.weight", L),
            "ln1_bias": _stack(get, "encoder.layers.{}.layer_norm1.bias", L),
            "q_w": _stack(get, "encoder.layers.{}.self_attn.q_proj.weight", L, True),
            "q_b": _stack(get, "encoder.layers.{}.self_attn.q_proj.bias", L),
            "k_w": _stack(get, "encoder.layers.{}.self_attn.k_proj.weight", L, True),
            "k_b": _stack(get, "encoder.layers.{}.self_attn.k_proj.bias", L),
            "v_w": _stack(get, "encoder.layers.{}.self_attn.v_proj.weight", L, True),
            "v_b": _stack(get, "encoder.layers.{}.self_attn.v_proj.bias", L),
            "o_w": _stack(get, "encoder.layers.{}.self_attn.out_proj.weight", L, True),
            "o_b": _stack(get, "encoder.layers.{}.self_attn.out_proj.bias", L),
            "ln2_scale": _stack(get, "encoder.layers.{}.layer_norm2.weight", L),
            "ln2_bias": _stack(get, "encoder.layers.{}.layer_norm2.bias", L),
            "fc1_w": _stack(get, "encoder.layers.{}.mlp.fc1.weight", L, True),
            "fc1_b": _stack(get, "encoder.layers.{}.mlp.fc1.bias", L),
            "fc2_w": _stack(get, "encoder.layers.{}.mlp.fc2.weight", L, True),
            "fc2_b": _stack(get, "encoder.layers.{}.mlp.fc2.bias", L),
        },
    }
    return _to_jnp(params, dtype)


def convert_clip(sd: StateDict, cfg: VisionConfig, dtype=jnp.float32,
                 prefix: str = "vision_model.") -> Dict:
    """CLIPVisionModel state_dict -> siglip.init_params(arch='clip') layout
    (the 7B tower, reference Vidi_7B/model/mm_vision/clip.py)."""
    get = _getter(sd, prefix)
    L = cfg.num_layers
    pw = get("embeddings.patch_embedding.weight")  # [O, C, KH, KW], no bias
    params = {
        "patch_w": pw.reshape(pw.shape[0], -1).T,
        "cls_embed": get("embeddings.class_embedding"),
        "pos_embed": get("embeddings.position_embedding.weight"),
        # HF spells it "pre_layrnorm" (sic)
        "pre_ln_scale": get("pre_layrnorm.weight"),
        "pre_ln_bias": get("pre_layrnorm.bias"),
        "layers": {
            "ln1_scale": _stack(get, "encoder.layers.{}.layer_norm1.weight", L),
            "ln1_bias": _stack(get, "encoder.layers.{}.layer_norm1.bias", L),
            "q_w": _stack(get, "encoder.layers.{}.self_attn.q_proj.weight", L, True),
            "q_b": _stack(get, "encoder.layers.{}.self_attn.q_proj.bias", L),
            "k_w": _stack(get, "encoder.layers.{}.self_attn.k_proj.weight", L, True),
            "k_b": _stack(get, "encoder.layers.{}.self_attn.k_proj.bias", L),
            "v_w": _stack(get, "encoder.layers.{}.self_attn.v_proj.weight", L, True),
            "v_b": _stack(get, "encoder.layers.{}.self_attn.v_proj.bias", L),
            "o_w": _stack(get, "encoder.layers.{}.self_attn.out_proj.weight", L, True),
            "o_b": _stack(get, "encoder.layers.{}.self_attn.out_proj.bias", L),
            "ln2_scale": _stack(get, "encoder.layers.{}.layer_norm2.weight", L),
            "ln2_bias": _stack(get, "encoder.layers.{}.layer_norm2.bias", L),
            "fc1_w": _stack(get, "encoder.layers.{}.mlp.fc1.weight", L, True),
            "fc1_b": _stack(get, "encoder.layers.{}.mlp.fc1.bias", L),
            "fc2_w": _stack(get, "encoder.layers.{}.mlp.fc2.weight", L, True),
            "fc2_b": _stack(get, "encoder.layers.{}.mlp.fc2.bias", L),
        },
    }
    return _to_jnp(params, dtype)


def convert_whisper(sd: StateDict, cfg: AudioConfig, dtype=jnp.float32,
                    prefix: str = "encoder.") -> Dict:
    """WhisperEncoder state_dict -> whisper.init_params layout."""
    get = _getter(sd, prefix)
    L = cfg.num_layers
    params = {
        "conv1_w": get("conv1.weight"),  # [O, I, K] kept as-is
        "conv1_b": get("conv1.bias"),
        "conv2_w": get("conv2.weight"),
        "conv2_b": get("conv2.bias"),
        "pos_embed": get("embed_positions.weight"),
        "final_ln_scale": get("layer_norm.weight"),
        "final_ln_bias": get("layer_norm.bias"),
        "layers": {
            "ln1_scale": _stack(get, "layers.{}.self_attn_layer_norm.weight", L),
            "ln1_bias": _stack(get, "layers.{}.self_attn_layer_norm.bias", L),
            "q_w": _stack(get, "layers.{}.self_attn.q_proj.weight", L, True),
            "q_b": _stack(get, "layers.{}.self_attn.q_proj.bias", L),
            "k_w": _stack(get, "layers.{}.self_attn.k_proj.weight", L, True),
            "v_w": _stack(get, "layers.{}.self_attn.v_proj.weight", L, True),
            "v_b": _stack(get, "layers.{}.self_attn.v_proj.bias", L),
            "o_w": _stack(get, "layers.{}.self_attn.out_proj.weight", L, True),
            "o_b": _stack(get, "layers.{}.self_attn.out_proj.bias", L),
            "ln2_scale": _stack(get, "layers.{}.final_layer_norm.weight", L),
            "ln2_bias": _stack(get, "layers.{}.final_layer_norm.bias", L),
            "fc1_w": _stack(get, "layers.{}.fc1.weight", L, True),
            "fc1_b": _stack(get, "layers.{}.fc1.bias", L),
            "fc2_w": _stack(get, "layers.{}.fc2.weight", L, True),
            "fc2_b": _stack(get, "layers.{}.fc2.bias", L),
        },
    }
    return _to_jnp(params, dtype)


def convert_text(sd: StateDict, cfg: TextConfig, dtype=jnp.bfloat16,
                 prefix: str = "model.") -> Dict:
    """Gemma2/Mistral backbone state_dict -> decoder.init_params layout."""
    get = _getter(sd, prefix)
    L = cfg.num_layers
    layers = {
        "input_ln": _stack(get, "layers.{}.input_layernorm.weight", L),
        "post_attn_ln": _stack(get, "layers.{}.post_attention_layernorm.weight", L),
        "q_w": _stack(get, "layers.{}.self_attn.q_proj.weight", L, True),
        "k_w": _stack(get, "layers.{}.self_attn.k_proj.weight", L, True),
        "v_w": _stack(get, "layers.{}.self_attn.v_proj.weight", L, True),
        "o_w": _stack(get, "layers.{}.self_attn.o_proj.weight", L, True),
        "gate_w": _stack(get, "layers.{}.mlp.gate_proj.weight", L, True),
        "up_w": _stack(get, "layers.{}.mlp.up_proj.weight", L, True),
        "down_w": _stack(get, "layers.{}.mlp.down_proj.weight", L, True),
    }
    if cfg.double_norms:
        layers["pre_ffn_ln"] = _stack(get, "layers.{}.pre_feedforward_layernorm.weight", L)
        layers["post_ffn_ln"] = _stack(get, "layers.{}.post_feedforward_layernorm.weight", L)
    params = {
        "embed": get("embed_tokens.weight"),
        "final_ln": get("norm.weight"),
        "layers": layers,
    }
    if not cfg.tie_word_embeddings:
        # lm_head lives outside the `model.` prefix in HF causal-LM layouts
        params["lm_head"] = np.asarray(sd["lm_head.weight"]).T
    return _to_jnp(params, dtype)


def convert_mm_adapters(sd: StateDict, cfg: DattnConfig, dtype=jnp.bfloat16,
                        prefix: str = "model.") -> Dict:
    """mm_rand_* adapter modules (reference: multimodal.py:63-94)."""
    get = _getter(sd, prefix)

    def proj(name):
        return {
            "w0": get(f"{name}.model.0.weight").T,
            "b0": get(f"{name}.model.0.bias"),
            "w1": get(f"{name}.model.2.weight").T,
            "b1": get(f"{name}.model.2.bias"),
        }

    def pos(name):
        return {
            "w0": get(f"{name}.mlp.0.weight").T,
            "b0": get(f"{name}.mlp.0.bias"),
            "w1": get(f"{name}.mlp.2.weight").T,
            "b1": get(f"{name}.mlp.2.bias"),
        }

    if cfg.mm_input_type == "image":
        # image branch (multimodal.py:95-119): mm_rand_projector/_norm
        mm = {
            "llm_norm": {"weight": get("mm_rand_llm_norm.weight")},
            "projector": proj("mm_rand_projector"),
            "norm": {"weight": get("mm_rand_norm.weight")},
            "pos_w": pos("mm_rand_pos_w"),
            "pos_h": pos("mm_rand_pos_h"),
        }
        pos_keys = ("pos_w", "pos_h")
    else:
        mm = {
            "llm_norm": {"weight": get("mm_rand_llm_norm.weight")},
            "img_projector": proj("mm_rand_img_projector"),
            "img_norm": {"weight": get("mm_rand_img_norm.weight")},
            "pos_w": pos("mm_rand_pos_w"),
            "pos_h": pos("mm_rand_pos_h"),
            "pos_t": pos("mm_rand_pos_t"),
            "aud_pool": {"w": get("mm_rand_aud_pool.weight")},  # [O, I, K]
            "aud_projector": proj("mm_rand_aud_projector"),
            "aud_norm": {"weight": get("mm_rand_aud_norm.weight")},
        }
        if cfg.mm_version == "v1":
            # 7B pool is a learned conv (Vidi_7B pool.py:16-18)
            mm["img_pool"] = {"w": get("mm_rand_img_pool.conv.weight")}
        pos_keys = ("pos_w", "pos_h", "pos_t")
    # pos-embed MLPs stay fp32 (reference pos.py:36-38) — converted straight
    # from the source arrays, never round-tripped through the model dtype
    pos_trees = {k: _to_jnp(mm.pop(k), jnp.float32) for k in pos_keys}
    out = _to_jnp(mm, dtype)
    out.update(pos_trees)
    return out


def convert_dattn(sd: StateDict, cfg: DattnConfig, dtype=jnp.bfloat16) -> Dict:
    """Full Vidi checkpoint (DattnGemma2ForCausalLM / Mistral state_dict) ->
    dattn.init_params layout. Tower modules live under model.mm_vis / mm_aud."""
    conv_vis = convert_clip if cfg.vision.arch == "clip" else convert_siglip
    return {
        "text": convert_text(sd, cfg.text, dtype),
        "vision": conv_vis(sd, cfg.vision, dtype,
                           prefix="model.mm_vis.vision_model."),
        "audio": convert_whisper(sd, cfg.audio, dtype,
                                 prefix="model.mm_aud.encoder."),
        "mm": convert_mm_adapters(sd, cfg, dtype),
    }


def _to_jnp(tree, dtype):
    import jax
    return jax.tree.map(lambda a: jnp.asarray(a, dtype), tree)
