"""Vidi-7B (Mistral/CLIP/v1-adapter) family tests.

Oracles: torch modules built exactly like the reference's
(Vidi_7B/model/mm_vision/pool.py, Vidi_7B/model/lmm/dattn/multimodal.py:84-92,
Vidi_7B/model/txt_utils.py:89-120), weights shared through the production
converter paths.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch

from vidi_tpu.core.config import DattnConfig, VisionConfig
from vidi_tpu.infer.convert import convert_clip
from vidi_tpu.media.text import (
    ByteTokenizer,
    chat_template_mistral,
    preprocess_conv,
    targets_mistral,
    tokenizer_image_token,
)
from vidi_tpu.models import adapters, dattn, siglip
from vidi_tpu.constants import IGNORE_INDEX


def _state_dict(mod):
    return {k: v.detach().numpy() for k, v in mod.state_dict().items()}


# ---------------------------------------------------------------------------
# 7B Conv2DPool: conv (valid) + bilinear align_corners=True
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("s_in,s_out", [(16, 8), (27, 14), (7, 3)])
def test_conv2d_pool_v1_matches_torch(s_in, s_out):
    import math
    d = 12
    k = math.ceil(s_in / s_out)
    torch.manual_seed(0)
    conv = torch.nn.Conv2d(d, d, bias=False, kernel_size=k)

    x = np.random.default_rng(0).standard_normal((3, s_in, s_in, d)).astype(np.float32)
    with torch.no_grad():
        y = conv(torch.tensor(x).permute(0, 3, 1, 2))
        want = torch.nn.functional.interpolate(
            y, size=s_out, mode="bilinear", align_corners=True)
        want = want.permute(0, 2, 3, 1).numpy()

    params = {"w": jnp.asarray(conv.weight.detach().numpy())}
    got = np.asarray(adapters.conv2d_pool_v1(params, jnp.asarray(x), s_out))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_bilinear_align_corners_identity():
    x = np.random.default_rng(1).standard_normal((2, 5, 5, 3)).astype(np.float32)
    got = np.asarray(adapters.bilinear_align_corners(jnp.asarray(x), (5, 5)))
    np.testing.assert_allclose(got, x, rtol=1e-6, atol=1e-6)


# ---------------------------------------------------------------------------
# CLIP tower parity vs HF
# ---------------------------------------------------------------------------

def test_clip_tower_matches_hf():
    from transformers import CLIPVisionConfig, CLIPVisionModel

    hf_cfg = CLIPVisionConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=3,
        num_attention_heads=2, image_size=56, patch_size=14,
    )
    torch.manual_seed(0)
    hf = CLIPVisionModel(hf_cfg).eval()

    cfg = VisionConfig(
        arch="clip", hidden_size=32, num_layers=3, num_heads=2,
        intermediate_size=64, patch_size=14, image_size=56,
        layer_norm_eps=1e-5, hidden_act="quick_gelu", select_layer=-2,
    )
    params = convert_clip(_state_dict(hf), cfg)

    imgs = np.random.default_rng(0).standard_normal((2, 56, 56, 3)).astype(np.float32)
    got = np.asarray(siglip.forward_features(params, jnp.asarray(imgs), cfg))

    with torch.no_grad():
        out = hf(torch.tensor(imgs).permute(0, 3, 1, 2), output_hidden_states=True)
    # reference taps hidden_states[-2][:, 1:] (Vidi_7B clip.py:20-25)
    want = out.hidden_states[-2][:, 1:].numpy()
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


# ---------------------------------------------------------------------------
# Mistral chat template + label masking
# ---------------------------------------------------------------------------

def test_targets_mistral_masks_instructions():
    tok = ByteTokenizer()
    conv = [
        {"from": "human", "value": "what is shown?"},
        {"from": "gpt", "value": "a red car"},
        {"from": "human", "value": "when?"},
        {"from": "gpt", "value": "0.1-0.2"},
    ]
    text = chat_template_mistral(conv)
    assert text.startswith("[INST] ") and "[/INST]" in text and "</s>" in text

    sample = preprocess_conv(conv, tok, has_image=False, arch="mistral")
    ids, labels = sample["input_ids"], sample["labels"]
    assert len(ids) == len(labels)
    # bos masked
    assert labels[0] == IGNORE_INDEX
    # answers supervised: the supervised positions decode to the gpt turns
    sup = [int(t) for t, l in zip(ids, labels) if l != IGNORE_INDEX]
    decoded = tok.decode(sup)
    assert "a red car" in decoded and "0.1-0.2" in decoded
    # instruction text is NOT supervised
    assert "what is shown" not in decoded and "when?" not in decoded


def test_targets_mistral_mismatch_falls_back_to_ignore(capsys):
    tok = ByteTokenizer()
    conv = [
        {"from": "human", "value": "q"},
        {"from": "gpt", "value": "a"},
    ]
    text = chat_template_mistral(conv)
    ids = np.asarray(tok(text).input_ids[:-2], np.int64)  # truncated -> mismatch
    labels = targets_mistral(text, ids, tok, has_image=False)
    assert (labels == IGNORE_INDEX).all()


def test_tokenizer_image_token_mistral_prompt():
    tok = ByteTokenizer()
    ids = tokenizer_image_token("<image>\nfind the dog", tok)
    assert ids.count(-200) == 1
    assert ids[0] == tok.bos_token_id


# ---------------------------------------------------------------------------
# Tiny 7B E2E: encode + forward + decode-step parity of cache semantics
# ---------------------------------------------------------------------------

def test_vidi7b_tiny_forward_and_generate():
    cfg = DattnConfig.tiny("mistral")
    assert cfg.mm_version == "v1" and cfg.vision.arch == "clip"
    params = dattn.init_params(jax.random.PRNGKey(0), cfg, jnp.float32)

    rng = np.random.default_rng(0)
    b, n, s = 1, 3, cfg.vision.image_size
    images = jnp.asarray(rng.standard_normal((b, n, s, s, 3)), jnp.float32)
    frame_counts = jnp.asarray([n], jnp.int32)
    mels = jnp.asarray(
        rng.standard_normal((b, 1, cfg.audio.num_mel_bins, cfg.audio.nb_max_frames)),
        jnp.float32)
    audio_sizes = jnp.asarray([600], jnp.int32)

    img, img_mask = dattn.encode_video_images(
        params, cfg, images, frame_counts, (0, 0))
    # v1 pooling gives pool_size x pool_size tokens per frame
    assert img.shape == (b, n * cfg.mm_image_pool_size**2, cfg.text.hidden_size)
    aud, aud_mask = dattn.encode_video_audios(params, cfg, mels, audio_sizes)

    ids = jnp.asarray(rng.integers(3, cfg.text.vocab_size, (b, 8)), jnp.int32)
    mask = jnp.ones((b, 8), bool)
    positions = jnp.arange(8, dtype=jnp.int32)[None]
    embeds = params["text"]["embed"][ids]

    h, caches = dattn.forward(
        params, cfg, embeds, mask, positions,
        img=img, img_mask=img_mask, aud=aud, aud_mask=aud_mask,
        return_caches=True)
    assert h.shape == (b, 8, cfg.text.hidden_size)
    assert caches.img_k.shape[0] == cfg.text.num_layers

    from vidi_tpu.infer.generate import generate
    res = generate(params, cfg, ids, mask, img=img, img_mask=img_mask,
                   aud=aud, aud_mask=aud_mask, max_new_tokens=4, eos_id=2)
    assert res.tokens.shape[1] == 4


def test_vidi7b_conversion_roundtrip():
    """init -> fake state_dict in reference naming -> convert -> same values."""
    from vidi_tpu.infer.convert import convert_mm_adapters

    cfg = DattnConfig.tiny("mistral")
    params = dattn.init_params(jax.random.PRNGKey(1), cfg, jnp.float32)
    mm = params["mm"]

    def lin(p, i):
        return {"weight": np.asarray(p[f"w{i}"]).T, "bias": np.asarray(p[f"b{i}"])}

    sd = {}
    for name, p in [("mm_rand_img_projector", mm["img_projector"]),
                    ("mm_rand_aud_projector", mm["aud_projector"])]:
        for i, j in [(0, 0), (1, 2)]:
            sd[f"model.{name}.model.{j}.weight"] = lin(p, i)["weight"]
            sd[f"model.{name}.model.{j}.bias"] = lin(p, i)["bias"]
    for name, p in [("mm_rand_pos_w", mm["pos_w"]), ("mm_rand_pos_h", mm["pos_h"]),
                    ("mm_rand_pos_t", mm["pos_t"])]:
        for i, j in [(0, 0), (1, 2)]:
            sd[f"model.{name}.mlp.{j}.weight"] = lin(p, i)["weight"]
            sd[f"model.{name}.mlp.{j}.bias"] = lin(p, i)["bias"]
    sd["model.mm_rand_llm_norm.weight"] = np.asarray(mm["llm_norm"]["weight"])
    sd["model.mm_rand_img_norm.weight"] = np.asarray(mm["img_norm"]["weight"])
    sd["model.mm_rand_aud_norm.weight"] = np.asarray(mm["aud_norm"]["weight"])
    sd["model.mm_rand_img_pool.conv.weight"] = np.asarray(mm["img_pool"]["w"])
    sd["model.mm_rand_aud_pool.weight"] = np.asarray(mm["aud_pool"]["w"])

    got = convert_mm_adapters(sd, cfg, jnp.float32)
    flat_got = jax.tree_util.tree_leaves_with_path(got)
    flat_want = {jax.tree_util.keystr(k): v
                 for k, v in jax.tree_util.tree_leaves_with_path(mm)}
    for k, v in flat_got:
        np.testing.assert_allclose(
            np.asarray(v), np.asarray(flat_want[jax.tree_util.keystr(k)]),
            rtol=1e-6, atol=1e-6, err_msg=jax.tree_util.keystr(k))
