"""Model assembly: finetuning starts from a plain base LLM + separate tower
checkpoints with freshly initialized mm_rand_* adapters — the reference's
train entry (train.py:122-141; towers via multimodal.py:44-57
from_pretrained; mm modules in `_keys_to_ignore_on_load_missing`,
gemma.py:469, with mm_rand_llm_norm scaled at mm_std, multimodal.py:63)."""
import json
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch

MM_STD = 0.028976401314139366


def _state_dict(mod):
    return {k: np.ascontiguousarray(v.detach().numpy())
            for k, v in mod.state_dict().items()}


def _save_ckpt(dirpath, sd, cfg_dict):
    from safetensors.numpy import save_file

    os.makedirs(dirpath, exist_ok=True)
    save_file(sd, os.path.join(dirpath, "model.safetensors"))
    with open(os.path.join(dirpath, "config.json"), "w") as f:
        json.dump(cfg_dict, f)


@pytest.fixture(scope="module")
def base_ckpts(tmp_path_factory):
    """Tiny HF-format checkpoint dirs: plain Gemma2 LLM + SigLIP + Whisper."""
    from transformers import (Gemma2Config, Gemma2ForCausalLM,
                              SiglipVisionConfig, SiglipVisionModel,
                              WhisperConfig)
    from transformers.models.whisper.modeling_whisper import WhisperEncoder

    root = tmp_path_factory.mktemp("base_ckpts")
    torch.manual_seed(0)

    text_cfg = Gemma2Config(
        vocab_size=512, hidden_size=64, intermediate_size=128,
        num_hidden_layers=4, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, sliding_window=16, query_pre_attn_scalar=16,
        attn_logit_softcapping=50.0, final_logit_softcapping=30.0)
    text = Gemma2ForCausalLM(text_cfg).eval()
    _save_ckpt(root / "gemma2", _state_dict(text), text_cfg.to_dict())

    vis_cfg = SiglipVisionConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=3,
        num_attention_heads=2, image_size=42, patch_size=14)
    vis = SiglipVisionModel(vis_cfg).eval()
    _save_ckpt(root / "siglip", _state_dict(vis), vis_cfg.to_dict())

    aud_cfg = WhisperConfig(
        d_model=32, encoder_layers=2, encoder_attention_heads=2,
        encoder_ffn_dim=64, num_mel_bins=128, max_source_positions=1500)
    aud = WhisperEncoder(aud_cfg).eval()
    _save_ckpt(root / "whisper", _state_dict(aud), aud_cfg.to_dict())

    return root, text, vis, aud


def test_assemble_matches_components(base_ckpts):
    from vidi_tpu.infer.convert import convert_siglip, convert_text, convert_whisper
    from vidi_tpu.infer.loader import load_model
    from vidi_tpu.media.text import ByteTokenizer

    root, text, vis, aud = base_ckpts
    params, cfg, tok = load_model(
        str(root / "gemma2"),
        mm_vision_tower=str(root / "siglip"),
        mm_audio_tower=str(root / "whisper"),
        dtype=jnp.float32,
        mm_overrides={"mm_std": MM_STD, "mm_time_interval": 16,
                      "model_max_length": 128,
                      "mm_image_pool_size": None})  # None flags are dropped

    # geometry came from the tower configs, not defaults
    assert cfg.vision.image_size == 42 and cfg.vision.num_layers == 3
    assert cfg.audio.d_model == 32 and cfg.audio.num_layers == 2
    assert cfg.text.num_layers == 4 and cfg.text.vocab_size == 512
    assert cfg.mm_time_interval == 16 and cfg.mm_image_pool_size == 2
    assert isinstance(tok, ByteTokenizer)  # no tokenizer files -> fallback

    # converted weights equal the direct converter outputs
    want_text = convert_text(_state_dict(text), cfg.text, jnp.float32)
    np.testing.assert_array_equal(np.asarray(params["text"]["embed"]),
                                  np.asarray(want_text["embed"]))
    np.testing.assert_array_equal(
        np.asarray(params["text"]["layers"]["q_w"]),
        np.asarray(want_text["layers"]["q_w"]))
    want_vis = convert_siglip(_state_dict(vis), cfg.vision, jnp.float32)
    np.testing.assert_array_equal(np.asarray(params["vision"]["patch_w"]),
                                  np.asarray(want_vis["patch_w"]))
    want_aud = convert_whisper(_state_dict(aud), cfg.audio, jnp.float32,
                               prefix="")
    np.testing.assert_array_equal(np.asarray(params["audio"]["conv1_w"]),
                                  np.asarray(want_aud["conv1_w"]))

    # fresh adapters: llm_norm at mm_std (multimodal.py:63), pos MLPs fp32
    np.testing.assert_allclose(
        np.asarray(params["mm"]["llm_norm"]["weight"]), MM_STD, rtol=1e-6)
    assert params["mm"]["pos_t"]["w0"].dtype == jnp.float32

    # the assembled tree runs the full multimodal forward
    from vidi_tpu.models import dattn, decoder
    from vidi_tpu.models.adapters import budget_hw

    rng = np.random.default_rng(0)
    frames = jnp.asarray(rng.standard_normal((1, 2, 42, 42, 3)), jnp.float32)
    mels = jnp.asarray(rng.standard_normal((1, 1, 128, 3000)), jnp.float32)
    hw = budget_hw(2, cfg.mm_image_pool_size, cfg.vision.num_patches_per_side)
    img, im = dattn.encode_video_images(
        params, cfg, frames, jnp.asarray([2], jnp.int32), hw)
    audt, am = dattn.encode_video_audios(
        params, cfg, mels, jnp.asarray([3000], jnp.int32))
    ids = jnp.asarray(rng.integers(3, 512, (1, 8)), jnp.int32)
    embeds = decoder.embed_tokens(params["text"], ids, cfg.text)
    mask = jnp.ones((1, 8), bool)
    pos = jnp.arange(8, dtype=jnp.int32)[None]
    h, _ = dattn.forward(params, cfg, embeds, mask, pos,
                         img=img, img_mask=im, aud=audt, aud_mask=am)
    logits = decoder.lm_logits(params["text"], h, cfg.text)
    assert np.isfinite(np.asarray(logits)).all()


def test_assemble_audio_tower_optional_for_image_type(base_ckpts):
    from vidi_tpu.infer.loader import load_model

    from vidi_tpu.core.config import AudioConfig

    root, _, _, _ = base_ckpts
    params, cfg, _ = load_model(
        str(root / "gemma2"),
        mm_vision_tower=str(root / "siglip"),
        dtype=jnp.float32,
        mm_overrides={"mm_input_type": "image", "mm_std": MM_STD})
    assert cfg.mm_input_type == "image"
    assert "projector" in params["mm"] and "pos_t" not in params["mm"]
    # assembly default comes from the reference ModelArguments (train.py:51),
    # not the released-checkpoint fallback
    assert cfg.mm_time_interval == 10000
    # no audio tower -> tiny stub, not a never-fed random whisper-large
    assert cfg.audio == AudioConfig.tiny()
    assert params["audio"]["conv1_w"].shape[0] == cfg.audio.d_model


def test_assemble_rejects_random_weights_and_bad_layout(base_ckpts, tmp_path):
    from vidi_tpu.infer.loader import load_model

    root, _, _, _ = base_ckpts
    with pytest.raises(AssertionError):
        load_model(None, "tiny", mm_vision_tower=str(root / "siglip"))
    # wrong-layout dir (a whisper where the vision tower should be) fails at
    # prefix detection with the key sample, not deep inside the converter
    with pytest.raises(KeyError, match="no prefix"):
        load_model(str(root / "gemma2"),
                   mm_vision_tower=str(root / "whisper"),
                   dtype=jnp.float32, mm_overrides={"mm_std": MM_STD})


def test_assemble_mistral_clip(tmp_path):
    """7B-family assembly: plain Mistral + CLIP tower -> v1 adapters
    (learned conv pool, d_aud-keeping audio pool) — the Vidi_7B lineage."""
    from transformers import (CLIPVisionConfig, CLIPVisionModel,
                              MistralConfig, MistralForCausalLM)

    from vidi_tpu.infer.loader import load_model

    torch.manual_seed(1)
    text_cfg = MistralConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, sliding_window=16)
    _save_ckpt(tmp_path / "mistral", _state_dict(MistralForCausalLM(text_cfg)),
               text_cfg.to_dict())
    vis_cfg = CLIPVisionConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=3,
        num_attention_heads=2, image_size=28, patch_size=14)
    _save_ckpt(tmp_path / "clip", _state_dict(CLIPVisionModel(vis_cfg)),
               vis_cfg.to_dict())

    params, cfg, _ = load_model(
        str(tmp_path / "mistral"),
        mm_vision_tower=str(tmp_path / "clip"),
        dtype=jnp.float32,
        mm_overrides={"mm_input_type": "image", "mm_image_pool_size": 2})
    assert cfg.text.arch == "mistral" and cfg.mm_version == "v1"
    assert cfg.vision.arch == "clip" and cfg.vision.hidden_act == "quick_gelu"
    assert "pre_ln_scale" in params["vision"] and "cls_embed" in params["vision"]
    assert "lm_head" in params["text"]  # mistral heads are untied


@pytest.mark.slow
def test_image_train_step_runs_and_learns():
    """mm_input_type="image" training: encode_images path inside loss_fn
    (reference dataset_type="image-conv" finetuning)."""
    import dataclasses
    import optax

    from vidi_tpu.core.config import DattnConfig
    from vidi_tpu.models import dattn
    from vidi_tpu.train import data as data_mod
    from vidi_tpu.train.optimizer import TrainHParams, make_optimizer
    from vidi_tpu.train.train_step import make_batch_hw, opt_init, train_step

    cfg = dataclasses.replace(DattnConfig.tiny(), mm_input_type="image")
    params = dattn.init_params(jax.random.PRNGKey(0), cfg, jnp.float32)
    hp = TrainHParams(total_steps=10, learning_rate=1e-3, warmup_ratio=0.0)
    tx = make_optimizer(params, hp)
    opt_state = opt_init(tx, params)
    batch = data_mod.synthetic_image_batch(cfg, b=2, t=16)
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    hw = make_batch_hw(cfg, 1)

    losses = []
    for i in range(3):
        params, opt_state, loss = train_step(
            params, opt_state, batch, jax.random.PRNGKey(i), cfg=cfg, tx=tx,
            hw=hw, remat=False)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]  # same batch -> memorization
