"""Tower parity tests: our functional JAX towers vs HF torch modules with the
same (randomly initialized) weights, via the production weight converter."""
import numpy as np
import jax.numpy as jnp
import torch

from vidi_tpu.core.config import AudioConfig, VisionConfig
from vidi_tpu.infer.convert import convert_siglip, convert_whisper
from vidi_tpu.models import siglip, whisper


def _state_dict(mod):
    return {k: v.detach().numpy() for k, v in mod.state_dict().items()}


def test_siglip_matches_hf():
    from transformers import SiglipVisionConfig, SiglipVisionModel

    hf_cfg = SiglipVisionConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=3,
        num_attention_heads=2, image_size=56, patch_size=14,
    )
    torch.manual_seed(0)
    hf = SiglipVisionModel(hf_cfg).eval()

    cfg = VisionConfig(
        hidden_size=32, num_layers=3, num_heads=2, intermediate_size=64,
        patch_size=14, image_size=56, select_layer=-2,
    )
    params = convert_siglip(_state_dict(hf), cfg)

    imgs = np.random.default_rng(0).standard_normal((2, 56, 56, 3)).astype(np.float32)
    got = np.asarray(siglip.forward_features(params, jnp.asarray(imgs), cfg))

    with torch.no_grad():
        out = hf(torch.tensor(imgs).permute(0, 3, 1, 2), output_hidden_states=True)
    want = out.hidden_states[-2].numpy()  # reference taps [-2] (siglip.py:30-36)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_whisper_encoder_matches_hf():
    from transformers import WhisperConfig
    from transformers.models.whisper.modeling_whisper import WhisperEncoder

    hf_cfg = WhisperConfig(
        d_model=32, encoder_layers=2, encoder_attention_heads=2,
        encoder_ffn_dim=64, num_mel_bins=8, max_source_positions=16,
    )
    torch.manual_seed(0)
    hf = WhisperEncoder(hf_cfg).eval()

    cfg = AudioConfig(
        d_model=32, num_layers=2, num_heads=2, ffn_dim=64,
        num_mel_bins=8, max_source_positions=16,
    )
    params = convert_whisper(_state_dict(hf), cfg, prefix="")

    mel = np.random.default_rng(1).standard_normal((2, 8, 32)).astype(np.float32)
    got = np.asarray(whisper.forward(params, jnp.asarray(mel), cfg))

    with torch.no_grad():
        want = hf(torch.tensor(mel)).last_hidden_state.numpy()
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_whisper_sinusoid_matches_hf_init():
    """Our sinusoid table must equal HF's embed_positions init (used when
    initializing from scratch)."""
    from transformers import WhisperConfig
    from transformers.models.whisper.modeling_whisper import WhisperEncoder

    hf_cfg = WhisperConfig(
        d_model=32, encoder_layers=1, encoder_attention_heads=2,
        encoder_ffn_dim=64, num_mel_bins=8, max_source_positions=16,
    )
    hf = WhisperEncoder(hf_cfg)
    want = hf.embed_positions.weight.detach().numpy()
    got = whisper.sinusoidal_positions(16, 32)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
