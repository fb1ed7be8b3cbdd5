"""Fused int8 tower-layer Pallas kernels vs the jnp dynamic_qdense path.

The jnp path (infer/quantize.dynamic_qdense through ops.basic.dense) is the
numerics of record; the fused kernels (ops/pallas/fused_tower_layer.py) must
reproduce it. Kernels run in interpret mode on the forced-CPU test backend.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vidi_tpu.core.config import AudioConfig, VisionConfig
from vidi_tpu.infer.quantize import quantize_tower_params
from vidi_tpu.models import siglip, whisper
from vidi_tpu.ops.pallas import fused_tower_layer as ftl


@pytest.fixture(autouse=True)
def _interpret(monkeypatch):
    monkeypatch.setattr(ftl, "INTERPRET", True)


def _vis_cfg(ff):
    return VisionConfig(hidden_size=256, intermediate_size=ff, num_layers=3,
                        num_heads=4, patch_size=16, image_size=64,
                        select_layer=-2, hidden_act="gelu_tanh")


def test_ffn_padding_shapes():
    """ff=456 pads to 512 with zero weight/bias in the padded columns."""
    cfg = _vis_cfg(456)
    params = siglip.init_params(jax.random.key(0), cfg)
    qp = quantize_tower_params(params)
    assert qp["layers"]["fc1_w"]["qi8"].shape == (3, 256, 512)
    assert qp["layers"]["fc2_w"]["qi8"].shape == (3, 512, 256)
    assert qp["layers"]["fc1_b"].shape == (3, 512)
    np.testing.assert_array_equal(
        np.asarray(qp["layers"]["fc1_w"]["qi8"][..., 456:]), 0)
    np.testing.assert_array_equal(np.asarray(qp["layers"]["fc1_b"][:, 456:]), 0)


@pytest.mark.parametrize("ff", [384, 456])
def test_siglip_fused_matches_jnp(monkeypatch, ff):
    cfg = _vis_cfg(ff)
    params = siglip.init_params(jax.random.key(1), cfg)
    qp = quantize_tower_params(params)
    images = jax.random.uniform(jax.random.key(2), (2, 64, 64, 3)) * 2 - 1

    monkeypatch.setenv("VIDI_TOWER_FUSED", "0")
    want = siglip.forward_features(qp, images, cfg)
    monkeypatch.setenv("VIDI_TOWER_FUSED", "1")
    got = siglip.forward_features(qp, images, cfg)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_clip_fused_matches_jnp(monkeypatch):
    """CLIP shares the encoder layer; exercises quick_gelu + cls token."""
    cfg = VisionConfig(arch="clip", hidden_size=256, intermediate_size=512,
                       num_layers=2, num_heads=4, patch_size=16,
                       image_size=64, select_layer=-2,
                       layer_norm_eps=1e-5, hidden_act="quick_gelu")
    params = siglip.init_params(jax.random.key(11), cfg)
    qp = quantize_tower_params(params)
    images = jax.random.uniform(jax.random.key(12), (2, 64, 64, 3)) * 2 - 1

    monkeypatch.setenv("VIDI_TOWER_FUSED", "0")
    want = siglip.forward_features(qp, images, cfg)
    monkeypatch.setenv("VIDI_TOWER_FUSED", "1")
    got = siglip.forward_features(qp, images, cfg)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.slow  # heavy integration; fast gate keeps a representative
def test_whisper_fused_matches_jnp(monkeypatch):
    cfg = AudioConfig(d_model=256, ffn_dim=512, num_layers=2, num_heads=4,
                      num_mel_bins=32, max_source_positions=64)
    params = whisper.init_params(jax.random.key(3), cfg)
    qp = quantize_tower_params(params)
    mel = jax.random.normal(jax.random.key(4), (1, 32, 128))

    monkeypatch.setenv("VIDI_TOWER_FUSED", "0")
    want = whisper.forward(qp, mel, cfg)
    monkeypatch.setenv("VIDI_TOWER_FUSED", "1")
    got = whisper.forward(qp, mel, cfg)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.slow  # heavy integration; fast gate keeps a representative
def test_fused_pieces_vs_manual():
    """Each kernel against a hand-built jnp composition, incl. bf16 inputs
    and a non-multiple-of-8 row count (masked last grid block)."""
    from vidi_tpu.infer.quantize import dynamic_qdense
    from vidi_tpu.ops.basic import layer_norm, tower_act

    d, ff, m = 256, 384, 49
    key = jax.random.key(5)
    params = siglip.init_params(key, _vis_cfg(ff))
    lp = jax.tree.map(lambda a: a[0], quantize_tower_params(params)["layers"])
    lp = {k: (jax.tree.map(lambda a: a.astype(jnp.bfloat16), v)
              if not isinstance(v, dict) and v.dtype == jnp.float32 else v)
          for k, v in lp.items()}
    x = jax.random.normal(jax.random.key(6), (1, m, d)).astype(jnp.bfloat16)

    h = layer_norm(x, lp["ln1_scale"], lp["ln1_bias"], 1e-6)
    want_q = dynamic_qdense(h, lp["q_w"], lp["q_b"])
    want_k = dynamic_qdense(h, lp["k_w"], lp["k_b"])
    got_q, got_k, _ = ftl.ln_qkv(x, lp, eps=1e-6)
    np.testing.assert_allclose(np.asarray(got_q, np.float32),
                               np.asarray(want_q, np.float32), rtol=2e-2, atol=2e-2)
    np.testing.assert_allclose(np.asarray(got_k, np.float32),
                               np.asarray(want_k, np.float32), rtol=2e-2, atol=2e-2)

    attn = jax.random.normal(jax.random.key(7), (1, m, d)).astype(jnp.bfloat16)
    want_o = x + dynamic_qdense(attn, lp["o_w"], lp["o_b"])
    got_o = ftl.o_residual(attn, x, lp)
    np.testing.assert_allclose(np.asarray(got_o, np.float32),
                               np.asarray(want_o, np.float32), rtol=2e-2, atol=2e-2)

    h2 = layer_norm(x, lp["ln2_scale"], lp["ln2_bias"], 1e-6)
    a = tower_act(dynamic_qdense(h2, lp["fc1_w"], lp["fc1_b"]), "gelu_tanh")
    want_f = x + dynamic_qdense(a, lp["fc2_w"], lp["fc2_b"])
    got_f = ftl.ln_ffn(x, lp, eps=1e-6, hidden_act="gelu_tanh")
    np.testing.assert_allclose(np.asarray(got_f, np.float32),
                               np.asarray(want_f, np.float32), rtol=2e-2, atol=2e-2)


def test_use_fused_gating(monkeypatch):
    cfg = _vis_cfg(384)
    params = siglip.init_params(jax.random.key(8), cfg)
    lp = jax.tree.map(lambda a: a[0], quantize_tower_params(params)["layers"])
    assert ftl.use_fused(lp)
    monkeypatch.setenv("VIDI_TOWER_FUSED", "0")
    assert not ftl.use_fused(lp)
    monkeypatch.delenv("VIDI_TOWER_FUSED")
    # unquantized layers never route here
    lp_f = jax.tree.map(lambda a: a[0], params["layers"])
    assert not ftl.use_fused(lp_f)
    # off-lane hidden size falls back to jnp
    cfg_odd = VisionConfig(hidden_size=120, intermediate_size=256,
                           num_layers=2, num_heads=4, patch_size=16,
                           image_size=64, select_layer=-2,
                           hidden_act="gelu_tanh")
    lp_odd = jax.tree.map(
        lambda a: a[0],
        quantize_tower_params(siglip.init_params(jax.random.key(9),
                                                 cfg_odd))["layers"])
    assert not ftl.use_fused(lp_odd)


def test_quant_gated_mlp_matches_jnp(monkeypatch):
    """Fused W8A8 gated FFN (gate/up shared-quantize kernel + quant_matmul
    down) vs the jnp dynamic_qdense path through decoder.mlp."""
    from vidi_tpu.core.config import TextConfig
    from vidi_tpu.infer import quantize as qz
    from vidi_tpu.models import decoder
    from vidi_tpu.ops.pallas import quant_matmul as qm

    monkeypatch.setattr(qm, "INTERPRET", True)
    monkeypatch.setattr(qz, "w8a8_min_tokens", 1)
    cfg = TextConfig(hidden_size=256, intermediate_size=512, num_layers=1,
                     num_heads=4, num_kv_heads=2, head_dim=64,
                     vocab_size=128, hidden_act="gelu_tanh")
    key = jax.random.key(0)
    ks = jax.random.split(key, 4)
    lp = {
        "gate_w": qz.quantize_weight(jax.random.normal(ks[0], (256, 512)) * 0.05),
        "up_w": qz.quantize_weight(jax.random.normal(ks[1], (256, 512)) * 0.05),
        "down_w": qz.quantize_weight(jax.random.normal(ks[2], (512, 256)) * 0.05),
    }
    x = jax.random.normal(ks[3], (2, 40, 256)).astype(jnp.bfloat16)

    monkeypatch.setenv("VIDI_QMM_MLP", "0")
    want = decoder.mlp(lp, x, cfg)
    monkeypatch.setenv("VIDI_QMM_MLP", "1")
    got = decoder.mlp(lp, x, cfg)
    assert got.shape == want.shape and got.dtype == want.dtype
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               rtol=2e-2, atol=2e-2)
    # silu variant (mistral)
    cfg_s = TextConfig(hidden_size=256, intermediate_size=512, num_layers=1,
                       num_heads=4, num_kv_heads=2, head_dim=64,
                       vocab_size=128, hidden_act="silu")
    monkeypatch.setenv("VIDI_QMM_MLP", "0")
    want = decoder.mlp(lp, x, cfg_s)
    monkeypatch.setenv("VIDI_QMM_MLP", "1")
    got = decoder.mlp(lp, x, cfg_s)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               rtol=2e-2, atol=2e-2)
