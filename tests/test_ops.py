"""Unit tests for core ops vs independent (numpy/torch) oracles."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch
import torch.nn.functional as F

from vidi_tpu.ops.norms import rms_norm, scaled_rms_norm, gemma_rms_norm
from vidi_tpu.ops.rope import rope_cos_sin, apply_rope
from vidi_tpu.ops.attention import self_attention, cross_attention
from vidi_tpu.models import adapters


def test_rms_norm_matches_torch():
    x = np.random.randn(4, 32).astype(np.float32)
    got = np.asarray(rms_norm(jnp.asarray(x), eps=1e-5))
    t = torch.tensor(x)
    want = (t * torch.rsqrt(t.pow(2).mean(-1, keepdim=True) + 1e-5)).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def test_scaled_rms_norm_weight():
    x = np.random.randn(3, 16).astype(np.float32)
    w = np.random.randn(16).astype(np.float32)
    got = np.asarray(scaled_rms_norm(jnp.asarray(x), jnp.asarray(w)))
    t = torch.tensor(x)
    normed = t * torch.rsqrt(t.pow(2).mean(-1, keepdim=True) + 1e-5)
    want = (torch.tensor(w) * normed).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_gemma_rms_norm_one_plus_weight():
    x = np.random.randn(2, 8).astype(np.float32)
    w = np.zeros(8, np.float32)  # (1 + 0) -> plain rms norm
    got = np.asarray(gemma_rms_norm(jnp.asarray(x), jnp.asarray(w), eps=1e-6))
    want = np.asarray(rms_norm(jnp.asarray(x), eps=1e-6))
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def test_rope_matches_hf_convention():
    """Oracle: hand-built rotate_half RoPE in torch (HF formulation)."""
    B, T, H, D = 2, 5, 3, 8
    theta = 10000.0
    x = np.random.randn(B, T, H, D).astype(np.float32)
    pos = np.arange(T, dtype=np.int32)[None, :].repeat(B, 0)

    cos, sin = rope_cos_sin(jnp.asarray(pos), D, theta)
    got = np.asarray(apply_rope(jnp.asarray(x), cos, sin))

    inv = 1.0 / theta ** (np.arange(0, D, 2) / D)
    freqs = pos[..., None] * inv  # [B,T,D/2]
    emb = np.concatenate([freqs, freqs], -1)
    c, s = np.cos(emb)[:, :, None, :], np.sin(emb)[:, :, None, :]
    rot = np.concatenate([-x[..., D // 2:], x[..., : D // 2]], -1)
    want = x * c + rot * s
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def _torch_sdpa(q, k, v, mask, scale, softcap=None):
    # q,k,v: [B,H,T,D] torch, mask additive
    logits = torch.einsum("bhtd,bhsd->bhts", q, k) * scale
    if softcap is not None:
        logits = torch.tanh(logits / softcap) * softcap
    logits = logits + mask
    probs = torch.softmax(logits, dim=-1)
    return torch.einsum("bhts,bhsd->bhtd", probs, v)


@pytest.mark.parametrize("sliding,softcap", [(None, None), (4, 50.0), (None, 30.0)])
def test_self_attention_vs_torch(sliding, softcap):
    B, T, HQ, HK, D = 2, 7, 4, 2, 16
    rng = np.random.default_rng(0)
    q = rng.standard_normal((B, T, HQ, D), dtype=np.float32)
    k = rng.standard_normal((B, T, HK, D), dtype=np.float32)
    v = rng.standard_normal((B, T, HK, D), dtype=np.float32)
    pos = np.arange(T, dtype=np.int32)[None].repeat(B, 0)
    valid = np.ones((B, T), bool)
    valid[1, -2:] = False
    scale = D**-0.5

    got = np.asarray(
        self_attention(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
            q_positions=jnp.asarray(pos), kv_positions=jnp.asarray(pos),
            kv_valid=jnp.asarray(valid), scale=scale,
            sliding_window=sliding, softcap=softcap,
        )
    )

    # torch oracle with repeated KV heads
    tq = torch.tensor(q).permute(0, 2, 1, 3)
    tk = torch.tensor(k).repeat_interleave(HQ // HK, dim=2).permute(0, 2, 1, 3)
    tv = torch.tensor(v).repeat_interleave(HQ // HK, dim=2).permute(0, 2, 1, 3)
    allow = pos[:, :, None] >= pos[:, None, :]
    if sliding is not None:
        allow &= (pos[:, :, None] - pos[:, None, :]) < sliding
    allow &= valid[:, None, :]
    mask = torch.where(torch.tensor(allow)[:, None], 0.0, -1e30)
    want = _torch_sdpa(tq, tk, tv, mask, scale, softcap).permute(0, 2, 1, 3).numpy()
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_gqa_grouping_order_matches_repeat_interleave():
    """Query head h attends with KV head h // group — HF repeat_kv semantics."""
    B, T, HQ, HK, D = 1, 3, 4, 2, 8
    rng = np.random.default_rng(1)
    q = rng.standard_normal((B, T, HQ, D), dtype=np.float32)
    k = rng.standard_normal((B, T, HK, D), dtype=np.float32)
    v = rng.standard_normal((B, T, HK, D), dtype=np.float32)
    out = np.asarray(
        cross_attention(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
            kv_valid=None, scale=D**-0.5,
        )
    )
    # head 0,1 use kv head 0; heads 2,3 use kv head 1
    for h in range(HQ):
        kv = k[:, :, h // 2], v[:, :, h // 2]
        logits = np.einsum("btd,bsd->bts", q[:, :, h], kv[0]) * D**-0.5
        p = np.exp(logits - logits.max(-1, keepdims=True))
        p /= p.sum(-1, keepdims=True)
        want = np.einsum("bts,bsd->btd", p, kv[1])
        np.testing.assert_allclose(out[:, :, h], want, rtol=1e-4, atol=1e-4)


def test_cross_attention_fully_masked_rows_are_finite():
    """All-False KV masks must not NaN (the reference forces all-True and
    zeroes the output afterwards, gemma.py:180-192 — we must stay finite)."""
    B, T, S, H, D = 1, 2, 3, 2, 4
    q = jnp.ones((B, T, H, D))
    k = jnp.ones((B, S, H, D))
    v = jnp.ones((B, S, H, D))
    valid = jnp.zeros((B, S), bool)
    out = cross_attention(q, k, v, kv_valid=valid, scale=0.5)
    assert bool(jnp.all(jnp.isfinite(out)))


# ---------------------------------------------------------------------------
# Adapters
# ---------------------------------------------------------------------------

def test_space_to_depth_matches_reference_channel_order():
    """Oracle: the documented NCHW permute from vidi/utils.py:134-150."""
    n, h, w, c, m = 2, 4, 6, 3, 2
    x = np.random.randn(n, h, w, c).astype(np.float32)
    got = np.asarray(adapters.space_to_depth(jnp.asarray(x), m))

    t = torch.tensor(x).permute(0, 3, 1, 2)  # NCHW
    t = t.reshape(n, c, h // m, m, w // m, m)
    t = t.permute(0, 1, 3, 5, 2, 4).reshape(n, c * m * m, h // m, w // m)
    want = t.permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(got, want)


def test_conv2d_pool_matches_torch_pipeline():
    """pad->bilinear->s2d vs torch F.pad + F.interpolate(align_corners=False)."""
    n, s, c = 3, 27, 8
    x = np.random.randn(n, s, s, c).astype(np.float32)
    for hw in [(28, 28), (14, 14), (10, 10)]:
        got = np.asarray(adapters.conv2d_pool(jnp.asarray(x), hw, 2))
        t = torch.tensor(x).permute(0, 3, 1, 2)
        t = F.pad(t, (0, 1, 0, 1))
        if hw[0] != 28:
            t = F.interpolate(t, size=hw, mode="bilinear", align_corners=False)
        tt = t.reshape(n, c, hw[0] // 2, 2, hw[1] // 2, 2)
        tt = tt.permute(0, 1, 3, 5, 2, 4).reshape(n, 4 * c, hw[0] // 2, hw[1] // 2)
        want = tt.permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_budget_hw_rule():
    # Small frame counts keep the padded 28x28 grid.
    assert adapters.budget_hw(100, 2) == (28, 28)
    # max frames at full res: 60000*4 / 784 = 306.1 per side^2
    assert adapters.budget_hw(306, 2) == (28, 28)
    h, w = adapters.budget_hw(307, 2)
    assert h < 28 and h % 2 == 0 and h >= 10
    # Extremely long videos floor at 10.
    assert adapters.budget_hw(100000, 2) == (10, 10)
    # Exact formula parity with vidi/utils.py:152-171.
    import math
    for nf in [400, 1000, 5000]:
        ratio = math.sqrt(240000 / (nf * 28 * 28))
        temp = int(28 * ratio)
        want = max(10, temp - temp % 2)
        assert adapters.budget_hw(nf, 2) == (want, want)


def test_pos_embed_matches_torch_oracle():
    d, n_anchors, length = 16, 4, 7
    params = adapters.init_pos_embed(jax.random.PRNGKey(0), d)
    got = np.asarray(adapters.pos_embed(params, length, n_anchors, d))

    p = torch.arange(length, dtype=torch.float32) / (length - 1) * (n_anchors - 1)
    div = torch.exp(torch.arange(0, d, 2, dtype=torch.float32) * (-np.log(10000.0) / d))
    pe = torch.zeros(length, d)
    pe[:, 0::2] = torch.sin(p[:, None] * div)
    pe[:, 1::2] = torch.cos(p[:, None] * div)
    w0 = torch.tensor(np.asarray(params["w0"]))
    b0 = torch.tensor(np.asarray(params["b0"]))
    w1 = torch.tensor(np.asarray(params["w1"]))
    b1 = torch.tensor(np.asarray(params["b1"]))
    h = torch.nn.functional.gelu(pe @ w0 + b0) @ w1 + b1
    np.testing.assert_allclose(got, h.numpy(), rtol=1e-5, atol=1e-5)


def test_audio_pool_matches_conv1d():
    b, t, cin, cout, pool = 2, 23, 6, 10, 5
    x = np.random.randn(b, t, cin).astype(np.float32)
    params = adapters.init_audio_pool(jax.random.PRNGKey(0), cin, cout, pool)
    got = np.asarray(adapters.audio_pool(params, jnp.asarray(x), pool))

    conv = torch.nn.Conv1d(cin, cout, pool, stride=pool, bias=False)
    conv.weight.data = torch.tensor(np.asarray(params["w"]))
    want = conv(torch.tensor(x).permute(0, 2, 1)).permute(0, 2, 1).detach().numpy()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_mlp_projector_gelu_exact():
    d_in, d_out = 8, 12
    params = adapters.init_mlp_projector(jax.random.PRNGKey(0), d_in, d_out, 2)
    x = np.random.randn(5, d_in).astype(np.float32)
    got = np.asarray(adapters.mlp_projector(params, jnp.asarray(x), 2))
    h = torch.tensor(x) @ torch.tensor(np.asarray(params["w0"])) + torch.tensor(np.asarray(params["b0"]))
    h = torch.nn.functional.gelu(h)  # exact erf gelu (torch default)
    want = (h @ torch.tensor(np.asarray(params["w1"])) + torch.tensor(np.asarray(params["b1"]))).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
