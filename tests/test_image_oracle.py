"""Torch-oracle parity for the image-input path: an eager transcription of
the reference's encode_images composition (multimodal.py:267-337 — tower tap,
projector, mm_rand_norm placement, pos-embed adds, anyres tile reassembly,
llm_norm) fed the SAME weights through the production converter."""
import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import torch

from vidi_tpu.core.config import DattnConfig, VisionConfig
from vidi_tpu.infer.convert import convert_mm_adapters, convert_siglip
from vidi_tpu.models import dattn


def _rms_norm(x, eps=1e-5):  # norm.py:8-15
    v = x.float().pow(2).mean(-1, keepdim=True)
    return (x.float() * torch.rsqrt(v + eps)).to(x.dtype)


class _PosEmbd(torch.nn.Module):  # pos.py:29-65 (eval mode, no noise)
    def __init__(self, d, n_anchors):
        super().__init__()
        self.d, self.N = d, n_anchors
        self.mlp = torch.nn.Sequential(
            torch.nn.Linear(d, d), torch.nn.GELU(), torch.nn.Linear(d, d))

    def forward(self, x, dim):
        ln = x.shape[dim]
        p = torch.arange(ln, dtype=torch.float32) / (ln - 1) * (self.N - 1)
        div = torch.exp(torch.arange(0, self.d, 2, dtype=torch.float32)
                        * (-np.log(10000.0) / self.d))
        pe = torch.zeros(ln, self.d)
        pe[:, 0::2] = torch.sin(p[:, None] * div)
        pe[:, 1::2] = torch.cos(p[:, None] * div)
        pe = self.mlp(pe)
        shape = [1 if i != dim else ln for i in range(x.ndim - 1)] + [self.d]
        return pe.reshape(shape)


def _build(aspect, grid_max=1):
    from transformers import SiglipVisionConfig, SiglipVisionModel

    torch.manual_seed(0)
    hf_cfg = SiglipVisionConfig(hidden_size=32, intermediate_size=64,
                                num_hidden_layers=3, num_attention_heads=2,
                                image_size=42, patch_size=14)
    vis = SiglipVisionModel(hf_cfg).eval()
    grid_points = tuple((a, b) for a in (1, 2) for b in (1, 2)
                        if max(a, b) <= grid_max and (a, b) != (1, 1))
    cfg = dataclasses.replace(
        DattnConfig.tiny(), mm_input_type="image",
        mm_image_aspect_ratio=aspect,
        mm_image_grid_points=grid_points or ((1, 1),),
        vision=VisionConfig(hidden_size=32, num_layers=3, num_heads=2,
                            intermediate_size=64, patch_size=14,
                            image_size=42))
    d_vis, d = 32, cfg.text.hidden_size
    s = cfg.vision.num_patches_per_side
    proj = torch.nn.Sequential(torch.nn.Linear(d_vis, d), torch.nn.GELU(),
                               torch.nn.Linear(d, d))
    anchors = s * grid_max
    pos_h, pos_w = _PosEmbd(d, anchors).eval(), _PosEmbd(d, anchors).eval()
    norm_w = torch.randn(d).abs() + 0.5
    llm_w = torch.randn(d).abs() * 0.03

    sd = {f"model.mm_vis.{k}": v.detach().numpy()  # keys carry vision_model.
          for k, v in vis.state_dict().items()}
    for i in (0, 2):
        sd[f"model.mm_rand_projector.model.{i}.weight"] = proj[i].weight.detach().numpy()
        sd[f"model.mm_rand_projector.model.{i}.bias"] = proj[i].bias.detach().numpy()
        for name, mod in (("pos_h", pos_h), ("pos_w", pos_w)):
            sd[f"model.mm_rand_{name}.mlp.{i}.weight"] = mod.mlp[i].weight.detach().numpy()
            sd[f"model.mm_rand_{name}.mlp.{i}.bias"] = mod.mlp[i].bias.detach().numpy()
    sd["model.mm_rand_norm.weight"] = norm_w.numpy()
    sd["model.mm_rand_llm_norm.weight"] = llm_w.numpy()

    params = {
        "vision": convert_siglip(sd, cfg.vision, jnp.float32,
                                 prefix="model.mm_vis.vision_model."),
        "mm": convert_mm_adapters(sd, cfg, jnp.float32),
    }
    return cfg, params, vis, proj, pos_h, pos_w, norm_w, llm_w, s, d


def test_encode_images_plain_matches_torch_oracle():
    cfg, params, vis, proj, pos_h, pos_w, norm_w, llm_w, s, d = _build("resize")
    rng = np.random.default_rng(0)
    imgs = rng.standard_normal((2, 42, 42, 3)).astype(np.float32)

    got, mask = dattn.encode_images(params, cfg, jnp.asarray(imgs))
    assert bool(np.asarray(mask).all())

    with torch.no_grad():  # multimodal.py:322-336
        t_imgs = torch.tensor(imgs).permute(0, 3, 1, 2)
        feats = vis(t_imgs, output_hidden_states=True).hidden_states[-2]
        feats = feats.reshape(2, s, s, -1)
        feats = proj(feats)
        feats = norm_w * _rms_norm(feats)
        feats = feats + _rms_norm(pos_h(feats, dim=1))
        feats = feats + _rms_norm(pos_w(feats, dim=2))
        feats = feats.flatten(1, 2)
        feats = llm_w * _rms_norm(feats)
    np.testing.assert_allclose(np.asarray(got), feats.numpy(),
                               rtol=2e-4, atol=2e-4)


def test_encode_images_anyres_matches_torch_oracle():
    grid_max = 2
    cfg, params, vis, proj, pos_h, pos_w, norm_w, llm_w, s, d = _build(
        "anyres", grid_max=grid_max)
    gw, gh = 2, 1
    rng = np.random.default_rng(1)
    imgs = rng.standard_normal((1, 1 + gw * gh, 42, 42, 3)).astype(np.float32)

    got, mask = dattn.encode_images(params, cfg, jnp.asarray(imgs),
                                    grid_shape=(gw, gh))
    assert bool(np.asarray(mask).all())

    with torch.no_grad():  # multimodal.py:269-318
        flat = torch.tensor(imgs[0]).permute(0, 3, 1, 2)
        feats = vis(flat, output_hidden_states=True).hidden_states[-2]
        feats = proj(feats)  # anyres projects BEFORE reshape, skips mm_rand_norm
        base = feats[0].reshape(s, s, -1)
        base = base + _rms_norm(pos_h(base, dim=0))
        base = base + _rms_norm(pos_w(base, dim=1))
        tiles = feats[1:].view(gh, gw, s, s, -1)
        tiles = tiles.permute(0, 2, 1, 3, 4).flatten(0, 1).flatten(1, 2)
        tiles = tiles + _rms_norm(pos_h(tiles, dim=0))
        tiles = tiles + _rms_norm(pos_w(tiles, dim=1))
        feats = torch.cat([base.flatten(0, 1), tiles.flatten(0, 1)])
        feats = llm_w * _rms_norm(feats)
    np.testing.assert_allclose(np.asarray(got[0]), feats.numpy(),
                               rtol=2e-4, atol=2e-4)
