"""Image-input path (mm_input_type="image"): plain + anyres encode_images
(reference: Vidi1.5_9B/vidi/model/lmm/dattn/multimodal.py:267-337)."""
import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from vidi_tpu.core.config import DattnConfig
from vidi_tpu.media.images import (
    get_anyres_grid_shape,
    process_anyres_image,
    select_best_resolution,
)
from vidi_tpu.models import dattn
import pytest


def _image_cfg(aspect="resize"):
    base = DattnConfig.tiny()
    return dataclasses.replace(base, mm_input_type="image",
                               mm_image_aspect_ratio=aspect)


def test_encode_images_plain():
    cfg = _image_cfg()
    params = dattn.init_params(jax.random.PRNGKey(0), cfg, jnp.float32)
    assert "projector" in params["mm"] and "pos_t" not in params["mm"]

    s_img = cfg.vision.image_size
    s = cfg.vision.num_patches_per_side
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.standard_normal((2, s_img, s_img, 3)), jnp.float32)
    tok, mask = dattn.encode_images(params, cfg, images)
    assert tok.shape == (2, s * s, cfg.text.hidden_size)
    assert bool(mask.all())


def test_encode_images_zero_sample_masked():
    cfg = _image_cfg()
    params = dattn.init_params(jax.random.PRNGKey(0), cfg, jnp.float32)
    s_img = cfg.vision.image_size
    rng = np.random.default_rng(0)
    images = np.asarray(rng.standard_normal((2, s_img, s_img, 3)), np.float32)
    images[1] = 0.0  # text-only dummy (collator zero-fill semantics)
    tok, mask = dattn.encode_images(params, cfg, jnp.asarray(images))
    assert bool(mask[0].all()) and not bool(mask[1].any())
    np.testing.assert_array_equal(np.asarray(tok[1]), 0.0)


def test_encode_images_anyres():
    cfg = _image_cfg("anyres")
    params = dattn.init_params(jax.random.PRNGKey(0), cfg, jnp.float32)
    s_img = cfg.vision.image_size
    s = cfg.vision.num_patches_per_side
    gw, gh = 2, 1
    n_tiles = 1 + gw * gh
    rng = np.random.default_rng(0)
    images = jnp.asarray(
        rng.standard_normal((1, n_tiles, s_img, s_img, 3)), jnp.float32)
    tok, mask = dattn.encode_images(params, cfg, images, grid_shape=(gw, gh))
    assert tok.shape == (1, s * s + gh * s * gw * s, cfg.text.hidden_size)
    assert bool(mask.all())


def test_encode_images_anyres_batched_matches_single():
    """Per-device batch > 1 with MIXED per-sample grids (the reference's
    list path, multimodal.py:271-315): every sample's valid tokens must equal
    the b=1 static-grid oracle, padding masked."""
    cfg = _image_cfg("anyres")
    params = dattn.init_params(jax.random.PRNGKey(0), cfg, jnp.float32)
    s_img = cfg.vision.image_size
    s = cfg.vision.num_patches_per_side
    d = cfg.text.hidden_size
    rng = np.random.default_rng(3)

    grids = [(2, 1), (1, 3)]
    n_tiles = [1 + gw * gh for gw, gh in grids]
    p_max = max(n_tiles)
    images = np.zeros((2, p_max, s_img, s_img, 3), np.float32)
    for i, nt in enumerate(n_tiles):
        images[i, :nt] = rng.standard_normal((nt, s_img, s_img, 3))

    tok_b, mask_b = dattn.encode_images(
        params, cfg, jnp.asarray(images),
        grids=jnp.asarray(grids, jnp.int32))
    assert tok_b.shape == (2, p_max * s * s, d)

    for i, (gw, gh) in enumerate(grids):
        nt = n_tiles[i]
        tok_1, mask_1 = dattn.encode_images(
            params, cfg, jnp.asarray(images[i:i + 1, :nt]),
            grid_shape=(gw, gh))
        n_valid = int(mask_1.sum())
        assert int(mask_b[i].sum()) == n_valid
        assert bool(mask_b[i, :n_valid].all())  # valid tokens lead
        np.testing.assert_allclose(
            np.asarray(tok_b[i, :n_valid]), np.asarray(tok_1[0]),
            rtol=2e-5, atol=2e-5)
        np.testing.assert_array_equal(np.asarray(tok_b[i, n_valid:]), 0.0)


@pytest.mark.slow  # heavy integration; fast gate keeps a representative
def test_image_train_step_anyres_batched():
    """Anyres image-conv training at per-device batch 2 with two different
    grids riding the batch as the traced "grids" array (collate_images)."""
    from vidi_tpu.train.optimizer import TrainHParams, make_optimizer
    from vidi_tpu.train.train_step import make_batch_hw, opt_init, train_step

    cfg = _image_cfg("anyres")
    params = dattn.init_params(jax.random.PRNGKey(0), cfg, jnp.float32)
    tx = make_optimizer(params, TrainHParams(total_steps=2))
    opt_state = opt_init(tx, params)

    s_img = cfg.vision.image_size
    rng = np.random.default_rng(5)
    grids = np.asarray([(2, 1), (1, 3)], np.int32)
    p_max = 1 + 3
    images = np.zeros((2, p_max, s_img, s_img, 3), np.float32)
    images[0, :3] = rng.standard_normal((3, s_img, s_img, 3))
    images[1, :4] = rng.standard_normal((4, s_img, s_img, 3))
    batch = {
        "input_ids": jnp.asarray(rng.integers(3, 259, (2, 16)), jnp.int32),
        "labels": jnp.asarray(rng.integers(3, 259, (2, 16)), jnp.int32),
        "text_mask": jnp.ones((2, 16), bool),
        "images": jnp.asarray(images, jnp.float32),
        "image_sizes": jnp.full((2, 2), s_img, jnp.int32),
        "grids": jnp.asarray(grids),
    }
    params, opt_state, loss = train_step(
        params, opt_state, batch, jax.random.PRNGKey(1), cfg=cfg, tx=tx,
        hw=make_batch_hw(cfg, 1), remat=False)
    assert np.isfinite(float(loss))


def test_anyres_host_preprocess_matches_grid():
    """process_anyres_image tile count must agree with the grid shape that
    encode_images receives (img_utils.py:103-120 semantics)."""
    from PIL import Image

    cfg = _image_cfg("anyres")
    res = [(int(a * cfg.vision.image_size), int(b * cfg.vision.image_size))
           for a, b in cfg.mm_image_grid_points]
    img = Image.new("RGB", (100, 40), (200, 10, 10))
    tiles = process_anyres_image(img, cfg.vision.image_size, res)
    best = select_best_resolution(img.size, res)
    gw, gh = get_anyres_grid_shape(img.size, res, cfg.vision.image_size)
    assert (gw * cfg.vision.image_size, gh * cfg.vision.image_size) == best
    assert tiles.shape[0] == 1 + gw * gh


def test_image_train_step_anyres():
    """Anyres image-conv training: per-sample tile grid as a static
    train_step arg at batch=1 (reference image finetuning supports anyres
    through per-sample grids, multimodal.py:269-318)."""
    from vidi_tpu.train.optimizer import TrainHParams, make_optimizer
    from vidi_tpu.train.train_step import make_batch_hw, opt_init, train_step

    cfg = _image_cfg("anyres")
    params = dattn.init_params(jax.random.PRNGKey(0), cfg, jnp.float32)
    tx = make_optimizer(params, TrainHParams(total_steps=2))
    opt_state = opt_init(tx, params)

    s_img = cfg.vision.image_size
    rng = np.random.default_rng(0)
    gw, gh = 2, 1
    batch = {
        "input_ids": jnp.asarray(rng.integers(3, 259, (1, 16)), jnp.int32),
        "labels": jnp.asarray(rng.integers(3, 259, (1, 16)), jnp.int32),
        "text_mask": jnp.ones((1, 16), bool),
        "images": jnp.asarray(
            rng.standard_normal((1, 1 + gw * gh, s_img, s_img, 3)),
            jnp.float32),
        "image_sizes": jnp.full((1, 2), s_img, jnp.int32),
    }
    params, opt_state, loss = train_step(
        params, opt_state, batch, jax.random.PRNGKey(1), cfg=cfg, tx=tx,
        hw=make_batch_hw(cfg, 1), remat=False, grid_shape=(gw, gh))
    assert np.isfinite(float(loss))
