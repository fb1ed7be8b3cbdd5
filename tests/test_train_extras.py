"""Samplers, image dataset, grad accumulation, media policy extras."""
import json

import numpy as np
import pytest

from vidi_tpu.core.config import DattnConfig
from vidi_tpu.media.images import (
    preprocess_frames_crop,
    process_slideshow_image,
)
from vidi_tpu.media.text import ByteTokenizer, truncate_at_keywords
from vidi_tpu.train import data as data_mod
from vidi_tpu.train.samplers import (
    length_grouped_indices,
    mm_length_grouped_indices,
    random_epoch_indices,
    sp_data_indices,
)


# ---------------------------------------------------------------------------
# samplers
# ---------------------------------------------------------------------------

def test_length_grouped_indices_is_permutation_and_sorted_in_megabatches():
    rng = np.random.default_rng(0)
    lengths = rng.integers(1, 100, 64).tolist()
    idx = length_grouped_indices(lengths, batch_size=4, mega_batch_mult=2, rng=rng)
    assert sorted(idx) == list(range(64))
    # first element is the global longest (OOM-first convention)
    assert lengths[idx[0]] == max(lengths)
    # each megabatch (8) is sorted descending below its head (the heads of
    # megabatch 0 and the max-holding megabatch are swapped, HF semantics)
    for i in range(0, 64, 8):
        mb = [lengths[j] for j in idx[i + 1: i + 8]]
        assert mb == sorted(mb, reverse=True)


def test_mm_length_grouped_indices_separates_modalities():
    rng = np.random.default_rng(1)
    # positive = multimodal, negative = language-only
    lengths = [10, 20, -5, 30, -8, 40, -3, 50, 60, -7, 70, 80]
    idx = mm_length_grouped_indices(lengths, batch_size=2, rng=rng)
    assert sorted(idx) == list(range(len(lengths)))
    # every batch is single-modality except possibly the merged tail batch
    batches = [idx[i: i + 2] for i in range(0, len(idx), 2)]
    mixed = sum(
        1 for b in batches
        if len({lengths[i] > 0 for i in b}) > 1)
    assert mixed <= 2  # tail merge only


def test_sp_data_indices_replicates_within_sp_group():
    # dp=2, sp=2, bs_local=2 -> bs_global = 4*2/2 = 4
    idx = list(range(8))
    out = sp_data_indices(idx, bs_local=2, sp_size=2, dp_size=2)
    assert len(out) == 16
    # layout per global batch of 4: ranks [dp0, dp0, dp1, dp1] each read
    # bs_local=2 -> [0,1, 0,1, 2,3, 2,3]
    assert out[:8] == [0, 1, 0, 1, 2, 3, 2, 3]
    assert out[8:] == [4, 5, 4, 5, 6, 7, 6, 7]


def test_random_epoch_indices_cover_dataset():
    out = random_epoch_indices(10, bs_local=1, sp_size=1, dp_size=1, seed=3)
    assert sorted(out) == list(range(10))


# ---------------------------------------------------------------------------
# ImageConvDataset
# ---------------------------------------------------------------------------

def _write_image_dataset(tmp_path, n=3):
    from PIL import Image

    recs = []
    for i in range(n):
        img = Image.new("RGB", (64 + i * 10, 48), (i * 10, 20, 30))
        img.save(tmp_path / f"img{i}.png")
        recs.append({
            "image": f"img{i}.png",
            "conversations": [
                {"from": "human", "value": "<image>\nwhat is this?"},
                {"from": "gpt", "value": f"a thing {i}"},
            ],
        })
    recs.append({
        "conversations": [
            {"from": "human", "value": "hello"},
            {"from": "gpt", "value": "hi"},
        ],
    })
    path = tmp_path / "data.json"
    path.write_text(json.dumps(recs))
    return str(path)


def test_image_conv_dataset_plain(tmp_path):
    import dataclasses
    cfg = dataclasses.replace(DattnConfig.tiny(), mm_input_type="image")
    path = _write_image_dataset(tmp_path)
    ds = data_mod.ImageConvDataset(path, str(tmp_path), ByteTokenizer(), cfg)
    assert len(ds) == 4
    # signed modality lengths: 3 positive, 1 negative
    ml = ds.modality_lengths
    assert sum(1 for l in ml if l > 0) == 3 and sum(1 for l in ml if l < 0) == 1
    # lengths add the 512 image-token estimate to the word count
    assert ds.lengths[0] == ml[0] + 512

    s0 = ds[0]
    size = cfg.vision.image_size
    assert s0["pixels"].shape == (size, size, 3)
    assert (s0["input_ids"] != -200).all()

    batch = data_mod.collate_images([ds[i] for i in range(4)], cfg)
    assert batch["images"].shape[0] == 4
    assert batch["input_ids"].shape == batch["labels"].shape


def test_image_conv_dataset_crop_policy(tmp_path):
    """"crop" is a distinct policy (reference img_utils.py:194-195), not a
    silent fall-through to resize; unknown policies raise like the
    reference's process_images."""
    import dataclasses

    from PIL import Image
    from vidi_tpu.media.images import preprocess_frames_crop, tower_stats

    cfg = dataclasses.replace(DattnConfig.tiny(), mm_input_type="image",
                              mm_image_aspect_ratio="crop")
    path = _write_image_dataset(tmp_path)
    ds = data_mod.ImageConvDataset(path, str(tmp_path), ByteTokenizer(), cfg)
    s0 = ds[0]
    img = Image.open(tmp_path / "img0.png").convert("RGB")
    # normalization uses the tower's own stats (siglip here), not defaults
    mean, std = tower_stats(cfg.vision.arch)
    want = preprocess_frames_crop([img], cfg.vision.image_size, mean, std)[0]
    np.testing.assert_array_equal(s0["pixels"], want)

    bad = dataclasses.replace(cfg, mm_image_aspect_ratio="mystery")
    only_img = tmp_path / "img_only.json"  # no text-only record the x5
    only_img.write_text(json.dumps(        # retry could resample onto
        [json.loads((tmp_path / "data.json").read_text())[0]]))
    ds_bad = data_mod.ImageConvDataset(str(only_img), str(tmp_path),
                                       ByteTokenizer(), bad)
    with pytest.raises(IOError):  # x5 retry wraps the NotImplementedError
        ds_bad[0]


def test_image_conv_dataset_anyres(tmp_path):
    import dataclasses
    cfg = dataclasses.replace(DattnConfig.tiny(), mm_input_type="image",
                              mm_image_aspect_ratio="anyres")
    path = _write_image_dataset(tmp_path)
    ds = data_mod.ImageConvDataset(path, str(tmp_path), ByteTokenizer(), cfg)
    s0 = ds[0]
    size = cfg.vision.image_size
    assert s0["pixels"].ndim == 4 and s0["pixels"].shape[1:] == (size, size, 3)
    assert s0["pixels"].shape[0] >= 2  # base + >=1 tile


def test_image_dataset_retry_on_bad_record(tmp_path):
    recs = [{"image": "missing.png",
             "conversations": [{"from": "human", "value": "x"},
                               {"from": "gpt", "value": "y"}]}]
    path = tmp_path / "data.json"
    path.write_text(json.dumps(recs))
    import dataclasses
    cfg = dataclasses.replace(DattnConfig.tiny(), mm_input_type="image")
    ds = data_mod.ImageConvDataset(str(path), str(tmp_path), ByteTokenizer(), cfg)
    with pytest.raises(IOError):
        ds[0]


# ---------------------------------------------------------------------------
# media extras
# ---------------------------------------------------------------------------

def test_preprocess_frames_crop_matches_hf_clip_processor():
    from PIL import Image
    from transformers import CLIPImageProcessor

    proc = CLIPImageProcessor(
        size={"shortest_edge": 28}, crop_size={"height": 28, "width": 28})
    rng = np.random.default_rng(0)
    img = Image.fromarray(rng.integers(0, 255, (40, 60, 3), dtype=np.uint8))
    want = proc.preprocess(img, return_tensors="np")["pixel_values"][0]
    got = preprocess_frames_crop([img], 28)[0].transpose(2, 0, 1)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_process_slideshow_image_boxes_normalized():
    from PIL import Image

    img = Image.new("RGB", (200, 120), (1, 2, 3))
    rng = np.random.default_rng(0)
    pixels, boxes = process_slideshow_image(img, 42, rng=rng)
    assert pixels.shape[1:] == (42, 42, 3)
    assert pixels.shape[0] == boxes.shape[0] > 1
    assert (boxes >= 0).all() and (boxes <= 1).all()
    assert (boxes[:, 2] > boxes[:, 0]).all() and (boxes[:, 3] > boxes[:, 1]).all()


def test_truncate_at_keywords():
    assert truncate_at_keywords("a red car<end_of_turn>junk",
                                ["<end_of_turn>"]) == "a red car"
    assert truncate_at_keywords("no stop here", ["###"]) == "no stop here"


# ---------------------------------------------------------------------------
# grad accumulation smoke (MultiSteps wrapping)
# ---------------------------------------------------------------------------

@pytest.mark.slow  # heavy integration; fast gate keeps a representative
def test_multisteps_accumulation_steps_params_every_k():
    import jax
    import jax.numpy as jnp
    import optax
    from vidi_tpu.train.optimizer import TrainHParams, make_optimizer

    cfg = DattnConfig.tiny()
    from vidi_tpu.models import dattn
    params = dattn.init_params(jax.random.PRNGKey(0), cfg, jnp.float32)
    hp = TrainHParams(total_steps=10)
    tx = optax.MultiSteps(make_optimizer(params, hp), 2)
    from vidi_tpu.train.train_step import opt_init
    state = opt_init(tx, params)
    g = jax.tree.map(jnp.ones_like, params)
    up1, state = tx.update(g, state, params)
    # first micro-step: accumulate only, no optimizer step taken
    assert all(float(jnp.abs(x).max()) == 0.0 for x in jax.tree.leaves(up1))
    assert int(state.mini_step) == 1 and int(state.gradient_step) == 0
    _, state = tx.update(g, state, params)
    # second micro-step completes one optimizer step
    assert int(state.mini_step) == 0 and int(state.gradient_step) == 1


# ---------------------------------------------------------------------------
# orbax checkpoint save / auto-resume roundtrip
# ---------------------------------------------------------------------------

def test_checkpoint_save_restore_roundtrip(tmp_path):
    import jax
    import jax.numpy as jnp
    from vidi_tpu.models import dattn
    from vidi_tpu.train.checkpoint import Checkpointer
    from vidi_tpu.train.optimizer import TrainHParams, make_optimizer
    from vidi_tpu.train.train_step import opt_init

    cfg = DattnConfig.tiny()
    params = dattn.init_params(jax.random.PRNGKey(0), cfg, jnp.float32)
    tx = make_optimizer(params, TrainHParams(total_steps=5))
    opt_state = opt_init(tx, params)

    ckpt = Checkpointer(str(tmp_path / "run"), save_total_limit=2)
    assert ckpt.latest_step() is None
    ckpt.save(3, params, opt_state)
    ckpt.save(7, params, opt_state)
    ckpt.close()

    ckpt2 = Checkpointer(str(tmp_path / "run"), save_total_limit=2)
    assert ckpt2.latest_step() == 7
    step, params_r, opt_r = ckpt2.restore(params, opt_state)
    ckpt2.close()
    assert step == 7
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(params_r)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))
    assert len(jax.tree.leaves(opt_r)) == len(jax.tree.leaves(opt_state))


def test_video_dataset_slideshow_and_text_records(tmp_path):
    """VideoConvDataset's three record types (video.py:56-84): document image
    -> slideshow frames; text-only -> zero dummies with has_image=False."""
    from PIL import Image

    Image.new("RGB", (200, 120), (9, 9, 9)).save(tmp_path / "doc.png")
    recs = [
        {"image": "doc.png",
         "conversations": [{"from": "human", "value": "<image>\nread this"},
                           {"from": "gpt", "value": "a document"}]},
        {"conversations": [{"from": "human", "value": "hi"},
                           {"from": "gpt", "value": "hello"}]},
    ]
    path = tmp_path / "data.json"
    path.write_text(json.dumps(recs))
    cfg = DattnConfig.tiny()
    ds = data_mod.VideoConvDataset(str(path), str(tmp_path), ByteTokenizer(), cfg)

    s0 = ds[0]
    assert s0["has_image"] and s0["pixels"].shape[0] > 1
    assert s0["audio_len"] == 0
    assert (s0["input_ids"] != -200).all()

    s1 = ds[1]
    assert not s1["has_image"]
    batch = data_mod.collate([s0, s1], cfg)
    assert batch["frame_counts"][1] == 0 and batch["audio_sizes"][0] == 0


def test_prefetcher_order_and_exceptions():
    from vidi_tpu.train.prefetch import Prefetcher

    assert list(Prefetcher(range(7), depth=2)) == list(range(7))
    assert list(Prefetcher(iter([]), depth=2)) == []

    def boom():
        yield 1
        yield 2
        raise ValueError("decode failed")

    it = iter(Prefetcher(boom(), depth=1))
    assert next(it) == 1 and next(it) == 2
    import pytest
    with pytest.raises(ValueError, match="decode failed"):
        next(it)


def test_tb_reporter_writes_readable_events(tmp_path):
    """--report_to tensorboard parity (finetune.sh:50-51): scalars land in
    <output_dir>/runs as TB event files and read back with the TB reader."""
    from vidi_tpu.train.tb import TBReporter

    tb = TBReporter(str(tmp_path), enabled=True)
    assert tb.enabled
    tb.report({"loss": 2.5, "learning_rate": 1e-5, "skipped": None}, step=0)
    tb.report({"loss": 2.25}, step=1)
    tb.close()

    from tensorboard.backend.event_processing.event_accumulator import (
        EventAccumulator)
    import glob
    runs = glob.glob(str(tmp_path / "runs" / "events.out.tfevents.*"))
    assert runs, "no event file written"
    acc = EventAccumulator(str(tmp_path / "runs"))
    acc.Reload()
    losses = acc.Scalars("train/loss")
    assert [e.step for e in losses] == [0, 1]
    assert abs(losses[0].value - 2.5) < 1e-6
    assert abs(acc.Scalars("train/learning_rate")[0].value - 1e-5) < 1e-9
    assert "train/skipped" not in acc.Tags()["scalars"]

    off = TBReporter(str(tmp_path), enabled=False)
    off.report({"loss": 1.0}, 0)  # no-op, no crash
    off.close()


def test_checkpoint_restore_falls_back_past_corrupt_latest(tmp_path):
    """A torn latest checkpoint (job died mid-async-save) must not brick
    auto-resume: restore() falls back to the newest READABLE step."""
    import shutil

    import jax.numpy as jnp
    from vidi_tpu.train.checkpoint import Checkpointer

    params = {"w": jnp.arange(4.0)}
    opt = {"m": jnp.zeros(4)}
    ck = Checkpointer(str(tmp_path), save_total_limit=3)
    for step in (1, 2):
        ck.save(step, {"w": params["w"] * step}, opt)
    ck.mgr.wait_until_finished()

    # corrupt step 2: delete its array data but keep the step directory
    step2 = tmp_path / "checkpoints" / "2"
    assert step2.is_dir()
    for sub in step2.iterdir():
        if sub.is_dir():
            shutil.rmtree(sub)

    ck2 = Checkpointer(str(tmp_path), save_total_limit=3)
    # the torn step is still listed — the fallback must actually trigger
    assert sorted(ck2.mgr.all_steps()) == [1, 2]
    step, got_params, _ = ck2.restore(params, opt)
    assert step == 1
    np.testing.assert_array_equal(np.asarray(got_params["w"]),
                                  np.arange(4.0) * 1)
    ck2.close()


@pytest.mark.slow
def test_frozen_stop_gradient_equivalent_under_grad_accum():
    """stop_gradient on frozen modules must not change training math: under
    optax.MultiSteps the accumulated tower grads are zeroed by the frozen
    label anyway, so params after a full GA cycle are identical — the fold
    only drops the (otherwise live) tower backward from the graph."""
    import jax
    import jax.numpy as jnp
    import optax

    from vidi_tpu.core.config import DattnConfig
    from vidi_tpu.models import dattn
    from vidi_tpu.train import data as data_mod
    from vidi_tpu.train.optimizer import TrainHParams, make_optimizer
    from vidi_tpu.train.train_step import make_batch_hw, opt_init, train_step

    cfg = DattnConfig.tiny()
    hp = TrainHParams(total_steps=10)
    batch = data_mod.synthetic_batch(cfg, b=1, t=16, n_frames=2, n_windows=1)
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    hw = make_batch_hw(cfg, 2)

    results = {}
    for frozen in ((), ("vision", "audio")):
        params = dattn.init_params(jax.random.PRNGKey(0), cfg, jnp.float32)
        tx = optax.MultiSteps(make_optimizer(params, hp), 2)
        opt_state = opt_init(tx, params)
        for i in range(2):  # one full GA cycle
            params, opt_state, _ = train_step(
                params, opt_state, batch, jax.random.PRNGKey(5),
                cfg=cfg, tx=tx, hw=hw, remat=False, frozen=frozen)
        results[frozen] = params

    ref, frz = results[()], results[("vision", "audio")]
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-7), ref, frz)
    # and the frozen towers really did not move
    init = dattn.init_params(jax.random.PRNGKey(0), cfg, jnp.float32)
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(
        np.asarray(a), np.asarray(b)), init["vision"], frz["vision"])


@pytest.mark.slow
def test_remat_modes_identical_params():
    """remat=True (full recompute), remat="dots" (matmul-saveable policy) and
    remat=False must agree to float-reassociation noise — remat only changes
    WHAT is recomputed in backward, never the math (the reference's
    gradient_checkpointing=True is the all-or-nothing form). XLA may
    re-order reductions between the schedules, so exact bit-identity is not
    guaranteed even in fp32."""
    import jax
    import jax.numpy as jnp

    from vidi_tpu.models import dattn
    from vidi_tpu.train.optimizer import TrainHParams, make_optimizer
    from vidi_tpu.train.train_step import make_batch_hw, opt_init, train_step

    cfg = DattnConfig.tiny()
    base = dattn.init_params(jax.random.PRNGKey(0), cfg, jnp.float32)
    tx = make_optimizer(base, TrainHParams(total_steps=10))
    batch = data_mod.synthetic_batch(cfg, b=1, t=16, n_frames=2, n_windows=1)
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    hw = make_batch_hw(cfg, 2)

    outs = {}
    for mode in (True, "dots", False):
        params = jax.tree.map(lambda x: x.copy(), base)  # train_step donates
        params, _, loss = train_step(
            params, opt_init(tx, params), batch, jax.random.PRNGKey(1),
            cfg=cfg, tx=tx, hw=hw, remat=mode)
        outs[mode] = (float(loss), params)

    for mode in ("dots", False):
        np.testing.assert_allclose(outs[True][0], outs[mode][0], rtol=1e-6)
        jax.tree.map(lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6),
            outs[True][1], outs[mode][1])
