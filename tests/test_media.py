"""Media pipeline tests: mel vs WhisperFeatureExtractor, images vs
SiglipImageProcessor, text splicing/label-masking semantics, video decode."""
import os

import numpy as np
import pytest

from vidi_tpu.core.config import AudioConfig
from vidi_tpu.constants import IGNORE_INDEX, IMAGE_TOKEN_INDEX
from vidi_tpu.media import audio as audio_mod
from vidi_tpu.media import images as images_mod
from vidi_tpu.media import text as text_mod

DUMMY_MP4 = "/root/reference/Vidi1.5_9B/dummy.mp4"


def test_mel_filter_bank_matches_hf():
    from transformers.audio_utils import mel_filter_bank as hf_fb

    want = hf_fb(
        num_frequency_bins=201, num_mel_filters=128, min_frequency=0.0,
        max_frequency=8000.0, sampling_rate=16000, norm="slaney",
        mel_scale="slaney",
    )
    got = audio_mod.mel_filter_bank(201, 128, 0.0, 8000.0, 16000)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-7)


def test_process_audio_matches_whisper_feature_extractor():
    from transformers import WhisperFeatureExtractor

    fe = WhisperFeatureExtractor(feature_size=128)
    cfg = AudioConfig()
    rng = np.random.default_rng(0)
    wave = (rng.standard_normal(16000 * 40) * 0.1).astype(np.float32)  # 40 s

    # reference chunking: 30-s windows, each featurized padded
    chunks = [wave[i: i + fe.n_samples] for i in range(0, len(wave), fe.n_samples)]
    hf = fe(chunks, sampling_rate=16000, return_tensors="np",
            return_token_timestamps=True)
    want = hf.input_features
    want_len = int(hf.num_frames.sum())

    got, got_len = audio_mod.process_audio(wave, cfg)
    assert got.shape == want.shape == (2, 128, 3000)
    assert got_len == want_len
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_preprocess_frames_matches_siglip_processor():
    from transformers import SiglipImageProcessor
    from PIL import Image

    proc = SiglipImageProcessor(size={"height": 384, "width": 384})
    rng = np.random.default_rng(1)
    raw = rng.integers(0, 256, (240, 320, 3), dtype=np.uint8)
    img = Image.fromarray(raw)

    # reference "resize" policy: PIL bicubic to 384x384 THEN processor
    resized = img.resize((384, 384), resample=Image.BICUBIC)
    want = proc.preprocess(resized, return_tensors="np")["pixel_values"][0]
    want = np.transpose(want, (1, 2, 0))  # NCHW -> HWC

    got = images_mod.preprocess_frames_resize([img], 384)[0]
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_device_normalize_matches_host_path():
    """Default inference path: host PIL resize (uint8 out) + device
    normalize == the old host float path, elementwise."""
    import jax.numpy as jnp
    from vidi_tpu.ops.preprocess import normalize_uint8

    rng = np.random.default_rng(2)
    raw = [rng.integers(0, 256, (120, 160, 3), dtype=np.uint8)
           for _ in range(3)]
    want = images_mod.preprocess_frames_resize(raw, 64)
    u8 = images_mod.resize_frames_uint8(raw, 64)
    got = np.asarray(normalize_uint8(jnp.asarray(u8), 0.5, 0.5))
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def test_device_resize_close_to_pil():
    """Full device path (--device-resize): jax antialiased Keys-cubic vs PIL
    bicubic — same kernel family, agree to a few LSB in pixel units."""
    import jax.numpy as jnp
    from vidi_tpu.ops.preprocess import preprocess_uint8

    rng = np.random.default_rng(3)
    # smooth-ish image: random low-res upsampled (resize kernels only differ
    # meaningfully near Nyquist; pure noise overstates the gap)
    low = rng.integers(0, 256, (30, 40, 3), dtype=np.uint8)
    from PIL import Image
    raw = np.asarray(Image.fromarray(low).resize((320, 240), Image.BILINEAR))
    want = images_mod.preprocess_frames_resize([raw], 96)[0]
    got = np.asarray(preprocess_uint8(jnp.asarray(raw)[None], 96, 0.5, 0.5)[0])
    # normalized units: 1 pixel LSB == 2/255 ~ 0.0078
    assert np.abs(got - want).mean() < 0.01
    assert np.abs(got - want).max() < 0.08


def test_frame_tokens_uint8_dispatch_matches_float():
    """dattn._frame_tokens dtype dispatch: uint8 frames (device normalize)
    produce the same tokens as host-normalized float frames."""
    import jax
    import jax.numpy as jnp
    from vidi_tpu.core.config import DattnConfig
    from vidi_tpu.models import dattn

    cfg = DattnConfig.tiny()
    params = dattn.init_params(jax.random.PRNGKey(0), cfg, jnp.float32)
    rng = np.random.default_rng(4)
    s = cfg.vision.image_size
    u8 = rng.integers(0, 256, (2, s, s, 3), dtype=np.uint8)
    f32 = images_mod.preprocess_frames_resize(list(u8), s)
    hw = (2, 2)
    got = np.asarray(dattn.frame_tokens_chunk(
        params, jnp.asarray(u8), cfg=cfg, hw=hw))
    want = np.asarray(dattn.frame_tokens_chunk(
        params, jnp.asarray(f32), cfg=cfg, hw=hw))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_tokenizer_image_token_splice():
    tok = text_mod.ByteTokenizer()
    ids = text_mod.tokenizer_image_token("<image>\nhi", tok)
    # bos, IMAGE_TOKEN_INDEX, '\n', 'h', 'i'
    assert ids[0] == tok.bos_token_id
    assert ids[1] == IMAGE_TOKEN_INDEX
    assert len(ids) == 5
    # no image token
    ids2 = text_mod.tokenizer_image_token("hi", tok)
    assert IMAGE_TOKEN_INDEX not in ids2


def test_chat_template_and_targets():
    tok = text_mod.ByteTokenizer()
    conv = [
        {"from": "human", "value": "<image>\nwhere is the cat?"},
        {"from": "gpt", "value": "0.1-0.2"},
    ]
    s = text_mod.chat_template_gemma2(conv, generation=False)
    assert s.startswith("<start_of_turn>user\n")
    assert "<start_of_turn>model\n0.1-0.2<end_of_turn>\n" in s
    gen = text_mod.preprocess_chat([conv[0]], tok)
    assert gen.endswith("<start_of_turn>model\n")

    out = text_mod.preprocess_conv(conv, tok, has_image=True)
    ids, labels = out["input_ids"], out["labels"]
    assert len(ids) == len(labels)
    # some positions supervised (the answer), instruction masked
    assert (labels == IGNORE_INDEX).any()
    sup = labels[labels != IGNORE_INDEX]
    assert len(sup) > 0
    # supervised ids decode to (a suffix of) the answer + end marker
    assert IMAGE_TOKEN_INDEX in ids


def test_targets_mismatch_falls_back_to_all_ignore(capsys):
    tok = text_mod.ByteTokenizer()
    conv = "<start_of_turn>user\nq<end_of_turn>\n<start_of_turn>model\na<end_of_turn>\n"
    ids = np.asarray(tok(conv).input_ids)
    # corrupt: drop tokens so the length bookkeeping can't line up
    bad = ids[:5]
    labels = text_mod.targets_gemma2(conv, bad, tok, has_image=False)
    assert (labels == IGNORE_INDEX).all()


@pytest.mark.skipif(not os.path.exists(DUMMY_MP4), reason="reference media absent")
def test_load_video_and_audio_dummy_mp4():
    from vidi_tpu.media import video as video_mod

    dur, fps, nf, w, h = video_mod.probe(DUMMY_MP4)
    assert 20 < dur < 30 and nf > 300
    frames = video_mod.load_video(DUMMY_MP4, fps=1.0)
    # stride = round(16/1) = 16 -> ceil(394/16) = 25 frames
    assert len(frames) == int(np.ceil(nf / round(fps)))
    assert frames[0].shape == (h, w, 3)
    aud = video_mod.load_audio(DUMMY_MP4)
    assert abs(len(aud) / 16000 - dur) < 1.0


@pytest.mark.skipif(not os.path.exists(DUMMY_MP4), reason="reference media absent")
def test_native_and_cv2_frames_agree():
    from vidi_tpu.media import video as video_mod

    if not video_mod._load_native():
        pytest.skip("native decoder not built")
    idx = np.asarray([0, 16, 32], np.int64)
    native = video_mod.load_video(DUMMY_MP4, fps=1.0)[:3]
    cv2_frames = video_mod._load_video_cv2(DUMMY_MP4, idx)
    for a, b in zip(native, cv2_frames):
        # different YUV->RGB rounding paths; allow small differences
        diff = np.abs(a.astype(int) - b.astype(int)).mean()
        assert diff < 3.0, diff


def test_task_prompts_and_parsers():
    from vidi_tpu.infer.tasks import (
        build_task_prompt, parse_chapters, parse_highlights, parse_mcq)

    assert "time segments" in build_task_prompt("tr", "a red car.")
    assert "percentage" in build_task_prompt("tr", "x", mm_version="v1",
                                             length=12.5)
    assert "bounding box" in build_task_prompt("stg", "the dog")
    assert "chapters" in build_task_prompt("chapter")
    assert "highlights" in build_task_prompt("highlight", "goals")
    mcq = build_task_prompt("mcq", "What color?", options=["red", "blue"])
    assert "A. red" in mcq and "B. blue" in mcq

    chs = parse_chapters("0.000-0.250 Intro\n0.250-1.000: Main part", 100.0)
    assert chs == [{"start": 0.0, "end": 25.0, "title": "Intro"},
                   {"start": 25.0, "end": 100.0, "title": "Main part"}]
    assert parse_highlights("0.100-0.200, 0.900-0.950", 100.0) == [
        (10.0, 20.0), (90.0, 95.0)]
    assert parse_mcq("<answer> B </answer>") == "B"


def test_encode_media_streaming_matches_batch():
    """The overlapped streaming encode (decode||transfer||tower per chunk)
    must produce the same features as the decode-everything-first path."""
    import jax
    import jax.numpy as jnp

    from vidi_tpu.core.config import DattnConfig
    from vidi_tpu.infer import pipeline
    from vidi_tpu.models import dattn

    cfg = DattnConfig.tiny()
    params = dattn.init_params(jax.random.PRNGKey(0), cfg, jnp.float32)
    ref = pipeline.encode_media(params, cfg, DUMMY_MP4)
    got = pipeline.encode_media(params, cfg, DUMMY_MP4, stream_chunk=7)
    for r, g in zip(ref, got):
        np.testing.assert_allclose(np.asarray(g, np.float32),
                                   np.asarray(r, np.float32),
                                   rtol=2e-5, atol=2e-5)


def test_stream_video_matches_load_video_both_backends():
    from vidi_tpu.media import video as V

    ref = np.stack(V.load_video(DUMMY_MP4, fps=1.0))
    got = np.concatenate(list(V.stream_video(DUMMY_MP4, fps=1.0, chunk=7)))
    np.testing.assert_array_equal(got, ref)
    # force the cv2 fallback
    lib = V._native
    try:
        V._native = False
        got2 = np.concatenate(list(V.stream_video(DUMMY_MP4, fps=1.0, chunk=7)))
    finally:
        V._native = lib
    np.testing.assert_array_equal(got2, ref)


def test_stream_video_time_range_dup_indices():
    """linspace time_range sampling (fps > native fps) produces duplicate
    frame indices; tiny chunks put cap boundaries inside the dup runs —
    the stream must still bit-match load_video on both backends."""
    from vidi_tpu.media import video as V

    tr = (2.0, 8.0)
    ref = np.stack(V.load_video(DUMMY_MP4, fps=10.0, time_range=tr))
    for chunk in (1, 3, 8):
        got = np.concatenate(
            list(V.stream_video(DUMMY_MP4, fps=10.0, chunk=chunk, time_range=tr)))
        np.testing.assert_array_equal(got, ref)
    lib = V._native
    try:
        V._native = False
        got = np.concatenate(
            list(V.stream_video(DUMMY_MP4, fps=10.0, chunk=3, time_range=tr)))
    finally:
        V._native = lib
    np.testing.assert_array_equal(got, ref)
