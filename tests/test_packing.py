"""Sample packing: block-diagonal attention equals per-sample forward.

Covers the TPU-native equivalent of the reference's varlen packing patch
(Vidi1.5_9B/vidi/model/lmm/dattn/utils.py:15-38)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vidi_tpu.constants import IGNORE_INDEX
from vidi_tpu.core.config import DattnConfig
from vidi_tpu.models import dattn, decoder
from vidi_tpu.train.packing import first_fit_pack, pack_batch, pack_rows
from vidi_tpu.train.train_step import loss_fn, make_batch_hw


def test_first_fit_pack():
    bins = first_fit_pack([5, 3, 7, 2, 4], capacity=8)
    assert sorted(i for b in bins for i in b) == [0, 1, 2, 3, 4]
    lengths = [5, 3, 7, 2, 4]
    for b in bins:
        assert sum(min(lengths[i], 8) for i in b) <= 8
    # oversize sample gets its own (truncated) bin
    assert first_fit_pack([20], capacity=8) == [[0]]


def _samples(rng, lengths, vocab=128):
    out = []
    for n in lengths:
        ids = rng.integers(3, vocab, n).astype(np.int32)
        lab = ids.copy()
        lab[: n // 2] = IGNORE_INDEX
        out.append({"input_ids": ids, "labels": lab})
    return out


def test_pack_rows_layout():
    rng = np.random.default_rng(0)
    samples = _samples(rng, [5, 3, 6])
    packed = pack_rows(samples, seq_len=9)
    # 6+3 share a row, 5 alone
    assert packed["input_ids"].shape[0] == 2
    segs = packed["segment_ids"]
    for row in range(2):
        for seg in np.unique(segs[row]):
            if seg == 0:
                continue
            where = np.where(segs[row] == seg)[0]
            # contiguous, positions restart at 0, first label IGNOREd
            assert np.array_equal(where, np.arange(where[0], where[-1] + 1))
            assert packed["positions"][row, where[0]] == 0
            assert packed["labels"][row, where[0]] == IGNORE_INDEX
    assert np.array_equal(packed["text_mask"], segs != 0)


@pytest.mark.parametrize("arch", ["gemma2", "mistral"])
def test_packed_forward_matches_per_sample(arch):
    """Hidden states of each packed segment == the same sample run alone."""
    cfg = DattnConfig.tiny(arch)
    params = dattn.init_params(jax.random.PRNGKey(0), cfg, jnp.float32)
    rng = np.random.default_rng(1)
    lengths = [7, 4, 6, 3]
    samples = _samples(rng, lengths, cfg.text.vocab_size)
    packed = pack_rows(samples, seq_len=11)

    def fwd(ids, mask, pos, segs=None):
        embeds = decoder.embed_tokens(params["text"], jnp.asarray(ids), cfg.text)
        h, _ = dattn.forward(
            params, cfg, embeds, jnp.asarray(mask), jnp.asarray(pos),
            text_segs=None if segs is None else jnp.asarray(segs))
        return np.asarray(h)

    h_packed = fwd(packed["input_ids"], packed["text_mask"],
                   packed["positions"], packed["segment_ids"])

    # map each original sample to (row, slice) in the packed layout
    for i, s in enumerate(samples):
        n = len(s["input_ids"])
        hit = None
        for row in range(packed["input_ids"].shape[0]):
            for seg in np.unique(packed["segment_ids"][row]):
                if seg == 0:
                    continue
                w = np.where(packed["segment_ids"][row] == seg)[0]
                if len(w) == n and np.array_equal(
                        packed["input_ids"][row, w], s["input_ids"]):
                    hit = (row, w)
        assert hit is not None
        row, w = hit
        ids = s["input_ids"][None]
        h_alone = fwd(ids, np.ones((1, n), bool),
                      np.arange(n, dtype=np.int32)[None])
        np.testing.assert_allclose(
            h_packed[row, w], h_alone[0], rtol=2e-5, atol=2e-5)


@pytest.mark.slow
def test_pack_batch_runs_loss_fn():
    """A packed batch flows through the standard training loss (text-only
    rows alongside the zero modality dummies)."""
    cfg = DattnConfig.tiny()
    params = dattn.init_params(jax.random.PRNGKey(0), cfg, jnp.float32)
    rng = np.random.default_rng(2)
    samples = _samples(rng, [6, 5, 4, 3], cfg.text.vocab_size)
    batch = pack_batch(samples, cfg, seq_len=12, rows_per_batch=2)
    assert batch["input_ids"].shape == (2, 12)
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    hw = make_batch_hw(cfg, 2)
    loss = loss_fn(params, cfg, batch, jax.random.PRNGKey(0), hw=hw)
    assert np.isfinite(float(loss))
    # gradients flow
    g = jax.grad(lambda p: loss_fn(p, cfg, batch, jax.random.PRNGKey(0), hw=hw))(params)
    gn = jax.tree_util.tree_reduce(
        lambda a, x: a + float(jnp.sum(jnp.abs(x))), g["text"], 0.0)
    assert np.isfinite(gn) and gn > 0
