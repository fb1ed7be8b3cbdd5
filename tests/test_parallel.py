"""Sequence-parallel attention on the virtual 8-device CPU mesh:
ring cross-attention and Ulysses head-sharded cross-attention must match the
single-device jnp reference exactly (up to fp tolerance)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vidi_tpu.core.mesh import make_mesh
from vidi_tpu.ops.attention import cross_attention
from vidi_tpu.parallel.ring_attention import ring_cross_attention
from vidi_tpu.parallel.ulysses import (
    expand_kv,
    heads_to_seq,
    seq_to_heads,
    ulysses_cross_attention_sharded,
)


def _mesh(data=2, seq=4):
    return make_mesh(jax.devices()[: data * seq], data=data, seq=seq, model=1)


def _qkv(b=2, t=16, s=64, hq=8, hk=4, d=32, seed=0):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.standard_normal((b, t, hq, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, s, hk, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, s, hk, d)), jnp.float32)
    mask = jnp.asarray(rng.random((b, s)) > 0.3)
    return q, k, v, mask


def test_ring_cross_attention_matches_reference():
    mesh = _mesh()
    q, k, v, mask = _qkv()
    want = cross_attention(q, k, v, kv_valid=mask, scale=0.125, softcap=50.0)
    got = ring_cross_attention(q, k, v, mask, mesh, sm_scale=0.125, softcap=50.0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_ring_cross_attention_fully_masked_shard():
    """A shard whose entire KV block is masked must not poison the merge."""
    mesh = _mesh()
    q, k, v, mask = _qkv()
    mask = np.array(mask)
    mask[:, :16] = False  # first ring shard (s=64 over seq=4 -> 16 per shard)
    mask = jnp.asarray(mask)
    want = cross_attention(q, k, v, kv_valid=mask, scale=0.125)
    got = ring_cross_attention(q, k, v, mask, mesh, sm_scale=0.125)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.slow
def test_ring_cross_attention_grads_flow():
    mesh = _mesh()
    q, k, v, mask = _qkv(t=8, s=32)

    def loss_ring(q, k, v):
        return jnp.sum(ring_cross_attention(q, k, v, mask, mesh, sm_scale=0.125) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(cross_attention(q, k, v, kv_valid=mask, scale=0.125) ** 2)

    g_ring = jax.grad(loss_ring, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_ring, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=5e-4)


def test_ulysses_cross_attention_matches_reference():
    mesh = _mesh(data=2, seq=4)
    q, k, v, mask = _qkv()
    want = cross_attention(q, k, v, kv_valid=mask, scale=0.125, softcap=50.0)
    got = ulysses_cross_attention_sharded(
        q, k, v, mask, mesh, sm_scale=0.125, softcap=50.0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_seq_heads_all_to_all_roundtrip():
    from jax.sharding import PartitionSpec as P

    mesh = _mesh(data=1, seq=8)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 32, 8, 4)), jnp.float32)

    def body(x_):
        h = seq_to_heads(x_, "seq")   # [B, S, H/8, D]
        assert h.shape == (2, 32, 1, 4)
        return heads_to_seq(h, "seq")

    out = jax.shard_map(body, mesh=mesh,
                        in_specs=P(None, "seq", None, None),
                        out_specs=P(None, "seq", None, None))(x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x))


def test_expand_kv_replicates_heads():
    rng = np.random.default_rng(0)
    k = jnp.asarray(rng.standard_normal((1, 8, 2, 4)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((1, 8, 2, 4)), jnp.float32)
    k2, v2 = expand_kv(k, v, num_kv_heads=2, sp_size=8)
    assert k2.shape == (1, 8, 8, 4)
    np.testing.assert_allclose(np.asarray(k2[:, :, 0]), np.asarray(k2[:, :, 3]))
    np.testing.assert_allclose(np.asarray(k2[:, :, 0]), np.asarray(k[:, :, 0]))


def test_forward_ring_matches_gspmd():
    """Full Dattn forward with sp_mode='ring' must match the GSPMD path on a
    seq-sharded mesh."""
    import dataclasses
    from vidi_tpu.core.config import DattnConfig
    from vidi_tpu.models import dattn, decoder
    from vidi_tpu.parallel import sharding

    cfg = DattnConfig.tiny()
    params = dattn.init_params(jax.random.PRNGKey(0), cfg, jnp.float32)
    rng = np.random.default_rng(0)
    b, t = 2, 8
    ids = jnp.asarray(rng.integers(3, cfg.text.vocab_size, (b, t)), jnp.int32)
    mask = jnp.ones((b, t), bool)
    positions = jnp.broadcast_to(jnp.arange(t, dtype=jnp.int32)[None], (b, t))
    d = cfg.text.hidden_size
    img = jnp.asarray(rng.standard_normal((b, 32, d)), jnp.float32)
    img_mask = jnp.asarray(rng.random((b, 32)) > 0.2)
    embeds = decoder.embed_tokens(params["text"], ids, cfg.text)

    mesh = _mesh(data=2, seq=4)
    with sharding.use_mesh(mesh):
        h_ref, _ = jax.jit(lambda p, e: dattn.forward(
            p, cfg, e, mask, positions, img=img, img_mask=img_mask))(params, embeds)
        h_ring, _ = jax.jit(lambda p, e: dattn.forward(
            p, cfg, e, mask, positions, img=img, img_mask=img_mask,
            sp_mode="ring"))(params, embeds)
    np.testing.assert_allclose(np.asarray(h_ring), np.asarray(h_ref),
                               rtol=2e-4, atol=2e-4)


def test_generate_matches_under_seq_mesh():
    """Full generate (prefill + decode while_loop) with the modality stream
    sharded over the seq mesh axis must emit the same greedy tokens as the
    single-device run — the multi-chip long-video inference configuration
    (BASELINE config: 'chunked prefill + ring/sequence-parallel attention';
    reference analog: ulysses_attn.py head-sharded cross-attention)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from vidi_tpu.core.config import DattnConfig
    from vidi_tpu.infer.generate import generate
    from vidi_tpu.models import dattn
    from vidi_tpu.parallel import sharding

    cfg = DattnConfig.tiny()
    params = dattn.init_params(jax.random.PRNGKey(0), cfg, jnp.float32)
    rng = np.random.default_rng(1)
    b, t, s = 2, 8, 32
    d = cfg.text.hidden_size
    ids = jnp.asarray(rng.integers(3, cfg.text.vocab_size, (b, t)), jnp.int32)
    mask = jnp.ones((b, t), bool)
    img = jnp.asarray(rng.standard_normal((b, s, d)), jnp.float32)
    img_mask = jnp.asarray(rng.random((b, s)) > 0.2)

    ref = generate(params, cfg, ids, mask, img=img, img_mask=img_mask,
                   max_new_tokens=6, eos_id=1)

    mesh = _mesh(data=2, seq=4)
    with sharding.use_mesh(mesh):
        sh = lambda a, spec: jax.device_put(a, NamedSharding(mesh, spec))
        got = generate(
            params, cfg,
            sh(ids, P("data", None)), sh(mask, P("data", None)),
            img=sh(img, P("data", "seq", None)),
            img_mask=sh(img_mask, P("data", "seq")),
            max_new_tokens=6, eos_id=1)
    np.testing.assert_array_equal(np.asarray(got.tokens), np.asarray(ref.tokens))
    np.testing.assert_array_equal(np.asarray(got.lengths), np.asarray(ref.lengths))


def test_prefill_caches_shard_over_seq_axis():
    """Memory-scaling proof for the >single-chip-HBM regime (hour-long 9B):
    the modality KV caches built by prefill must actually be PARTITIONED over
    the mesh's seq axis — per-device shard bytes = global / seq — not
    replicated. This is the documented path past the single-chip int8
    envelope (reference analog: ulysses_attn.py shards work, DeepSpeed holds
    caches per-rank; here GSPMD partitions the [L, B, Hk, S, D] caches)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from vidi_tpu.core.config import DattnConfig
    from vidi_tpu.models import dattn, decoder
    from vidi_tpu.parallel import sharding

    cfg = DattnConfig.tiny()
    params = dattn.init_params(jax.random.PRNGKey(0), cfg, jnp.float32)
    rng = np.random.default_rng(2)
    b, t, s = 2, 8, 32
    d = cfg.text.hidden_size
    ids = jnp.asarray(rng.integers(3, cfg.text.vocab_size, (b, t)), jnp.int32)
    mask = jnp.ones((b, t), bool)
    img = jnp.asarray(rng.standard_normal((b, s, d)), jnp.float32)
    img_mask = jnp.ones((b, s), bool)

    mesh = _mesh(data=2, seq=4)
    with sharding.use_mesh(mesh):
        sh = lambda a, spec: jax.device_put(a, NamedSharding(mesh, spec))
        params_m = sharding.shard_params(params, mesh)

        @jax.jit
        def prefill(params, ids, mask, img, img_mask):
            positions = jnp.maximum(jnp.cumsum(mask, axis=1) - 1, 0)
            h = decoder.embed_tokens(params["text"], ids, cfg.text)
            _, caches = dattn.forward(
                params, cfg, h, mask, positions.astype(jnp.int32),
                img=img, img_mask=img_mask, return_caches=True)
            return caches

        caches = prefill(params_m, sh(ids, P("data", None)),
                         sh(mask, P("data", None)),
                         sh(img, P("data", "seq", None)),
                         sh(img_mask, P("data", "seq")))
        for name in ("img_k", "img_v"):
            arr = getattr(caches, name)
            # [L, B, Hk, S, D]: S axis split seq-ways, B split data-ways
            shard = arr.sharding.shard_shape(arr.shape)
            assert shard[3] == arr.shape[3] // 4, (name, shard, arr.shape)
            assert shard[1] == arr.shape[1] // 2, (name, shard, arr.shape)


@pytest.mark.slow  # heavy integration; fast gate keeps a representative
def test_image_train_step_under_mesh():
    """Image-mode training (encode_images loss branch) compiles and runs
    under a (data, seq) mesh with FSDP-sharded params — the image-conv
    analog of the video dryrun."""
    import dataclasses

    from vidi_tpu.core.config import DattnConfig
    from vidi_tpu.models import dattn
    from vidi_tpu.parallel import sharding
    from vidi_tpu.train import data as data_mod
    from vidi_tpu.train.optimizer import TrainHParams, make_optimizer
    from vidi_tpu.train.train_step import make_batch_hw, opt_init, train_step

    from jax.sharding import NamedSharding, PartitionSpec as P

    cfg = dataclasses.replace(DattnConfig.tiny(), mm_input_type="image")
    mesh = _mesh(data=2, seq=4)
    with sharding.use_mesh(mesh):
        params = dattn.init_params(jax.random.PRNGKey(0), cfg, jnp.float32)
        params = sharding.shard_params(params, mesh)
        hp = TrainHParams(total_steps=4)
        tx = make_optimizer(params, hp)
        opt_state = opt_init(tx, params)
        batch = data_mod.synthetic_image_batch(cfg, b=2, t=16)
        batch = {k: jax.device_put(
            jnp.asarray(v), NamedSharding(
                mesh, P("data", *([None] * (np.asarray(v).ndim - 1)))))
            for k, v in batch.items()}
        params, opt_state, loss = train_step(
            params, opt_state, batch, jax.random.PRNGKey(1), cfg=cfg, tx=tx,
            hw=make_batch_hw(cfg, 1), remat=True)
        assert np.isfinite(float(loss))


@pytest.mark.slow  # heavy integration; fast gate keeps a representative
def test_forward_ulysses_matches_gspmd():
    """Full Dattn forward with sp_mode='ulysses' (the reference's explicit
    head-reshard plan, ulysses_attn.py:165-207, as a real all-to-all) must
    match the GSPMD path on a seq-sharded mesh — and its gradients must
    match too (the a2a/dynamic-slice plan is trained through in the
    reference's finetune)."""
    from vidi_tpu.core.config import DattnConfig
    from vidi_tpu.models import dattn, decoder
    from vidi_tpu.parallel import sharding

    cfg = DattnConfig.tiny()
    params = dattn.init_params(jax.random.PRNGKey(0), cfg, jnp.float32)
    rng = np.random.default_rng(0)
    b, t = 2, 8
    ids = jnp.asarray(rng.integers(3, cfg.text.vocab_size, (b, t)), jnp.int32)
    mask = jnp.ones((b, t), bool)
    positions = jnp.broadcast_to(jnp.arange(t, dtype=jnp.int32)[None], (b, t))
    d = cfg.text.hidden_size
    img = jnp.asarray(rng.standard_normal((b, 32, d)), jnp.float32)
    img_mask = jnp.asarray(rng.random((b, 32)) > 0.2)
    embeds = decoder.embed_tokens(params["text"], ids, cfg.text)

    mesh = _mesh(data=2, seq=4)
    with sharding.use_mesh(mesh):
        h_ref, _ = jax.jit(lambda p, e: dattn.forward(
            p, cfg, e, mask, positions, img=img, img_mask=img_mask))(params, embeds)
        h_uly, _ = jax.jit(lambda p, e: dattn.forward(
            p, cfg, e, mask, positions, img=img, img_mask=img_mask,
            sp_mode="ulysses"))(params, embeds)
        np.testing.assert_allclose(np.asarray(h_uly), np.asarray(h_ref),
                                   rtol=2e-4, atol=2e-4)

        def loss(p, mode):
            h, _ = dattn.forward(p, cfg, embeds, mask, positions, img=img,
                                 img_mask=img_mask, sp_mode=mode)
            return jnp.sum(h.astype(jnp.float32) ** 2)

        g_ref = jax.jit(jax.grad(loss), static_argnums=1)(params, "gspmd")
        g_uly = jax.jit(jax.grad(loss), static_argnums=1)(params, "ulysses")
    flat_ref = jax.tree_util.tree_leaves_with_path(g_ref)
    flat_uly = jax.tree_util.tree_leaves(g_uly)
    for (path, a), bb in zip(flat_ref, flat_uly):
        np.testing.assert_allclose(
            np.asarray(bb), np.asarray(a), rtol=5e-3, atol=5e-3,
            err_msg=jax.tree_util.keystr(path))
