"""Ring attention over the virtual CPU mesh (SURVEY §5.7 stretch).

The reference has no sequence parallelism; these tests pin our ring
implementation to the single-device attention oracle: forward allclose,
gradients allclose (the lse-cotangent path through the ring combine), and
a full sequence-parallel train step whose loss equals the unsharded one.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from graphgpt_tpu.config import MeshConfig, ModelConfig
from graphgpt_tpu.ops.attention import xla_attention
from graphgpt_tpu.parallel import mesh as mesh_lib
from graphgpt_tpu.parallel.ring_attention import (
    ring_attention_sharded,
    xla_chunk_with_lse,
)


def _inputs(b=2, p=4096, h=2, dh=16, seed=0, packed=True):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.normal(0, 1, (b, p, h, dh)), jnp.float32)
    k = jnp.asarray(rng.normal(0, 1, (b, p, h, dh)), jnp.float32)
    v = jnp.asarray(rng.normal(0, 1, (b, p, h, dh)), jnp.float32)
    if packed:
        # several packed segments + a padded tail, crossing shard boundaries
        seg = np.zeros((b, p), np.int32)
        for bi in range(b):
            bounds = np.sort(rng.choice(np.arange(1, p - 64), 5, replace=False))
            prev, sid = 0, 1
            for bd in list(bounds) + [p - 32]:  # leave 32 padding
                seg[bi, prev:bd] = sid
                prev, sid = bd, sid + 1
        seg = jnp.asarray(seg)
    else:
        seg = jnp.ones((b, p), jnp.int32)
    return q, k, v, seg


def _seq_mesh(seq=4):
    return mesh_lib.make_mesh(MeshConfig(data=2, seq=seq), jax.devices()[: 2 * seq])


def test_chunk_oracle_matches_full():
    """xla_chunk_with_lse == full attention when the chunk IS the sequence."""
    q, k, v, seg = _inputs(p=256)
    out, lse = xla_chunk_with_lse(q, k, v, seg, seg)
    ref = xla_attention(q, k, v, seg)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)
    valid = np.broadcast_to((np.asarray(seg) > 0)[:, None], lse.shape)
    assert np.isfinite(np.asarray(lse)[valid]).all()


def test_ring_forward_matches_full_mpe4096():
    q, k, v, seg = _inputs(p=4096)
    mesh = _seq_mesh(4)
    with mesh:
        out = jax.jit(
            lambda *a: ring_attention_sharded(*a, mesh=mesh)
        )(q, k, v, seg)
    ref = xla_attention(q, k, v, seg)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=3e-5, atol=3e-5)


def test_ring_gradients_match_full():
    """The lse cotangent flows through the ring combine: grads wrt q/k/v
    match the single-device oracle."""
    q, k, v, seg = _inputs(p=1024)
    mesh = _seq_mesh(4)

    def ring_loss(q, k, v):
        out = ring_attention_sharded(q, k, v, seg, mesh=mesh)
        return jnp.sum(out.astype(jnp.float32) ** 2)

    def full_loss(q, k, v):
        out = xla_attention(q, k, v, seg)
        return jnp.sum(out.astype(jnp.float32) ** 2)

    with mesh:
        g_ring = jax.jit(jax.grad(ring_loss, argnums=(0, 1, 2)))(q, k, v)
    g_full = jax.grad(full_loss, argnums=(0, 1, 2))(q, k, v)
    for gr, gf, name in zip(g_ring, g_full, "qkv"):
        np.testing.assert_allclose(
            np.asarray(gr), np.asarray(gf), rtol=2e-4, atol=2e-4, err_msg=name
        )


def test_ring_degenerate_single_shard():
    q, k, v, seg = _inputs(p=512)
    mesh = mesh_lib.make_mesh(MeshConfig(data=2, seq=1), jax.devices()[:2])
    with mesh:
        out = ring_attention_sharded(q, k, v, seg, mesh=mesh)
    ref = xla_attention(q, k, v, seg)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_sequence_parallel_train_step_matches_unsharded():
    """Full train step with attn_impl='ring' on a (data=2, seq=4) mesh:
    sharded loss equals the single-device loss on the same batch."""
    from graphgpt_tpu.models import heads

    cfg = ModelConfig(
        vocab_size=97,
        hidden_size=64,
        num_hidden_layers=2,
        head_dim=16,
        num_attention_heads=4,
        intermediate_size=128,
        stacked_feat=4,
        next_n_token=4,
        dtype="float32",
        task_type="pretrain-mlm",
        causal_attention=False,
        max_position_embeddings=256,
        attn_impl="ring",
    ).finalize()
    params = heads.init_pretrain_params(cfg, jax.random.PRNGKey(0))
    params = jax.tree_util.tree_map(lambda x: np.asarray(x), params)
    rng = np.random.default_rng(0)
    b, p, f = 4, 256, 4
    ids = rng.integers(2, cfg.vocab_size, size=(b, p, f)).astype(np.int32)
    labels = np.where(rng.random((b, p, f)) < 0.4, ids, -100).astype(np.int32)
    batch_host = {
        "input_ids": ids,
        "labels": labels,
        "position_ids": np.tile(np.arange(p, dtype=np.int32), (b, 1)),
        "segment_ids": np.ones((b, p), np.int32),
    }
    mesh = _seq_mesh(4)
    shardings = mesh_lib.named_sharding_tree(mesh, mesh_lib.param_pspecs(params))
    sp = jax.device_put(params, shardings)
    batch = mesh_lib.shard_batch(mesh, batch_host)
    with mesh:
        loss_ring = float(
            jax.jit(lambda p_, b_: heads.pretrain_forward(p_, cfg, b_)["loss"])(
                sp, batch
            )
        )
        # gradients run end to end under the ring too
        g = jax.jit(
            jax.grad(lambda p_: heads.pretrain_forward(p_, cfg, batch)["loss"])
        )(sp)
        gnorm = float(
            jnp.sqrt(
                sum(jnp.sum(x.astype(jnp.float32) ** 2) for x in jax.tree_util.tree_leaves(g))
            )
        )
    cfg1 = ModelConfig(**{**cfg.__dict__, "attn_impl": "xla"})
    single = jax.device_put(params, jax.devices()[0])
    bh = {k2: jnp.asarray(v2) for k2, v2 in batch_host.items()}
    loss_single = float(heads.pretrain_forward(single, cfg1, bh)["loss"])
    assert np.isfinite(gnorm) and gnorm > 0
    np.testing.assert_allclose(loss_ring, loss_single, rtol=2e-5, atol=2e-5)


def test_pallas_chunk_matches_oracle(monkeypatch):
    """Off-TPU the chunk kernels run in the generic Pallas interpreter
    (GGT_PALLAS_INTERPRET — the same plumbing the multichip dryrun uses),
    so this no longer skips on CPU; on-device it runs compiled."""
    if jax.default_backend() != "tpu":
        monkeypatch.setenv("GGT_PALLAS_INTERPRET", "1")
    from graphgpt_tpu.ops.flash_attention import flash_attention_chunk

    q, k, v, seg = _inputs(p=512)
    qb, kb, vb = (x.astype(jnp.bfloat16) for x in (q, k, v))
    out, lse = jax.jit(flash_attention_chunk)(qb, kb, vb, seg, seg)
    ref_out, ref_lse = xla_chunk_with_lse(q, k, v, seg, seg)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref_out), rtol=3e-2, atol=3e-2
    )
    valid = np.broadcast_to((np.asarray(seg) > 0)[:, None], ref_lse.shape)
    np.testing.assert_allclose(
        np.asarray(lse)[valid], np.asarray(ref_lse)[valid], rtol=2e-2, atol=2e-2
    )


def test_causal_ring_forward_matches_full():
    """Causal ring (NTP pretrain over the seq axis, r3 verdict item 6):
    ring-level chunk ordering (own=local-causal, earlier=bidirectional,
    later=skipped) equals the single-device causal oracle."""
    q, k, v, seg = _inputs(p=1024, seed=3)
    mesh = _seq_mesh(4)
    with mesh:
        out = jax.jit(
            lambda *a: ring_attention_sharded(*a, mesh=mesh, causal=True)
        )(q, k, v, seg)
    ref = xla_attention(q, k, v, seg, causal=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=3e-5, atol=3e-5)


def test_causal_ring_gradients_match_full():
    q, k, v, seg = _inputs(p=512, seed=4)
    mesh = _seq_mesh(4)

    def ring_loss(q, k, v):
        out = ring_attention_sharded(q, k, v, seg, mesh=mesh, causal=True)
        return jnp.sum(out.astype(jnp.float32) ** 2)

    def full_loss(q, k, v):
        out = xla_attention(q, k, v, seg, causal=True)
        return jnp.sum(out.astype(jnp.float32) ** 2)

    with mesh:
        g1 = jax.jit(jax.grad(ring_loss, argnums=(0, 1, 2)))(q, k, v)
    g2 = jax.grad(full_loss, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=5e-5, atol=5e-5)
