"""The Pallas compute path under a sharded mesh (parallel/kernel_sharding).

Round-4 verdict Missing #1: the kernels (flash attention, fused MLP,
norm-fused MLP, RMSNorm adjoint) were invoked bare inside jax.jit, so
GSPMD had to all-gather their sharded operands on a real mesh. These
tests run the REAL kernel dispatch (generic Pallas interpreter,
GGT_PALLAS_INTERPRET=1) over virtual CPU meshes and assert:

  - kernel wrappers == plain XLA math, forward AND grads, under dp x fsdp
    meshes (the shipping multi-chip configuration);
  - the full pretrain forward: sharded-with-kernels loss/grads ==
    unsharded XLA loss/grads;
  - the compiled HLO contains NO all-gather of a full-length activation
    (weight gathers — FSDP's gather-for-compute — are expected);
  - tensor>1 meshes fall back LOUDLY to the XLA path with correct
    numerics (kernel_sharding module docstring note 2: jax 0.9 corrupts
    gradients around ANY manual region when tensor-sharded weights exist
    in the graph — `test_jax_tensor_sharded_shardmap_canary` demonstrates
    the upstream bug and XPASSes when a jax upgrade fixes it);
  - non-divisible shapes fall back to XLA with a warning, not an error.

Reference bar: SDPA runs shard-local on every rank under DDP/ZeRO
(reference src/training/pipeline.py:152-157, misc_utils.py:511-515).
"""

from __future__ import annotations

import copy

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from graphgpt_tpu.config import MeshConfig
from graphgpt_tpu.parallel import kernel_sharding as ks
from graphgpt_tpu.parallel import mesh as mesh_lib


@pytest.fixture(autouse=True)
def _interpret_kernels(monkeypatch):
    monkeypatch.setenv("GGT_PALLAS_INTERPRET", "1")


def _mesh(data=2, fsdp=4, tensor=1):
    return mesh_lib.make_mesh(
        MeshConfig(data=data, fsdp=fsdp, tensor=tensor), jax.devices()[:8]
    )


def _rand(key, *shape):
    # 0.1 scale keeps sums-of-squares O(1-100) so rtol comparisons aren't
    # dominated by f32 reduction-order noise between kernel and XLA GEMMs
    return 0.1 * jax.random.normal(jax.random.PRNGKey(key), shape, jnp.float32)


def _worst(ref_grads, got_grads):
    worst = 0.0
    for a, b in zip(
        jax.tree_util.tree_leaves(ref_grads), jax.tree_util.tree_leaves(got_grads)
    ):
        a, b = np.asarray(a), np.asarray(b)
        worst = max(worst, float(np.abs(b - a).max() / (np.abs(a).max() + 1e-12)))
    return worst


# ---------------------------------------------------------------------------
# Unit wrappers (dp x fsdp mesh — the kernel-sharded configuration)
# ---------------------------------------------------------------------------
@pytest.mark.parametrize("tensor", [1, 2])
def test_sharded_mlp_matches_xla(tensor):
    """tensor=1: shard_map'd kernel; tensor=2: loud XLA fallback. Both must
    match the unsharded XLA math, grads included."""
    from graphgpt_tpu.ops.mlp import xla_mlp

    n, d, dff = 64, 32, 128
    x, wg, wu, wd = _rand(0, n, d), _rand(1, d, dff), _rand(2, d, dff), _rand(3, dff, d)
    ref, ref_grads = jax.value_and_grad(
        lambda *a: jnp.sum(xla_mlp(*a, "gelu") ** 2), argnums=(0, 1, 2, 3)
    )(x, wg, wu, wd)
    mesh = _mesh(data=2, fsdp=4 // tensor, tensor=tensor)
    with mesh:
        got, got_grads = jax.jit(
            jax.value_and_grad(
                lambda *a: jnp.sum(ks.mlp(*a, "gelu") ** 2), argnums=(0, 1, 2, 3)
            )
        )(x, wg, wu, wd)
    assert np.allclose(float(got), float(ref), rtol=1e-5)
    assert _worst(ref_grads, got_grads) < 2e-4


def test_sharded_norm_mlp_matches_xla():
    from graphgpt_tpu.models.modeling import rms_norm
    from graphgpt_tpu.ops.mlp import xla_mlp

    n, d, dff = 64, 32, 128
    x, wn = _rand(0, n, d), jnp.abs(_rand(4, d)) + 0.5
    wg, wu, wd = _rand(1, d, dff), _rand(2, d, dff), _rand(3, dff, d)

    def ref_fn(x, wn, wg, wu, wd):
        return jnp.sum((x + xla_mlp(rms_norm(x, wn, 1e-6), wg, wu, wd, "gelu")) ** 2)

    ref, ref_grads = jax.value_and_grad(ref_fn, argnums=(0, 1, 2, 3, 4))(
        x, wn, wg, wu, wd
    )
    with _mesh():
        got, got_grads = jax.jit(
            jax.value_and_grad(
                lambda *a: jnp.sum(ks.norm_mlp(*a, 1e-6, "gelu") ** 2),
                argnums=(0, 1, 2, 3, 4),
            )
        )(x, wn, wg, wu, wd)
    assert np.allclose(float(got), float(ref), rtol=1e-5)
    assert _worst(ref_grads, got_grads) < 2e-4


@pytest.mark.parametrize("causal", [False, True])
def test_sharded_flash_matches_xla(causal):
    from graphgpt_tpu.ops.attention import xla_attention

    b, p, h, dh = 8, 128, 4, 32
    q, k, v = _rand(0, b, p, h, dh), _rand(1, b, p, h, dh), _rand(2, b, p, h, dh)
    rng = np.random.default_rng(0)
    seg = np.zeros((b, p), np.int32)
    for r in range(b):
        pos, sid = 0, 1
        while pos < p:
            ln = min(int(rng.integers(8, 40)), p - pos)
            seg[r, pos : pos + ln] = sid
            pos += ln
            sid += 1
    seg = jnp.asarray(seg)

    def ref_fn(q, k, v):
        return jnp.sum(xla_attention(q, k, v, seg, causal=causal) ** 2)

    ref, ref_grads = jax.value_and_grad(ref_fn, argnums=(0, 1, 2))(q, k, v)
    with _mesh():
        got, got_grads = jax.jit(
            jax.value_and_grad(
                lambda q, k, v: jnp.sum(
                    ks.flash_attention(q, k, v, seg, causal=causal) ** 2
                ),
                argnums=(0, 1, 2),
            )
        )(q, k, v)
    assert np.allclose(float(got), float(ref), rtol=1e-4), (float(got), float(ref))
    assert _worst(ref_grads, got_grads) < 1e-3


def test_sharded_norm_qkv_matches_xla():
    from graphgpt_tpu.models.modeling import rms_norm

    n, d = 64, 32
    x, wn = _rand(0, n, d), jnp.abs(_rand(4, d)) + 0.5
    wq, wk, wv = _rand(1, d, d), _rand(2, d, d), _rand(3, d, d)

    def ref_fn(x, wn, wq, wk, wv):
        h = rms_norm(x, wn, 1e-6)
        return jnp.sum((h @ wq) ** 2) + jnp.sum((h @ wk) ** 2) + jnp.sum((h @ wv) ** 2)

    ref, ref_grads = jax.value_and_grad(ref_fn, argnums=(0, 1, 2, 3, 4))(
        x, wn, wq, wk, wv
    )
    with _mesh():
        def got_fn(x, wn, wq, wk, wv):
            q, k, v = ks.norm_qkv(x, wn, wq, wk, wv, 1e-6)
            return jnp.sum(q**2) + jnp.sum(k**2) + jnp.sum(v**2)

        got, got_grads = jax.jit(
            jax.value_and_grad(got_fn, argnums=(0, 1, 2, 3, 4))
        )(x, wn, wq, wk, wv)
    assert np.allclose(float(got), float(ref), rtol=1e-5)
    assert _worst(ref_grads, got_grads) < 2e-4


def test_sharded_rmsnorm_bwd_matches_xla():
    """rms_norm(pallas_bwd=True): the Pallas adjoint runs shard-local
    (kernel_sharding.rmsnorm_bwd wraps it; dw psummed over token axes)."""
    from graphgpt_tpu.models import modeling

    n, d = 64, 32
    x, w = _rand(0, n, d), jnp.abs(_rand(1, d)) + 0.5

    def ref_fn(x, w):
        return jnp.sum(modeling._rms_norm_ref(x, w, 1e-6) ** 2)

    ref, ref_grads = jax.value_and_grad(ref_fn, argnums=(0, 1))(x, w)
    with _mesh():
        got, got_grads = jax.jit(
            jax.value_and_grad(
                lambda x, w: jnp.sum(modeling.rms_norm(x, w, 1e-6, True) ** 2),
                argnums=(0, 1),
            )
        )(x, w)
    assert np.allclose(float(got), float(ref), rtol=1e-5)
    assert _worst(ref_grads, got_grads) < 2e-4


def test_norm_qkv_tensor_mesh_avoids_shard_map():
    """tensor>1: norm_qkv must take the XLA path — a shard_map manual
    region here (no cp variant exists for the qkv kernel) would trigger
    the jax gradient-corruption bug (kernel_sharding module note 2)."""
    from graphgpt_tpu.models.modeling import rms_norm

    n, d = 64, 32
    x, wn = _rand(0, n, d), jnp.abs(_rand(4, d)) + 0.5
    wq, wk, wv = _rand(1, d, d), _rand(2, d, d), _rand(3, d, d)

    def ref_fn(x, wn, wq, wk, wv):
        h = rms_norm(x, wn, 1e-6)
        return jnp.sum((h @ wq) ** 2) + jnp.sum((h @ wk) ** 2) + jnp.sum((h @ wv) ** 2)

    ref, ref_grads = jax.value_and_grad(ref_fn, argnums=(0, 1, 2, 3, 4))(
        x, wn, wq, wk, wv
    )
    with _mesh(data=2, fsdp=2, tensor=2):
        def got_fn(x, wn, wq, wk, wv):
            q, k, v = ks.norm_qkv(x, wn, wq, wk, wv, 1e-6)
            return jnp.sum(q**2) + jnp.sum(k**2) + jnp.sum(v**2)

        got, got_grads = jax.jit(
            jax.value_and_grad(got_fn, argnums=(0, 1, 2, 3, 4))
        )(x, wn, wq, wk, wv)
    assert np.allclose(float(got), float(ref), rtol=1e-5)
    assert _worst(ref_grads, got_grads) < 2e-4


def test_rmsnorm_bwd_tensor_mesh_returns_none():
    """tensor>1: rmsnorm_bwd would place a shard_map INSIDE a custom_vjp
    backward — the exact corrupting position of module note 2 — so it must
    decline (None) and the caller's XLA adjoint must stay grad-exact."""
    from graphgpt_tpu.models import modeling

    n, d = 64, 32
    x, w = _rand(0, n, d), jnp.abs(_rand(1, d)) + 0.5
    g = _rand(2, n, d)

    def ref_fn(x, w):
        return jnp.sum(modeling._rms_norm_ref(x, w, 1e-6) ** 2)

    ref, ref_grads = jax.value_and_grad(ref_fn, argnums=(0, 1))(x, w)
    with _mesh(data=2, fsdp=2, tensor=2):
        assert ks.rmsnorm_bwd(x, g, w, 1e-6) is None
        got, got_grads = jax.jit(
            jax.value_and_grad(
                lambda x, w: jnp.sum(modeling.rms_norm(x, w, 1e-6, True) ** 2),
                argnums=(0, 1),
            )
        )(x, w)
    assert np.allclose(float(got), float(ref), rtol=1e-5)
    assert _worst(ref_grads, got_grads) < 2e-4


# ---------------------------------------------------------------------------
# Fallbacks
# ---------------------------------------------------------------------------
def test_non_divisible_falls_back_to_xla():
    from graphgpt_tpu.ops.mlp import xla_mlp

    n, d, dff = 30, 32, 128  # 30 tokens don't divide the 8-way token axes
    x, wg, wu, wd = _rand(0, n, d), _rand(1, d, dff), _rand(2, d, dff), _rand(3, dff, d)
    ref = xla_mlp(x, wg, wu, wd, "gelu")
    ks._warned.clear()
    with _mesh(), pytest.warns(UserWarning, match="falling back"):
        got = jax.jit(lambda *a: ks.mlp(*a, "gelu"))(x, wg, wu, wd)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_tensor_parallel_runs_cp_mlp():
    """tensor>1: the MLP kernels keep running via custom_partitioning
    (module docstring note 2) — correct fwd AND grads, no warning;
    GGT_TP_KERNELS=0 forces the loud XLA fallback."""
    from graphgpt_tpu.ops.mlp import xla_mlp

    n, d, dff = 64, 32, 128
    x, wg, wu, wd = _rand(0, n, d), _rand(1, d, dff), _rand(2, d, dff), _rand(3, dff, d)
    ref, ref_grads = jax.value_and_grad(
        lambda *a: jnp.sum(xla_mlp(*a, "gelu") ** 2), argnums=(0, 1, 2, 3)
    )(x, wg, wu, wd)
    with _mesh(data=2, fsdp=2, tensor=2):
        got, got_grads = jax.jit(
            jax.value_and_grad(
                lambda *a: jnp.sum(ks.mlp(*a, "gelu") ** 2), argnums=(0, 1, 2, 3)
            )
        )(x, wg, wu, wd)
    assert np.allclose(float(got), float(ref), rtol=1e-5)
    assert _worst(ref_grads, got_grads) < 2e-4


def test_tensor_parallel_flash_falls_back_loudly():
    """tensor>1 flash: a cp op inside a custom_vjp bwd re-triggers the jax
    bug, so attention routes to XLA there — loudly."""
    from graphgpt_tpu.ops.attention import xla_attention

    b, p, h, dh = 8, 64, 4, 16
    q, k, v = _rand(0, b, p, h, dh), _rand(1, b, p, h, dh), _rand(2, b, p, h, dh)
    seg = jnp.ones((b, p), jnp.int32)
    ref = xla_attention(q, k, v, seg)
    ks._warned.clear()
    with _mesh(data=2, fsdp=2, tensor=2), pytest.warns(UserWarning, match="tensor=2"):
        got = jax.jit(lambda q, k, v: ks.flash_attention(q, k, v, seg))(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-5)


def test_tp_kernels_env_escape_hatch():
    from graphgpt_tpu.ops.mlp import xla_mlp
    import os

    n, d, dff = 64, 32, 128
    x, wg, wu, wd = _rand(0, n, d), _rand(1, d, dff), _rand(2, d, dff), _rand(3, dff, d)
    ref = xla_mlp(x, wg, wu, wd, "gelu")
    ks._warned.clear()
    os.environ["GGT_TP_KERNELS"] = "0"
    try:
        with _mesh(data=2, fsdp=2, tensor=2), pytest.warns(
            UserWarning, match="GGT_TP_KERNELS"
        ):
            got = jax.jit(lambda *a: ks.mlp(*a, "gelu"))(x, wg, wu, wd)
    finally:
        os.environ.pop("GGT_TP_KERNELS", None)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_seq_sharded_flash_falls_back():
    """seq-parallel meshes must not reach the flash kernel (ring handles
    them); the wrapper falls back to GSPMD-partitioned XLA attention."""
    from graphgpt_tpu.ops.attention import xla_attention

    b, p, h, dh = 4, 64, 2, 16
    q, k, v = _rand(0, b, p, h, dh), _rand(1, b, p, h, dh), _rand(2, b, p, h, dh)
    seg = jnp.ones((b, p), jnp.int32)
    mesh = mesh_lib.make_mesh(MeshConfig(data=2, seq=4), jax.devices()[:8])
    ref = xla_attention(q, k, v, seg)
    ks._warned.clear()
    with mesh, pytest.warns(UserWarning, match="ring"):
        got = jax.jit(lambda q, k, v: ks.flash_attention(q, k, v, seg))(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-5)


def test_no_mesh_is_bare_kernel_call():
    """Without a mesh context the wrapper is the bare kernel (numerics
    pinned by the existing kernel tests; here just parity vs XLA)."""
    from graphgpt_tpu.ops.mlp import xla_mlp

    n, d, dff = 64, 32, 128
    x, wg, wu, wd = _rand(0, n, d), _rand(1, d, dff), _rand(2, d, dff), _rand(3, dff, d)
    got = jax.jit(lambda *a: ks.mlp(*a, "gelu"))(x, wg, wu, wd)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(xla_mlp(x, wg, wu, wd, "gelu")), rtol=1e-5,
        atol=1e-5,
    )


# ---------------------------------------------------------------------------
# Full model: sharded kernels == unsharded XLA, and the HLO audit
# ---------------------------------------------------------------------------
def _tiny_cfg():
    from graphgpt_tpu.config import ModelConfig

    cfg = ModelConfig(
        vocab_size=120,
        hidden_size=64,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=4,
        head_dim=16,
        intermediate_size=256,
        stacked_feat=3,
        next_n_token=3,
        mask_token_id=1,
        task_type="pretrain-mlm",
        causal_attention=False,
        max_position_embeddings=128,
        dtype="float32",
        remat=True,
        remat_policy="save_attn",
        mlp_kernel="on",
        attn_impl="pallas",
    )
    return cfg.finalize()


def _tiny_batch(b, p, f, vocab):
    rng = np.random.default_rng(0)
    ids = rng.integers(2, vocab, size=(b, p, f)).astype(np.int32)
    labels = np.where(rng.random((b, p, f)) < 0.5, ids, -100).astype(np.int32)
    seg = np.ones((b, p), np.int32)
    seg[:, p // 2 :] = 2
    return {
        "input_ids": ids,
        "labels": labels,
        "position_ids": np.tile(np.arange(p, dtype=np.int32), (b, 1)),
        "segment_ids": seg,
        "wgt": np.ones((b,), np.float32),
    }


def _full_model_compare(mesh):
    from graphgpt_tpu.models import heads

    cfg = _tiny_cfg()
    params = heads.init_pretrain_params(cfg, jax.random.PRNGKey(0))
    params = jax.tree_util.tree_map(np.asarray, params)
    b, p = 8, 128
    batch = _tiny_batch(b, p, cfg.stacked_feat, cfg.vocab_size)

    cfg_x = copy.deepcopy(cfg)
    cfg_x.mlp_kernel = "off"
    cfg_x.attn_impl = "xla"
    ref_loss, ref_grads = jax.jit(
        jax.value_and_grad(lambda pr, bt: heads.pretrain_forward(pr, cfg_x, bt)["loss"])
    )(params, batch)

    sp = jax.device_put(
        params, mesh_lib.named_sharding_tree(mesh, mesh_lib.param_pspecs(params))
    )
    sb = mesh_lib.shard_batch(mesh, batch)
    with mesh:
        got_loss, got_grads = jax.jit(
            jax.value_and_grad(
                lambda pr, bt: heads.pretrain_forward(pr, cfg, bt)["loss"]
            )
        )(sp, sb)
    assert abs(float(got_loss) - float(ref_loss)) < 1e-4 * max(
        1.0, abs(float(ref_loss))
    )
    assert _worst(ref_grads, got_grads) < 5e-3


def test_full_model_sharded_kernels_match_unsharded_xla():
    """dp x fsdp mesh: the REAL kernel dispatch (shard_map'd Pallas, grads
    via the explicit-backward custom_vjp wrappers) == unsharded XLA."""
    _full_model_compare(_mesh())


def test_full_model_tensor_mesh_cp_kernels_correct():
    """dp x fsdp x tp mesh: the MLP kernels run via custom_partitioning
    and flash falls back to XLA — full-model loss AND grads still match
    the unsharded reference (verified at flagship 768-dims too in the
    round-5 drills)."""
    ks._warned.clear()
    _full_model_compare(_mesh(data=2, fsdp=2, tensor=2))


def test_hlo_has_no_activation_allgather():
    """Compiled HLO of the sharded-kernel loss+grad: weight all-gathers
    (FSDP) exist, activation all-gathers don't."""
    from graphgpt_tpu.models import heads

    cfg = _tiny_cfg()
    params = heads.init_pretrain_params(cfg, jax.random.PRNGKey(0))
    b, p = 8, 128
    batch = _tiny_batch(b, p, cfg.stacked_feat, cfg.vocab_size)
    mesh = _mesh()
    sp = jax.device_put(
        params, mesh_lib.named_sharding_tree(mesh, mesh_lib.param_pspecs(params))
    )
    sb = mesh_lib.shard_batch(mesh, batch)
    with mesh:
        compiled = (
            jax.jit(
                jax.value_and_grad(
                    lambda pr, bt: heads.pretrain_forward(pr, cfg, bt)["loss"]
                )
            )
            .lower(sp, sb)
            .compile()
        )
    txt = compiled.as_text()
    assert txt.count("all-gather") > 0, "expected FSDP weight gathers in HLO"
    bad = ks.find_activation_allgathers(txt, b * p, b, p)
    assert not bad, f"activations all-gathered:\n" + "\n".join(bad[:5])


def test_find_activation_allgathers_catches_violation():
    """The scanner itself: a synthetic all-gather of a [B*P, D] activation
    is flagged; a weight gather isn't."""
    good = "  %ag = f32[64,256]{1,0} all-gather(f32[16,256]{1,0} %w), dims={0}"
    bad_tok = "  %ag.1 = f32[1024,64]{1,0} all-gather(f32[256,64]{1,0} %x), dims={0}"
    bad_bp = "  %ag.2 = f32[8,128,64]{2,1,0} all-gather(f32[2,128,64]{2,1,0} %x), dims={0}"
    txt = "\n".join([good, bad_tok, bad_bp])
    found = ks.find_activation_allgathers(txt, 1024, 8, 128)
    assert len(found) == 2


# ---------------------------------------------------------------------------
# Upstream-bug canary
# ---------------------------------------------------------------------------
@pytest.mark.xfail(
    strict=False,
    reason="jax 0.9 partitioner bug: an IDENTITY shard_map (fwd x*1.0, "
    "explicit custom_vjp bwd g*1.0) on the activation path corrupts the "
    "gradients of surrounding XLA-autodiffed code whenever TENSOR-SHARDED "
    "weights exist in the graph (both GSPMD and Shardy; forward exact). "
    "When this test XPASSes, a jax upgrade fixed it — Megatron tp bodies "
    "can return to kernel_sharding (git history of this file has them).",
)
def test_jax_tensor_sharded_shardmap_canary():
    """Minimal trigger (at flagship dims): embed gather (tensor-sharded
    table) -> rmsnorm -> gelu MLP (tensor-sharded weights) -> residual ->
    IDENTITY shard_map -> linear probe loss. One layer, no custom kernels
    anywhere; the same model without the identity shard_map (or with
    dp/fsdp-only sharding) is grad-exact to 1e-6."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from graphgpt_tpu.models.modeling import rms_norm

    mesh = _mesh(data=2, fsdp=2, tensor=2)
    b, p, d, dff, V = 8, 128, 768, 3072, 754
    n = b * p
    rng = np.random.default_rng(0)
    T = jnp.asarray((0.02 * rng.standard_normal((V, d))).astype(np.float32))
    ids = jnp.asarray(rng.integers(0, V, size=(b, p)).astype(np.int32))
    R = jnp.asarray(rng.standard_normal((n, d)).astype(np.float32))
    wn = jnp.ones((d,), jnp.float32)
    w1 = jnp.asarray((0.02 * rng.standard_normal((d, dff))).astype(np.float32))
    w2 = jnp.asarray((0.02 * rng.standard_normal((dff, d))).astype(np.float32))
    TOK = P(("data", "fsdp", "seq"), None)
    ident = jax.shard_map(
        lambda t: t * 1.0, mesh=mesh, in_specs=(TOK,), out_specs=TOK,
        check_vma=False,
    )

    @jax.custom_vjp
    def f(t):
        return ident(t)

    f.defvjp(lambda t: (f(t), None), lambda _, g: (ident(g),))

    def model(use_sm, T, w1, w2):
        x = T[ids].reshape(n, d)
        h = jax.nn.gelu(rms_norm(x, wn, 1e-6) @ w1) @ w2
        out = x + h
        if use_sm:
            out = f(out)
        return jnp.sum(out * R)

    ref_grads = jax.grad(lambda *a: model(False, *a), argnums=(0, 1, 2))(T, w1, w2)
    Ts = jax.device_put(T, NamedSharding(mesh, P("fsdp", "tensor")))
    w1s = jax.device_put(w1, NamedSharding(mesh, P("fsdp", "tensor")))
    w2s = jax.device_put(w2, NamedSharding(mesh, P("tensor", "fsdp")))
    with mesh:
        got_grads = jax.jit(
            jax.grad(lambda *a: model(True, *a), argnums=(0, 1, 2))
        )(Ts, w1s, w2s)
    assert _worst(ref_grads, got_grads) < 1e-4, (
        "identity shard_map corrupted surrounding gradients"
    )
