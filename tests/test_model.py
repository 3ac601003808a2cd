"""Model core: shapes, masking semantics, loss kernels, gradients."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from graphgpt_tpu.config import ModelConfig
from graphgpt_tpu.models import heads, modeling
from graphgpt_tpu.ops import losses
from graphgpt_tpu.ops.attention import xla_attention


def small_cfg(**kw) -> ModelConfig:
    cfg = ModelConfig(
        vocab_size=100,
        hidden_size=64,
        num_hidden_layers=2,
        head_dim=16,
        num_attention_heads=4,
        intermediate_size=128,
        stacked_feat=5,
        next_n_token=5,
        mask_token_id=1,
        dtype="float32",
    )
    if kw.get("causal_attention"):
        cfg.task_type = "pretrain"  # pretrain-mlm forces bidirectional
    for k, v in kw.items():
        setattr(cfg, k, v)
    return cfg.finalize()


def run_pretrain(params, cfg, batch, rng=None, train=False):
    if rng is None:
        fn = jax.jit(lambda p, b: heads.pretrain_forward(p, cfg, b, train=train))
        return fn(params, batch)
    fn = jax.jit(lambda p, b, r: heads.pretrain_forward(p, cfg, b, rng=r, train=train))
    return fn(params, batch, rng)


def run_task(params, cfg, batch):
    fn = jax.jit(lambda p, b: heads.task_forward(p, cfg, b))
    return fn(params, batch)


def make_batch(cfg, b=2, p=16, seed=0):
    rng = np.random.default_rng(seed)
    ids = rng.integers(2, cfg.vocab_size, size=(b, p, cfg.stacked_feat)).astype(np.int32)
    labels = np.where(rng.random((b, p, cfg.stacked_feat)) < 0.3, ids, -100).astype(np.int32)
    return {
        "input_ids": jnp.asarray(ids),
        "labels": jnp.asarray(labels),
        "position_ids": jnp.tile(jnp.arange(p), (b, 1)),
        "segment_ids": jnp.ones((b, p), jnp.int32),
        "wgt": jnp.ones((b,), jnp.float32),
    }


def test_forward_shapes():
    cfg = small_cfg()
    params = heads.init_pretrain_params(cfg, jax.random.PRNGKey(0))
    batch = make_batch(cfg)
    out = run_pretrain(params, cfg, batch)
    assert out["hidden_states"].shape == (2, 16, 64)
    assert np.isfinite(float(out["loss"]))


def test_rms_norm_matches_manual():
    x = jnp.asarray(np.random.default_rng(0).normal(size=(3, 7)), jnp.float32)
    w = jnp.asarray(np.random.default_rng(1).normal(size=(7,)), jnp.float32)
    got = modeling.rms_norm(x, w, 1e-6)
    want = x / np.sqrt((np.asarray(x) ** 2).mean(-1, keepdims=True) + 1e-6) * np.asarray(w)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5)


def test_causal_masking_blocks_future():
    cfg = small_cfg(causal_attention=True)
    params = heads.init_pretrain_params(cfg, jax.random.PRNGKey(0))
    batch = make_batch(cfg)
    h1 = run_pretrain(params, cfg, batch)["hidden_states"]
    batch2 = dict(batch)
    ids2 = np.asarray(batch["input_ids"]).copy()
    ids2[:, -1] = 3  # change only the last position
    batch2["input_ids"] = jnp.asarray(ids2)
    h2 = run_pretrain(params, cfg, batch2)["hidden_states"]
    np.testing.assert_allclose(
        np.asarray(h1[:, :-1]), np.asarray(h2[:, :-1]), rtol=2e-4, atol=2e-5
    )
    assert not np.allclose(np.asarray(h1[:, -1]), np.asarray(h2[:, -1]))


def test_bidirectional_sees_future():
    cfg = small_cfg(causal_attention=False)
    params = heads.init_pretrain_params(cfg, jax.random.PRNGKey(0))
    batch = make_batch(cfg)
    h1 = run_pretrain(params, cfg, batch)["hidden_states"]
    ids2 = np.asarray(batch["input_ids"]).copy()
    ids2[:, -1] = 3
    batch2 = dict(batch)
    batch2["input_ids"] = jnp.asarray(ids2)
    h2 = run_pretrain(params, cfg, batch2)["hidden_states"]
    assert not np.allclose(np.asarray(h1[:, 0]), np.asarray(h2[:, 0]))


def test_segment_isolation():
    """Packed segments must not attend across segment boundaries."""
    cfg = small_cfg(causal_attention=False)
    params = heads.init_pretrain_params(cfg, jax.random.PRNGKey(0))
    batch = make_batch(cfg, b=1, p=16)
    seg = np.ones((1, 16), np.int32)
    seg[:, 8:] = 2
    batch["segment_ids"] = jnp.asarray(seg)
    h1 = run_pretrain(params, cfg, batch)["hidden_states"]
    ids2 = np.asarray(batch["input_ids"]).copy()
    ids2[:, 12] = 5  # perturb segment 2 only
    batch2 = dict(batch)
    batch2["input_ids"] = jnp.asarray(ids2)
    h2 = run_pretrain(params, cfg, batch2)["hidden_states"]
    np.testing.assert_allclose(
        np.asarray(h1[:, :8]), np.asarray(h2[:, :8]), rtol=2e-4, atol=2e-5
    )
    assert not np.allclose(np.asarray(h1[:, 8:]), np.asarray(h2[:, 8:]))


def test_padding_rows_ignored():
    cfg = small_cfg()
    params = heads.init_pretrain_params(cfg, jax.random.PRNGKey(0))
    batch = make_batch(cfg, b=1, p=16)
    seg = np.ones((1, 16), np.int32)
    seg[:, 12:] = 0  # padding
    batch["segment_ids"] = jnp.asarray(seg)
    labels = np.asarray(batch["labels"]).copy()
    labels[:, 12:] = -100
    batch["labels"] = jnp.asarray(labels)
    h1 = run_pretrain(params, cfg, batch)
    ids2 = np.asarray(batch["input_ids"]).copy()
    ids2[:, 13] = 7  # change padding content
    batch2 = dict(batch)
    batch2["input_ids"] = jnp.asarray(ids2)
    h2 = run_pretrain(params, cfg, batch2)
    np.testing.assert_allclose(
        np.asarray(h1["hidden_states"][:, :12]),
        np.asarray(h2["hidden_states"][:, :12]),
        rtol=2e-4,
        atol=2e-5,
    )
    np.testing.assert_allclose(float(h1["loss"]), float(h2["loss"]), rtol=1e-5)


def test_chunked_ce_matches_direct():
    rng = np.random.default_rng(0)
    b, p, d, n, v = 2, 8, 16, 3, 50
    hidden = jnp.asarray(rng.normal(size=(b, p, d)), jnp.float32)
    labels = jnp.asarray(rng.integers(-1, v, size=(b, p, n)), jnp.int32)
    labels = jnp.where(labels < 0, -100, labels)
    proj = jnp.asarray(rng.normal(size=(d, n * d)) * 0.1, jnp.float32)
    lm = jnp.asarray(rng.normal(size=(d, v)) * 0.1, jnp.float32)
    got = losses.chunked_stacked_ce(hidden, labels, proj, lm, chunk=4)
    # direct computation
    h = (hidden @ proj).reshape(b, p, n, d)
    logits = h @ lm
    lse = jax.nn.logsumexp(logits, axis=-1)
    safe = jnp.maximum(labels, 0)
    picked = jnp.take_along_axis(logits, safe[..., None], -1)[..., 0]
    ce = lse - picked
    valid = (labels != -100).astype(jnp.float32)
    want = float(jnp.sum(ce * valid) / jnp.sum(valid))
    np.testing.assert_allclose(float(got), want, rtol=1e-5)


def test_dlm_weighted_ce_normalization():
    rng = np.random.default_rng(0)
    b, p, d, n, v = 2, 8, 16, 3, 50
    hidden = jnp.asarray(rng.normal(size=(b, p, d)), jnp.float32)
    labels = jnp.asarray(rng.integers(0, v, size=(b, p, n)), jnp.int32)
    proj = jnp.asarray(rng.normal(size=(d, n * d)) * 0.1, jnp.float32)
    lm = jnp.asarray(rng.normal(size=(d, v)) * 0.1, jnp.float32)
    w = jnp.full((b, p, n), 2.0, jnp.float32)
    got = losses.chunked_stacked_ce(
        hidden, labels, proj, lm, token_wgt=w, dlm_normalizer=float(b * p * n), chunk=4
    )
    base = losses.chunked_stacked_ce(hidden, labels, proj, lm, chunk=4)
    # all-valid labels, uniform wgt=2: sum(2*ce)/(bpn) = 2*mean(ce)
    np.testing.assert_allclose(float(got), 2 * float(base), rtol=1e-5)


def test_gradients_finite():
    cfg = small_cfg()
    params = heads.init_pretrain_params(cfg, jax.random.PRNGKey(0))
    batch = make_batch(cfg)

    def loss_fn(p):
        return heads.pretrain_forward(p, cfg, batch, rng=jax.random.PRNGKey(1), train=True)["loss"]

    grads = jax.jit(jax.grad(loss_fn))(params)
    flat, _ = jax.tree_util.tree_flatten(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in flat)
    # embedding grad should be nonzero
    assert float(jnp.abs(grads["embed_tokens"]).sum()) > 0


def test_smtp_inside():
    cfg = small_cfg(smtp_inside=True)
    params = heads.init_pretrain_params(cfg, jax.random.PRNGKey(0))
    batch = make_batch(cfg)
    batch["node_idx"] = jnp.asarray(
        np.random.default_rng(0).integers(0, 16, size=(2, 16)), jnp.int32
    )
    del batch["labels"], batch["wgt"]
    out = run_pretrain(params, cfg, batch, rng=jax.random.PRNGKey(2), train=True)
    assert np.isfinite(float(out["loss"]))


def test_task_regression():
    cfg = small_cfg(
        task_type="graph",
        problem_type="regression",
        loss_type="l1",
        num_labels=1,
        next_n_token=1,
    )
    params = heads.init_task_params(cfg, jax.random.PRNGKey(0))
    batch = make_batch(cfg)
    del batch["labels"], batch["wgt"]
    batch["graph_labels"] = jnp.asarray([[5.0], [4.0]], jnp.float32)
    out = run_task(params, cfg, batch)
    assert out["task_logits"].shape == (2, 1)
    assert np.isfinite(float(out["loss"]))


def test_task_multilabel_nan_masking():
    cfg = small_cfg(
        task_type="graph",
        problem_type="multi_label_classification",
        num_labels=4,
        next_n_token=1,
    )
    params = heads.init_task_params(cfg, jax.random.PRNGKey(0))
    batch = make_batch(cfg)
    del batch["labels"], batch["wgt"]
    y = np.asarray([[1, 0, np.nan, 1], [0, np.nan, np.nan, 0]], np.float32)
    batch["graph_labels"] = jnp.asarray(y)
    out = run_task(params, cfg, batch)
    assert np.isfinite(float(out["loss"]))


def test_gqa_attention():
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(1, 8, 4, 16)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(1, 8, 2, 16)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(1, 8, 2, 16)), jnp.float32)
    seg = jnp.ones((1, 8), jnp.int32)
    out = xla_attention(q, k, v, seg)
    assert out.shape == (1, 8, 4, 16)
    # heads 0,1 share kv head 0 -> identical outputs if q identical
    q2 = q.at[:, :, 1].set(q[:, :, 0])
    out2 = xla_attention(q2, k, v, seg)
    np.testing.assert_allclose(np.asarray(out2[:, :, 0]), np.asarray(out2[:, :, 1]), rtol=1e-5)


def test_droppath_layerscale_paths():
    cfg = small_cfg(path_dropout=0.2, layer_scale_init_value=0.1)
    params = heads.init_pretrain_params(cfg, jax.random.PRNGKey(0))
    assert "ls1" in params["layers"]
    batch = make_batch(cfg)
    out = run_pretrain(params, cfg, batch, rng=jax.random.PRNGKey(3), train=True)
    assert np.isfinite(float(out["loss"]))


@pytest.mark.parametrize(
    "scaling",
    [
        None,
        {"rope_type": "linear", "factor": 4.0},
        {"rope_type": "dynamic", "factor": 4.0},
        {"rope_type": "yarn", "factor": 4.0, "original_max_position_embeddings": 1024},
        {
            "rope_type": "yarn",
            "factor": 8.0,
            "original_max_position_embeddings": 1024,
            "beta_fast": 48.0,
            "beta_slow": 2.0,
            "attention_factor": 1.3,
        },
        {
            "rope_type": "llama3",
            "factor": 8.0,
            "original_max_position_embeddings": 1024,
            "low_freq_factor": 1.0,
            "high_freq_factor": 4.0,
        },
    ],
)
def test_rope_scaling_matches_hf(scaling):
    """rope_scaling passthrough parity vs transformers' own init functions
    (the reference forwards these configs verbatim into HF Llama,
    configuration_graphgpt.py:321-334)."""
    from graphgpt_tpu.models.rope import scaled_inv_freq

    transformers = pytest.importorskip("transformers")
    from transformers.modeling_rope_utils import ROPE_INIT_FUNCTIONS

    cfg_hf = transformers.LlamaConfig(
        hidden_size=768,
        num_attention_heads=12,
        max_position_embeddings=4096,
        rope_theta=10000.0,
        rope_scaling=dict(scaling) if scaling else None,
    )
    rope_type = (scaling or {}).get("rope_type", "default")
    hf_inv, hf_att = ROPE_INIT_FUNCTIONS[rope_type](cfg_hf, device="cpu")
    ours, att = scaled_inv_freq(64, 10000.0, scaling, 4096)
    np.testing.assert_allclose(np.asarray(hf_inv), ours, rtol=1e-6)
    assert abs(float(hf_att) - att) < 1e-6


def test_rope_scaling_model_forward():
    cfg = small_cfg(
        rope_scaling={"rope_type": "yarn", "factor": 4.0, "original_max_position_embeddings": 64}
    )
    params = heads.init_pretrain_params(cfg, jax.random.PRNGKey(0))
    batch = make_batch(cfg)
    out = run_pretrain(params, cfg, batch)
    assert np.isfinite(float(out["loss"]))


def test_reset_position_ids_row_max_normalisation():
    """rope_range rescaling divides by each row's own max position + 1 and
    keeps fractional values (reference reset_pos_ids, utils_graphgpt.py:583-590)."""
    from graphgpt_tpu.models.rope import reset_position_ids

    pos = jnp.array([[0, 1, 2, 3], [0, 2, 4, 7]], jnp.int32)
    out = np.asarray(reset_position_ids(pos, rope_range=128, mpe=1024))
    assert out.dtype == np.float32
    np.testing.assert_allclose(out[0], np.array([0, 1, 2, 3]) * 128.0 / 4.0)
    np.testing.assert_allclose(out[1], np.array([0, 2, 4, 7]) * 128.0 / 8.0)
    # disabled when rope_range <= 0
    same = np.asarray(reset_position_ids(pos, rope_range=0, mpe=1024))
    np.testing.assert_array_equal(same, np.asarray(pos))


def test_rope_3d_interleaves_axes():
    """3D rotary (reference RotaryEmbedding3D, utils_graphgpt.py:465-550):
    signed exponent range and x/y/z interleaving across frequency slots."""
    from graphgpt_tpu.models.rope import rope_3d_cos_sin

    dh, base = 16, 10000.0
    pos = jnp.array(
        [[[1.0, 2.0, 3.0], [4.0, 0.0, 5.0]]], jnp.float32
    )  # [1, 2, 3]
    cos, sin = rope_3d_cos_sin(pos, dh, base)
    assert cos.shape == (1, 2, dh) and sin.shape == (1, 2, dh)
    # direct reimplementation of the reference math
    start = -(dh // 2)
    freq = 1.0 / (base ** (np.arange(start, start + dh, 2, dtype=np.float64) / dh))
    expand = int(np.ceil((dh // 2) / 3.0))
    p = np.asarray(pos)  # [1,2,3]
    tiled = np.repeat(p[:, :, None, :], expand, axis=2).reshape(1, 2, -1)[
        :, :, : dh // 2
    ]
    freqs = tiled * freq[None, None, :]
    emb = np.concatenate([freqs, freqs], axis=-1)
    np.testing.assert_allclose(np.asarray(cos), np.cos(emb), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(sin), np.sin(emb), rtol=1e-5, atol=1e-6)
    # frequency magnitudes span base^{1/2} .. ~base^{-1/2} (signed range)
    assert freq.max() > 1.0 > freq.min()


def test_step_pos_emb_table():
    """Additive step-position table (reference get_step_pos_emb,
    utils_graphgpt.py:553-571): 2π/period angles, (cos,sin) interleaved."""
    from graphgpt_tpu.models.rope import step_pos_emb

    dim, mpe = 8, 16
    tab = step_pos_emb(dim, mpe)
    assert tab.shape == (mpe, dim)
    periods = np.arange(1, dim // 2 + 1, dtype=np.float64)
    ang = np.arange(mpe)[:, None] * (2 * np.pi / periods)[None, :]
    np.testing.assert_allclose(tab[:, 0::2], np.cos(ang), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(tab[:, 1::2], np.sin(ang), rtol=1e-5, atol=1e-6)
    # period-1 column is constant (whole cycles at every integer step)
    np.testing.assert_allclose(tab[:, 0], 1.0, atol=1e-5)


def test_fused_embed_sum_matches_reference_path():
    """_embed_lookup_sum (no [B,P,F,D] materialisation) == table[ids].sum(-2)
    forward AND backward (count-matrix dW vs broadcast/one-hot dW)."""
    import numpy as np

    from graphgpt_tpu.models.modeling import _embed_lookup_sum

    rng = np.random.default_rng(0)
    vocab, d, b, p, f = 97, 32, 2, 16, 5
    table = jnp.asarray(rng.normal(0, 1, (vocab, d)), jnp.float32)
    ids = jnp.asarray(rng.integers(0, vocab, (b, p, f)), jnp.int32)
    cot = jnp.asarray(rng.normal(0, 1, (b, p, d)), jnp.float32)

    def fused(t):
        return jnp.sum(_embed_lookup_sum(t, ids) * cot)

    def ref(t):
        return jnp.sum(jnp.sum(t[ids], axis=-2) * cot)

    np.testing.assert_allclose(float(fused(table)), float(ref(table)), rtol=1e-6)
    g_fused = jax.grad(fused)(table)
    g_ref = jax.grad(ref)(table)
    np.testing.assert_allclose(
        np.asarray(g_fused), np.asarray(g_ref), rtol=1e-5, atol=1e-5
    )


def test_rms_norm_custom_vjp_matches_autodiff():
    """The fused RMSNorm adjoint equals plain autodiff through the
    f32-upcast reference (forward is the identical expression)."""
    import jax
    import jax.numpy as jnp

    from graphgpt_tpu.models import modeling as M

    rng = np.random.default_rng(0)
    for dtype in (jnp.float32, jnp.bfloat16):
        x = jnp.asarray(rng.normal(size=(4, 16, 64)), dtype)
        w = jnp.asarray(rng.normal(1.0, 0.1, size=(64,)), jnp.float32)

        y1 = M._rms_norm_vjp(x, w, 1e-6)
        y2 = M._rms_norm_ref(x, w, 1e-6)
        np.testing.assert_array_equal(np.asarray(y1), np.asarray(y2))

        def loss_custom(x, w):
            return jnp.sum(M._rms_norm_vjp(x, w, 1e-6).astype(jnp.float32) ** 2)

        def loss_ref(x, w):
            return jnp.sum(M._rms_norm_ref(x, w, 1e-6).astype(jnp.float32) ** 2)

        g1 = jax.grad(loss_custom, argnums=(0, 1))(x, w)
        g2 = jax.grad(loss_ref, argnums=(0, 1))(x, w)
        # association differs (mean-of-products vs summed chain rule)
        tol = 2e-5 if dtype == jnp.float32 else 2e-2
        for a, b in zip(g1, g2):
            np.testing.assert_allclose(
                np.asarray(a, np.float32), np.asarray(b, np.float32),
                rtol=tol, atol=tol,
            )


def test_fused_mlp_matches_xla():
    """ops/mlp.fused_mlp (Pallas fwd + hand adjoint) == the plain XLA MLP:
    forward allclose (erf via the A-S rational approx, |err|<=1.5e-7) and
    gradients allclose for x and the f32 master weights."""
    import jax
    import jax.numpy as jnp
    from jax.experimental.pallas import tpu as pltpu

    from graphgpt_tpu.ops import mlp as M

    rng = np.random.default_rng(0)
    n, dm, dff = 64, 32, 128
    for act in ("gelu", "gelu_new", "silu"):
        x = jnp.asarray(rng.normal(size=(n, dm)) * 0.5, jnp.float32)
        wg = jnp.asarray(rng.normal(size=(dm, dff)) * 0.2, jnp.float32)
        wu = jnp.asarray(rng.normal(size=(dm, dff)) * 0.2, jnp.float32)
        wd = jnp.asarray(rng.normal(size=(dff, dm)) * 0.2, jnp.float32)

        with pltpu.force_tpu_interpret_mode():
            y1 = M.fused_mlp(x, wg, wu, wd, act)
        y2 = M.xla_mlp(x, wg, wu, wd, act)
        np.testing.assert_allclose(
            np.asarray(y1), np.asarray(y2), rtol=2e-5, atol=2e-5
        )

        def loss1(x, wg, wu, wd):
            return jnp.sum(M.fused_mlp(x, wg, wu, wd, act) ** 2)

        def loss2(x, wg, wu, wd):
            return jnp.sum(M.xla_mlp(x, wg, wu, wd, act) ** 2)

        with pltpu.force_tpu_interpret_mode():
            g1 = jax.grad(loss1, argnums=(0, 1, 2, 3))(x, wg, wu, wd)
        g2 = jax.grad(loss2, argnums=(0, 1, 2, 3))(x, wg, wu, wd)
        for a, b in zip(g1, g2):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=5e-4, atol=5e-4
            )


def test_rmsnorm_pallas_bwd_matches_plain():
    """The fused Pallas RMSNorm adjoint == the plain-XLA adjoint."""
    import jax
    import jax.numpy as jnp
    from jax.experimental.pallas import tpu as pltpu

    from graphgpt_tpu.models import modeling as M

    rng = np.random.default_rng(1)
    for dtype in (jnp.float32, jnp.bfloat16):
        x = jnp.asarray(rng.normal(size=(96, 64)), dtype)
        w = jnp.asarray(rng.normal(1.0, 0.1, size=(64,)), jnp.float32)

        def loss(pallas_bwd):
            def f(x, w):
                return jnp.sum(
                    M._rms_norm_vjp(x, w, 1e-6, pallas_bwd).astype(jnp.float32) ** 2
                )

            return f

        g_plain = jax.grad(loss(False), argnums=(0, 1))(x, w)
        with pltpu.force_tpu_interpret_mode():
            g_pallas = jax.grad(loss(True), argnums=(0, 1))(x, w)
        tol = 2e-5 if dtype == jnp.float32 else 2e-2
        for a, b in zip(g_pallas, g_plain):
            np.testing.assert_allclose(
                np.asarray(a, np.float32), np.asarray(b, np.float32),
                rtol=tol, atol=tol,
            )


def test_fused_norm_mlp_matches_composition():
    """fused_norm_mlp == x + xla_mlp(rms_norm(x)) with matching grads."""
    import jax
    import jax.numpy as jnp
    from jax.experimental.pallas import tpu as pltpu

    from graphgpt_tpu.models import modeling as Mo
    from graphgpt_tpu.ops import mlp as M

    rng = np.random.default_rng(2)
    n, dm, dff = 64, 32, 128
    x = jnp.asarray(rng.normal(size=(n, dm)) * 0.5, jnp.float32)
    wn = jnp.asarray(rng.normal(1.0, 0.1, size=(dm,)), jnp.float32)
    wg = jnp.asarray(rng.normal(size=(dm, dff)) * 0.2, jnp.float32)
    wu = jnp.asarray(rng.normal(size=(dm, dff)) * 0.2, jnp.float32)
    wd = jnp.asarray(rng.normal(size=(dff, dm)) * 0.2, jnp.float32)

    def ref(x, wn, wg, wu, wd):
        h = Mo._rms_norm_ref(x, wn, 1e-6)
        return x + M.xla_mlp(h, wg, wu, wd, "gelu")

    with pltpu.force_tpu_interpret_mode():
        y1 = M.fused_norm_mlp(x, wn, wg, wu, wd, 1e-6, "gelu")
    y2 = ref(x, wn, wg, wu, wd)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), rtol=2e-5, atol=2e-5)

    def loss1(*a):
        return jnp.sum(M.fused_norm_mlp(*a, 1e-6, "gelu") ** 2)

    def loss2(*a):
        return jnp.sum(ref(*a) ** 2)

    with pltpu.force_tpu_interpret_mode():
        g1 = jax.grad(loss1, argnums=(0, 1, 2, 3, 4))(x, wn, wg, wu, wd)
    g2 = jax.grad(loss2, argnums=(0, 1, 2, 3, 4))(x, wn, wg, wu, wd)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-3)


def test_fused_norm_qkv_matches_composition():
    """fused_norm_qkv == (rms_norm(x) @ wq, @ wk, @ wv) with matching grads."""
    import jax
    import jax.numpy as jnp
    from jax.experimental.pallas import tpu as pltpu

    from graphgpt_tpu.models import modeling as Mo
    from graphgpt_tpu.ops import mlp as M

    rng = np.random.default_rng(3)
    n, dm, dh = 64, 32, 48
    x = jnp.asarray(rng.normal(size=(n, dm)) * 0.5, jnp.float32)
    wn = jnp.asarray(rng.normal(1.0, 0.1, size=(dm,)), jnp.float32)
    wq = jnp.asarray(rng.normal(size=(dm, dh)) * 0.2, jnp.float32)
    wk = jnp.asarray(rng.normal(size=(dm, dh)) * 0.2, jnp.float32)
    wv = jnp.asarray(rng.normal(size=(dm, dh)) * 0.2, jnp.float32)

    def ref(x, wn, wq, wk, wv):
        h = Mo._rms_norm_ref(x, wn, 1e-6)
        return h @ wq, h @ wk, h @ wv

    with pltpu.force_tpu_interpret_mode():
        outs1 = M.fused_norm_qkv(x, wn, wq, wk, wv, 1e-6)
    outs2 = ref(x, wn, wq, wk, wv)
    for a, b in zip(outs1, outs2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-5, atol=2e-5)

    def loss1(*a):
        q, k, v = M.fused_norm_qkv(*a, 1e-6)
        return jnp.sum(q**2) + jnp.sum(k**2) * 2 + jnp.sum(v**2) * 3

    def loss2(*a):
        q, k, v = ref(*a)
        return jnp.sum(q**2) + jnp.sum(k**2) * 2 + jnp.sum(v**2) * 3

    with pltpu.force_tpu_interpret_mode():
        g1 = jax.grad(loss1, argnums=(0, 1, 2, 3, 4))(x, wn, wq, wk, wv)
    g2 = jax.grad(loss2, argnums=(0, 1, 2, 3, 4))(x, wn, wq, wk, wv)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-3)
