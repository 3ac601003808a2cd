"""3D position pretrain model + mol3d utilities."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from graphgpt_tpu.config import ModelConfig
from graphgpt_tpu.data import mol3d
from graphgpt_tpu.models import pos_pretrain


def test_anchor_rotation_canonical():
    rng = np.random.default_rng(0)
    pos = rng.normal(size=(6, 3)).astype(np.float32)
    out = mol3d.anchor_rotate(pos)
    np.testing.assert_allclose(out[0], 0, atol=1e-5)  # node 0 at origin
    np.testing.assert_allclose(out[1, :2], 0, atol=1e-5)  # node 1 on z-axis
    assert out[1, 2] > 0  # positive z
    np.testing.assert_allclose(out[2, 0], 0, atol=1e-5)  # node 2 in y-z plane
    # pairwise distances preserved
    d0 = np.linalg.norm(pos[:, None] - pos[None, :], axis=-1)
    d1 = np.linalg.norm(out[:, None] - out[None, :], axis=-1)
    np.testing.assert_allclose(d0, d1, rtol=1e-4, atol=1e-4)


def test_trans_rotate_preserves_distances():
    rng = np.random.default_rng(1)
    pos = rng.normal(size=(5, 3)).astype(np.float32)
    out = mol3d.trans_rotate_random(pos, rng)
    np.testing.assert_allclose(out.mean(0), 0, atol=1e-5)
    d0 = np.linalg.norm(pos[:, None] - pos[None, :], axis=-1)
    d1 = np.linalg.norm(out[:, None] - out[None, :], axis=-1)
    np.testing.assert_allclose(d0, d1, rtol=1e-4, atol=1e-4)


def test_discrete_pos_bins():
    pos = np.asarray([[-100, 0, 100]], np.float32).T.reshape(1, 3)
    bins = mol3d.discrete_pos(pos, 256)
    assert bins.min() >= 0 and bins.max() <= 255
    assert bins[0, 0] == 0 and bins[0, 2] == 255


def test_pos_type():
    assert mol3d.pos_type_from_node_index(np.asarray([-1, 0, 1, 2, 3, 9])).tolist() == [
        0, 1, 2, 3, 4, 4,
    ]


def _cfg(problem="pos-smtp-line"):
    return ModelConfig(
        vocab_size=80,
        hidden_size=32,
        num_hidden_layers=2,
        head_dim=8,
        num_attention_heads=4,
        intermediate_size=64,
        stacked_feat=4,
        next_n_token=4,
        mask_token_id=1,
        dtype="float32",
        pos_problem_type=problem,
        pos_num_bins=16,
    ).finalize()


def _batch(cfg, b=2, p=12):
    rng = np.random.default_rng(0)
    ids = rng.integers(2, cfg.vocab_size, size=(b, p, cfg.stacked_feat)).astype(np.int32)
    node_idx = np.tile(np.arange(p), (b, 1)).astype(np.int32)
    return {
        "input_ids": jnp.asarray(ids),
        "position_ids": jnp.tile(jnp.arange(p), (b, 1)),
        "segment_ids": jnp.ones((b, p), jnp.int32),
        "pos_type": jnp.asarray(np.clip(node_idx + 1, 0, 4)),
        "node_idx": jnp.asarray(node_idx + 1),
        "pos": jnp.asarray(rng.normal(size=(b, p, 3)).astype(np.float32)),
    }


@pytest.mark.parametrize("problem", ["pos-smtp-line", "pos-smtp-cube", "pos-smtp-mix"])
def test_pos_pred_forward_and_grads(problem):
    cfg = _cfg(problem)
    params = pos_pretrain.init_pos_pred_params(cfg, jax.random.PRNGKey(0))
    batch = _batch(cfg)

    fn = jax.jit(
        lambda p, b, r: pos_pretrain.pos_pred_forward(p, cfg, b, rng=r, train=True)["loss"]
    )
    loss = fn(params, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(loss))
    grads = jax.jit(jax.grad(lambda p: pos_pretrain.pos_pred_forward(p, cfg, _batch(cfg), rng=jax.random.PRNGKey(1), train=True)["loss"]))(params)
    flat = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in flat)
    key = "embed_pos_token" if problem != "pos-smtp-mix" else "embed_line_token"
    assert float(jnp.abs(grads[key]).sum()) > 0


def test_pos_pred_tokenizer_integration():
    """pretrain-smtp extras feed the pos model end-to-end."""
    from graphgpt_tpu.config import Config
    from graphgpt_tpu.data.collator import collate
    from graphgpt_tpu.data.datasets import (
        MOL_EDGE_CARD,
        MOL_NODE_CARD,
        SyntheticMolDataset,
    )
    from graphgpt_tpu.data import vocab as V
    from graphgpt_tpu.data.tokenizer import StackedGSTTokenizer

    c = Config()
    c.tokenization.semantics.node.discrete = "node_attr"
    c.tokenization.semantics.node.dim = 9
    c.tokenization.semantics.edge.discrete = "edge_attr"
    c.tokenization.semantics.edge.dim = 3
    vm = V.vocab_map_from_list(
        V.build_vocab(
            c.tokenization,
            [np.arange(x) for x in MOL_NODE_CARD],
            [np.arange(x) for x in MOL_EDGE_CARD],
        )
    )
    tok = StackedGSTTokenizer(c.tokenization, vm, task_type="pretrain-smtp")
    ds = SyntheticMolDataset(4, seed=0, with_pos=True)
    rng = np.random.default_rng(0)
    samples = [tok(ds[i], rng) for i in range(4)]
    assert "pos" in samples[0].extras and "node_idx" in samples[0].extras
    batch = collate(samples, mpe=128)
    cfg = ModelConfig(
        vocab_size=tok.vocab_size,
        hidden_size=32,
        num_hidden_layers=2,
        head_dim=8,
        num_attention_heads=4,
        intermediate_size=64,
        stacked_feat=13,
        next_n_token=13,
        mask_token_id=vm["<mask>"],
        dtype="float32",
        pos_num_bins=16,
    ).finalize()
    params = pos_pretrain.init_pos_pred_params(cfg, jax.random.PRNGKey(0))
    jb = {k: jnp.asarray(v) for k, v in batch.data.items()}
    out = jax.jit(
        lambda p, b: pos_pretrain.pos_pred_forward(p, cfg, b, rng=jax.random.PRNGKey(0))
    )(params, jb)
    assert np.isfinite(float(out["loss"]))


def test_pretrain_mlm_coord_host_masking():
    """pretrain-mlm-coord: host-side MLM masking + coordinate decoration
    (reference prepare_inputs_for_pretrain_mlm_coord,
    src/utils/tokenizer_utils.py:428-451) feeds the pos model with its 2D
    labels precomputed."""
    from graphgpt_tpu.config import Config
    from graphgpt_tpu.data.collator import collate
    from graphgpt_tpu.data.datasets import (
        MOL_EDGE_CARD,
        MOL_NODE_CARD,
        SyntheticMolDataset,
    )
    from graphgpt_tpu.data import vocab as V
    from graphgpt_tpu.data.tokenizer import StackedGSTTokenizer

    c = Config()
    c.tokenization.semantics.node.discrete = "node_attr"
    c.tokenization.semantics.node.dim = 9
    c.tokenization.semantics.edge.discrete = "edge_attr"
    c.tokenization.semantics.edge.dim = 3
    vm = V.vocab_map_from_list(
        V.build_vocab(
            c.tokenization,
            [np.arange(x) for x in MOL_NODE_CARD],
            [np.arange(x) for x in MOL_EDGE_CARD],
        )
    )
    tok = StackedGSTTokenizer(c.tokenization, vm, task_type="pretrain-mlm-coord")
    ds = SyntheticMolDataset(4, seed=0, with_pos=True)
    rng = np.random.default_rng(0)
    samples = [tok(ds[i], rng) for i in range(4)]
    s = samples[0]
    # decoration present alongside host-masked labels
    assert {"pos", "node_idx", "pos_type"} <= set(s.extras)
    assert (s.labels != -100).any(), "host MLM masking must produce labels"
    masked_cells = s.labels != -100
    assert (s.input_ids[masked_cells] == vm["<mask>"]).mean() > 0.5

    batch = collate(samples, mpe=128)
    cfg = ModelConfig(
        vocab_size=tok.vocab_size,
        hidden_size=32,
        num_hidden_layers=2,
        head_dim=8,
        num_attention_heads=4,
        intermediate_size=64,
        stacked_feat=13,
        next_n_token=13,
        mask_token_id=vm["<mask>"],
        dtype="float32",
        pos_num_bins=16,
        task_type="pretrain-mlm-coord",
    ).finalize()
    params = pos_pretrain.init_pos_pred_params(cfg, jax.random.PRNGKey(0))
    jb = {k: jnp.asarray(v) for k, v in batch.data.items()}
    assert "labels" in jb
    out = jax.jit(
        lambda p, b: pos_pretrain.pos_pred_forward(p, cfg, b, rng=jax.random.PRNGKey(0))
    )(params, jb)
    assert np.isfinite(float(out["loss"]))
    assert np.isfinite(float(out["pretrain_loss"]))


def test_pos_percentile_boundaries_semantics():
    """Boundary construction matches the reference: |pos|>eps filtering,
    percentile grid, widened +-100 outer edges (pcqm4mv2.py:261-284)."""
    rng = np.random.default_rng(0)
    pos = rng.normal(size=(500, 3)).astype(np.float32)
    pos[:100] = 0.0  # filtered out by |pos| > eps
    b = mol3d.pos_percentile_boundaries(pos, 128)
    assert b.shape == (129,)
    assert b[0] == -100.0 and b[-1] == 100.0
    assert np.all(np.diff(b[1:-1]) >= 0)
    filtered = pos.reshape(-1)[np.abs(pos.reshape(-1)) > 1e-4]
    np.testing.assert_allclose(
        b[64], np.percentile(filtered, 50.0), rtol=1e-5
    )


def test_discrete_pos_v2_matches_torch_bucketize():
    """Non-uniform binning parity with the reference's torch.bucketize
    (discrete_pos_v2, mol_utils.py:167-179)."""
    import torch

    rng = np.random.default_rng(1)
    pos = (rng.normal(size=(40, 3)) * 3).astype(np.float32)
    bounds = mol3d.pos_percentile_boundaries(pos, 16)
    ours = mol3d.discrete_pos_v2(pos, 16, {16: bounds})
    ref = (
        torch.bucketize(
            torch.clamp(torch.tensor(pos), min=-99, max=99).float(),
            torch.tensor(bounds).float(),
        )
        - 1
    ).numpy()
    np.testing.assert_array_equal(ours, ref)
    assert ours.min() >= 0 and ours.max() <= 15


def test_build_dict_bounds_cache(tmp_path):
    rng = np.random.default_rng(2)
    pos = rng.normal(size=(200, 3)).astype(np.float32)
    d1 = mol3d.build_dict_bounds(pos, cache_dir=str(tmp_path), nums=(128, 256))
    assert set(d1) == {128, 256}
    # second call loads from cache files
    d2 = mol3d.build_dict_bounds(
        np.zeros((1, 3), np.float32), cache_dir=str(tmp_path), nums=(128, 256)
    )
    np.testing.assert_array_equal(d1[128], d2[128])


def test_pos_pred_forward_with_boundaries():
    """pos_pred_forward consumes batch-carried percentile boundaries (the
    dict_bounds propagation path, reference pipeline.py:159-162)."""
    cfg = _cfg("pos-smtp-line")
    params = pos_pretrain.init_pos_pred_params(cfg, jax.random.PRNGKey(0))
    batch = _batch(cfg)
    rng = np.random.default_rng(3)
    bounds = mol3d.pos_percentile_boundaries(
        np.asarray(batch["pos"]).reshape(-1, 3), cfg.pos_num_bins
    )
    batch_b = dict(batch)
    batch_b[f"pos_boundaries_{cfg.pos_num_bins}"] = jnp.asarray(bounds)
    out_uniform = pos_pretrain.pos_pred_forward(
        params, cfg, batch, rng=jax.random.PRNGKey(1), train=True
    )
    out_bounds = pos_pretrain.pos_pred_forward(
        params, cfg, batch_b, rng=jax.random.PRNGKey(1), train=True
    )
    assert np.isfinite(float(out_bounds["loss"]))
    # different binning must change the 3D token stream (and hence loss)
    assert float(out_bounds["loss"]) != float(out_uniform["loss"])


def test_loss_agg_sample_lvl_differs():
    """loss_agg=sample-lvl weights each sample equally (reference
    modeling_pretrain.py:606,634 — the normalized per-feat wgt); the value
    must differ from token-lvl on unbalanced batches and stay finite."""
    import dataclasses

    cfg = _cfg()
    params = pos_pretrain.init_pos_pred_params(cfg, jax.random.PRNGKey(0))
    batch = _batch(cfg)
    out_tok = pos_pretrain.pos_pred_forward(params, cfg, batch, jax.random.PRNGKey(1))
    cfg2 = dataclasses.replace(cfg, loss_agg="sample-lvl")
    out_smp = pos_pretrain.pos_pred_forward(params, cfg2, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(out_smp["loss"]))
    assert float(out_smp["loss"]) != float(out_tok["loss"])
