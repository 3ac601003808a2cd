"""Determinism and shape-invariance properties of the full pipeline."""

import jax
import jax.numpy as jnp
import numpy as np

from graphgpt_tpu.config import Config, MlmScheduleConfig, ModelConfig
from graphgpt_tpu.data.collator import collate
from graphgpt_tpu.data.datasets import (
    MOL_EDGE_CARD,
    MOL_NODE_CARD,
    SyntheticMolDataset,
)
from graphgpt_tpu.data.loader import GraphTokenLoader
from graphgpt_tpu.data import vocab as V
from graphgpt_tpu.data.tokenizer import StackedGSTTokenizer
from graphgpt_tpu.models import heads


def _tok():
    cfg = Config()
    cfg.tokenization.semantics.node.discrete = "node_attr"
    cfg.tokenization.semantics.node.dim = 9
    cfg.tokenization.semantics.edge.discrete = "edge_attr"
    cfg.tokenization.semantics.edge.dim = 3
    vm = V.vocab_map_from_list(
        V.build_vocab(
            cfg.tokenization,
            [np.arange(c) for c in MOL_NODE_CARD],
            [np.arange(c) for c in MOL_EDGE_CARD],
        )
    )
    return cfg, StackedGSTTokenizer(
        cfg.tokenization, vm, task_type="pretrain-mlm", mlm_cfg=MlmScheduleConfig()
    )


def test_loader_worker_count_invariance(tmp_path):
    """Same seed + indices => identical batches for 0 and 2 workers."""
    cfg, tok = _tok()
    ds = SyntheticMolDataset(64, seed=0)
    idx = np.arange(64)
    batches0 = [
        {k: v.copy() for k, v in b.data.items()}
        for b in GraphTokenLoader(ds, tok, 4, mpe=128, pack=True, num_workers=0, seed=3).epoch_batches(idx)
    ]
    batches2 = [
        {k: v.copy() for k, v in b.data.items()}
        for b in GraphTokenLoader(ds, tok, 4, mpe=128, pack=True, num_workers=2, seed=3).epoch_batches(idx)
    ]
    assert len(batches0) == len(batches2)
    for b0, b2 in zip(batches0, batches2):
        for k in b0:
            np.testing.assert_array_equal(b0[k], b2[k], err_msg=k)


def test_padding_length_invariance():
    """Loss is identical whether a batch is padded to 128 or 256 rows.

    Holds for the masked-mean CE path. (The dLM-weighted loss is
    intentionally NOT padding-invariant: the reference normalises by
    bz*seq*next_n with seq = padded length, modeling_pretrain.py:230-236,
    and we reproduce that.)"""
    cfg, tok = _tok()
    tok.mlm_cfg.dlm_wgt = False  # masked-mean CE path
    ds = SyntheticMolDataset(8, seed=1)
    rng = np.random.default_rng(0)
    samples = [tok(ds[i], rng) for i in range(8)]
    b_small = collate(samples, mpe=1024, fixed_length=128)
    b_big = collate(samples, mpe=1024, fixed_length=256)
    mcfg = ModelConfig(
        vocab_size=tok.vocab_size,
        hidden_size=32,
        num_hidden_layers=2,
        head_dim=8,
        num_attention_heads=4,
        intermediate_size=64,
        stacked_feat=13,
        next_n_token=13,
        mask_token_id=tok.mask_id,
        dtype="float32",
    ).finalize()
    params = heads.init_pretrain_params(mcfg, jax.random.PRNGKey(0))
    f = lambda b: float(
        jax.jit(lambda p, bb: heads.pretrain_forward(p, mcfg, bb)["loss"])(
            params, {k: jnp.asarray(v) for k, v in b.data.items()}
        )
    )
    np.testing.assert_allclose(f(b_small), f(b_big), rtol=1e-4)


def test_tokenizer_determinism_per_seed():
    cfg, tok = _tok()
    ds = SyntheticMolDataset(4, seed=2)
    s1 = tok(ds[0], np.random.default_rng((7, 0)))
    s2 = tok(ds[0], np.random.default_rng((7, 0)))
    np.testing.assert_array_equal(s1.input_ids, s2.input_ids)
    np.testing.assert_array_equal(s1.labels, s2.labels)
