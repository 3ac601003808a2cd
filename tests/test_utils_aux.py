"""Coverage for the small auxiliary utilities that had none: visualize,
inspection, and the interleaved pairwise AUC surrogate."""

import numpy as np
import jax.numpy as jnp

from graphgpt_tpu.data.datasets import SyntheticMolDataset
from graphgpt_tpu.utils import inspection, visualize


def test_spring_layout_and_draw(tmp_path):
    ds = SyntheticMolDataset(4, seed=0)
    g = ds[0]
    pos = visualize.spring_layout(g, iterations=10)
    assert pos.shape == (g.num_nodes, 2)
    assert np.isfinite(pos).all()
    # connected nodes end up closer than the global mean distance
    u, v = g.edge_index
    edge_d = np.linalg.norm(pos[u] - pos[v], axis=-1).mean()
    all_d = np.linalg.norm(pos[:, None] - pos[None], axis=-1).mean()
    assert edge_d < all_d
    out = visualize.draw_graph(g, walk=np.asarray([0, 1, 0]), path=str(tmp_path / "g.png"))
    import os

    assert os.path.getsize(out) > 1000


def test_inspect_tokenization_stats():
    from graphgpt_tpu.config import MlmScheduleConfig, TokenizationConfig
    from graphgpt_tpu.data import vocab as vocab_mod
    from graphgpt_tpu.data.datasets import MOL_EDGE_CARD, MOL_NODE_CARD
    from graphgpt_tpu.data.tokenizer import StackedGSTTokenizer

    cfg = TokenizationConfig()
    cfg.semantics.node.discrete = "node_attr"
    cfg.semantics.node.dim = 9
    cfg.semantics.edge.discrete = "edge_attr"
    cfg.semantics.edge.dim = 3
    vocab = vocab_mod.build_vocab(
        cfg,
        [np.arange(c) for c in MOL_NODE_CARD],
        [np.arange(c) for c in MOL_EDGE_CARD],
    )
    tok = StackedGSTTokenizer(
        cfg,
        vocab_mod.vocab_map_from_list(vocab),
        task_type="pretrain-mlm",
        mlm_cfg=MlmScheduleConfig(),
    )
    ds = SyntheticMolDataset(32, seed=1)
    stats = inspection.inspect_tokenization(ds, tok, n_stats=16)
    assert 0 < stats["mean_len"] <= stats["max_len"]
    assert stats["p99_len"] <= stats["max_len"]


def test_pairwise_auc_loss_interleaved():
    """Interleaved (1 pos + num_neg negs) layout — the edge sampler's batch
    shape (reference auc_loss, loss_utils.py:25-53)."""
    from graphgpt_tpu.ops.losses import pairwise_auc_loss

    # perfect separation by margin 1 -> zero loss
    scores = jnp.asarray([2.0, 1.0, 1.0, 3.0, 2.0, 2.0])  # pos, n, n, pos, n, n
    assert float(pairwise_auc_loss(scores, None, num_neg=2)) == 0.0
    # inverted ranking -> positive loss
    scores = jnp.asarray([0.0, 1.0, 1.0])
    assert float(pairwise_auc_loss(scores, None, num_neg=2)) > 0.5
