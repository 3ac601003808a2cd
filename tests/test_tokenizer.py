"""StackedGST tokenizer, vocab, SMTP masking, collation."""

import numpy as np
import pytest

from graphgpt_tpu.config import Config, TokenizationConfig
from graphgpt_tpu.data import vocab as vocab_mod
from graphgpt_tpu.data.collator import collate, pack_samples
from graphgpt_tpu.data.datasets import (
    MOL_EDGE_CARD,
    MOL_NODE_CARD,
    SyntheticMolDataset,
)
from graphgpt_tpu.data.tokenizer import (
    PAD_ID,
    StackedGSTTokenizer,
    smtp_mask_stacked,
)
from graphgpt_tpu.data.vocab import LABEL_PAD_ID


def make_tok_cfg():
    cfg = TokenizationConfig()
    cfg.semantics.node.discrete = "node_attr"
    cfg.semantics.node.dim = 9
    cfg.semantics.edge.discrete = "edge_attr"
    cfg.semantics.edge.dim = 3
    return cfg


def make_vocab(cfg):
    node_vals = [np.arange(c) for c in MOL_NODE_CARD]
    edge_vals = [np.arange(c) for c in MOL_EDGE_CARD]
    vocab = vocab_mod.build_vocab(cfg, node_vals, edge_vals)
    return vocab_mod.vocab_map_from_list(vocab)


@pytest.fixture(scope="module")
def tokenizer():
    cfg = make_tok_cfg()
    vm = make_vocab(cfg)
    from graphgpt_tpu.config import MlmScheduleConfig

    return StackedGSTTokenizer(cfg, vm, task_type="pretrain-mlm", mlm_cfg=MlmScheduleConfig())


def test_vocab_roundtrip(tmp_path):
    cfg = make_tok_cfg()
    vocab = vocab_mod.build_vocab(
        cfg, [np.arange(c) for c in MOL_NODE_CARD], [np.arange(c) for c in MOL_EDGE_CARD]
    )
    fn = str(tmp_path / "vocab")
    vocab_mod.save_vocab(vocab, fn)
    loaded = vocab_mod.load_vocab(fn)
    assert loaded["<label_pad>"] == -100
    assert min(v for v in loaded.values() if v > 0) == 1
    assert len(loaded) == len(vocab) + 1
    # ids are contiguous 1..n
    assert max(loaded.values()) == len(vocab)


def test_vocab_contains_expected_tokens():
    cfg = make_tok_cfg()
    vm = make_vocab(cfg)
    for tok in ("<eos>", "<bos>", "<mask>", "<gsum>", "<edge_jump>", "0", "511",
                "molecule#node#0", "molecule#node#0#118", "molecule#edge#2#1"):
        assert tok in vm, tok


def test_tokenize_shapes(tokenizer):
    ds = SyntheticMolDataset(10, seed=1)
    rng = np.random.default_rng(0)
    for i in range(10):
        g = ds[i]
        ids, walk, ranks = tokenizer.tokenize(g, rng)
        assert ids.shape[1] == 13  # 1 + 9 + 3
        assert ids.shape[0] == len(walk) + 1
        assert (ids[-1] == tokenizer.eos_id).all()
        assert (ids > 0).all()  # no pads inside a sample
        # structural slot holds node-idx tokens
        assert set(ids[:-1, 0]) <= set(tokenizer.node_idx_ids.tolist())


def test_tokenize_node_attrs_consistent(tokenizer):
    """Same raw node => same node-attr token columns at every visit."""
    ds = SyntheticMolDataset(5, seed=2)
    rng = np.random.default_rng(0)
    g = ds[0]
    ids, walk, ranks = tokenizer.tokenize(g, rng)
    for node in set(walk.tolist()):
        rows = ids[:-1][walk == node][:, 1:10]
        assert (rows == rows[0]).all()


def test_smtp_mask_counts():
    rng = np.random.default_rng(0)
    ids = rng.integers(1, 100, size=(64, 13)).astype(np.int32)
    masked, labels = smtp_mask_stacked(ids, mask_token_id=1, alpha_t=0.25, rng=rng)
    n_sel = (labels != LABEL_PAD_ID).sum()
    assert n_sel == int(np.ceil(64 * 13 * 0.25))
    # masked positions replaced by the mask token
    sel = labels != LABEL_PAD_ID
    assert (masked[sel] == 1).all()
    assert (masked[~sel] == ids[~sel]).all()
    # labels hold original ids at selected cells
    assert (labels[sel] == ids[sel]).all()


def test_call_pretrain_mlm(tokenizer):
    ds = SyntheticMolDataset(4, seed=3)
    rng = np.random.default_rng(0)
    s = tokenizer(ds[0], rng)
    assert s.input_ids.shape == s.labels.shape
    assert s.wgt is not None and s.wgt > 0
    assert s.position_ids.tolist() == list(range(s.seq_len))
    assert (s.labels != LABEL_PAD_ID).sum() > 0


def test_collate_padding(tokenizer):
    ds = SyntheticMolDataset(8, seed=4)
    rng = np.random.default_rng(0)
    samples = [tokenizer(ds[i], rng) for i in range(8)]
    batch = collate(samples, mpe=1024, bucket=8)
    p = batch["input_ids"].shape[1]
    assert p % 8 == 0
    assert batch["input_ids"].shape == (8, p, 13)
    # padding rows are PAD_ID / -100 / mask 0
    for i, s in enumerate(samples):
        assert (batch["input_ids"][i, s.seq_len :] == PAD_ID).all()
        assert (batch["labels"][i, s.seq_len :] == LABEL_PAD_ID).all()
        assert (batch["attention_mask"][i, s.seq_len :] == 0).all()
        assert (batch["segment_ids"][i, s.seq_len :] == 0).all()
        assert (batch["segment_ids"][i, : s.seq_len] == 1).all()


def test_packing(tokenizer):
    ds = SyntheticMolDataset(64, seed=5)
    rng = np.random.default_rng(0)
    samples = (tokenizer(ds[i], rng) for i in range(64))
    packed = list(pack_samples(samples, mpe=256))
    assert all(p.seq_len <= 256 for p in packed)
    # most rows should be well-filled
    fills = [p.seq_len / 256 for p in packed[:-1]]
    assert np.mean(fills) > 0.7
    batch = collate(packed[:4], mpe=256, bucket=8)
    segs = batch["segment_ids"]
    assert segs.max() > 1  # multiple segments per row
    # segment ids are non-decreasing within a row
    for row in segs:
        nz = row[row > 0]
        assert (np.diff(nz) >= 0).all()


def test_graph_task(tokenizer_graph=None):
    cfg = make_tok_cfg()
    vm = make_vocab(cfg)
    tok = StackedGSTTokenizer(cfg, vm, task_type="graph")
    ds = SyntheticMolDataset(4, seed=6)
    s = tok(ds[0], np.random.default_rng(0))
    assert s.graph_labels is not None and s.graph_labels.shape == (1,)
    assert (s.labels == LABEL_PAD_ID).all()


def test_node_task():
    cfg = make_tok_cfg()
    vm = make_vocab(cfg)
    tok = StackedGSTTokenizer(cfg, vm, task_type="node")
    ds = SyntheticMolDataset(4, seed=7)
    g = ds[0]
    g.root_n_id = np.asarray([2])
    g.y = np.zeros((g.num_nodes, 1), np.int64)
    g.y[2] = 3
    s = tok(g, np.random.default_rng(0))
    assert s.node_labels.tolist() == [3.0]
    # final row is the target-node row with default edge attrs
    assert s.input_ids[-1, 0] in tok.node_idx_ids
    assert (s.input_ids[-1, -3:] == tok.edge_lookup.default_ids).all()


def test_long_stack_tokenizer():
    from graphgpt_tpu.data.tokenizer import StackedGSTTokenizerLong
    from graphgpt_tpu.config import MlmScheduleConfig

    cfg = make_tok_cfg()
    cfg.stack_method = "long"
    vm = make_vocab(cfg)
    tok = StackedGSTTokenizerLong(cfg, vm, task_type="pretrain-mlm", mlm_cfg=MlmScheduleConfig())
    ds = SyntheticMolDataset(4, seed=0)
    rng = np.random.default_rng(0)
    ids, walk, ranks = tok.tokenize(ds[0], rng)
    assert ids.shape[1] == 2 + 9 + 3  # long stacked_feat
    assert ids.shape[0] == 2 * len(walk)  # alternating rows + eos
    # node rows carry node-idx tokens; edge rows carry <new>
    assert ids[0, 0] in set(tok.node_idx_ids.tolist())
    assert ids[1, 0] == tok.new_id
    # full call produces parity-padded labels
    s = tok(ds[0], rng)
    assert s.input_ids.shape[1] == 14


def test_nodev2_task():
    cfg = make_tok_cfg()
    vm = make_vocab(cfg)
    tok = StackedGSTTokenizer(cfg, vm, task_type="nodev2", num_intra_cls=4)
    ds = SyntheticMolDataset(4, seed=8)
    g = ds[0]
    g.y = np.arange(g.num_nodes, dtype=np.int64).reshape(-1, 1) % 4
    s = tok(g, np.random.default_rng(0))
    labs = s.extras["nodev2_labels"]
    # each node labelled exactly once
    assert (labs != -100).sum() == g.num_nodes
    assert "cls_idx" in s.extras
    # the class rows sit at the end of the sequence
    cls_start = int(s.extras["cls_idx"][0])
    assert s.input_ids.shape[0] == cls_start + 4
    # model consumes the batch end to end
    import jax
    import jax.numpy as jnp
    from graphgpt_tpu.config import ModelConfig
    from graphgpt_tpu.models import heads as H
    from graphgpt_tpu.data.collator import collate

    batch = collate([s], mpe=256)
    mcfg = ModelConfig(
        vocab_size=tok.vocab_size, hidden_size=32, num_hidden_layers=2,
        head_dim=8, num_attention_heads=4, intermediate_size=64,
        stacked_feat=13, next_n_token=1, dtype="float32",
        task_type="nodev2", problem_type="single_label_classification",
        loss_type="token_ce_intra", num_labels=4,
    ).finalize()
    params = H.init_task_params(mcfg, jax.random.PRNGKey(0))
    jb = {k: jnp.asarray(v) for k, v in batch.data.items()}
    out = jax.jit(lambda p, b: H.task_forward(p, mcfg, b))(params, jb)
    assert np.isfinite(float(out["loss"]))


def test_block_aligned_packing(tokenizer):
    """pack_samples(block=G): no sample crosses a G boundary, every token
    accounted for, waste bounded; gaps carry segment id 0 (negative
    segment_lengths encoding) so attention at P=G equals attention at
    P=mpe (ops/attention.py attn_block)."""
    G, MPE = 64, 256
    ds = SyntheticMolDataset(96, seed=7)
    rng = np.random.default_rng(0)
    samples = [tokenizer(ds[i], rng) for i in range(96)]
    total_tokens = sum(min(s.seq_len, G) for s in samples)
    packed = list(pack_samples(iter(samples), mpe=MPE, block=G))
    seen_tokens = 0
    for row in packed:
        batch = collate([row], mpe=MPE, bucket=8, fixed_length=MPE)
        seg = batch["segment_ids"][0]
        seen_tokens += int((seg > 0).sum())
        # no segment crosses a block boundary
        for sid in np.unique(seg[seg > 0]):
            pos = np.flatnonzero(seg == sid)
            assert pos[-1] // G == pos[0] // G, (sid, pos[0], pos[-1])
        # ids on non-pad positions are non-decreasing
        nz = seg[seg > 0]
        assert (np.diff(nz) >= 0).all()
    assert seen_tokens == total_tokens  # nothing lost, nothing duplicated
    # waste stays small with the best-fit lookahead
    capacity = len(packed) * MPE
    assert seen_tokens / capacity > 0.8


def test_attn_block_factorisation_matches_full():
    """attention(attn_block=G) == attention(attn_block=0) when no segment
    crosses a G boundary."""
    import jax.numpy as jnp

    from graphgpt_tpu.ops.attention import attention

    rng = np.random.default_rng(3)
    b, p, h, d, G = 2, 256, 2, 16, 64
    q = jnp.asarray(rng.normal(size=(b, p, h, d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, p, h, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, p, h, d)), jnp.float32)
    seg = np.zeros((b, p), np.int32)
    for r in range(b):
        sid = 1
        for blk in range(p // G):
            pos = blk * G
            while pos < (blk + 1) * G - 4:
                ln = int(rng.integers(8, 40))
                ln = min(ln, (blk + 1) * G - pos)
                seg[r, pos : pos + ln] = sid
                pos += ln
                sid += 1
    seg = jnp.asarray(seg)
    full = attention(q, k, v, seg, impl="xla")
    blocked = attention(q, k, v, seg, impl="xla", attn_block=G)
    np.testing.assert_allclose(
        np.asarray(full), np.asarray(blocked), rtol=2e-5, atol=2e-5
    )
