"""Round-5 config-consumption audit: fields with real reference semantics
that were declared but never consumed (the r4 memory note's scan)."""

import numpy as np
import pytest

from graphgpt_tpu.config import ModelConfig
from graphgpt_tpu.data.datasets import SyntheticMolDataset
from graphgpt_tpu.data.tokenizer import StackedGSTTokenizer

from test_tokenizer import make_tok_cfg, make_vocab


def test_add_eos_controls_task_rows():
    """Reference tokenizer.py:525-526: task-mode sequences append the eos
    row only under add_eos (default true); pretrain always carries it (the
    mlm preparer's labels[-1:])."""
    ds = SyntheticMolDataset(4, seed=0)
    g = ds[0]
    rng = np.random.default_rng(0)

    def ids_for(add_eos, task):
        cfg = make_tok_cfg()
        cfg.add_eos = add_eos
        tok = StackedGSTTokenizer(cfg, make_vocab(cfg), task_type=task)
        out, _, _ = tok.tokenize(g, np.random.default_rng(0))
        return tok, out

    tok, with_eos = ids_for(True, "graph")
    _, without = ids_for(False, "graph")
    assert with_eos.shape[0] == without.shape[0] + 1
    assert np.all(with_eos[-1] == tok.eos_id)
    assert not np.all(without[-1] == tok.eos_id)
    np.testing.assert_array_equal(with_eos[:-1], without)
    # pretrain rows keep the eos row regardless of the flag
    _, pt = ids_for(False, "pretrain-mlm")
    np.testing.assert_array_equal(pt, with_eos)


def test_unsupported_bias_fields_guarded():
    with pytest.raises(AssertionError, match="bias"):
        ModelConfig(attention_bias=True).finalize()
    with pytest.raises(AssertionError, match="pad_token_id"):
        ModelConfig(pad_token_id=3).finalize()
