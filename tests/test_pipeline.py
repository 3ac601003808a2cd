"""End-to-end pipeline smoke: pretrain -> warm-start finetune."""

import os

import numpy as np
import pytest

from graphgpt_tpu.config import Config


def _base_cfg(tmp_path, task="pretrain-mlm"):
    cfg = Config()
    cfg.tokenization.semantics.node.discrete = "node_attr"
    cfg.tokenization.semantics.node.dim = 9
    cfg.tokenization.semantics.edge.discrete = "edge_attr"
    cfg.tokenization.semantics.edge.dim = 3
    cfg.model.hidden_size = 64
    cfg.model.num_hidden_layers = 2
    cfg.model.head_dim = 16
    cfg.model.dtype = "float32"
    cfg.training.task_type = task
    cfg.training.batch_size = 8
    cfg.training.max_length = 128
    cfg.training.num_workers = 0
    cfg.training.schedule.logging_steps = 5
    cfg.training.output_dir = str(tmp_path / task)
    return cfg


@pytest.fixture(scope="module")
def pretrain_dir(tmp_path_factory):
    from graphgpt_tpu.training.pipeline import PretrainPipeline

    tmp = tmp_path_factory.mktemp("pt")
    cfg = _base_cfg(tmp)
    cfg.training.pack_tokens = 1
    cfg.training.schedule.total_num_steps = 10
    cfg.training.schedule.warmup_num_steps = 2
    pipe = PretrainPipeline(cfg).setup()
    pipe.run()
    return cfg.training.output_dir


def test_pretrain_smoke(pretrain_dir):
    assert os.path.exists(os.path.join(pretrain_dir, "log.csv"))
    assert os.path.exists(os.path.join(pretrain_dir, "vocab"))
    assert os.listdir(os.path.join(pretrain_dir, "ckpt"))


def test_finetune_warmstart(pretrain_dir, tmp_path):
    from graphgpt_tpu.training.finetune import FinetunePipeline

    cfg = _base_cfg(tmp_path, task="graph")
    cfg.model.problem_type = "regression"
    cfg.model.loss_type = "l1"
    cfg.model.num_labels = 1
    cfg.training.schedule.epochs = 1
    cfg.training.valid_percent = 0.1
    cfg.training.pretrain_cpt = pretrain_dir
    cfg.training.optimizer.use_ema = True
    # tiny dataset for speed
    pipe = FinetunePipeline(cfg)
    pipe.cfg.tokenization.dataset = "synthetic_mol"
    pipe.setup()
    pipe.dataset.size = 128  # shrink
    pipe.train_idx = pipe.train_idx[pipe.train_idx < 128][:64]
    pipe.valid_idx = pipe.valid_idx[pipe.valid_idx < 128][:32]
    best = pipe.run()
    assert any(k.startswith("valid_") for k in best), best
    assert np.isfinite(best["valid_mae"])
    assert os.path.exists(os.path.join(cfg.training.output_dir, "result.csv"))


def test_finetune_freeze_embeddings(pretrain_dir, tmp_path):
    from graphgpt_tpu.training.finetune import FinetunePipeline

    cfg = _base_cfg(tmp_path, task="graph")
    cfg.model.problem_type = "regression"
    cfg.model.loss_type = "l1"
    cfg.model.num_labels = 1
    cfg.training.schedule.epochs = 1
    cfg.training.freeze = 0
    pipe = FinetunePipeline(cfg)
    pipe.setup()
    pipe.train_idx = pipe.train_idx[:32]
    pipe.valid_idx = pipe.valid_idx[:16] if len(pipe.valid_idx) else pipe.train_idx[:16]
    import jax
    import numpy as np

    emb0 = np.asarray(pipe.state.params["embed_tokens"]).copy()
    pipe.run()
    emb1 = np.asarray(pipe.state.params["embed_tokens"])
    np.testing.assert_array_equal(emb0, emb1)  # frozen
