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


def test_finetune_eval_parity_surface(pretrain_dir, tmp_path):
    """Per-epoch ckpt + train-subset/valid/EMA-valid/test-EMA metrics +
    ema_best checkpoint + eval_only ckpt sweep (reference
    finetune_mode.py:363-458, log_eval_dump_utils.py:649-799)."""
    import csv

    from graphgpt_tpu.training.finetune import FinetunePipeline

    cfg = _base_cfg(tmp_path, task="graph")
    cfg.model.problem_type = "regression"
    cfg.model.loss_type = "l1"
    cfg.model.num_labels = 1
    cfg.training.schedule.epochs = 2
    cfg.training.valid_percent = 0.1
    cfg.training.optimizer.use_ema = True
    cfg.training.k_samplers = 16
    cfg.training.save_pred = True
    cfg.training.dump_infer = True
    pipe = FinetunePipeline(cfg)
    pipe.setup()
    pipe.dataset.size = 96
    pipe.train_idx = pipe.train_idx[pipe.train_idx < 96][:48]
    pipe.valid_idx = pipe.valid_idx[pipe.valid_idx < 96][:16]
    pipe.test_idx = pipe.valid_idx
    best = pipe.run()
    out = cfg.training.output_dir
    # one ckpt per epoch, an ema-best dir, and the eval csv surface
    assert len(os.listdir(os.path.join(out, "ckpt"))) >= 2
    assert os.listdir(os.path.join(out, "ckpt_ema_best"))
    with open(os.path.join(out, "result.csv")) as f:
        rows = list(csv.DictReader(f))
    assert len(rows) == 2  # one eval row per epoch
    for col in ("train_mae", "valid_mae", "valid_ema_mae", "test_mae"):
        assert col in rows[0], rows[0].keys()
        assert np.isfinite(float(rows[0][col]))
    # prediction dumps per split + hidden-state dump
    for fn in ("train_results.csv", "valid_results.csv", "test_results.csv"):
        assert os.path.exists(os.path.join(out, fn)), fn
    assert any(f.startswith("hidden_states_epoch") for f in os.listdir(out))
    assert pipe.ema_best  # EMA-best tracked with reference key semantics

    # --- eval_only: sweep the saved epoch ckpts without training
    cfg2 = _base_cfg(tmp_path, task="graph")
    cfg2.model.problem_type = "regression"
    cfg2.model.loss_type = "l1"
    cfg2.model.num_labels = 1
    cfg2.training.eval_only = True
    cfg2.training.optimizer.use_ema = True  # state template must match saved
    cfg2.training.k_samplers = 0
    cfg2.training.pretrain_cpt = out
    cfg2.training.output_dir = str(tmp_path / "eval_only")
    pipe2 = FinetunePipeline(cfg2)
    pipe2.setup()
    pipe2.dataset.size = 96
    pipe2.valid_idx = pipe.valid_idx
    pipe2.test_idx = np.asarray([], dtype=np.int64)
    pipe2.run()
    with open(os.path.join(cfg2.training.output_dir, "result.csv")) as f:
        rows2 = list(csv.DictReader(f))
    assert len(rows2) == 2  # one row per swept epoch ckpt
    assert sorted(int(float(r["epoch"])) for r in rows2) == [0, 1]


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


def test_generation_eval_full_sweep(tmp_path):
    """evaluate_generation sweeps EVERY validation batch per band (reference
    full-loader band sweep, log_eval_dump_utils.py:307-384), accumulating
    masked-position accuracy across batches with one fixed-shape sampler."""
    from graphgpt_tpu.training.pipeline import PretrainPipeline

    cfg = _base_cfg(tmp_path)
    cfg.training.valid_percent = 0.2
    cfg.training.schedule.total_num_steps = 2
    cfg.training.schedule.warmup_num_steps = 1
    cfg.generation.steps = 3
    pipe = PretrainPipeline(cfg).setup()
    try:
        res = pipe.evaluate_generation(n_samples=8, n_bands=2, batch_size=4)
    finally:
        pipe.loader.close()
    assert set(res) == {"gen_acc@umr_0.0-0.5", "gen_acc@umr_0.5-1.0"}
    for v in res.values():
        assert 0.0 <= v <= 1.0


def _pos_graphs_npz(path, n_graphs=24, seed=0):
    """Graph-level store with 3D positions (for coord pretrain)."""
    rng = np.random.default_rng(seed)
    node_attr, pos_rows, edge_cols = [], [], []
    node_ptr, edge_ptr, ys = [0], [0], []
    for g in range(n_graphs):
        n = int(rng.integers(4, 12))
        src = np.arange(n - 1)
        ei = np.stack(
            [np.concatenate([src, src + 1]), np.concatenate([src + 1, src])]
        )
        node_attr.append(rng.integers(0, 5, size=(n, 2)).astype(np.int32))
        pos_rows.append(rng.normal(0, 2, size=(n, 3)).astype(np.float32))
        edge_cols.append(ei + node_ptr[-1])
        node_ptr.append(node_ptr[-1] + n)
        edge_ptr.append(edge_ptr[-1] + ei.shape[1])
        ys.append(float(g))
    np.savez(
        path,
        node_attr=np.concatenate(node_attr),
        pos=np.concatenate(pos_rows),
        edge_index=np.concatenate(edge_cols, axis=1).astype(np.int32),
        node_ptr=np.asarray(node_ptr, np.int64),
        edge_ptr=np.asarray(edge_ptr, np.int64),
        y=np.asarray(ys, np.float32)[:, None],
        train_idx=np.arange(0, 16, dtype=np.int64),
        valid_idx=np.arange(16, 20, dtype=np.int64),
        test_idx=np.arange(20, 24, dtype=np.int64),
    )


def test_coord_pipeline_percentile_boundaries(tmp_path):
    """With dataset_policy.pos_percentile_bounds=true the pipeline selects
    the pos-pretrain model family AND propagates the dataset's dict_bounds
    into every device batch as pos_boundaries_{num_bins} (ADVICE r2: the
    key was never injected, silently falling back to uniform binning;
    reference propagation at pipeline.py:159-162)."""
    from graphgpt_tpu.models import pos_pretrain
    from graphgpt_tpu.training.pipeline import PretrainPipeline

    d = tmp_path / "pcqm4m-v2"
    d.mkdir()
    _pos_graphs_npz(d / "graphs.npz")
    cfg = _base_cfg(tmp_path, task="pretrain-coord")
    cfg.tokenization.dataset = "pcqm4m-v2"
    cfg.tokenization.data_dir = str(tmp_path)
    cfg.tokenization.dataset_policy = {"pos_percentile_bounds": True}
    cfg.tokenization.semantics.node.dim = 2
    cfg.tokenization.semantics.edge.discrete = None
    cfg.tokenization.semantics.edge.dim = 0
    cfg.model.pos_num_bins = 128
    cfg.model.pos_problem_type = "pos-smtp-line"
    cfg.training.batch_size = 8
    cfg.training.max_length = 64
    cfg.training.schedule.total_num_steps = 2
    cfg.training.schedule.warmup_num_steps = 1
    pipe = PretrainPipeline(cfg).setup()
    try:
        assert pipe.forward_fn is pos_pretrain.pos_pred_forward
        assert "pos_boundaries_128" in pipe._const_batch
        # batches carry the boundaries end-to-end and the step runs
        batch = next(pipe._device_batches(epoch=0))
        assert "pos_boundaries_128" in batch
        batch.pop("_host_token_count", None)
        import jax

        with pipe.mesh:
            state, metrics = pipe.train_step(
                pipe.state, batch, jax.random.PRNGKey(0)
            )
        assert np.isfinite(float(metrics["loss"]))
    finally:
        pipe.loader.close()


def test_evaluate_only_full_gen_sweep(tmp_path):
    """evaluate_only defaults to the FULL 10-band generation sweep over the
    whole validation subset (reference eval_pt_gen_only,
    log_eval_dump_utils.py:450-501) — the 32-sample/5-band cap is gone."""
    from graphgpt_tpu.training.pipeline import PretrainPipeline

    cfg = _base_cfg(tmp_path)
    cfg.training.valid_percent = 0.2
    cfg.generation.steps = 2
    pipe = PretrainPipeline(cfg).setup()
    try:
        pipe.valid_idx = pipe.valid_idx[:8]  # shrink for test speed
        res = pipe.evaluate_only()
    finally:
        pipe.loader.close()
    gen_keys = [k for k in res if k.startswith("gen_acc@umr_")]
    assert len(gen_keys) == 10, sorted(res)
    assert "valid_loss" in res


def test_flat_tokenizer_pipeline(tmp_path):
    """tokenization.tokenizer_class='GSTTokenizer' runs the pretrain
    pipeline end to end on the flat token stream (the config knob existed
    but was never honoured — the pipeline always built the stacked
    tokenizer; reference tokenizer registry, pretrain_mode.py:160-166)."""
    from graphgpt_tpu.data.gst_tokenizer import GSTTokenizer
    from graphgpt_tpu.training.pipeline import PretrainPipeline

    cfg = _base_cfg(tmp_path, task="pretrain-mlm")
    cfg.tokenization.tokenizer_class = "GSTTokenizer"
    cfg.training.pack_tokens = 1
    cfg.training.schedule.logging_steps = 2
    cfg.training.schedule.total_num_steps = 4
    cfg.training.schedule.warmup_num_steps = 1
    cfg.training.do_valid = False
    pipe = PretrainPipeline(cfg).setup()
    try:
        assert isinstance(pipe.tokenizer, GSTTokenizer)
        assert pipe.cfg.model.stacked_feat == 1
        batch = next(pipe._device_batches(epoch=0))
        assert batch["input_ids"].ndim == 2  # flat [B, P] stream
        pipe.run()
    finally:
        pipe.loader.close()
    import csv

    with open(os.path.join(cfg.training.output_dir, "log.csv")) as f:
        rows = list(csv.DictReader(f))
    assert rows and np.isfinite(float(rows[-1]["loss"]))


def test_pretrain_block_aligned_packing(tmp_path):
    """pack_block end to end: the pipeline propagates attn_block to the
    model (train step runs the factorised attention), the loader emits
    block-aligned segment ids, and eval uses the un-factorised config
    (eval batches may be unpacked)."""
    from graphgpt_tpu.training.pipeline import PretrainPipeline

    cfg = _base_cfg(tmp_path, task="pretrain-mlm")
    cfg.training.pack_tokens = 1
    cfg.training.pack_block = 64
    cfg.training.schedule.total_num_steps = 4
    cfg.training.schedule.logging_steps = 2
    cfg.training.schedule.warmup_num_steps = 1
    cfg.training.do_valid = True
    cfg.training.valid_percent = 0.05
    cfg.training.tot_samples = 200
    pipe = PretrainPipeline(cfg).setup()
    assert pipe.cfg.model.attn_block == 64
    assert pipe._m_eval.attn_block == 0
    # loader rows are block-aligned: no segment crosses a 64 boundary
    batch = next(pipe.loader.epoch_batches(pipe.train_idx[:128], epoch=0))
    for row in batch["segment_ids"]:
        for sid in np.unique(row[row > 0]):
            pos = np.flatnonzero(row == sid)
            assert pos[-1] // 64 == pos[0] // 64
    state = pipe.run()
    pipe.loader.close()
    assert np.isfinite(float(state.step))
    assert os.path.exists(os.path.join(cfg.training.output_dir, "log.csv"))


def test_pt_mid_training_eval_surface(tmp_path):
    """r4 verdict Missing #3: at every steps_per_saving the pipeline logs
    valid loss AND EMA-valid loss AND a generation band sweep into
    result.csv (the reference runs all three per saving interval,
    log_eval_dump_utils.py:565-645)."""
    import csv

    from graphgpt_tpu.training.pipeline import PretrainPipeline

    cfg = _base_cfg(tmp_path, task="pretrain-mlm")
    cfg.training.pack_tokens = 1
    cfg.training.schedule.total_num_steps = 4
    cfg.training.schedule.warmup_num_steps = 1
    cfg.training.schedule.steps_per_saving = 2
    cfg.training.do_valid = True
    cfg.training.valid_percent = 0.05
    cfg.training.tot_samples = 200
    cfg.training.optimizer.use_ema = True
    cfg.training.gen_eval_bands = 2
    cfg.training.gen_eval_samples = 4
    pipe = PretrainPipeline(cfg).setup()
    try:
        pipe.run()
    finally:
        pipe.loader.close()
    with open(os.path.join(cfg.training.output_dir, "result.csv")) as f:
        rows = list(csv.DictReader(f))
    assert rows, "no result.csv rows written at save points"
    last = rows[-1]
    assert np.isfinite(float(last["valid_loss"]))
    assert np.isfinite(float(last["ema_valid_loss"]))
    band_cols = [k for k in last if k.startswith("gen_acc@umr_")]
    assert len(band_cols) == 2, last.keys()
    for k in band_cols:
        v = float(last[k])
        assert 0.0 <= v <= 1.0


def test_band_edge_labels_exact():
    """{:.1f}-only formatting mislabelled non-divisor-of-10 band edges
    (n_bands=4: 0.25 -> '0.2'); the helper keeps one decimal only when
    exact so historical n_bands=10 keys are unchanged."""
    from graphgpt_tpu.training.pipeline import _band_edge

    assert _band_edge(0.0) == "0.0"
    assert _band_edge(0.5) == "0.5"
    assert _band_edge(1.0) == "1.0"
    assert _band_edge(0.25) == "0.25"
    assert _band_edge(0.75) == "0.75"
    # n_bands=10 edges keep their single-decimal historical form
    for b in range(10):
        assert _band_edge(b / 10) == f"{b / 10:.1f}"


def test_cap_to_full_batches():
    """Shared cap logic for every partitioned-corpus batch site: None on a
    zero cap (uniform skip), full-batch repetition below one batch (the
    loader's drop_last would otherwise discard the sole partial buffer),
    full-batch truncation above."""
    from graphgpt_tpu.parallel.mesh import cap_to_full_batches

    idx = np.arange(10)
    assert cap_to_full_batches(idx, 0, 4) is None
    # below one batch: repeated up to exactly bs rows
    out = cap_to_full_batches(idx, 3, 4)
    assert list(out) == [0, 1, 2, 0]
    # cyclic repetition keeps adjacent pairs adjacent for an even cap
    pairs = np.repeat(np.arange(3), 2)  # [0,0,1,1,2,2]
    out = cap_to_full_batches(pairs, 6, 8)
    assert list(out) == [0, 0, 1, 1, 2, 2, 0, 0]
    # above one batch: truncated to a multiple of bs
    out = cap_to_full_batches(idx, 9, 4)
    assert list(out) == list(range(8))
