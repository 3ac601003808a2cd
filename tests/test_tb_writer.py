"""Differential test: our dependency-free event writer vs tensorboard's
own event file loader (the reference's SummaryWriter output surface,
log_eval_dump_utils.py:817-866)."""

import numpy as np
import pytest

tb_loader = pytest.importorskip("tensorboard.backend.event_processing.event_file_loader")

from graphgpt_tpu.utils.tb_writer import SummaryWriter, maybe_tb_writer


def _load_events(path):
    loader = tb_loader.LegacyEventFileLoader(path)
    return list(loader.Load())


def test_scalars_roundtrip(tmp_path):
    w = SummaryWriter(str(tmp_path))
    w.add_scalar("train/loss", 1.25, step=10)
    w.add_scalar("train/lr", 3e-4, step=10)
    w.add_scalar("train/loss", 0.75, step=20)
    w.close()

    events = _load_events(w.path)
    assert events[0].file_version == "brain.Event:2"
    scalars = [
        (e.step, v.tag, v.simple_value)
        for e in events
        for v in e.summary.value
        if v.HasField("simple_value")
    ]
    assert (10, "train/loss", 1.25) in scalars
    assert (20, "train/loss", 0.75) in scalars
    lr = [s for s in scalars if s[1] == "train/lr"][0]
    assert abs(lr[2] - 3e-4) < 1e-9


def test_histogram_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    data = rng.normal(0, 1, size=1000)
    w = SummaryWriter(str(tmp_path))
    w.add_histogram("params/embed", data, step=5)
    w.close()

    events = _load_events(w.path)
    histos = [
        (e.step, v.tag, v.histo)
        for e in events
        for v in e.summary.value
        if v.HasField("histo")
    ]
    assert len(histos) == 1
    step, tag, h = histos[0]
    assert step == 5 and tag == "params/embed"
    assert h.num == 1000
    np.testing.assert_allclose(h.min, data.min())
    np.testing.assert_allclose(h.max, data.max())
    np.testing.assert_allclose(h.sum, data.sum(), rtol=1e-12)
    assert sum(h.bucket) == 1000


def test_maybe_tb_writer_gating(tmp_path):
    assert maybe_tb_writer(str(tmp_path), False, 0) is None
    assert maybe_tb_writer(str(tmp_path), True, 1) is None
    w = maybe_tb_writer(str(tmp_path), True, 0)
    assert w is not None
    w.close()
    import os

    assert os.path.dirname(w.path).endswith("summary")


def test_pipeline_writes_tb_events(tmp_path):
    """use_tb_writer=true produces tensorboard-readable scalar curves and
    parameter histograms from the pretrain pipeline."""
    from graphgpt_tpu.config import Config
    from graphgpt_tpu.training.pipeline import PretrainPipeline

    cfg = Config()
    cfg.tokenization.semantics.node.discrete = "node_attr"
    cfg.tokenization.semantics.node.dim = 9
    cfg.tokenization.semantics.edge.discrete = "edge_attr"
    cfg.tokenization.semantics.edge.dim = 3
    cfg.model.hidden_size = 64
    cfg.model.num_hidden_layers = 2
    cfg.model.head_dim = 16
    cfg.model.dtype = "float32"
    cfg.training.batch_size = 8
    cfg.training.max_length = 64
    cfg.training.num_workers = 0
    cfg.training.pack_tokens = 1
    cfg.training.schedule.total_num_steps = 4
    cfg.training.schedule.warmup_num_steps = 1
    cfg.training.schedule.logging_steps = 2
    cfg.training.do_valid = False
    cfg.training.use_tb_writer = True
    cfg.training.output_dir = str(tmp_path / "run")
    pipe = PretrainPipeline(cfg).setup()
    pipe.run()

    import glob
    import os

    files = glob.glob(os.path.join(cfg.training.output_dir, "summary", "events.*"))
    assert files, "no event file written"
    events = _load_events(files[0])
    tags = {v.tag for e in events for v in e.summary.value}
    assert "train/loss" in tags
    assert any(t.startswith("params/") for t in tags)
