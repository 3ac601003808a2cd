"""Every shipped preset YAML must load into a valid, synced Config.

The presets mirror the reference's launch-script matrix
(examples/**/*.sh + configs/tokenization/**, SURVEY.md §2.3 "Shell
launchers"); this test pins the schema so presets can't rot.
"""

import glob
import os

import pytest

from graphgpt_tpu.config import PRETRAIN_TASKS, TASK_TYPES, load_config

CONFIG_DIR = os.path.join(os.path.dirname(__file__), "..", "configs")
PRESETS = sorted(glob.glob(os.path.join(CONFIG_DIR, "*.yaml")))


@pytest.mark.parametrize("path", PRESETS, ids=[os.path.basename(p) for p in PRESETS])
def test_preset_loads_and_syncs(path):
    cfg = load_config(path)
    assert cfg.training.task_type in TASK_TYPES
    assert cfg.model.hidden_size % cfg.model.head_dim == 0
    assert cfg.model.num_attention_heads == cfg.model.hidden_size // cfg.model.head_dim
    # stacked_feat/next_n derivations (base_configs.py:206-223 semantics)
    tok = cfg.tokenization
    base = 1 if tok.stack_method == "short" else 2
    assert cfg.model.stacked_feat == base + tok.semantics.node.dim + tok.semantics.edge.dim
    if cfg.training.task_type in PRETRAIN_TASKS:
        assert cfg.model.next_n_token == cfg.model.stacked_feat
    else:
        assert cfg.model.next_n_token == 1
    if cfg.training.task_type in ("pretrain-mlm", "pretrain-mlm-coord"):
        assert not cfg.model.causal_attention


def test_preset_matrix_covers_reference_launchers():
    """One preset per reference launch script family (SURVEY.md §2.3)."""
    names = {os.path.basename(p) for p in PRESETS}
    for required in (
        "pcqm4m_v2_pretrain.yaml",
        "pcqm4m_v2_supervised.yaml",
        "ogbg_molpcba_pretrain.yaml",
        "ogbg_molpcba_supervised.yaml",
        "ogbl_ppa_pretrain.yaml",
        "ogbl_ppa_supervised.yaml",
        "ogbl_citation2_supervised.yaml",
        "ogbl_wikikg2_supervised.yaml",
        "ogbn_proteins_pretrain.yaml",
        "ogbn_proteins_supervised.yaml",
        "ogbn_products_supervised.yaml",
        "spice_circuit_pretrain.yaml",
        "spice_circuit_supervised.yaml",
        "reddit_pretrain.yaml",
        "reddit_supervised.yaml",
        "toy_pretrain.yaml",
    ):
        assert required in names, f"missing preset {required}"


def test_finetune_presets_reference_pretrain_output_dirs():
    for path in PRESETS:
        cfg = load_config(path)
        if cfg.training.task_type in ("graph", "edge", "node", "nodev2"):
            if cfg.training.pretrain_cpt:
                assert cfg.training.pretrain_cpt.startswith("./exp/")


def test_model_size_shorthand():
    """model.size expands the reference launch matrix
    (pcqm4m_v2_pretrain.sh:158-233) through finalize(), including the
    irregular tiny6/small12 entries."""
    from graphgpt_tpu.config import ModelConfig

    m = ModelConfig(size="base").finalize()
    assert (m.hidden_size, m.num_hidden_layers) == (768, 12)
    assert m.intermediate_size == 768 * 4 and m.num_attention_heads == 12

    m = ModelConfig(size="small12").finalize()
    assert (m.hidden_size, m.num_hidden_layers) == (384, 12)
    assert m.intermediate_size == 384  # 1x hidden
    assert m.num_attention_heads == 12 and m.head_dim == 32

    m = ModelConfig(size="xxlarge").finalize()
    assert (m.hidden_size, m.num_hidden_layers) == (1600, 48)

    # dotted CLI override path
    from graphgpt_tpu.config import Config, apply_overrides

    cfg = Config()
    apply_overrides(cfg, ["model.size=large"])
    cfg.sync()
    assert cfg.model.hidden_size == 1024 and cfg.model.num_hidden_layers == 24
