"""Configuration dataclasses for graph-gpt-tpu.

Mirrors the reference's four config groups (tokenization / model / training /
generation; reference: configs/config.yaml, src/conf/base_configs.py:186-203)
as plain dataclasses with YAML loading and `key.subkey=value` CLI overrides,
without a Hydra dependency.

Derived-field logic follows the reference:
  - architecture defaults intermediate=4*hidden, head_dim=64
    (reference: src/utils/modules_utils.py:36-42)
  - stacked_feat = 1 + node_dim + edge_dim for stack_method=short,
    2 + node_dim + edge_dim for long (reference: src/conf/base_configs.py:206-223)
  - next_n_token = stacked_feat for pretrain (reference: modules_utils.py:76)
  - pretrain-mlm forces bidirectional attention (reference: modules_utils.py:71-73)
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Tuple

# ---------------------------------------------------------------------------
# Task types (reference: src/conf/base_configs.py:11-25)
# ---------------------------------------------------------------------------
TASK_TYPES = {
    "pretrain",
    "pretrain-mlm",
    "pretrain-smtp",
    "pretrain-cl",
    "pretrain-ltp",
    "pretrain-euler",
    "pretrain-coord",
    "pretrain-coord-cl",
    "pretrain-mlm-coord",
    "graph",
    "edge",
    "node",
    "nodev2",
}

PRETRAIN_TASKS = {t for t in TASK_TYPES if t.startswith("pretrain")}


# ---------------------------------------------------------------------------
# Tokenization config group
# ---------------------------------------------------------------------------
@dataclass
class SemanticsAttrConfig:
    """Per node/edge/graph attribute tokenization schema."""

    discrete: Optional[str] = None  # attr field name, e.g. "node_attr"
    dim: int = 0  # number of discrete columns
    continuous: Optional[str] = None
    ignored_val: Optional[int] = None
    embed: Optional[str] = None  # raw float embedding field name
    embed_dim: int = 0
    share_vocab: bool = False


@dataclass
class SemanticsConfig:
    attr_assignment: str = "first"  # first|last|random|all|mix
    attr_shuffle: bool = False
    node: SemanticsAttrConfig = field(default_factory=SemanticsAttrConfig)
    edge: SemanticsAttrConfig = field(default_factory=SemanticsAttrConfig)
    graph: SemanticsAttrConfig = field(default_factory=SemanticsAttrConfig)
    reserved_tokens: Tuple[str, ...] = tuple(f"semantics_{i}" for i in range(10))
    # instruction-tuning generators (reference semantics.instructions.func):
    # homo_lumo|cepdb_prop_all
    instruct_funcs: Tuple[str, ...] = ()


@dataclass
class StructureNodeConfig:
    bos_token: str = "<bos>"
    eos_token: str = "<eos>"
    new_node_token: str = "<new>"
    node_scope: int = 512
    scope_base: int = 512
    cyclic: int = 1  # 0 normal / 1 cyclic / 2 random (nx_utils.py:234-260)


@dataclass
class StructureEdgeConfig:
    remove_edge_type_token: bool = True
    in_token: str = "<edge_in>"
    out_token: str = "<edge_out>"
    bi_token: str = "<edge_bi>"
    jump_token: str = "<edge_jump>"


@dataclass
class StructureConfig:
    node: StructureNodeConfig = field(default_factory=StructureNodeConfig)
    edge: StructureEdgeConfig = field(default_factory=StructureEdgeConfig)
    summary_token: str = "<gsum>"
    mask_token: str = "<mask>"
    icl_token: str = "<icl>"
    sep_token: str = "<sep>"
    reserved_tokens: Tuple[str, ...] = tuple(f"structure_{i}" for i in range(10))
    # structure-understanding auxiliary tasks appended during pretraining
    # (reference structure.nx.func list): degree|triangles|shortest_path|...
    nx_funcs: Tuple[str, ...] = ()


@dataclass
class TokenizationConfig:
    tokenizer_class: str = "StackedGSTTokenizer"  # or "GSTTokenizer"
    dataset: str = "synthetic_mol"
    data_dir: str = "./data"
    vocab_file: str = "vocab"
    attr_world_identifier: str = "molecule"
    # append the trailing eos row to TASK sequences (reference tokenizer
    # default True, tokenizer.py:36,525-526; pretrain rows always carry it)
    add_eos: bool = True
    stack_method: str = "short"  # short|long
    label_tokens_to_pad: Tuple[str, ...] = ()
    semantics: SemanticsConfig = field(default_factory=SemanticsConfig)
    structure: StructureConfig = field(default_factory=StructureConfig)
    rotation: str = "anchor_rotate"  # 3D positions: anchor_rotate|trans_rotate
    # split-policy knobs applied by graph-level readers (reference
    # _readers/pcqm4mv2.py:344-428): true_valid, test_large,
    # remove_special {edge0,node1,node2,disconnected}, duplicate_train
    dataset_policy: Dict[str, Any] = field(default_factory=dict)

    @property
    def stacked_feat(self) -> int:
        """1 (short) or 2 (long) structural slots + attr dims.

        Reference: src/conf/base_configs.py:206-223.
        """
        base = 1 if self.stack_method == "short" else 2
        return base + self.semantics.node.dim + self.semantics.edge.dim


# ---------------------------------------------------------------------------
# Model config group
# ---------------------------------------------------------------------------
# the reference's published architecture matrix (tiny 128x2 ... xxlarge
# 1600x48; examples/graph_lvl/pcqm4m_v2_pretrain.sh:158-233). Irregular
# entries carry their explicit intermediate/head settings (small12 is the
# 1x-MLP 32-per-head variant).
_MODEL_SIZES = {
    "tiny": dict(hidden_size=128, num_hidden_layers=2),
    "tiny6": dict(
        hidden_size=128, num_hidden_layers=6, intermediate_size=512,
        num_attention_heads=4, head_dim=32,
    ),
    "mini": dict(hidden_size=256, num_hidden_layers=4),
    "small": dict(hidden_size=512, num_hidden_layers=4),
    "small12": dict(
        hidden_size=384, num_hidden_layers=12, intermediate_size=384,
        num_attention_heads=12, head_dim=32,
    ),
    "medium": dict(hidden_size=512, num_hidden_layers=8),
    "base": dict(hidden_size=768, num_hidden_layers=12),
    "base24": dict(hidden_size=768, num_hidden_layers=24),
    "base48": dict(hidden_size=768, num_hidden_layers=48),
    "large": dict(hidden_size=1024, num_hidden_layers=24),
    "large48": dict(hidden_size=1024, num_hidden_layers=48),
    "xlarge": dict(hidden_size=1280, num_hidden_layers=36),
    "xlarge48": dict(hidden_size=1280, num_hidden_layers=48),
    "xxlarge": dict(hidden_size=1600, num_hidden_layers=48),
}


@dataclass
class ModelConfig:
    # named architecture shorthand (the reference launch scripts' size
    # table, examples/graph_lvl/pcqm4m_v2_pretrain.sh:158-233): when set,
    # finalize() expands it into hidden_size/num_hidden_layers (+
    # intermediate_size/heads for the irregular entries). Explicit dims in
    # the config/CLI win only when `size` is empty.
    size: str = ""  # tiny|tiny6|mini|small|small12|medium|base|base24|base48|large|large48|xlarge|xlarge48|xxlarge
    vocab_size: int = 0  # filled from tokenizer
    hidden_size: int = 128
    intermediate_size: int = 0  # 0 => 4*hidden
    num_hidden_layers: int = 2
    num_attention_heads: int = 0  # 0 => hidden//64
    num_key_value_heads: int = 0  # 0 => num_attention_heads
    head_dim: int = 0  # 0 => 64
    hidden_act: str = "gelu"
    max_position_embeddings: int = 1024
    initializer_range: float = 0.02
    rms_norm_eps: float = 1e-6
    rope_theta: float = 10000.0
    rope_range: int = 0
    rope_resonance: bool = False  # integer-wavelength Resonance RoPE
    # HF-style rope_scaling passthrough (reference RopeScalingConfig,
    # src/conf/model/model_configs.py:274, configuration_graphgpt.py:321-334):
    # {"rope_type": "linear"|"dynamic"|"yarn"|"llama3", "factor": float, ...}
    rope_scaling: Optional[dict] = None
    tie_word_embeddings: bool = False
    causal_attention: bool = False
    attention_bias: bool = False
    mlp_bias: bool = False

    # dropout trio + stochastic depth + layer scale
    attention_dropout: float = 0.0
    embed_dropout: float = 0.0
    mlp_dropout: float = 0.0
    path_dropout: float = 0.0  # DropPath max rate, linearly increasing per layer
    layer_scale_init_value: float = 0.0

    # graph input stacking
    stacked_feat: int = 1
    stack_method: str = "short"
    stacked_feat_agg_method: str = "sum"  # sum|gated
    embed_dim: int = 0  # external raw-embedding input dim

    # pretrain head
    next_n_token: int = 1
    use_generative: bool = True
    use_discriminative: bool = False
    focal_gamma: float = 0.0
    smtp_inside: bool = False
    smtp_power: float = 1.0

    # 3D-position pretrain head (GraphGPTPosPred; reference
    # configs/model/base.yaml pos_pt_head block)
    pos_problem_type: str = "pos-smtp-line"  # pos-smtp-line|pos-smtp-cube|pos-smtp-mix
    pos_num_bins: int = 256  # line bins (or cube bins per axis)
    pos_num_bins_line: int = 256  # mix: line-token bins
    pos_num_bins_cube: int = 32  # mix: cube-token bins per axis
    smtp_3d_power: float = 1.0  # -1 cosine, -2 arccos, else polynomial
    smtp_3d_noise_scale: float = 0.2
    coord_lvl_mask: bool = True
    pos_agg_method: str = "sum"  # sum|gated for the 3-coord line tokens
    smtp_2d_rate: float = 0.1
    sep_2d3d_inputs: bool = True
    pos_range: str = "p1p"
    loss_agg: str = "token-lvl"  # token-lvl|sample-lvl

    # denoising double-heads FT head (reference denoise_head block)
    noise_scale: float = 0.35
    denoise_wgt: float = 1.0
    denoise_schedule_pow: float = 0.0
    bi_causal_split: int = 0  # >0: binary-energy decoding suffix length
    r_2d: float = 4.0
    r_3d: float = 0.0
    r_both: float = 6.0
    add_pos_type: bool = True
    smtp_3d: bool = False
    smtp_wgt: float = 1.0
    smtp_vocab: int = 256
    # label every valid position (denoise-style) instead of only the
    # schedule-masked ones (reference smtp_denoise, modeling_finetune.py:509)
    smtp_denoise: bool = False

    # finetune head
    task_type: str = "pretrain-mlm"
    problem_type: str = ""  # regression|single_label_classification|multi_label_classification
    pooling_method: str = "last"
    mlp: Tuple[int, ...] = ()
    head_dropout: float = 0.0
    loss_type: str = ""  # l1|mse|auc|token_ce|token_ce_intra|ce
    num_labels: int = 1
    num_neg: int = 1
    use_aux: bool = False  # auxiliary NTP head during finetune

    # special tokens. pad is pinned to 0 by the vocab builder (structure
    # tokens are laid out with <pad> first) — the reference consumes
    # pad_token_id only to derive sequence lengths for last-token pooling
    # (modeling_finetune.py:284-292), which here comes from segment_ids
    # (heads.last_token_pool); cls_token_id is schema parity only (the
    # reference asserts pooling_method=='last' and never reads it).
    pad_token_id: int = 0
    bos_token_id: int = 1
    eos_token_id: int = 2
    mask_token_id: int = 0  # filled from tokenizer
    cls_token_id: int = 0

    # numerics
    dtype: str = "bfloat16"  # activation/compute dtype
    remat: bool = False  # activation rematerialisation per layer
    remat_policy: str = "full"  # full|pairs|quads|dots|save_attn
    attn_impl: str = "auto"  # auto|pallas|xla
    # fused Pallas MLP kernel (ops/mlp.py): auto resolves to "on" when the
    # execution mesh is TPU (pipelines resolve it at setup; +5.5% step
    # throughput on v5e — PERF.md round 4), "off" elsewhere
    mlp_kernel: str = "auto"  # auto|on|off
    # block-aligned-packing window (0 = off): set alongside
    # training.pack_block — the loader guarantees no packed segment crosses
    # an attn_block boundary, so attention runs at P=attn_block
    # (ops/attention.py) for G/P of the dense cost
    attn_block: int = 0

    def finalize(self) -> "ModelConfig":
        """Resolve derived architecture fields (modules_utils.py:36-42)."""
        # loud guards for schema-parity fields with no kernel support here
        # (the reference's Llama configs keep both False on every model)
        assert not self.attention_bias and not self.mlp_bias, (
            "projection biases are not implemented (reference GraphGPT "
            "models run bias-free Llama projections)"
        )
        assert self.pad_token_id == 0, (
            "pad_token_id is pinned to 0 by the vocab builder layout"
        )
        if self.size:
            spec = _MODEL_SIZES[self.size]
            self.hidden_size = spec["hidden_size"]
            self.num_hidden_layers = spec["num_hidden_layers"]
            self.intermediate_size = spec.get(
                "intermediate_size", self.intermediate_size
            )
            self.num_attention_heads = spec.get(
                "num_attention_heads", self.num_attention_heads
            )
            if "head_dim" in spec:
                self.head_dim = spec["head_dim"]
        if self.intermediate_size == 0:
            self.intermediate_size = self.hidden_size * 4
        if self.head_dim == 0:
            self.head_dim = 64
        if self.num_attention_heads == 0:
            assert self.hidden_size % self.head_dim == 0
            self.num_attention_heads = self.hidden_size // self.head_dim
        if self.num_key_value_heads == 0:
            self.num_key_value_heads = self.num_attention_heads
        if self.task_type in ("pretrain-mlm", "pretrain-mlm-coord"):
            self.causal_attention = False
        return self


# ---------------------------------------------------------------------------
# Training config group
# ---------------------------------------------------------------------------
@dataclass
class MlmScheduleConfig:
    """SMTP mask-ratio schedule (reference: training/base.yaml pretrain_mlm)."""

    name: str = "polynomial"  # polynomial|cosine|fixed
    fixed_ratio: float = 0.7
    power: float = 1.0
    mtp: Tuple[float, float, float] = (1.0, 0.0, 0.0)  # mask/random/keep split
    umr_clip: Tuple[float, float] = (0.01, 0.99)
    dlm_wgt: bool = True
    num_gen_samples: int = 128


@dataclass
class ScheduleConfig:
    epochs: int = 0
    warmup_epochs: float = 0.0
    total_tokens: float = 1e9
    warmup_tokens: float = 1e8
    total_num_steps: int = 0
    warmup_num_steps: int = 0
    logging_steps: int = 100
    steps_per_saving: int = 0


@dataclass
class OptimizerConfig:
    name: str = "adamw"
    lr: float = 3e-4
    min_lr: float = 0.0
    betas: Tuple[float, float] = (0.9, 0.95)
    weight_decay: float = 0.1
    eps: float = 1e-6
    max_grad_norm: float = 1.0
    gradient_accumulation_steps: int = 1
    # warmup_decay|onecycle|cosine|constant|cyclic|cosine_wr|lr_range_test
    scheduler: str = "warmup_decay"
    # cyclic / cosine-warm-restarts knobs (reference loss_utils.py:170-367)
    cycle_steps: int = 0  # 0 => total_steps // 4
    cycle_mult: float = 1.0  # T_mult for cosine_wr
    use_ema: bool = False
    ema_decay: float = 0.9999
    # >0 engages layer-wise LR decay: layer i scaled by decay^(L-1-i)
    # (reference get_layerwise_param_groups*, src/utils/loss_utils.py:270-412)
    layerwise_lr_decay: float = 0.0


@dataclass
class MeshConfig:
    """Device mesh layout. Products must divide available devices."""

    data: int = -1  # -1 => all remaining devices
    fsdp: int = 1
    seq: int = 1  # ring-attention sequence parallelism (SURVEY §5.7 stretch)
    tensor: int = 1


@dataclass
class TrainingConfig:
    output_dir: str = "./exp/run"
    pretrain_cpt: str = ""
    task_type: str = "pretrain-mlm"
    pretrain_mlm: MlmScheduleConfig = field(default_factory=MlmScheduleConfig)
    schedule: ScheduleConfig = field(default_factory=ScheduleConfig)
    optimizer: OptimizerConfig = field(default_factory=OptimizerConfig)
    mesh: MeshConfig = field(default_factory=MeshConfig)
    batch_size: int = 128  # global batch size
    # global eval batch size (reference batch_size_eval, loader_utils.py:
    # 451-472); 0 = use batch_size
    batch_size_eval: int = 0
    max_length: int = 1024
    pad_to_multiple_of: int = 8
    pack_tokens: float = 0.0  # >0 enables sequence packing to mpe
    # block-aligned packing window (0 = off): samples never cross a
    # pack_block boundary within a row (best-fit lookahead fills the gaps),
    # letting attention run at P=pack_block — see ModelConfig.attn_block
    pack_block: int = 0
    # SMTP masking drawn once per packed row (reference packed-sequence
    # semantics) instead of per sample before packing
    mask_after_pack: bool = False
    num_workers: int = 8
    valid_percent: float = 0.0
    do_valid: bool = False
    # PT mid-training eval surface: the reference runs valid-loss AND a
    # generation band sweep AND an EMA-valid pass at every steps_per_saving
    # (log_eval_dump_utils.py:565-645). gen_eval_bands=0 disables the band
    # sweep at save points (evaluate_only still sweeps all 10 bands);
    # gen_eval_samples caps its cost mid-training.
    gen_eval_bands: int = 4
    gen_eval_samples: int = 32
    # evaluate the test split each eval epoch (reference do_test gates the
    # FT test loader, loader_utils.py:371; default ON here — evaluation by
    # default, set false to skip)
    do_test: bool = True
    # print one sample's tokenize->ids chain + length percentiles at setup
    # (the reference runs inspect_tokenization_results inside every
    # prepare_data, inspection_utils.py:73-143)
    inspect_tokenization: bool = True
    seed: int = 42
    tot_samples: int = 10000  # samples for tokens-per-sample estimation
    freeze: int = -1
    epoch_per_eval: int = 1
    eval_only: bool = False
    # FT eval parity knobs (reference train_cfg.ft_eval, finetune_mode.py):
    k_samplers: int = 256  # train-subset eval size (ft_eval.k_samplers)
    # TensorBoard event files under output_dir/summary (rank 0 only; off by
    # default like the reference's use_tb_writer, pretrain_mode.py:316)
    use_tb_writer: bool = False
    save_pred: bool = False  # dump per-split prediction csv at each eval
    dump_infer: bool = False  # dump test logits + pooled hidden states
    # north-star distributed input (SURVEY.md §2.2): edge-partition the
    # big-graph corpus per host with background halo feature all-to-all
    dataset_partitioned: bool = False
    halo_hops: int = 1


# ---------------------------------------------------------------------------
# Generation config group
# ---------------------------------------------------------------------------
@dataclass
class GenerationConfig:
    steps: int = 64
    alg: str = "entropy"  # origin|maskgit_plus|topk_margin|entropy
    temperature: float = 0.0
    top_p: float = 0.0  # 0 disables nucleus filtering
    top_k: int = 0  # 0 disables top-k filtering
    alg_temp: float = 0.0
    eps: float = 1e-3
    batched: bool = True


# ---------------------------------------------------------------------------
# Composed config
# ---------------------------------------------------------------------------
@dataclass
class Config:
    tokenization: TokenizationConfig = field(default_factory=TokenizationConfig)
    model: ModelConfig = field(default_factory=ModelConfig)
    training: TrainingConfig = field(default_factory=TrainingConfig)
    generation: GenerationConfig = field(default_factory=GenerationConfig)

    def sync(self) -> "Config":
        """Propagate cross-group derived fields (base_configs.py:206-301)."""
        tok = self.tokenization
        m = self.model
        m.task_type = self.training.task_type
        m.stack_method = tok.stack_method
        # the flat GSTTokenizer emits ONE token per position (no stacked
        # feature axis); only the stacked tokenizer derives
        # stacked_feat/next_n from the attr dims (base_configs.py:206-223)
        flat = tok.tokenizer_class == "GSTTokenizer"
        stacked = 1 if flat else tok.stacked_feat
        if self.training.task_type in PRETRAIN_TASKS:
            m.stacked_feat = stacked
            m.next_n_token = stacked
        else:
            m.stacked_feat = stacked
            m.next_n_token = 1
        m.embed_dim = tok.semantics.node.embed_dim + tok.semantics.edge.embed_dim
        m.max_position_embeddings = max(
            m.max_position_embeddings, self.training.max_length
        )
        m.finalize()
        return self


# ---------------------------------------------------------------------------
# Dict/YAML/CLI plumbing
# ---------------------------------------------------------------------------
def _from_dict(cls, data: Dict[str, Any]):
    if not dataclasses.is_dataclass(cls):
        return data
    kwargs = {}
    fields = {f.name: f for f in dataclasses.fields(cls)}
    for key, val in data.items():
        if key not in fields:
            raise KeyError(f"Unknown config key {key!r} for {cls.__name__}")
        ftype = fields[key].type
        default = fields[key].default_factory() if fields[key].default_factory is not dataclasses.MISSING else None  # type: ignore[misc]
        if isinstance(val, dict) and default is not None and dataclasses.is_dataclass(default):
            kwargs[key] = _from_dict(type(default), val)
        elif isinstance(val, list):
            kwargs[key] = tuple(val)
        else:
            kwargs[key] = val
    return cls(**kwargs)


def config_from_dict(data: Dict[str, Any]) -> Config:
    return _from_dict(Config, data)


def config_to_dict(cfg) -> Dict[str, Any]:
    return dataclasses.asdict(cfg)


def _parse_value(raw: str) -> Any:
    try:
        return json.loads(raw)
    except (json.JSONDecodeError, ValueError):
        return raw


def apply_overrides(cfg: Config, overrides: List[str]) -> Config:
    """Apply `group.key.subkey=value` CLI overrides in place."""
    for item in overrides:
        if "=" not in item:
            raise ValueError(f"Override {item!r} must be key=value")
        path, raw = item.split("=", 1)
        parts = path.split(".")
        obj = cfg
        for part in parts[:-1]:
            obj = getattr(obj, part)
        if not hasattr(obj, parts[-1]):
            raise AttributeError(
                f"Unknown config key {path!r} ({type(obj).__name__} has no field {parts[-1]!r})"
            )
        val = _parse_value(raw)
        if isinstance(val, list):
            val = tuple(val)
        setattr(obj, parts[-1], val)
    return cfg


def load_config(yaml_path: Optional[str] = None, overrides: Optional[List[str]] = None) -> Config:
    if yaml_path:
        import yaml  # lazy; PyYAML is available transitively

        with open(yaml_path) as f:
            data = yaml.safe_load(f) or {}
        cfg = config_from_dict(data)
    else:
        cfg = Config()
    if overrides:
        apply_overrides(cfg, overrides)
    return cfg.sync()
