"""Device mesh construction and sharding rules.

Replaces the reference's NCCL process groups (src/utils/misc_utils.py:507-539,
DeepSpeed ZeRO-2) with a jax.sharding.Mesh over (data, fsdp, tensor) axes:

  - data: pure data parallelism (grad psum inserted by pjit),
  - fsdp: parameter/optimizer-state sharding (the ZeRO equivalent,
    ds_config2_pt.json stage-2 semantics) — batch is also split over fsdp,
  - tensor: Megatron-style tensor parallelism following the reference's
    declarative tp plan (colwise q/k/v/gate/up, rowwise o/down;
    src/conf/model/model_configs.py:307-317 — declared there, executed here).

On multi-host slices, axes are laid out so `tensor` rides ICI within a host
group and `data` spans DCN (mesh axis order gives ICI-contiguity to the
trailing axes).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import MeshConfig

AXES = ("data", "fsdp", "seq", "tensor")


def make_mesh(cfg: Optional[MeshConfig] = None, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    fsdp = cfg.fsdp if cfg else 1
    seq = getattr(cfg, "seq", 1) if cfg else 1
    tensor = cfg.tensor if cfg else 1
    data = cfg.data if cfg else -1
    if data == -1:
        assert n % (fsdp * seq * tensor) == 0, (
            f"{n} devices not divisible by fsdp*seq*tensor"
        )
        data = n // (fsdp * seq * tensor)
    assert data * fsdp * seq * tensor == n, (
        f"mesh {data}x{fsdp}x{seq}x{tensor} != {n} devices"
    )
    arr = np.asarray(devices).reshape(data, fsdp, seq, tensor)
    return Mesh(arr, AXES)


def current_mesh() -> Optional[Mesh]:
    """The mesh entered via `with mesh:` (used by ops that need the mesh at
    trace time, e.g. the ring-attention shard_map)."""
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("ignore", DeprecationWarning)
        from jax.interpreters import pxla

        m = pxla.thread_resources.env.physical_mesh
    return None if m.empty else m


def initialize_multihost(
    coordinator: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Multi-host bring-up (replaces dist.init_process_group; NCCL env
    handling at misc_utils.py:507-539). Explicit args or GGT_NUM_PROCESSES /
    GGT_PROCESS_ID env vars; no-op on a single process."""
    import os

    num_processes = num_processes or int(os.environ.get("GGT_NUM_PROCESSES", "0")) or None
    if process_id is None and "GGT_PROCESS_ID" in os.environ:
        process_id = int(os.environ["GGT_PROCESS_ID"])
    if coordinator:
        jax.distributed.initialize(
            coordinator_address=coordinator,
            num_processes=num_processes,
            process_id=process_id,
        )
    else:
        try:
            jax.distributed.initialize()
        except Exception:
            pass  # single-process


# ---------------------------------------------------------------------------
# Partition specs
# ---------------------------------------------------------------------------
def batch_pspec() -> P:
    return P(("data", "fsdp"))


def _layer_specs() -> Dict[str, P]:
    # stacked per-layer weights carry a leading L axis (never sharded)
    return {
        "attn_norm": P(None, None),
        "mlp_norm": P(None, None),
        # colwise: shard output dim over tensor; fsdp shards the input dim
        "q": P(None, "fsdp", "tensor"),
        "k": P(None, "fsdp", "tensor"),
        "v": P(None, "fsdp", "tensor"),
        "gate": P(None, "fsdp", "tensor"),
        "up": P(None, "fsdp", "tensor"),
        # rowwise: shard input dim over tensor
        "o": P(None, "tensor", "fsdp"),
        "down": P(None, "tensor", "fsdp"),
        "ls1": P(None, None),
        "ls2": P(None, None),
    }


def param_pspecs(params: Dict[str, Any]) -> Dict[str, Any]:
    """PartitionSpec tree mirroring a params tree from models.heads init."""
    specs: Dict[str, Any] = {}
    layer_rules = _layer_specs()
    for key, val in params.items():
        if key == "layers":
            specs[key] = {k: layer_rules[k] for k in val}
        elif key == "embed_tokens":
            specs[key] = P("fsdp", "tensor")
        elif key in ("lm_head", "n_token_proj", "cl_proj", "embed_proj"):
            specs[key] = P("fsdp", "tensor")
        elif key == "score_mlp":
            specs[key] = [
                {k: P(None) for k in layer} for layer in val
            ]
        elif isinstance(val, list):
            specs[key] = [jax.tree_util.tree_map(lambda _: P(None), v) for v in val]
        else:
            ndim = getattr(val, "ndim", 0)
            specs[key] = P(*([None] * ndim))
    return specs


def named_sharding_tree(mesh: Mesh, spec_tree):
    return jax.tree_util.tree_map(
        lambda s: NamedSharding(mesh, s),
        spec_tree,
        is_leaf=lambda x: isinstance(x, P),
    )


# batch keys whose axis 1 is the SEQUENCE axis (sharded over `seq` when the
# mesh has sequence parallelism); task labels etc. stay batch-sharded only
_SEQ_KEYS = frozenset(
    {
        "input_ids",
        "labels",
        "position_ids",
        "segment_ids",
        "attention_mask",
        "pos",
        "pos_type",
        "node_idx",
        "raw_node_idx",
        "nodev2_labels",
    }
)


def shard_batch(mesh: Mesh, batch: Dict[str, Any]) -> Dict[str, Any]:
    """Device-put host arrays with the batch axis split over data*fsdp (and,
    for sequence-keyed arrays on a sequence-parallel mesh, the P axis split
    over `seq` so ring attention consumes them without resharding).

    Multi-process: each host passes its LOCAL batch shard and the global
    array is assembled across processes (the jax equivalent of the
    reference's rank-strided samplers, loader_utils.py:70-90)."""
    out = {}
    multi = jax.process_count() > 1
    seq_n = dict(mesh.shape).get("seq", 1)
    for k, v in batch.items():
        nd = np.ndim(v)
        if (
            seq_n > 1
            and nd >= 2
            and k in _SEQ_KEYS
            and np.shape(v)[1] % seq_n == 0
        ):
            spec = P(("data", "fsdp"), "seq", *([None] * (nd - 2)))
        else:
            spec = P(("data", "fsdp"), *([None] * (nd - 1)))
        sharding = NamedSharding(mesh, spec)
        if multi:
            out[k] = jax.make_array_from_process_local_data(sharding, np.asarray(v))
        else:
            out[k] = jax.device_put(v, sharding)
    return out


def replicate(mesh: Mesh, tree):
    """Fully replicate host values over the (possibly multi-process) mesh."""
    return jax.tree_util.tree_map(
        lambda v: jax.device_put(
            v, NamedSharding(mesh, P(*([None] * np.ndim(v))))
        ),
        tree,
    )


def host_local_rows(arr) -> np.ndarray:
    """This process's rows of a global batch-sharded array, in the order the
    process contributed them — the inverse of
    make_array_from_process_local_data. Addressable shards are deduped by
    global row offset (the batch axis may be replicated over e.g. the
    `tensor` mesh axis, giving several shards with identical indices) and
    concatenated in offset order."""
    if jax.process_count() == 1:
        return np.asarray(arr)
    seen = {}
    for s in arr.addressable_shards:
        start = s.index[0].start or 0
        if start not in seen:
            seen[start] = np.asarray(s.data)
    return np.concatenate([seen[k] for k in sorted(seen)])


def all_hosts_concat(arr: np.ndarray) -> np.ndarray:
    """Concatenate equal-shape host-local arrays across processes (the
    reference's padded eval all_gather, misc_utils.py:472-504; shapes here
    are kept equal by fixed per-host batch counts instead of padding)."""
    if jax.process_count() == 1:
        return arr
    from jax.experimental import multihost_utils

    g = multihost_utils.process_allgather(arr)
    return np.asarray(g).reshape((-1,) + tuple(arr.shape[1:]))


def cross_host_min_int(value: int) -> int:
    """Minimum of a host-local int across processes. Used by the
    partitioned-corpus pipelines: each host's dataset is a DISJOINT local
    shard, so per-epoch step counts must be capped to the smallest shard
    for every process to issue identical collective steps."""
    if jax.process_count() == 1:
        return int(value)
    from jax.experimental import multihost_utils

    g = multihost_utils.process_allgather(np.asarray([int(value)], np.int64))
    return int(np.min(g))


def cap_to_full_batches(idx: np.ndarray, cap: int, bs: int):
    """Truncate a per-host index set to a cross-host cap in FULL batches.

    Shared by every partitioned-corpus batch site (the same cap logic was
    previously copy-pasted with drift between them): returns None when
    cap <= 0 — the cap is a cross-host MIN, so every process sees the
    same None and skips uniformly; repeats rows up to one full batch when
    0 < cap < bs (the loader's drop_last would otherwise discard the sole
    partial buffer — zero batches, silently — and a partial batch can't
    shard over the mesh). Cyclic np.resize repetition keeps adjacent
    pairs (pretrain-cl views) adjacent when cap is even."""
    if cap <= 0:
        return None
    if cap < bs:
        return np.resize(np.asarray(idx)[:cap], bs)
    return np.asarray(idx)[: cap - cap % bs]


def cross_host_mean_scalar(values) -> float:
    """Mean of host-local scalars across all processes (reference
    dist.reduce of eval losses, log_eval_dump_utils.py:284-291)."""
    arr = np.asarray(values, np.float64).reshape(-1)
    total, count = float(arr.sum()), float(arr.size)
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        g = multihost_utils.process_allgather(np.asarray([total, count]))
        total, count = float(np.sum(g[..., 0])), float(np.sum(g[..., 1]))
    return total / count if count else float("nan")
