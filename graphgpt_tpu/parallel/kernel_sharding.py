"""shard_map wrappers giving the Pallas compute path a multi-chip story.

GSPMD treats a Mosaic custom call as an opaque, unpartitionable op: invoked
bare inside `jax.jit` over a sharded mesh it either all-gathers the sharded
operands (replicating the kernel's compute and weights on every chip) or
fails to compile. The reference never hits this because its SDPA/CUDA
kernels run shard-local on every rank by construction under DDP/ZeRO
(reference src/training/pipeline.py:152-157, src/utils/misc_utils.py:511-515).

Here every Pallas kernel call goes through a wrapper that, when a
non-trivial mesh is active at trace time (`with mesh:` — the training
pipelines always trace inside one):

  - shards the TOKEN/BATCH dims over ("data", "fsdp", "seq") — every kernel
    is batch-parallel since mask structure derives from per-row segment ids;
  - for `tensor` > 1 the MLP kernels keep running via custom_partitioning
    with their token dim sharded over EVERY mesh axis (note 2); flash
    attention falls back to GSPMD-partitioned XLA there;
  - weights carry replicated in_specs, so the per-layer weight all-gather
    is exactly the FSDP/ZeRO-3 gather-for-compute — while activations stay
    sharded end to end (asserted by `find_activation_allgathers` over the
    compiled HLO);
  - falls back LOUDLY (one warning per call signature) to the equivalent
    XLA math when a dim doesn't divide its mesh axes — GSPMD partitions the
    plain-XLA ops fine, so odd shapes lose the kernel, not correctness.

CORRECTNESS NOTES:

1. shard_map is never differentiated here. Each wrapper is a custom_vjp
   whose forward AND backward are SEPARATE forward-only shard_maps over
   the kernels' hand-written adjoints (ops/mlp._fused_mlp_bwd etc.,
   ops/flash_attention._flash_bwd) with EXPLICIT token-axis psums for the
   weight gradients (the gradient all-reduce). Relying on shard_map's own
   transpose with check_vma=False proved unsound, and check_vma=True
   cannot infer through Pallas calls (no vma on their out_shapes).

2. `tensor` > 1 routes through jax.experimental.custom_partitioning
   instead of shard_map. jax 0.9 has a deeper partitioner bug: with
   TENSOR-SHARDED WEIGHTS anywhere in the graph, the mere presence of a
   shard_map manual region on the activation path corrupts the gradients
   of the SURROUNDING XLA-autodiffed code (a pure IDENTITY shard_map —
   fwd x*1.0, explicit custom_vjp bwd g*1.0 — flips dp-exact grads to
   ~100% wrong; one layer, no custom kernels, both GSPMD and Shardy
   partitioners, forward values exact; the canary
   tests/test_kernel_sharding.py::test_jax_tensor_sharded_shardmap_canary
   XPASSes when an upstream fix lands). custom_partitioning creates NO
   manual region — the kernel becomes a first-class partitioned op in
   GSPMD auto mode — and the same identity probe comes back grad-exact,
   with ONE caveat found by structural ablation: a custom_partitioning
   call placed INSIDE a custom_vjp backward rule re-triggers the
   corruption (forward-position cp ops are clean). Hence under tp the MLP
   kernels run via cp — their token dim partitions over every mesh axis,
   weights gathered per shard, and their backwards are plain XLA einsums
   that GSPMD handles natively — while flash attention falls back to XLA
   (its backward is itself a Pallas kernel, which would have to ride cp
   inside the custom_vjp bwd). GGT_TP_KERNELS=0 forces the plain-XLA
   fallback for the MLPs too.

Numerics pinned by tests/test_kernel_sharding.py against unsharded XLA,
gradients included, at flagship layer dimensions.
"""

from __future__ import annotations

import functools
import os
import re
import warnings
from typing import Optional

import jax
import jax.numpy as jnp
from jax.ad_checkpoint import checkpoint_name
from jax.sharding import PartitionSpec as P

# token/batch dims shard over every non-tensor axis: "data" (DP), "fsdp"
# (ZeRO batch split), and "seq" (tokens of one sequence — the MLP/norm
# kernels are token-parallel so sequence parallelism shards them too)
TOKEN_AXES = ("data", "fsdp", "seq")
TOK = P(TOKEN_AXES, None)

_warned: set = set()


def _warn_once(key: str, msg: str) -> None:
    if key not in _warned:
        _warned.add(key)
        warnings.warn(msg, stacklevel=3)


def kernel_mesh():
    """The active `with mesh:` mesh, when it is one of ours and non-trivial.

    Returns None (→ bare kernel call) for: no mesh context, a 1-device
    mesh, or a foreign mesh without our axis names (e.g. the "shard" mesh
    of parallel/dist_input)."""
    from .mesh import current_mesh

    mesh = current_mesh()
    if mesh is None:
        return None
    names = set(mesh.axis_names)
    if not {"data", "fsdp", "tensor"} <= names:
        return None
    if mesh.devices.size == 1:
        return None
    return mesh


def _counts(mesh):
    s = dict(mesh.shape)
    dp = s.get("data", 1) * s.get("fsdp", 1) * s.get("seq", 1)
    return dp, s.get("tensor", 1)


def interpret_forced() -> bool:
    """True when Pallas kernels run in the generic interpreter (CPU dryrun/
    tests exercising the REAL kernel dispatch, GGT_PALLAS_INTERPRET=1)."""
    return os.environ.get("GGT_PALLAS_INTERPRET", "0") == "1"


def pallas_platform() -> bool:
    """Whether Pallas kernels can run here: decide by the ACTIVE MESH
    devices' platform (under the axon tunnel jax.default_backend() is
    "tpu" even when the mesh is virtual CPU devices), falling back to the
    default backend with no mesh; interpret mode forces True."""
    if interpret_forced():
        return True
    from .mesh import current_mesh

    m = current_mesh()
    if m is not None and not m.empty:
        return m.devices.flat[0].platform == "tpu"
    return jax.default_backend() == "tpu"


def _fwd_only(body, mesh, in_specs, out_specs):
    """shard_map that is NEVER differentiated (wrappers pair a forward and
    an explicit backward shard_map inside a custom_vjp — see module note)."""
    return jax.shard_map(
        body, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
        check_vma=False,
    )


# ---------------------------------------------------------------------------
# MLP kernels
# ---------------------------------------------------------------------------
def _tp_fallback(mesh) -> bool:
    """True when tensor>1 AND the custom_partitioning kernel path is
    disabled (GGT_TP_KERNELS=0): kernels then fall back to plain XLA.
    shard_map is NEVER used under tensor>1 (module CORRECTNESS NOTE 2 —
    the jax 0.9 manual-region bug with tensor-sharded weights)."""
    _, tp = _counts(mesh)
    if tp > 1 and os.environ.get("GGT_TP_KERNELS", "1") == "0":
        _warn_once(
            f"tp:{tp}",
            f"tensor={tp} > 1 with GGT_TP_KERNELS=0: Pallas kernels fall "
            "back to the XLA path (GSPMD-partitioned).",
        )
        return True
    return False


def _use_cp(mesh) -> bool:
    """tensor>1 meshes run kernels via custom_partitioning (no manual
    regions — see module note 2)."""
    _, tp = _counts(mesh)
    return tp > 1


# ---------------------------------------------------------------------------
# custom_partitioning kernel path (tensor>1 meshes)
# ---------------------------------------------------------------------------
ALL_AXES = ("data", "fsdp", "seq", "tensor")


def _cp_wrap(fn, arg_spec_fn, out_spec_fn, rule: str):
    """Wrap a forward-only kernel call in custom_partitioning: the op
    becomes a first-class partitioned HLO in GSPMD AUTO mode (no manual
    region). arg_spec_fn/out_spec_fn(mesh) return PartitionSpecs; `rule`
    is the Shardy einsum-like propagation rule."""
    from jax.experimental.custom_partitioning import custom_partitioning
    from jax.sharding import NamedSharding

    cp = custom_partitioning(fn)

    def _infer(mesh, arg_infos, result_infos):
        outs = out_spec_fn(mesh)
        if isinstance(outs, tuple):
            return tuple(NamedSharding(mesh, s) for s in outs)
        return NamedSharding(mesh, outs)

    def _partition(mesh, arg_infos, result_infos):
        args = tuple(NamedSharding(mesh, s) for s in arg_spec_fn(mesh))
        outs = out_spec_fn(mesh)
        if isinstance(outs, tuple):
            res = tuple(NamedSharding(mesh, s) for s in outs)
        else:
            res = NamedSharding(mesh, outs)
        return mesh, fn, res, args

    cp.def_partition(
        infer_sharding_from_operands=_infer, partition=_partition,
        sharding_rule=rule,
    )
    return cp


@functools.lru_cache(maxsize=8)
def _cp_mlp_fn(act: str):
    """fused_mlp for tensor>1 meshes: the FORWARD Pallas kernel partitions
    its token dim over EVERY mesh axis (weights gathered per shard); the
    backward is the kernel's plain-XLA adjoint, which GSPMD partitions
    natively (tensor-sharded weight grads included)."""
    from ..ops import mlp as M

    kern = _cp_wrap(
        lambda x, wg, wu, wd: M._mlp_fwd_kernel_call(x, wg, wu, wd, act),
        lambda mesh: (P(ALL_AXES, None), P(None, None), P(None, None),
                      P(None, None)),
        lambda mesh: P(ALL_AXES, None),
        "n a, b c, e f, g i -> n j",
    )

    @jax.custom_vjp
    def f(x, wg, wu, wd):
        dt = x.dtype
        return kern(x, wg.astype(dt), wu.astype(dt), wd.astype(dt))

    f.defvjp(
        lambda x, wg, wu, wd: (f(x, wg, wu, wd), (x, wg, wu, wd)),
        lambda res, g: M._fused_mlp_bwd(act, res, g),
    )
    return f


@functools.lru_cache(maxsize=8)
def _cp_norm_mlp_fn(eps: float, act: str):
    """fused_norm_mlp for tensor>1 meshes (same structure as _cp_mlp_fn)."""
    from ..ops import mlp as M

    kern = _cp_wrap(
        lambda x, wn, wg, wu, wd: M._norm_mlp_call(x, wn, wg, wu, wd, eps, act),
        lambda mesh: (P(ALL_AXES, None), P(None), P(None, None),
                      P(None, None), P(None, None)),
        lambda mesh: P(ALL_AXES, None),
        "n a, b, c e, f g, i j -> n k",
    )

    @jax.custom_vjp
    def f(x, wn, wg, wu, wd):
        dt = x.dtype
        return kern(
            x, wn.astype(jnp.float32), wg.astype(dt), wu.astype(dt),
            wd.astype(dt),
        )

    f.defvjp(
        lambda x, wn, wg, wu, wd: (f(x, wn, wg, wu, wd), (x, wn, wg, wu, wd)),
        lambda res, g: M._fused_norm_mlp_bwd(eps, act, res, g),
    )
    return f


@functools.lru_cache(maxsize=64)
def _mlp_fn(mesh, act: str):
    """custom_vjp for act(x@wg)*(x@wu)@wd over `mesh` (tensor==1): fwd/bwd
    shard_maps around the kernel and its hand adjoint (_fused_mlp_bwd)."""
    from ..ops import mlp as M

    w_in = (P(None, None), P(None, None), P(None, None))

    def fwd_body(x, wg, wu, wd):
        return M.fused_mlp(x, wg, wu, wd, act)

    def bwd_body(x, wg, wu, wd, g):
        dx, dwg, dwu, dwd = M._fused_mlp_bwd(act, (x, wg, wu, wd), g)
        ps = lambda t: jax.lax.psum(t, TOKEN_AXES)
        return dx, ps(dwg), ps(dwu), ps(dwd)

    fwd_sm = _fwd_only(fwd_body, mesh, (TOK,) + w_in, TOK)
    bwd_sm = _fwd_only(bwd_body, mesh, (TOK,) + w_in + (TOK,), (TOK,) + w_in)

    @jax.custom_vjp
    def f(x, wg, wu, wd):
        return fwd_sm(x, wg, wu, wd)

    f.defvjp(
        lambda x, wg, wu, wd: (f(x, wg, wu, wd), (x, wg, wu, wd)),
        lambda res, g: bwd_sm(*res, g),
    )
    return f


def mlp(x, wg, wu, wd, act: str):
    """act(x@wg)*(x@wu)@wd via the fused Pallas kernel, shard-local under
    an active mesh. x: [N, D] flat tokens."""
    from ..ops.mlp import fused_mlp, xla_mlp

    mesh = kernel_mesh()
    if mesh is None:
        return fused_mlp(x, wg, wu, wd, act)
    dp, tp = _counts(mesh)
    n = x.shape[0]
    if _tp_fallback(mesh):
        return xla_mlp(x, wg, wu, wd, act)
    if n % (dp * tp):
        _warn_once(
            f"mlp:{n}:{dp}x{tp}",
            f"fused MLP kernel: tokens {n} %% {dp * tp} != 0"
            " — falling back to the XLA MLP (GSPMD-partitioned)",
        )
        return xla_mlp(x, wg, wu, wd, act)
    if _use_cp(mesh):
        return _cp_mlp_fn(act)(x, wg, wu, wd)
    return _mlp_fn(mesh, act)(x, wg, wu, wd)


def _rms_fwd32(x, wn, eps):
    """Shared forward pieces of the RMSNorm (f32): (n, rrms, hpre)."""
    x32 = x.astype(jnp.float32)
    var = jnp.mean(x32 * x32, axis=-1, keepdims=True)
    rrms = jax.lax.rsqrt(var + eps)
    nrm = x32 * rrms
    hpre = (nrm * wn.astype(jnp.float32)).astype(x.dtype)
    return nrm, rrms, hpre


@functools.lru_cache(maxsize=64)
def _norm_mlp_fn(mesh, eps: float, act: str):
    """custom_vjp for x + mlp(rmsnorm(x)*wn) over `mesh` (tensor==1): the
    single norm-fused kernel per token shard, weights replicated in."""
    from ..ops import mlp as M

    w_in = (P(None), P(None, None), P(None, None), P(None, None))

    def fwd_body(x, wn, wg, wu, wd):
        return M.fused_norm_mlp(x, wn, wg, wu, wd, eps, act)

    def bwd_body(x, wn, wg, wu, wd, g):
        dx, dwn, dwg, dwu, dwd = M._fused_norm_mlp_bwd(
            eps, act, (x, wn, wg, wu, wd), g
        )
        ps = lambda t: jax.lax.psum(t, TOKEN_AXES)
        return dx, ps(dwn), ps(dwg), ps(dwu), ps(dwd)

    fwd_sm = _fwd_only(fwd_body, mesh, (TOK,) + w_in, TOK)
    bwd_sm = _fwd_only(bwd_body, mesh, (TOK,) + w_in + (TOK,), (TOK,) + w_in)

    @jax.custom_vjp
    def f(x, wn, wg, wu, wd):
        return fwd_sm(x, wn, wg, wu, wd)

    f.defvjp(
        lambda x, wn, wg, wu, wd: (f(x, wn, wg, wu, wd), (x, wn, wg, wu, wd)),
        lambda res, g: bwd_sm(*res, g),
    )
    return f


def norm_mlp(x, wn, wg, wu, wd, eps: float, act: str):
    """x + mlp(rmsnorm(x)*wn) — the norm-fused kernel, shard-local under an
    active mesh."""
    from ..ops.mlp import fused_norm_mlp, xla_mlp

    mesh = kernel_mesh()
    if mesh is None:
        return fused_norm_mlp(x, wn, wg, wu, wd, eps, act)
    dp, tp = _counts(mesh)
    n = x.shape[0]
    if _tp_fallback(mesh) or n % (dp * tp):
        if n % (dp * tp):
            _warn_once(
                f"norm_mlp:{n}:{dp}x{tp}",
                f"norm-fused MLP kernel: tokens {n} %% {dp * tp} != 0"
                " — falling back to the XLA norm+MLP (GSPMD-partitioned)",
            )
        from ..models.modeling import rms_norm

        return x + xla_mlp(rms_norm(x, wn, eps), wg, wu, wd, act)
    if _use_cp(mesh):
        return _cp_norm_mlp_fn(float(eps), act)(x, wn, wg, wu, wd)
    return _norm_mlp_fn(mesh, float(eps), act)(x, wn, wg, wu, wd)


@functools.lru_cache(maxsize=64)
def _norm_qkv_fn(mesh, eps: float):
    """custom_vjp for (q,k,v) = rmsnorm(x)*wn @ (wq|wk|wv) over `mesh`
    (tensor==1): token-sharded, weights replicated in."""
    from ..ops import mlp as M

    w_in = (P(None), P(None, None), P(None, None), P(None, None))
    o_spec = (TOK,) * 3

    def fwd_body(x, wn, wq, wk, wv):
        return tuple(M.fused_norm_qkv(x, wn, wq, wk, wv, eps))

    def bwd_body(x, wn, wq, wk, wv, dq, dk, dv):
        dx, dwn, dwq, dwk, dwv = M._fused_norm_qkv_bwd(
            eps, (x, wn, wq, wk, wv), (dq, dk, dv)
        )
        ps = lambda t: jax.lax.psum(t, TOKEN_AXES)
        return dx, ps(dwn), ps(dwq), ps(dwk), ps(dwv)

    fwd_sm = _fwd_only(fwd_body, mesh, (TOK,) + w_in, o_spec)
    bwd_sm = _fwd_only(
        bwd_body, mesh, (TOK,) + w_in + o_spec, (TOK,) + w_in
    )

    @jax.custom_vjp
    def f(x, wn, wq, wk, wv):
        return fwd_sm(x, wn, wq, wk, wv)

    f.defvjp(
        lambda x, wn, wq, wk, wv: (f(x, wn, wq, wk, wv), (x, wn, wq, wk, wv)),
        lambda res, gs: bwd_sm(*res, *gs),
    )
    return f


def norm_qkv(x, wn, wq, wk, wv, eps: float):
    """(q, k, v) = rmsnorm(x)*wn @ (wq|wk|wv) — the norm-fused qkv kernel
    (off-by-default knob), shard-local under an active mesh."""
    from ..ops.mlp import fused_norm_qkv

    mesh = kernel_mesh()
    if mesh is None:
        return fused_norm_qkv(x, wn, wq, wk, wv, eps)
    dp, tp = _counts(mesh)
    n = x.shape[0]
    # tensor>1: no cp variant exists for the qkv kernel, and a shard_map
    # manual region here would trigger the jax gradient-corruption bug
    # (module note 2) — always take the XLA path, like flash attention.
    if tp > 1 or n % dp:
        if n % dp:
            _warn_once(
                f"norm_qkv:{n}:{dp}",
                "norm-fused qkv kernel: shapes don't divide the mesh —"
                " falling back to XLA norm + projections",
            )
        from ..models.modeling import rms_norm

        hpre = rms_norm(x, wn, eps)
        dt = x.dtype
        return hpre @ wq.astype(dt), hpre @ wk.astype(dt), hpre @ wv.astype(dt)
    return _norm_qkv_fn(mesh, float(eps))(x, wn, wq, wk, wv)


def rmsnorm_bwd(x, g, w, eps: float):
    """Fused RMSNorm adjoint kernel (dx, dw), shard-local; dw is psummed
    over the token axes. Called from inside modeling._rms_norm_vjp's
    backward rule — it is itself never differentiated, so a single
    forward-only shard_map suffices. Returns None when shapes don't
    divide — the caller then uses its XLA formula."""
    from ..ops.mlp import rmsnorm_bwd_pallas

    mesh = kernel_mesh()
    if mesh is None:
        return rmsnorm_bwd_pallas(x, g, w, eps)
    dp, tp = _counts(mesh)
    # tensor>1: this shard_map would sit INSIDE a custom_vjp backward —
    # the exact position module note 2 documents as re-triggering the
    # jax manual-region gradient corruption. Caller falls back to XLA.
    if tp > 1 or x.shape[0] % dp:
        return None

    def body(xs, gs, ws):
        dx, dw = rmsnorm_bwd_pallas(xs, gs, ws, eps)
        return dx, jax.lax.psum(dw, TOKEN_AXES)

    return _fwd_only(
        body, mesh, (TOK, TOK, P(None)), (TOK, P(None))
    )(x, g, w)


# ---------------------------------------------------------------------------
# Flash attention
# ---------------------------------------------------------------------------
@functools.lru_cache(maxsize=64)
def _flash_fns(mesh, causal: bool, bi_split: int, h_local: int, dh_k: int,
               rope: bool = False):
    """(fwd shard_map, attach custom_vjp) for the flash kernels over `mesh`
    (tensor==1).

    Mirrors ops/flash_attention's two-phase design at the GLOBAL level so
    the save_attn remat policy keeps working under a mesh: the forward
    shard_map produces (out, lse), which the caller checkpoint-names;
    an identity custom_vjp then carries the backward as its own shard_map
    over _flash_bwd. Batch over (data,fsdp) — attention is batch- and
    head-local, so neither direction needs a psum."""
    from ..ops import flash_attention as FA

    batch = ("data", "fsdp")
    qkv = P(batch, None, None)  # [B, P, H*dh_k]
    seg = P(batch, None)
    cs = P(batch, None, None)  # rope cos/sin [B, P, dh_k]
    lse_s = P(batch, None, None)  # [B, H, P]

    if rope:

        def fwd_body(qs, kf, vf, segs, cos, sin):
            b, p, _ = qs.shape
            bq, bk = FA._fwd_blocks(p)
            return FA._flash_fwd(
                qs, kf, vf, segs, segs, causal, bq, bk, h_local, dh_k,
                bi_split=bi_split, rope=(cos, sin),
            )

        fwd_sm = _fwd_only(
            fwd_body, mesh, (qkv, qkv, qkv, seg, cs, cs), (qkv, lse_s)
        )

        def bwd_body(qs, kf, vf, segs, cos, sin, out, lse, g):
            return FA._flash_bwd(
                qs, kf, vf, segs, segs, out, lse, g, causal, h_local, dh_k,
                bi_split=bi_split, rope=(cos, sin),
            )

        bwd_sm = _fwd_only(
            bwd_body, mesh, (qkv, qkv, qkv, seg, cs, cs, qkv, lse_s, qkv),
            (qkv, qkv, qkv),
        )

        @jax.custom_vjp
        def attach(qs, kf, vf, segs, cos, sin, out, lse):
            return out

        def attach_fwd(qs, kf, vf, segs, cos, sin, out, lse):
            return out, (qs, kf, vf, segs, cos, sin, out, lse)

        def attach_bwd(res, g):
            qs, kf, vf, segs, cos, sin, out, lse = res
            dq, dk, dv = bwd_sm(qs, kf, vf, segs, cos, sin, out, lse, g)
            return (
                dq, dk, dv, None, jnp.zeros_like(cos), jnp.zeros_like(sin),
                jnp.zeros_like(out), jnp.zeros_like(lse),
            )

        attach.defvjp(attach_fwd, attach_bwd)
        return fwd_sm, attach

    def fwd_body(qs, kf, vf, segs):
        b, p, _ = qs.shape
        bq, bk = FA._fwd_blocks(p)
        return FA._flash_fwd(
            qs, kf, vf, segs, segs, causal, bq, bk, h_local, dh_k,
            bi_split=bi_split,
        )

    fwd_sm = _fwd_only(fwd_body, mesh, (qkv, qkv, qkv, seg), (qkv, lse_s))

    def bwd_body(qs, kf, vf, segs, out, lse, g):
        return FA._flash_bwd(
            qs, kf, vf, segs, segs, out, lse, g, causal, h_local, dh_k,
            bi_split=bi_split,
        )

    bwd_sm = _fwd_only(
        bwd_body, mesh, (qkv, qkv, qkv, seg, qkv, lse_s, qkv),
        (qkv, qkv, qkv),
    )

    @jax.custom_vjp
    def attach(qs, kf, vf, segs, out, lse):
        return out

    def attach_fwd(qs, kf, vf, segs, out, lse):
        return out, (qs, kf, vf, segs, out, lse)

    def attach_bwd(res, g):
        qs, kf, vf, segs, out, lse = res
        dq, dk, dv = bwd_sm(qs, kf, vf, segs, out, lse, g)
        return dq, dk, dv, None, jnp.zeros_like(out), jnp.zeros_like(lse)

    attach.defvjp(attach_fwd, attach_bwd)
    return fwd_sm, attach


def flash_attention(
    q, k, v, segment_ids, causal: bool = False,
    softmax_scale: Optional[float] = None, bi_causal_split: int = 0,
    rope=None,
):
    """Pallas flash attention [B,P,H,Dh], shard-local under an active mesh:
    batch over ("data","fsdp"), heads over "tensor" (no collectives — the
    kernel is embarrassingly parallel over batch x heads). The sequence
    axis must be unsharded here; sequence parallelism goes through
    parallel/ring_attention instead (ops/attention impl="ring")."""
    from ..ops import flash_attention as FA

    mesh = kernel_mesh()
    if mesh is None:
        return FA.flash_attention(
            q, k, v, segment_ids, causal=causal, softmax_scale=softmax_scale,
            bi_causal_split=bi_causal_split, rope=rope,
        )
    s = dict(mesh.shape)
    bdp = s.get("data", 1) * s.get("fsdp", 1)
    tp = s.get("tensor", 1)
    b, p, h, dh = q.shape
    if _tp_fallback(mesh) or tp > 1 or b % bdp or s.get("seq", 1) > 1:
        from ..ops.attention import xla_attention

        if b % bdp or s.get("seq", 1) > 1:
            _warn_once(
                f"flash:{b}:{bdp}x{s.get('seq', 1)}",
                f"flash kernel: batch {b} %% {bdp} != 0 or seq axis "
                f"{s.get('seq', 1)} > 1 — falling back to XLA attention"
                " (GSPMD-partitioned); use attn_impl='ring' for sequence"
                " parallelism",
            )
        elif tp > 1:
            # the flash BACKWARD is itself a Pallas kernel, and a
            # custom_partitioning call inside a custom_vjp backward rule
            # re-triggers the jax 0.9 gradient-corruption bug (module note
            # 2; isolated by structural ablation — forward-only cp is
            # clean, which is why the MLP kernels keep running under tp).
            _warn_once(
                f"flash-tp:{tp}",
                f"tensor={tp} > 1: flash attention falls back to XLA "
                "(GSPMD-partitioned) — its Pallas backward cannot ride "
                "custom_partitioning inside a custom_vjp bwd on this jax "
                "(kernel_sharding module docstring, note 2)",
            )
        if rope is not None:
            from ..models.rope import apply_rope

            q, k = apply_rope(q, k, rope[0], rope[1])
        return xla_attention(
            q, k, v, segment_ids, causal, softmax_scale, bi_causal_split
        )
    if rope is not None and (FA._MODE in ("band", "skip") or dh < FA._PAD_DH):
        from ..models.rope import apply_rope

        q, k = apply_rope(q, k, rope[0], rope[1])
        rope = None
    # scale fold / GQA repeat / dh padding are plain XLA — global level
    qs, kf, vf, dh_k = FA._prep(q, k, v, softmax_scale)
    fwd_sm, attach = _flash_fns(
        mesh, causal, bi_causal_split, h, dh_k, rope=rope is not None
    )
    if rope is not None:
        cos = rope[0].astype(qs.dtype)
        sin = rope[1].astype(qs.dtype)
        out, lse = fwd_sm(
            jax.lax.stop_gradient(qs),
            jax.lax.stop_gradient(kf),
            jax.lax.stop_gradient(vf),
            segment_ids, cos, sin,
        )
        out = checkpoint_name(out, "attn_out")
        lse = checkpoint_name(lse, "attn_lse")
        out = attach(qs, kf, vf, segment_ids, cos, sin, out, lse)
    else:
        out, lse = fwd_sm(
            jax.lax.stop_gradient(qs),
            jax.lax.stop_gradient(kf),
            jax.lax.stop_gradient(vf),
            segment_ids,
        )
        out = checkpoint_name(out, "attn_out")
        lse = checkpoint_name(lse, "attn_lse")
        out = attach(qs, kf, vf, segment_ids, out, lse)
    out = out.reshape(b, p, h, dh_k)
    return out[..., :dh] if dh_k != dh else out


# ---------------------------------------------------------------------------
# Compiled-HLO audit: no activation ever rides an all-gather
# ---------------------------------------------------------------------------
# HLO: `%name = f32[256,128]{1,0} all-gather(f32[64,128]{1,0} %op), ...`
# — the RESULT shape (after `=`) is the gathered/full one we must audit;
# the operand shape in the parens is the (smaller) shard.
_AG_RE = re.compile(r"=\s*\(?([a-z0-9]+)\[([0-9,]+)\]")


def find_activation_allgathers(hlo_text: str, n_tokens: int, batch: int,
                               seqlen: int) -> list:
    """Scan compiled HLO for all-gather ops whose RESULT carries a
    full-length token dimension — i.e. a sharded activation being
    replicated. Weight all-gathers (the FSDP gather-for-compute) are
    expected and ignored: weights have no dim equal to n_tokens, nor the
    (batch, seqlen) leading pair.

    Returns offending HLO lines (empty == the kernel sharding holds)."""
    bad = []
    for line in hlo_text.splitlines():
        if "all-gather" not in line:
            continue
        m = _AG_RE.search(line)
        if not m:
            continue
        dims = [int(d) for d in m.group(2).split(",") if d]
        if not dims:
            continue
        if dims[0] == n_tokens:
            bad.append(line.strip())
        elif len(dims) >= 2 and dims[0] == batch and dims[1] == seqlen:
            bad.append(line.strip())
    return bad
