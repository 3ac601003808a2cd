"""Fused MLP forward kernel (Pallas TPU) with a hand-written adjoint.

XLA emits the reference MLP (up-GEMM -> act*gate -> down-GEMM -> residual)
as ONE windowed convolution whose prologue recomputes the up GEMM per
output window — profiled at 5.4 ms/layer vs the 3.2 ms two-GEMM roofline
at the flagship shape, and both optimization_barrier splits measured WORSE
end-to-end (PERF.md round 4). This kernel runs the three GEMMs back to
back on token tiles with all three weight matrices resident in VMEM
(fetched once per batch), the activation fused between them.

erf is not lowerable in Pallas TPU, so exact gelu uses the
Abramowitz-Stegun 7.1.26 rational approximation (|err| <= 1.5e-7 — three
orders below bf16 resolution).

The backward is a plain-XLA custom-VJP rule mirroring autodiff's math
(recompute xg/xu from x, five gradient GEMMs, fp32 weight grads).

Default-ON for TPU meshes via model.mlp_kernel="auto" (resolved at
pipeline setup; GGT_MLP_KERNEL=0 force-disables). The norm-fused variant
below additionally folds the pre-MLP RMSNorm and the residual add in
(GGT_MLP_NORM_FUSE=0 reverts). Numerics pinned by tests either way.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# scoped-vmem request for these kernels. Weights (3 x ~4.7 MB bf16) +
# double-buffered token tiles fit comfortably in 32 MB; requesting more
# starves the concurrent host->device input transfers of staging space
# (GGT_MLP_VMEM sweep, PERF.md round 4).
_VMEM_LIMIT = int(os.environ.get("GGT_MLP_VMEM", str(48 * 1024 * 1024)))


def _interpret() -> bool:
    """Generic Pallas interpreter mode (pure-JAX evaluation, CPU-safe and
    remat/shard_map-compatible, unlike pltpu.force_tpu_interpret_mode whose
    IO-callback effects break jax.checkpoint): lets the multichip dryrun /
    CPU tests run the REAL kernel dispatch on a virtual mesh. Single
    source of truth: parallel.kernel_sharding.interpret_forced (lazy
    import — that module imports ops lazily, avoiding a cycle)."""
    from ..parallel.kernel_sharding import interpret_forced

    return interpret_forced()


def _erf_f32(x):
    """Abramowitz-Stegun 7.1.26 (|error| <= 1.5e-7), f32, sign-extended."""
    a1, a2, a3, a4, a5 = (
        0.254829592,
        -0.284496736,
        1.421413741,
        -1.453152027,
        1.061405429,
    )
    p = 0.3275911
    sign = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p * ax)
    poly = ((((a5 * t + a4) * t + a3) * t + a2) * t + a1) * t
    return sign * (1.0 - poly * jnp.exp(-ax * ax))


def _act_f32(name: str):
    if name == "gelu":
        inv_sqrt2 = 0.7071067811865476
        return lambda x: 0.5 * x * (1.0 + _erf_f32(x * inv_sqrt2))
    if name in ("gelu_new", "gelu_pytorch_tanh"):
        c = 0.7978845608028654  # sqrt(2/pi)
        return lambda x: 0.5 * x * (1.0 + jnp.tanh(c * (x + 0.044715 * x * x * x)))
    if name == "silu":
        return lambda x: x * jax.nn.sigmoid(x)
    raise ValueError(f"unsupported hidden_act for the MLP kernel: {name!r}")


def _mlp_kernel(x_ref, wg_ref, wu_ref, wd_ref, o_ref, *, act: str):
    x = x_ref[...]  # [bt, dm]
    wg = wg_ref[...]
    wu = wu_ref[...]
    xg = jax.lax.dot_general(
        x, wg, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ).astype(x.dtype)  # bf16 like the XLA path (matmul f32-accum -> cast)
    xu = jax.lax.dot_general(
        x, wu, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ).astype(x.dtype)
    a = _act_f32(act)(xg.astype(jnp.float32)).astype(x.dtype)
    g = a * xu
    o_ref[...] = jax.lax.dot_general(
        g, wd_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(o_ref.dtype)


# token-tile sweep knob; 512 won the v5e sweep (see PERF.md round 4)
_MLP_BT = int(os.environ.get("GGT_MLP_BT", "512"))


def _mlp_fwd_kernel_call(x, wg, wu, wd, act: str, bt: int = 0):
    bt = bt or _MLP_BT
    n, dm = x.shape
    dff = wg.shape[1]
    while n % bt != 0:
        bt //= 2
    grid = (n // bt,)
    return pl.pallas_call(
        functools.partial(_mlp_kernel, act=act),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bt, dm), lambda i: (i, 0)),
            pl.BlockSpec((dm, dff), lambda i: (0, 0)),
            pl.BlockSpec((dm, dff), lambda i: (0, 0)),
            pl.BlockSpec((dff, dm), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((bt, dm), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((n, dm), x.dtype),
        interpret=_interpret(),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=_VMEM_LIMIT,
        ),
    )(x, wg, wu, wd)


def _dw_ptype():
    """preferred_element_type for the weight-gradient GEMMs. Default f32
    (exact master-precision gradients); GGT_DW_BF16=1 runs them at the
    bf16 MXU rate with one bf16 rounding before the f32 cast — the
    reference trains with fp16 gradients under DeepSpeed, so this is
    reference-comparable precision (measured knob, see PERF.md)."""
    import os as _os

    return jnp.bfloat16 if _os.environ.get("GGT_DW_BF16", "0") == "1" else jnp.float32


def _act_and_grad_f32(name: str):
    act = _act_f32(name)
    if name == "gelu":
        inv_sqrt2 = 0.7071067811865476
        c = 0.3989422804014327  # 1/sqrt(2*pi)

        def grad(x):
            return 0.5 * (1.0 + _erf_f32(x * inv_sqrt2)) + x * c * jnp.exp(
                -0.5 * x * x
            )

        return act, grad
    # generic fallback: autodiff the activation pointwise
    grad = jax.vmap(jax.grad(lambda v: act(v)))
    return act, lambda x: grad(x.reshape(-1)).reshape(x.shape)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def fused_mlp(x, wg, wu, wd, act: str):
    """act(x@wg) * (x@wu) @ wd with f32 master weights cast to x.dtype
    inside (cotangents returned in f32, matching the plain path)."""
    dt = x.dtype
    return _mlp_fwd_kernel_call(x, wg.astype(dt), wu.astype(dt), wd.astype(dt), act)


def _fused_mlp_fwd(x, wg, wu, wd, act):
    return fused_mlp(x, wg, wu, wd, act), (x, wg, wu, wd)


def _fused_mlp_bwd(act, res, dout):
    x, wg, wu, wd = res
    dt = x.dtype
    wg_c, wu_c, wd_c = wg.astype(dt), wu.astype(dt), wd.astype(dt)
    act_f, act_g = _act_and_grad_f32(act)
    xg = (x @ wg_c).astype(dt)
    xu = (x @ wu_c).astype(dt)
    a = act_f(xg.astype(jnp.float32)).astype(dt)
    g = a * xu
    dg = (dout @ wd_c.T).astype(dt)
    dwd = jnp.einsum("nf,nd->fd", g, dout, preferred_element_type=_dw_ptype())
    da = dg * xu
    dxu = dg * a
    dxg = (da.astype(jnp.float32) * act_g(xg.astype(jnp.float32))).astype(dt)
    dwg = jnp.einsum("nd,nf->df", x, dxg, preferred_element_type=_dw_ptype())
    dwu = jnp.einsum("nd,nf->df", x, dxu, preferred_element_type=_dw_ptype())
    dx = (dxg @ wg_c.T + dxu @ wu_c.T).astype(dt)
    return (
        dx,
        dwg.astype(wg.dtype),
        dwu.astype(wu.dtype),
        dwd.astype(wd.dtype),
    )


fused_mlp.defvjp(_fused_mlp_fwd, _fused_mlp_bwd)


# ---------------------------------------------------------------------------
# Norm-fused variant: rmsnorm -> gate/up/down MLP -> residual in ONE kernel
# (the pre-norm hpre never round-trips HBM, and the backward chains the two
# tested adjoints in plain XLA). GGT_MLP_NORM_FUSE=1 switches modeling to it.
# ---------------------------------------------------------------------------
def _norm_mlp_kernel(x_ref, wn_ref, wg_ref, wu_ref, wd_ref, o_ref, *, act, eps):
    x = x_ref[...]  # [bt, dm]
    x32 = x.astype(jnp.float32)
    var = jnp.mean(x32 * x32, axis=-1, keepdims=True)
    rrms = jax.lax.rsqrt(var + eps)
    hpre = (x32 * rrms * wn_ref[...].astype(jnp.float32)).astype(x.dtype)
    xg = jax.lax.dot_general(
        hpre, wg_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)
    xu = jax.lax.dot_general(
        hpre, wu_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)
    a = _act_f32(act)(xg.astype(jnp.float32)).astype(x.dtype)
    g = a * xu
    mlp = jax.lax.dot_general(
        g, wd_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[...] = (x32 + mlp).astype(o_ref.dtype)


def _norm_mlp_call(x, wn, wg, wu, wd, eps: float, act: str):
    n, dm = x.shape
    dff = wg.shape[1]
    bt = _MLP_BT
    while n % bt != 0:
        bt //= 2
    return pl.pallas_call(
        functools.partial(_norm_mlp_kernel, act=act, eps=eps),
        grid=(n // bt,),
        in_specs=[
            pl.BlockSpec((bt, dm), lambda i: (i, 0)),
            pl.BlockSpec((1, dm), lambda i: (0, 0)),
            pl.BlockSpec((dm, dff), lambda i: (0, 0)),
            pl.BlockSpec((dm, dff), lambda i: (0, 0)),
            pl.BlockSpec((dff, dm), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((bt, dm), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((n, dm), x.dtype),
        interpret=_interpret(),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=_VMEM_LIMIT,
        ),
    )(x, wn.reshape(1, dm), wg, wu, wd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def fused_norm_mlp(x, wn, wg, wu, wd, eps: float, act: str):
    """x + mlp(rmsnorm(x) * wn) in one kernel; f32 master weights cast to
    x.dtype inside; fp32 residual add."""
    dt = x.dtype
    return _norm_mlp_call(
        x, wn.astype(jnp.float32), wg.astype(dt), wu.astype(dt), wd.astype(dt),
        eps, act,
    )


def _fused_norm_mlp_fwd(x, wn, wg, wu, wd, eps, act):
    return fused_norm_mlp(x, wn, wg, wu, wd, eps, act), (x, wn, wg, wu, wd)


def _fused_norm_mlp_bwd(eps, act, res, dout):
    x, wn, wg, wu, wd = res
    dt = x.dtype
    wn32 = wn.astype(jnp.float32)
    wg_c, wu_c, wd_c = wg.astype(dt), wu.astype(dt), wd.astype(dt)
    act_f, act_g = _act_and_grad_f32(act)
    # recompute forward intermediates (remat-style)
    x32 = x.astype(jnp.float32)
    var = jnp.mean(x32 * x32, axis=-1, keepdims=True)
    rrms = jax.lax.rsqrt(var + eps)
    n = x32 * rrms
    hpre = (n * wn32).astype(dt)
    xg = (hpre @ wg_c).astype(dt)
    xu = (hpre @ wu_c).astype(dt)
    a = act_f(xg.astype(jnp.float32)).astype(dt)
    g = a * xu
    # MLP adjoint down to dhpre
    do = dout.astype(dt)
    dg = (do @ wd_c.T).astype(dt)
    dwd = jnp.einsum("nf,nd->fd", g, do, preferred_element_type=_dw_ptype())
    da = dg * xu
    dxu = dg * a
    dxg = (da.astype(jnp.float32) * act_g(xg.astype(jnp.float32))).astype(dt)
    dwg = jnp.einsum("nd,nf->df", hpre, dxg, preferred_element_type=_dw_ptype())
    dwu = jnp.einsum("nd,nf->df", hpre, dxu, preferred_element_type=_dw_ptype())
    dhpre = (dxg @ wg_c.T + dxu @ wu_c.T).astype(jnp.float32)
    # rmsnorm adjoint + residual passthrough
    dn = dhpre * wn32
    dx_norm = rrms * (dn - n * jnp.mean(dn * n, axis=-1, keepdims=True))
    dwn = jnp.sum(dhpre * n, axis=0)
    dx = (dout.astype(jnp.float32) + dx_norm).astype(x.dtype)
    return (
        dx,
        dwn.astype(wn.dtype),
        dwg.astype(wg.dtype),
        dwu.astype(wu.dtype),
        dwd.astype(wd.dtype),
    )


fused_norm_mlp.defvjp(_fused_norm_mlp_fwd, _fused_norm_mlp_bwd)


# ---------------------------------------------------------------------------
# Norm-fused q/k/v projections: the attention pre-norm's activation never
# round-trips HBM either (same structure as fused_norm_mlp, which measured
# +1.8% — GGT_ATTN_NORM_FUSE gates this one pending its own measurement).
# ---------------------------------------------------------------------------
def _norm_qkv_kernel(x_ref, wn_ref, wq_ref, wk_ref, wv_ref, q_ref, k_ref, v_ref,
                     *, eps):
    x32 = x_ref[...].astype(jnp.float32)
    var = jnp.mean(x32 * x32, axis=-1, keepdims=True)
    rrms = jax.lax.rsqrt(var + eps)
    hpre = (x32 * rrms * wn_ref[...].astype(jnp.float32)).astype(x_ref.dtype)
    for w_ref, o_ref in ((wq_ref, q_ref), (wk_ref, k_ref), (wv_ref, v_ref)):
        o_ref[...] = jax.lax.dot_general(
            hpre, w_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(o_ref.dtype)


def _norm_qkv_call(x, wn, wq, wk, wv, eps: float):
    n, dm = x.shape
    dq, dk, dv = wq.shape[1], wk.shape[1], wv.shape[1]
    bt = _MLP_BT
    while n % bt != 0:
        bt //= 2
    return pl.pallas_call(
        functools.partial(_norm_qkv_kernel, eps=eps),
        grid=(n // bt,),
        in_specs=[
            pl.BlockSpec((bt, dm), lambda i: (i, 0)),
            pl.BlockSpec((1, dm), lambda i: (0, 0)),
            pl.BlockSpec((dm, dq), lambda i: (0, 0)),
            pl.BlockSpec((dm, dk), lambda i: (0, 0)),
            pl.BlockSpec((dm, dv), lambda i: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((bt, dq), lambda i: (i, 0)),
            pl.BlockSpec((bt, dk), lambda i: (i, 0)),
            pl.BlockSpec((bt, dv), lambda i: (i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, dq), x.dtype),
            jax.ShapeDtypeStruct((n, dk), x.dtype),
            jax.ShapeDtypeStruct((n, dv), x.dtype),
        ],
        interpret=_interpret(),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=_VMEM_LIMIT,
        ),
    )(x, wn.reshape(1, dm), wq, wk, wv)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def fused_norm_qkv(x, wn, wq, wk, wv, eps: float):
    """(q, k, v) = rmsnorm(x)*wn @ (wq|wk|wv) in one kernel."""
    dt = x.dtype
    return _norm_qkv_call(
        x, wn.astype(jnp.float32), wq.astype(dt), wk.astype(dt), wv.astype(dt),
        eps,
    )


def _fused_norm_qkv_fwd(x, wn, wq, wk, wv, eps):
    return fused_norm_qkv(x, wn, wq, wk, wv, eps), (x, wn, wq, wk, wv)


def _fused_norm_qkv_bwd(eps, res, gs):
    x, wn, wq, wk, wv = res
    dq, dk, dv = gs
    dt = x.dtype
    wn32 = wn.astype(jnp.float32)
    x32 = x.astype(jnp.float32)
    var = jnp.mean(x32 * x32, axis=-1, keepdims=True)
    rrms = jax.lax.rsqrt(var + eps)
    n = x32 * rrms
    hpre = (n * wn32).astype(dt)
    dwq = jnp.einsum("nd,nf->df", hpre, dq, preferred_element_type=jnp.float32)
    dwk = jnp.einsum("nd,nf->df", hpre, dk, preferred_element_type=jnp.float32)
    dwv = jnp.einsum("nd,nf->df", hpre, dv, preferred_element_type=jnp.float32)
    dhpre = (
        (dq.astype(dt) @ wq.astype(dt).T)
        + (dk.astype(dt) @ wk.astype(dt).T)
        + (dv.astype(dt) @ wv.astype(dt).T)
    ).astype(jnp.float32)
    dn = dhpre * wn32
    dx = rrms * (dn - n * jnp.mean(dn * n, axis=-1, keepdims=True))
    dwn = jnp.sum(dhpre * n, axis=0)
    return (
        dx.astype(x.dtype),
        dwn.astype(wn.dtype),
        dwq.astype(wq.dtype),
        dwk.astype(wk.dtype),
        dwv.astype(wv.dtype),
    )


fused_norm_qkv.defvjp(_fused_norm_qkv_fwd, _fused_norm_qkv_bwd)


# ---------------------------------------------------------------------------
# RMSNorm backward kernel: one pass over token tiles computing dx and
# accumulating dw — the XLA lowering of the hand adjoint still costs
# ~1.8 ms/layer at [65536, 768] (~4x the HBM-traffic floor).
# ---------------------------------------------------------------------------
def _rmsnorm_bwd_kernel(x_ref, g_ref, w_ref, dx_ref, dw_ref, dw_acc, *, eps, nt):
    ti = pl.program_id(0)

    @pl.when(ti == 0)
    def _init():
        dw_acc[...] = jnp.zeros_like(dw_acc)

    x32 = x_ref[...].astype(jnp.float32)
    g32 = g_ref[...].astype(jnp.float32)
    var = jnp.mean(x32 * x32, axis=-1, keepdims=True)
    rrms = jax.lax.rsqrt(var + eps)
    n = x32 * rrms
    dn = g32 * w_ref[...].astype(jnp.float32)
    dx = rrms * (dn - n * jnp.mean(dn * n, axis=-1, keepdims=True))
    dx_ref[...] = dx.astype(dx_ref.dtype)
    dw_acc[...] += jnp.sum(g32 * n, axis=0, keepdims=True)

    @pl.when(ti == nt - 1)
    def _finish():
        dw_ref[...] = dw_acc[...]


def rmsnorm_bwd_pallas(x, g, w, eps: float, bt: int = 1024):
    """(dx, dw) for y = rmsnorm(x)*w given cotangent g — single fused pass."""
    n, dm = x.shape
    while n % bt != 0:
        bt //= 2
    nt = n // bt
    dx, dw = pl.pallas_call(
        functools.partial(_rmsnorm_bwd_kernel, eps=eps, nt=nt),
        grid=(nt,),
        in_specs=[
            pl.BlockSpec((bt, dm), lambda i: (i, 0)),
            pl.BlockSpec((bt, dm), lambda i: (i, 0)),
            pl.BlockSpec((1, dm), lambda i: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((bt, dm), lambda i: (i, 0)),
            pl.BlockSpec((1, dm), lambda i: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, dm), x.dtype),
            jax.ShapeDtypeStruct((1, dm), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((1, dm), jnp.float32)],
        interpret=_interpret(),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=_VMEM_LIMIT,
        ),
    )(x, g, w.reshape(1, dm))
    return dx, dw.reshape(dm)


def xla_mlp(x, wg, wu, wd, act: str):
    """Plain-XLA reference (the modeling.py default path's math)."""
    dt = x.dtype
    if act == "gelu":
        a = jax.nn.gelu((x @ wg.astype(dt)).astype(jnp.float32), approximate=False)
    elif act in ("gelu_new", "gelu_pytorch_tanh"):
        a = jax.nn.gelu((x @ wg.astype(dt)).astype(jnp.float32), approximate=True)
    elif act == "silu":
        a = jax.nn.silu((x @ wg.astype(dt)).astype(jnp.float32))
    else:
        raise ValueError(act)
    g = a.astype(dt) * (x @ wu.astype(dt))
    return g @ wd.astype(dt)
