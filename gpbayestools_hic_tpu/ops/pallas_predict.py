"""Pallas TPU kernel: fused GP PC-predict (mean + variance quadratic form).

The sampling hot path (Chain likelihood -> every ensemble/HMC/SMC step;
replaces the reference's per-PC sklearn ``GaussianProcessRegressor.predict``
loop, src/emulator.py:551-553 driven from src/mcmc.py:153-166) evaluates,
per GP and per walker batch:

    kstar = amp * exp(-0.5 * d2(x_train, q))      # (n, m)
    mean  = kstar^T alpha                          # (m,)
    qform = |G kstar|^2,  G = L^-1                 # (m,)  -> var = kdiag - qform

Under XLA this is three separate HBM-materialized stages -- the (n, m)
``kstar`` cannot be fused into the dot operands, so every evaluation pays
~450 MB of avoidable kstar traffic plus separate launches.  This kernel
fuses the whole pipeline in VMEM with two augmented MXU matmuls:

- **z matmul**: the anisotropic squared distance is folded INTO the
  contraction -- ``xs_aug`` carries extra columns ``[1, xn]`` and
  ``qs_aug`` carries ``[-0.5 qn, -0.5]``, so one dot yields
  ``z = qs.xs - 0.5 qn - 0.5 xn = -0.5 d2`` directly (no broadcast adds).
  Training-side padding rows carry ``xn = 1e30`` so their kstar is exactly
  ``exp(-5e29) = 0``.
- **v matmul**: ``alpha`` rides as an extra ROW of the G operand
  (``g_aug = [G; alpha; 0]``), so ``v_aug = kstar^T g_aug^T`` produces the
  variance product AND the mean in one MXU pass:
  ``mean = v_aug[:, n]``, ``qform = sum_i v_aug[:, i<n]^2``.

Precision: both matmuls run at 3-pass ``HIGH`` -- the quadratic form is the
validated cancellation-free norm form (see models/gp.GPConfig); the z
contraction's internal cancellation is ~1e-7 relative at 3-pass, i.e.
kstar to ~1e-6.

The op carries a custom VJP for the sampling gradient (HMC/Langevin/SMC):
the forward saves ``v_aug`` as a residual (0.37 ms of HBM round-trip vs
1.2 ms to recompute the big matmul), and the backward kernel recomputes
``kstar`` from the cheap z matmul, forms ``ct_kstar`` via one big MXU pass
and chains to ``ct_qs_aug`` in VMEM.  Gradients flow to the QUERY POINTS
only -- the GP state receives zero cotangents (sampling differentiates
w.r.t. walker positions; emulator training never routes through this op).
Like gp._norm_mean_var it is reverse-mode only; jacfwd consumers use the
vanilla path.

Sharding: the public entry points are wrapped in
``jax.experimental.custom_partitioning`` declaring the walker axis (m)
batch-parallel and the GP state replicated, so the op shards over the
1-D walker mesh (parallel/mesh.py) under pjit exactly like the XLA path
-- without this, GSPMD would silently all-gather the walker shards around
the opaque kernel.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from jax.experimental.custom_partitioning import custom_partitioning
from jax.sharding import NamedSharding, PartitionSpec as P

_LANE = 128
_DP = 128        # padded feature width (d + 2 <= _DP)
_TM = 256        # walker-tile width per kernel step
_HIGH = lax.Precision.HIGH

#: test hook: run the kernels in the Pallas interpreter (CPU-correct path)
INTERPRET = False
#: test hook: force the fused path regardless of backend (with INTERPRET)
FORCE = False


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def fused_eligible(kind: str, d: int, dtype) -> bool:
    """Static eligibility of the fused kernel for a GP family."""
    if not (FORCE or jax.default_backend() == "tpu"):
        return False
    return kind == "RBF" and d + 2 <= _DP and jnp.dtype(dtype) == jnp.float32


def build_fused_state(params: dict, x: np.ndarray) -> dict:
    """Precompute the kernel-ready layouts from a trained GP batch.

    Host-side numpy by design (fit-time prep; see CLAUDE.md).  ``params``
    holds log_amp/log_ls (b, d)/log_noise; ``x`` is the shared (n, d)
    training input; the caller supplies ``linv``/``alpha_vec`` via
    :func:`attach_fused_factors`.
    """
    ls = np.exp(np.asarray(params["log_ls"], dtype=np.float64))  # (b, d)
    amp = np.exp(np.asarray(params["log_amp"], dtype=np.float64))  # (b,)
    b, d = ls.shape
    n = x.shape[0]
    np_pad = _round_up(n, _LANE)
    xs = np.zeros((b, np_pad, _DP), dtype=np.float32)
    x64 = np.asarray(x, dtype=np.float64)
    for k in range(b):
        xk = x64 / ls[k]
        xs[k, :n, :d] = xk
        xs[k, :n, d] = 1.0
        xs[k, :n, d + 1] = np.sum(xk * xk, axis=1)
    # padding rows: xn = 1e30 makes kstar exactly exp(-5e29) = 0
    xs[:, n:, d] = 1.0
    xs[:, n:, d + 1] = 1e30
    return {
        "xs": jnp.asarray(xs),                        # (b, np, DP) bwd layout
        "xst": jnp.asarray(np.swapaxes(xs, 1, 2).copy()),  # (b, DP, np)
        "amp": jnp.asarray(amp[:, None].astype(np.float32)),  # (b, 1)
        "inv_ls": jnp.asarray((1.0 / ls).astype(np.float32)),  # (b, d)
    }


def attach_fused_factors(
    fstate: dict, linv: np.ndarray, alpha_vec: np.ndarray
) -> dict:
    """Add the augmented-G layouts ``[G; alpha; 0]`` to a fused state."""
    linv = np.asarray(linv, dtype=np.float32)     # (b, n, n)
    alpha = np.asarray(alpha_vec, dtype=np.float32)  # (b, n)
    b, n, _ = linv.shape
    np_pad = fstate["xs"].shape[1]
    np8 = np_pad + 8  # alpha row + 7 zero rows keeps the sublane multiple
    g = np.zeros((b, np8, np_pad), dtype=np.float32)
    g[:, :n, :n] = linv
    g[:, np_pad, :n] = alpha
    out = dict(fstate)
    out["g"] = jnp.asarray(g)                      # (b, np8, np) bwd layout
    out["gt"] = jnp.asarray(np.swapaxes(g, 1, 2).copy())  # (b, np, np8)
    return out


# --------------------------------------------------------------- kernels


def _fwd_kernel(amp_ref, xst_ref, gt_ref, qs_ref, mean_ref, qf_ref,
                *maybe_v_ref, np_pad: int, save_v: bool):
    """One (PC k, walker tile j) step: qs (TM, DP) -> mean/qf (TM,)."""
    qs = qs_ref[0]                                   # (TM, DP)
    z = jax.lax.dot_general(
        qs, xst_ref[0],                              # (DP, np)
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=_HIGH,
    )                                                # (TM, np) = -0.5 d2
    kstar = amp_ref[0, 0] * jnp.exp(jnp.minimum(z, 0.0))
    v = jax.lax.dot_general(
        kstar, gt_ref[0],                            # (np, np8)
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=_HIGH,
    )                                                # (TM, np8)
    mean = v[:, np_pad]
    qf = jnp.sum(v * v, axis=1) - mean * mean
    mean_ref[0] = mean
    qf_ref[0] = qf
    if save_v:
        maybe_v_ref[0][0] = v


def _bwd_kernel(amp_ref, xst_ref, xs_ref, g_ref, qs_ref, v_ref,
                ctm_ref, ctq_ref, ctqs_ref, *, np_pad: int):
    """Cotangent w.r.t. qs_aug for one (PC, walker tile) step."""
    qs = qs_ref[0]
    z = jax.lax.dot_general(
        qs, xst_ref[0],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=_HIGH,
    )
    kstar = amp_ref[0, 0] * jnp.exp(jnp.minimum(z, 0.0))
    v = v_ref[0]                                     # (TM, np8)
    np8 = v.shape[1]
    cols = lax.broadcasted_iota(jnp.int32, (1, np8), dimension=1)
    # qf = sum_i v_i^2 - v_np^2: column np_pad cancels out of qf exactly
    # (2 v_np - 2 mean = 0), so its only cotangent is the mean's; columns
    # > np_pad have v = 0 (zero G rows) so 2 v ct_qf vanishes there anyway
    ct_v = jnp.where(
        cols == np_pad, ctm_ref[0][:, None], 2.0 * v * ctq_ref[0][:, None]
    )
    ct_kstar = jax.lax.dot_general(
        ct_v, g_ref[0],                              # (np8, np)
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=_HIGH,
    )                                                # (TM, np)
    ct_z = jnp.where(z < 0.0, kstar * ct_kstar, 0.0)
    ctqs_ref[0] = jax.lax.dot_general(
        ct_z, xs_ref[0],                             # (np, DP)
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=_HIGH,
    )                                                # (TM, DP)


# ------------------------------------------------------ pallas_call wrappers


def _fwd_call(amp, xst, gt, qs_aug, *, save_v: bool):
    b, np_pad, np8 = gt.shape[0], gt.shape[1], gt.shape[2]
    m_pad = qs_aug.shape[1]
    tm = min(_TM, m_pad)
    grid = (b, m_pad // tm)
    out_shape = [
        jax.ShapeDtypeStruct((b, m_pad), jnp.float32),  # mean
        jax.ShapeDtypeStruct((b, m_pad), jnp.float32),  # qf
    ]
    out_specs = [
        pl.BlockSpec((1, tm), lambda k, j: (k, j), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, tm), lambda k, j: (k, j), memory_space=pltpu.VMEM),
    ]
    if save_v:
        out_shape.append(jax.ShapeDtypeStruct((b, m_pad, np8), jnp.float32))
        out_specs.append(
            pl.BlockSpec((1, tm, np8), lambda k, j: (k, j, 0),
                         memory_space=pltpu.VMEM)
        )
    res = pl.pallas_call(
        partial(_fwd_kernel, np_pad=np_pad, save_v=save_v),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1), lambda k, j: (k, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, _DP, np_pad), lambda k, j: (k, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, np_pad, np8), lambda k, j: (k, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tm, _DP), lambda k, j: (k, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        cost_estimate=pl.CostEstimate(
            flops=2 * b * m_pad * np_pad * (np8 + _DP),
            bytes_accessed=4 * b * (np_pad * np8 + m_pad * (_DP + 2)),
            transcendentals=b * m_pad * np_pad,
        ),
        interpret=INTERPRET,
    )(amp, xst, gt, qs_aug)
    return res


def _bwd_call(amp, xst, xs, g, qs_aug, v_aug, ct_mean, ct_qf):
    b, np8, np_pad = g.shape
    m_pad = qs_aug.shape[1]
    tm = min(_TM, m_pad)
    grid = (b, m_pad // tm)
    return pl.pallas_call(
        partial(_bwd_kernel, np_pad=np_pad),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1), lambda k, j: (k, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, _DP, np_pad), lambda k, j: (k, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, np_pad, _DP), lambda k, j: (k, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, np8, np_pad), lambda k, j: (k, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tm, _DP), lambda k, j: (k, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tm, np8), lambda k, j: (k, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tm), lambda k, j: (k, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tm), lambda k, j: (k, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tm, _DP), lambda k, j: (k, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, m_pad, _DP), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * m_pad * np_pad * (np8 + np8 + _DP),
            bytes_accessed=4 * b * (np_pad * np8 + m_pad * np8),
            transcendentals=b * m_pad * np_pad,
        ),
        interpret=INTERPRET,
    )(amp, xst, xs, g, qs_aug, v_aug, ct_mean, ct_qf)


def _fwd_values(amp, xst, gt, qs_aug):
    return tuple(_fwd_call(amp, xst, gt, qs_aug, save_v=False)[:2])


def _fwd_with_v(amp, xst, gt, qs_aug):
    return tuple(_fwd_call(amp, xst, gt, qs_aug, save_v=True))


def _bwd_cts(amp, xst, xs, g, qs_aug, v_aug, ct_mean, ct_qf):
    return _bwd_call(amp, xst, xs, g, qs_aug, v_aug, ct_mean, ct_qf)


# ----------------------------------------------- custom partitioning layer
#
# Declares the walker axis (m) batch-parallel so the op shards over the
# 1-D walker mesh under pjit: the m-carrying operands split on their m
# axis, the GP state is replicated, outputs inherit the m sharding.
# Without this GSPMD treats the kernel as opaque and all-gathers walkers.


def _make_partitioned(inner, m_operands: dict, out_m_axes, sdy_rule: str):
    """``m_operands``: {operand index: m-axis}; ``out_m_axes``: m-axis per
    output (the kernels put m at axis 1 everywhere, but keep it explicit).
    ``sdy_rule``: the einsum-like Shardy rule -- the m factor shared
    between the walker-carrying operands and every result is what lets the
    partitioner split the walker axis; the state factors (np/np8/dp) are
    contraction/replicated dimensions the kernel needs whole, so they are
    declared need-replication."""

    cp = custom_partitioning(inner)
    ref_idx = min(m_operands)

    def _m_name(arg_infos):
        spec = getattr(arg_infos[ref_idx].sharding, "spec", None) or P()
        ax = m_operands[ref_idx]
        return spec[ax] if len(spec) > ax else None

    def infer(mesh, arg_infos, result_infos):
        m = _m_name(arg_infos)

        def spec_for(axis, nd):
            parts = [None] * nd
            parts[axis] = m
            return NamedSharding(mesh, P(*parts))

        outs = [
            spec_for(ax, len(r.shape))
            for ax, r in zip(out_m_axes, result_infos)
        ]
        return tuple(outs) if len(outs) > 1 else outs[0]

    def part(mesh, arg_infos, result_infos):
        m = _m_name(arg_infos)
        in_sh = []
        for i, a in enumerate(arg_infos):
            parts = [None] * len(a.shape)
            if m is not None and i in m_operands:
                parts[m_operands[i]] = m
            in_sh.append(NamedSharding(mesh, P(*parts)))
        return mesh, inner, infer(mesh, arg_infos, result_infos), tuple(in_sh)

    cp.def_partition(
        infer_sharding_from_operands=infer,
        partition=part,
        sharding_rule=sdy_rule,
        need_replication_factors=("n", "g", "p", "s"),
    )
    return cp


_fwd_values_p = _make_partitioned(
    _fwd_values, {3: 1}, (1, 1),
    "b s, b p n, b n g, b m p -> b m, b m",
)
_fwd_with_v_p = _make_partitioned(
    _fwd_with_v, {3: 1}, (1, 1, 1),
    "b s, b p n, b n g, b m p -> b m, b m, b m g",
)
_bwd_cts_p = _make_partitioned(
    _bwd_cts, {4: 1, 5: 1, 6: 1, 7: 1}, (1,),
    "b s, b p n, b n p, b g n, b m p, b m g, b m, b m -> b m p",
)


# --------------------------------------------------------- public entry


def _build_qs_aug(fstate: dict, xq: jnp.ndarray, m_pad: int) -> jnp.ndarray:
    """(b, m_pad, DP) scaled+augmented query block from raw queries (m, d)."""
    inv_ls = fstate["inv_ls"]                       # (b, d)
    b, d = inv_ls.shape
    m = xq.shape[0]
    qs = xq[None, :, :] * inv_ls[:, None, :]        # (b, m, d)
    qn = jnp.sum(qs * qs, axis=-1)                  # (b, m)
    out = jnp.concatenate(
        [
            qs,
            -0.5 * qn[:, :, None],
            jnp.full((b, m, 1), -0.5, dtype=qs.dtype),
            jnp.zeros((b, m, _DP - d - 2), dtype=qs.dtype),
        ],
        axis=-1,
    )
    if m_pad > m:
        out = jnp.pad(out, ((0, 0), (0, m_pad - m), (0, 0)))
    return out


@jax.custom_vjp
def fused_pc_predict(fstate: dict, xq: jnp.ndarray):
    """Fused GP-batch predict: (m, d) queries -> (mean (m, b), qform (m, b)).

    ``var = kdiag - qform`` is left to the caller (models/gp.py keeps the
    validated ``maximum(kdiag - q, 0)`` epilogue).  Reverse-mode only; the
    GP state receives zero cotangents (sampling-only gradient).
    """
    m = xq.shape[0]
    m_pad = _round_up(m, min(_TM, _round_up(m, _LANE)))
    qs_aug = _build_qs_aug(fstate, xq, m_pad)
    mean, qf = _fwd_values_p(fstate["amp"], fstate["xst"], fstate["gt"], qs_aug)
    return mean[:, :m].T, qf[:, :m].T


def _fused_fwd(fstate, xq):
    m = xq.shape[0]
    m_pad = _round_up(m, min(_TM, _round_up(m, _LANE)))
    qs_aug = _build_qs_aug(fstate, xq, m_pad)
    mean, qf, v_aug = _fwd_with_v_p(
        fstate["amp"], fstate["xst"], fstate["gt"], qs_aug)
    return (mean[:, :m].T, qf[:, :m].T), (fstate, xq, qs_aug, v_aug)


def _fused_bwd(res, cts):
    fstate, xq, qs_aug, v_aug = res
    ct_mean, ct_qf = cts                            # (m, b) each
    m = xq.shape[0]
    m_pad = qs_aug.shape[1]
    ctm = jnp.zeros(v_aug.shape[:2], ct_mean.dtype).at[:, :m].set(ct_mean.T)
    ctq = jnp.zeros(v_aug.shape[:2], ct_qf.dtype).at[:, :m].set(ct_qf.T)
    ct_qs_aug = _bwd_cts_p(
        fstate["amp"], fstate["xst"], fstate["xs"], fstate["g"],
        qs_aug, v_aug, ctm, ctq,
    )
    # chain through the qs_aug construction with plain AD (small XLA ops)
    _, build_vjp = jax.vjp(lambda x: _build_qs_aug(fstate, x, m_pad), xq)
    (ct_xq,) = build_vjp(ct_qs_aug)
    ct_state = jax.tree.map(jnp.zeros_like, fstate)
    return ct_state, ct_xq


fused_pc_predict.defvjp(_fused_fwd, _fused_bwd)
