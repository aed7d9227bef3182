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
  contraction -- ``xs_aug`` carries extra feature columns ``[1, xn]`` and
  the query block carries ``[-0.5 qn, -0.5]``, so one dot yields
  ``z = xs.qs - 0.5 xn - 0.5 qn = -0.5 d2`` directly (no broadcast adds).
  Training-side padding rows carry ``xn = 1e30`` so their kstar is exactly
  ``exp(-5e29) = 0``.
- **v matmul**: ``alpha`` rides as an extra ROW of the G operand
  (``g_aug = [G; alpha; 0]``), so ``v = g_aug @ kstar`` produces the
  variance product AND the mean in one MXU pass:
  ``mean = v[n_pad, :]``, ``qform = sum_i v[i, :]^2 - mean^2``.

Everything is laid out (feature/train, walkers) so neither kernel contains
a transpose and the SAME two state arrays (``xs_aug``, ``g_aug``) serve
forward and backward.  Both matmuls run at 3-pass ``HIGH`` precision --
the quadratic form is the validated cancellation-free norm form (see
models/gp.GPConfig); the z contraction's internal cancellation is ~1e-7
relative at 3-pass, i.e. kstar to ~1e-6.

The op carries a custom VJP for the sampling gradient (HMC/Langevin/SMC):
the forward saves ``v`` as a residual (an HBM round-trip, ~3x cheaper than
recomputing the big matmul), and the backward kernel recomputes ``kstar``
from the cheap z matmul, forms ``ct_kstar`` via one big MXU pass and
chains to the query-block cotangent in VMEM.  Gradients flow to the QUERY
POINTS only -- the GP state receives zero cotangents (sampling
differentiates w.r.t. walker positions; emulator training never routes
through this op).  Like gp._norm_mean_var it is reverse-mode only; jacfwd
consumers use the vanilla path.

Sharding: the public entry points are wrapped in
``jax.experimental.custom_partitioning`` with Shardy rules declaring the
walker axis (m) batch-parallel and the GP state replicated, so the op
shards over the 1-D walker mesh (parallel/mesh.py) under pjit exactly
like the XLA path -- without this, GSPMD would treat the kernel as opaque
and all-gather the walker shards around it.
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

#: test hook: run the kernels in the Pallas interpreter (CPU-correct path)
INTERPRET = False
#: test hook: force the fused path regardless of backend (with INTERPRET)
FORCE = False


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _split_bf16_np(a: "np.ndarray"):
    """f32 -> (hi, lo) bf16 pair with hi + lo == a to bf16x2 accuracy."""
    import ml_dtypes

    hi = a.astype(ml_dtypes.bfloat16)
    lo = (a - hi.astype(np.float32)).astype(ml_dtypes.bfloat16)
    return hi, lo


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
    xk = x64[None, :, :] / ls[:, None, :]            # (b, n, d)
    xs[:, :n, :d] = xk
    xs[:, :n, d] = 1.0
    xs[:, :n, d + 1] = np.sum(xk * xk, axis=2)
    # padding rows: xn = 1e30 makes kstar exactly exp(-5e29) = 0
    xs[:, n:, d] = 1.0
    xs[:, n:, d + 1] = 1e30
    xs_hi, xs_lo = _split_bf16_np(xs)
    return {
        "xs_hi": jnp.asarray(xs_hi),                       # (b, np, DP) bf16
        "xs_lo": jnp.asarray(xs_lo),
        "amp": jnp.asarray(amp[:, None].astype(np.float32)),  # (b, 1)
        "inv_ls": jnp.asarray((1.0 / ls).astype(np.float32)),  # (b, d)
    }


def attach_fused_factors(
    fstate: dict, linv: np.ndarray, alpha_vec: np.ndarray
) -> dict:
    """Add the augmented-G layout ``[G; alpha; 0]`` to a fused state."""
    linv = np.asarray(linv, dtype=np.float32)     # (b, n, n)
    alpha = np.asarray(alpha_vec, dtype=np.float32)  # (b, n)
    b, n, _ = linv.shape
    np_pad = fstate["xs_hi"].shape[1]
    # alpha row + 15 zero rows: bf16 operands tile at (16, 128), so the
    # augmented row count must stay a multiple of 16
    npg = np_pad + 16
    g = np.zeros((b, npg, np_pad), dtype=np.float32)
    g[:, :n, :n] = linv
    g[:, np_pad, :n] = alpha
    g_hi, g_lo = _split_bf16_np(g)
    out = dict(fstate)
    out["g_hi"] = jnp.asarray(g_hi)                # (b, npg, np) bf16
    out["g_lo"] = jnp.asarray(g_lo)
    return out


@jax.jit
def _attach_factors_jit(linv, alpha_vec):
    """Pad/augment/split ``[G; alpha; 0]`` on the device (shapes static
    under jit; one compile shared by every same-shape emulator).

    The hi half is carved out by INTEGER mantissa masking (round-half-to-
    even into the top 16 bits), not ``astype(bfloat16)``: spelling the
    split as f32->bf16->f32 converts lets XLA:TPU's algebraic simplifier
    fold the convert chain and demote the subtraction, which silently
    zeroes the lo half -- the fused matmuls then run at 1-pass-bf16
    accuracy and the posterior moves by hundreds of log-units (caught by
    bench.py's generic-vs-auto cross-check, max rel 0.392).  Bitcasts and
    integer adds cannot be folded; the arithmetic is identical to the
    numpy builder (both are RNE), pinned bitwise by
    test_attach_factors_device_matches_host.
    """
    b, n, _ = linv.shape
    np_pad = _round_up(n, _LANE)
    npg = np_pad + 16
    g = jnp.zeros((b, npg, np_pad), dtype=jnp.float32)
    g = g.at[:, :n, :n].set(linv.astype(jnp.float32))
    g = g.at[:, np_pad, :n].set(alpha_vec.astype(jnp.float32))
    bits = lax.bitcast_convert_type(g, jnp.uint32)
    # round-to-nearest-even into the upper 16 bits (finite inputs only:
    # linv/alpha come from a Cholesky factor and are finite by construction)
    lsb = (bits >> 16) & jnp.uint32(1)
    hi_bits = (bits + jnp.uint32(0x7FFF) + lsb) & jnp.uint32(0xFFFF0000)
    hi_f32 = lax.bitcast_convert_type(hi_bits, jnp.float32)
    # bf16 <-> f32-with-zero-tail is a pure bit narrowing: exact both ways
    hi = lax.bitcast_convert_type(
        (hi_bits >> 16).astype(jnp.uint16), jnp.bfloat16
    )
    lo = (g - hi_f32).astype(jnp.bfloat16)
    return hi, lo


def attach_fused_factors_device(
    fstate: dict, linv: jnp.ndarray, alpha_vec: jnp.ndarray
) -> dict:
    """:func:`attach_fused_factors` without the device->host->device trip.

    gp_fit leaves ``linv``/``alpha_vec`` ON the device; pulling the
    (b, n, n) factor to host to pad it and re-uploading the two bf16
    splits moves ~33 MB per flagship emulator over the tunnel (measured
    as most of the gp_train_s regression 5.7 -> 11.3 s).  The augmented
    layout is pure pad/concat/cast work, so one tiny jitted program does
    it in place; both builders round f32->bf16 with round-to-nearest-even
    and agree bitwise (pinned by test_pallas_predict).
    """
    out = dict(fstate)
    out["g_hi"], out["g_lo"] = _attach_factors_jit(linv, alpha_vec)
    return out


# --------------------------------------------------------------- kernels


def _split_bf16(a):
    """In-kernel f32 -> bf16 (hi, lo) split (for operands computed in VMEM)."""
    hi = a.astype(jnp.bfloat16)
    lo = (a - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _dot3(ah, al, bh, bl, dims):
    """3-pass bf16 matmul with f32 accumulation == XLA's f32 HIGH.

    Mosaic rejects ``precision=HIGH`` on f32 dots (only DEFAULT/HIGHEST
    lower), so the 3-pass decomposition is spelled out: hi*hi + hi*lo +
    lo*hi, each a native bf16 MXU pass.  The dropped lo*lo term is
    O(2^-16) relative -- identical to XLA HIGH by construction.
    """
    dd = partial(
        jax.lax.dot_general,
        dimension_numbers=dims,
        preferred_element_type=jnp.float32,
        # explicit: the package-global jax_default_matmul_precision=highest
        # would otherwise request an fp32 contraction of bf16 operands,
        # which Mosaic rejects ("Bad rhs type"); each pass IS a native
        # single-pass bf16 MXU matmul by construction
        precision=lax.Precision.DEFAULT,
    )
    return dd(ah, bh) + dd(ah, bl) + dd(al, bh)


def _dot1(ah, b_f32, dims):
    """1-pass bf16 matmul (hi operands only, f32 accumulation).

    Used by the FAST backward (see :func:`fused_pc_predict_fastbwd`):
    ~2^-9 relative error, 3x fewer MXU passes than :func:`_dot3`.  Legal
    for sampling gradients only -- HMC/Langevin correctness comes from the
    accept step's exact VALUE; the gradient merely shapes the proposal map
    (any deterministic force field keeps leapfrog reversible and
    volume-preserving), so gradient precision trades acceptance rate, not
    exactness."""
    return jax.lax.dot_general(
        ah, b_f32.astype(jnp.bfloat16),
        dimension_numbers=dims,
        preferred_element_type=jnp.float32,
        precision=lax.Precision.DEFAULT,
    )


_CONTRACT_1_0 = (((1,), (0,)), ((), ()))
_CONTRACT_0_0 = (((0,), (0,)), ((), ()))


def _fwd_kernel(amp_ref, xsh_ref, xsl_ref, gh_ref, gl_ref, qs_ref,
                mean_ref, qf_ref, *maybe_v_ref,
                np_pad: int, tm: int, save_v: bool):
    """One (PC k, walker tile j) step: qs (DP, tm) -> mean/qf (tm,)."""
    qh, ql = _split_bf16(qs_ref[0])                  # (DP, tm)
    z = _dot3(xsh_ref[0], xsl_ref[0], qh, ql, _CONTRACT_1_0)
    k = pl.program_id(0)                             # (np, tm) = -0.5 d2
    kstar = amp_ref[k, 0] * jnp.exp(jnp.minimum(z, 0.0))
    kh, kl = _split_bf16(kstar)
    v = _dot3(gh_ref[0], gl_ref[0], kh, kl, _CONTRACT_1_0)  # (npg, tm)
    mean = v[np_pad, :]
    # masked sum over the G rows, NOT sum(v^2) - mean^2: the subtraction
    # would reintroduce exactly the cancellation the factored norm form
    # exists to avoid (absolute error ~ eps_f32 * mean^2 wherever the
    # whitened PC mean is large, i.e. extrapolation queries).  Rows past
    # np_pad are zero G rows (v = 0), so excluding only the mean row is
    # exact; the backward already treats d qf / d v_np as 0.
    rows = lax.broadcasted_iota(jnp.int32, (v.shape[0], 1), 0)
    qf = jnp.sum(jnp.where(rows == np_pad, 0.0, v * v), axis=0)
    j = pl.program_id(1)
    mean_ref[k, pl.ds(j * tm, tm)] = mean
    qf_ref[k, pl.ds(j * tm, tm)] = qf
    if save_v:
        maybe_v_ref[0][0] = v


def _bwd_kernel(amp_ref, xsh_ref, xsl_ref, gh_ref, gl_ref, qs_ref, v_ref,
                ctm_ref, ctq_ref, ctqs_ref, *, np_pad: int, tm: int):
    """Cotangent w.r.t. the query block for one (PC, walker tile) step."""
    qh, ql = _split_bf16(qs_ref[0])
    z = _dot3(xsh_ref[0], xsl_ref[0], qh, ql, _CONTRACT_1_0)  # (np, tm)
    k = pl.program_id(0)
    j = pl.program_id(1)
    kstar = amp_ref[k, 0] * jnp.exp(jnp.minimum(z, 0.0))
    v = v_ref[0]                                     # (npg, tm)
    npg = v.shape[0]
    rows = lax.broadcasted_iota(jnp.int32, (npg, 1), dimension=0)
    ctm = ctm_ref[k, pl.ds(j * tm, tm)]              # (tm,)
    ctq = ctq_ref[k, pl.ds(j * tm, tm)]
    # qf = sum_i v_i^2 - v_np^2: row np_pad cancels out of qf exactly
    # (2 v_np - 2 mean = 0), so its only cotangent is the mean's; rows
    # > np_pad have v = 0 (zero G rows) so 2 v ct_qf vanishes there anyway
    ct_v = jnp.where(
        rows == np_pad, ctm[None, :], 2.0 * v * ctq[None, :]
    )                                                # (npg, tm)
    cth, ctl = _split_bf16(ct_v)
    ct_kstar = _dot3(gh_ref[0], gl_ref[0], cth, ctl, _CONTRACT_0_0)
    ct_z = jnp.where(z < 0.0, kstar * ct_kstar, 0.0)  # (np, tm)
    zh, zl = _split_bf16(ct_z)
    ctqs_ref[0] = _dot3(xsh_ref[0], xsl_ref[0], zh, zl, _CONTRACT_0_0)


def _bwd_kernel_fast(amp_ref, xsh_ref, xsl_ref, gh_ref, qs_ref, v_ref,
                     ctm_ref, ctq_ref, ctqs_ref, *, np_pad: int, tm: int):
    """FAST query-block cotangent: the two cotangent matmuls run 1-pass
    bf16 (G hi rows only; no g_lo block is even loaded), while the z
    recompute keeps the 3-pass split -- z's augmented contraction cancels
    catastrophically (terms O(xn) >> |z|), so a 1-pass z would corrupt
    kstar itself, not just add benign gradient noise."""
    qh, ql = _split_bf16(qs_ref[0])
    z = _dot3(xsh_ref[0], xsl_ref[0], qh, ql, _CONTRACT_1_0)  # (np, tm)
    k = pl.program_id(0)
    j = pl.program_id(1)
    kstar = amp_ref[k, 0] * jnp.exp(jnp.minimum(z, 0.0))
    v = v_ref[0]                                     # (npg, tm)
    npg = v.shape[0]
    rows = lax.broadcasted_iota(jnp.int32, (npg, 1), dimension=0)
    ctm = ctm_ref[k, pl.ds(j * tm, tm)]              # (tm,)
    ctq = ctq_ref[k, pl.ds(j * tm, tm)]
    ct_v = jnp.where(
        rows == np_pad, ctm[None, :], 2.0 * v * ctq[None, :]
    )                                                # (npg, tm)
    ct_kstar = _dot1(gh_ref[0], ct_v, _CONTRACT_0_0)
    ct_z = jnp.where(z < 0.0, kstar * ct_kstar, 0.0)  # (np, tm)
    ctqs_ref[0] = _dot1(xsh_ref[0], ct_z, _CONTRACT_0_0)


# ------------------------------------------------------ pallas_call wrappers


def _fwd_call(amp, xs_hi, xs_lo, g_hi, g_lo, qs_aug, *, save_v: bool):
    b, npg, np_pad = g_hi.shape
    m_pad = qs_aug.shape[2]
    tm = min(_TM, m_pad)
    grid = (b, m_pad // tm)
    out_shape = [
        jax.ShapeDtypeStruct((b, m_pad), jnp.float32),  # mean
        jax.ShapeDtypeStruct((b, m_pad), jnp.float32),  # qf
    ]
    # mean/qf use FULL-ARRAY blocks + dynamic stores: a (1, tm) block has
    # a sub-8 sublane dim, which the Mosaic lowering rejects
    out_specs = [
        pl.BlockSpec((b, m_pad), lambda k, j: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((b, m_pad), lambda k, j: (0, 0),
                     memory_space=pltpu.VMEM),
    ]
    if save_v:
        out_shape.append(jax.ShapeDtypeStruct((b, npg, m_pad), jnp.float32))
        out_specs.append(
            pl.BlockSpec((1, npg, tm), lambda k, j: (k, 0, j),
                         memory_space=pltpu.VMEM)
        )
    state_specs = [
        pl.BlockSpec((b, 1), lambda k, j: (0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((1, np_pad, _DP), lambda k, j: (k, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, np_pad, _DP), lambda k, j: (k, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, npg, np_pad), lambda k, j: (k, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, npg, np_pad), lambda k, j: (k, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    return pl.pallas_call(
        partial(_fwd_kernel, np_pad=np_pad, tm=tm, save_v=save_v),
        grid=grid,
        in_specs=state_specs + [
            pl.BlockSpec((1, _DP, tm), lambda k, j: (k, 0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        cost_estimate=pl.CostEstimate(
            flops=2 * 3 * b * m_pad * np_pad * (npg + _DP),
            bytes_accessed=4 * b * (np_pad * npg + m_pad * (_DP + 2)),
            transcendentals=b * m_pad * np_pad,
        ),
        # the double-buffered G blocks + f32 z/kstar/v temporaries brush
        # the default 16 MiB scoped-VMEM limit at flagship shapes; v5e has
        # 128 MiB of VMEM, so raise the scoped cap instead of shrinking tm
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=INTERPRET,
    )(amp, xs_hi, xs_lo, g_hi, g_lo, qs_aug)


def _bwd_call(amp, xs_hi, xs_lo, g_hi, g_lo, qs_aug, v_aug, ct_mean, ct_qf):
    b, npg, np_pad = g_hi.shape
    m_pad = qs_aug.shape[2]
    tm = min(_TM, m_pad)
    grid = (b, m_pad // tm)
    return pl.pallas_call(
        partial(_bwd_kernel, np_pad=np_pad, tm=tm),
        grid=grid,
        in_specs=[
            pl.BlockSpec((b, 1), lambda k, j: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, np_pad, _DP), lambda k, j: (k, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, np_pad, _DP), lambda k, j: (k, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, npg, np_pad), lambda k, j: (k, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, npg, np_pad), lambda k, j: (k, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _DP, tm), lambda k, j: (k, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, npg, tm), lambda k, j: (k, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b, m_pad), lambda k, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b, m_pad), lambda k, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, _DP, tm), lambda k, j: (k, 0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, _DP, m_pad), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * 3 * b * m_pad * np_pad * (2 * npg + _DP),
            bytes_accessed=4 * b * (np_pad * npg + 2 * m_pad * npg),
            transcendentals=b * m_pad * np_pad,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=INTERPRET,
    )(amp, xs_hi, xs_lo, g_hi, g_lo, qs_aug, v_aug, ct_mean, ct_qf)


def _bwd_call_fast(amp, xs_hi, xs_lo, g_hi, qs_aug, v_aug, ct_mean, ct_qf):
    b, npg, np_pad = g_hi.shape
    m_pad = qs_aug.shape[2]
    tm = min(_TM, m_pad)
    grid = (b, m_pad // tm)
    return pl.pallas_call(
        partial(_bwd_kernel_fast, np_pad=np_pad, tm=tm),
        grid=grid,
        in_specs=[
            pl.BlockSpec((b, 1), lambda k, j: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, np_pad, _DP), lambda k, j: (k, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, np_pad, _DP), lambda k, j: (k, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, npg, np_pad), lambda k, j: (k, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _DP, tm), lambda k, j: (k, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, npg, tm), lambda k, j: (k, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b, m_pad), lambda k, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b, m_pad), lambda k, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, _DP, tm), lambda k, j: (k, 0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, _DP, m_pad), jnp.float32),
        cost_estimate=pl.CostEstimate(
            # z stays 3-pass; the two cotangent matmuls are single-pass
            flops=2 * b * m_pad * np_pad * (3 * _DP + npg + _DP),
            bytes_accessed=4 * b * (np_pad * npg // 2 + 2 * m_pad * npg),
            transcendentals=b * m_pad * np_pad,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=INTERPRET,
    )(amp, xs_hi, xs_lo, g_hi, qs_aug, v_aug, ct_mean, ct_qf)


def _fwd_values(amp, xs_hi, xs_lo, g_hi, g_lo, qs_aug):
    return tuple(
        _fwd_call(amp, xs_hi, xs_lo, g_hi, g_lo, qs_aug, save_v=False)[:2])


def _fwd_with_v(amp, xs_hi, xs_lo, g_hi, g_lo, qs_aug):
    return tuple(
        _fwd_call(amp, xs_hi, xs_lo, g_hi, g_lo, qs_aug, save_v=True))


def _bwd_cts(amp, xs_hi, xs_lo, g_hi, g_lo, qs_aug, v_aug, ct_mean, ct_qf):
    return _bwd_call(amp, xs_hi, xs_lo, g_hi, g_lo, qs_aug, v_aug,
                     ct_mean, ct_qf)


def _bwd_cts_fast(amp, xs_hi, xs_lo, g_hi, qs_aug, v_aug, ct_mean, ct_qf):
    return _bwd_call_fast(amp, xs_hi, xs_lo, g_hi, qs_aug, v_aug,
                          ct_mean, ct_qf)


# ----------------------------------------------- custom partitioning layer
#
# Declares the walker axis (m) batch-parallel so the op shards over the
# 1-D walker mesh under pjit: the m-carrying operands split on their m
# axis, the GP state is replicated, outputs inherit the m sharding.
# Without this GSPMD treats the kernel as opaque and all-gathers walkers.


def _make_partitioned(inner, m_operands: dict, out_m_axes, sdy_rule: str,
                      repl_factors: tuple):
    """``m_operands``: {operand index: m-axis}; ``out_m_axes``: m-axis per
    output.  ``sdy_rule``: the einsum-like Shardy rule -- the shared ``m``
    factor is what lets the partitioner split the walker axis; the state
    factors are declared need-replication (the kernel needs them whole).
    ``repl_factors`` must be listed in first-appearance order."""

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

        rs = (
            result_infos
            if isinstance(result_infos, (list, tuple))
            else [result_infos]
        )
        outs = [spec_for(ax, len(r.shape)) for ax, r in zip(out_m_axes, rs)]
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
        need_replication_factors=repl_factors,
    )
    return cp


# factor legend: b = PC batch, s = amp's singleton, n = padded training
# rows, p = padded feature width, g = augmented-G rows, m = walkers
_fwd_values_p = _make_partitioned(
    _fwd_values, {5: 2}, (1, 1),
    "b s, b n p, b n p, b g n, b g n, b p m -> b m, b m",
    ("s", "n", "p", "g"),
)
_fwd_with_v_p = _make_partitioned(
    _fwd_with_v, {5: 2}, (1, 1, 2),
    "b s, b n p, b n p, b g n, b g n, b p m -> b m, b m, b g m",
    ("s", "n", "p", "g"),
)
_bwd_cts_p = _make_partitioned(
    _bwd_cts, {5: 2, 6: 2, 7: 1, 8: 1}, (2,),
    "b s, b n p, b n p, b g n, b g n, b p m, b g m, b m, b m -> b p m",
    ("s", "n", "p", "g"),
)
_bwd_cts_fast_p = _make_partitioned(
    _bwd_cts_fast, {4: 2, 5: 2, 6: 1, 7: 1}, (2,),
    "b s, b n p, b n p, b g n, b p m, b g m, b m, b m -> b p m",
    ("s", "n", "p", "g"),
)


# ------------------------------------------------------- custom batching
#
# jax.vmap has no batching rule for custom_partitioning, so a vmapped
# caller (PTLMC's per-chain L-BFGS pre-opt vmaps the whole posterior --
# found by the round-5 bench PTLMC stage on real TPU) would die with
# NotImplementedError.  The op is batch-parallel in the walker axis m by
# construction, so the EXACT rule is: merge the vmap axis into m
# (B-major -- each lane owns a contiguous m-block), run the op once on
# the concatenated walkers, split the outputs back.  Wrapped INSIDE the
# custom-VJP bodies (autodiff never crosses custom_vmap, which does not
# support it; vmap-of-grad reaches these through custom_vjp's own
# batching rule).


def _vmap_over_walkers(fn, m_operands: dict, out_m_axes: tuple):
    """Wrap a partitioned kernel call in a merge-into-m custom_vmap rule.

    ``m_operands``: {operand index: m-axis in the UNBATCHED shape} --
    exactly the batch-parallel operands the Shardy rules declare;
    ``out_m_axes``: m-axis per output.  GP-state operands must be
    unbatched (they are replicated in every caller)."""
    from jax.custom_batching import custom_vmap

    wrapped = custom_vmap(fn)

    @wrapped.def_vmap
    def _rule(axis_size, in_batched, *args):
        bad = [
            i for i, b in enumerate(in_batched) if b and i not in m_operands
        ]
        if bad:
            raise NotImplementedError(
                f"fused predict vmap: operands {bad} (GP state) cannot be "
                "batched -- only the walker-carrying operands can"
            )
        # per-lane m is already lane-aligned; the MERGED axis must also
        # divide the kernel's walker tile (tm = min(_TM, m)), else the
        # grid under-covers and part of the output buffer is never
        # written (e.g. 3 lanes x 128 = 384 with tm 256).  Pad with zero
        # query columns (finite garbage outputs, sliced away below).
        # m_lane must come from a BATCHED m-operand: an unbatched one
        # (e.g. the qs_aug residual when only cotangents are vmapped
        # through a stored vjp_fn) has no leading batch axis, so
        # shape[ax + 1] would read past its rank.
        batched_m = [
            i for i, b in enumerate(in_batched) if b and i in m_operands
        ]
        if not batched_m:
            raise NotImplementedError(
                "fused predict vmap: at least one walker-carrying operand "
                "must be batched"
            )
        i0 = batched_m[0]
        m_lane = args[i0].shape[m_operands[i0] + 1]
        m_merged = axis_size * m_lane
        m_target = (
            m_merged if m_merged <= _TM else _round_up(m_merged, _TM)
        )
        merged = []
        for i, (a, batched) in enumerate(zip(args, in_batched)):
            if i not in m_operands:
                merged.append(a)
                continue
            ax = m_operands[i]
            if not batched:
                # lane-constant m-operand (e.g. a cotangent from a
                # lane-independent loss term): replicate it per lane so
                # the merged kernel operand still has the full m_target
                # width -- passing it through unmerged hands the kernel a
                # wrong-shaped block (found as NaNs under vmap-of-grad)
                a = jnp.broadcast_to(a[None], (axis_size, *a.shape))
            a = jnp.moveaxis(a, 0, ax)        # batch lands just before m
            shp = a.shape
            a = a.reshape(*shp[:ax], shp[ax] * shp[ax + 1], *shp[ax + 2:])
            if m_target > m_merged:
                pad = [(0, 0)] * a.ndim
                pad[ax] = (0, m_target - m_merged)
                a = jnp.pad(a, pad)
            merged.append(a)
        outs = fn(*merged)
        is_tuple = isinstance(outs, tuple)
        split = []
        for o, ax in zip(outs if is_tuple else (outs,), out_m_axes):
            if m_target > m_merged:
                o = lax.slice_in_dim(o, 0, m_merged, axis=ax)
            shp = o.shape
            o = o.reshape(
                *shp[:ax], axis_size, shp[ax] // axis_size, *shp[ax + 1:]
            )
            split.append(jnp.moveaxis(o, ax, 0))
        if is_tuple:
            return tuple(split), tuple(True for _ in split)
        return split[0], True

    return wrapped


_fwd_values_pb = _vmap_over_walkers(_fwd_values_p, {5: 2}, (1, 1))
_fwd_with_v_pb = _vmap_over_walkers(_fwd_with_v_p, {5: 2}, (1, 1, 2))
_bwd_cts_pb = _vmap_over_walkers(
    _bwd_cts_p, {5: 2, 6: 2, 7: 1, 8: 1}, (2,)
)
_bwd_cts_fast_pb = _vmap_over_walkers(
    _bwd_cts_fast_p, {4: 2, 5: 2, 6: 1, 7: 1}, (2,)
)


# --------------------------------------------------------- public entry


def _build_qs_aug(fstate: dict, xq: jnp.ndarray, m_pad: int) -> jnp.ndarray:
    """(b, DP, m_pad) scaled+augmented query block from raw queries (m, d)."""
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
    out = jnp.swapaxes(out, 1, 2)                   # (b, DP, m)
    if m_pad > m:
        out = jnp.pad(out, ((0, 0), (0, 0), (0, m_pad - m)))
    return out


def _m_pad_of(m: int) -> int:
    return _round_up(m, min(_TM, _round_up(m, _LANE)))


def _make_fused_entry(fast_bwd: bool):
    """Build the custom-VJP entry point; ``fast_bwd`` selects the 1-pass
    bf16 backward kernel (see :func:`fused_pc_predict_fastbwd`)."""

    @jax.custom_vjp
    def entry(fstate: dict, xq: jnp.ndarray):
        m = xq.shape[0]
        qs_aug = _build_qs_aug(fstate, xq, _m_pad_of(m))
        mean, qf = _fwd_values_pb(
            fstate["amp"], fstate["xs_hi"], fstate["xs_lo"],
            fstate["g_hi"], fstate["g_lo"], qs_aug)
        return mean[:, :m].T, qf[:, :m].T

    def fwd(fstate, xq):
        m = xq.shape[0]
        qs_aug = _build_qs_aug(fstate, xq, _m_pad_of(m))
        mean, qf, v_aug = _fwd_with_v_pb(
            fstate["amp"], fstate["xs_hi"], fstate["xs_lo"],
            fstate["g_hi"], fstate["g_lo"], qs_aug)
        return (mean[:, :m].T, qf[:, :m].T), (fstate, xq, qs_aug, v_aug)

    def bwd(res, cts):
        fstate, xq, qs_aug, v_aug = res
        ct_mean, ct_qf = cts                        # (m, b) each
        m = xq.shape[0]
        m_pad = qs_aug.shape[2]
        b = qs_aug.shape[0]
        ctm = jnp.zeros((b, m_pad), ct_mean.dtype).at[:, :m].set(ct_mean.T)
        ctq = jnp.zeros((b, m_pad), ct_qf.dtype).at[:, :m].set(ct_qf.T)
        if fast_bwd:
            ct_qs_aug = _bwd_cts_fast_pb(
                fstate["amp"], fstate["xs_hi"], fstate["xs_lo"],
                fstate["g_hi"], qs_aug, v_aug, ctm, ctq,
            )
        else:
            ct_qs_aug = _bwd_cts_pb(
                fstate["amp"], fstate["xs_hi"], fstate["xs_lo"],
                fstate["g_hi"], fstate["g_lo"], qs_aug, v_aug, ctm, ctq,
            )
        # chain through the qs_aug construction with plain AD (small XLA ops)
        _, build_vjp = jax.vjp(lambda x: _build_qs_aug(fstate, x, m_pad), xq)
        (ct_xq,) = build_vjp(ct_qs_aug)
        ct_state = jax.tree.map(jnp.zeros_like, fstate)
        return ct_state, ct_xq

    entry.defvjp(fwd, bwd)
    return entry


#: Fused GP-batch predict: (m, d) queries -> (mean (m, b), qform (m, b)).
#:
#: ``var = kdiag - qform`` is left to the caller (models/emulator.py keeps
#: the validated ``maximum(kdiag - q, 0)`` epilogue).  Reverse-mode only;
#: the GP state receives zero cotangents (sampling-only gradient).  The
#: backward runs the same 3-pass precision as the forward.
fused_pc_predict = _make_fused_entry(False)

#: Same forward as :func:`fused_pc_predict`, but the backward's two
#: cotangent matmuls run 1-pass bf16 (GPConfig.grad_precision="default",
#: the production sampling path).  VALUES are bit-identical to
#: ``fused_pc_predict``; gradients carry ~2^-9 relative noise, which is
#: legal for MCMC: the gradient only shapes the leapfrog/Langevin proposal
#: map (deterministic force field -> reversible, volume-preserving), while
#: chain exactness comes from the accept step's 3-pass value.  Measured
#: backward FLOPs drop ~2.2x (z recompute stays 3-pass; see
#: ``_bwd_kernel_fast``).
fused_pc_predict_fastbwd = _make_fused_entry(True)
