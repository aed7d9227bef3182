"""Pallas TPU kernel: fused batched MVN log-likelihood.

This is the framework's #1 hot op (SURVEY.md C11): one (n, n) Cholesky +
solve + logdet *per walker per MCMC step*.  XLA's batched ``cholesky`` +
``triangular_solve`` lowering on TPU launches a long sequence of small ops
(~22 ms for a 128 x 170 x 170 batch); this kernel does the whole thing in
one VMEM-resident pass.

Algorithm -- augmented symmetric elimination:

- Build ``A = [[C, y], [y^T, 0]]`` padded with an identity block to a lane
  multiple.  Symmetric Gaussian elimination on the first n columns is
  exactly Cholesky in pivot form: pivot ``p_k = A[k,k] = L_kk^2`` gives
  ``logdet(L) = 1/2 sum log p_k``, and after eliminating all n columns the
  trailing entry is ``A[n,n] = -y^T C^-1 y`` -- the quadratic form falls out
  with NO separate triangular solve.
- The update ``A -= u u^T / p_k`` (u = masked row k) is a rank-1 FMA over
  the whole (chunk, np, np) block: fully batch- and lane-vectorized VPU
  work, ~n^3 flops per matrix with zero sequential solves.
- A is kept symmetric throughout, so "column k" is read as *row* k -- a
  sublane slice, cheap on TPU, instead of a lane gather.

Non-PD inputs produce NaN pivots which propagate to the output; the wrapper
maps non-finite to -inf (MCMC rejection semantics).  The op carries a
custom VJP (XLA closed-form gradients) so it remains usable inside
gradient-based samplers.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .linalg import mvn_loglike_batch as _xla_mvn_loglike_batch

_LANE = 128

#: test hook: run the kernel in the Pallas interpreter (CPU-correct path)
INTERPRET = False


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


#: phase count for dead-row trimming in the elimination loop.  More phases
#: trim closer to the exact triangular profile but emit more distinct loop
#: bodies (compile time); 16 captured ~all of the win in the sweep.
N_PHASES = 16


def _phases(n: int, rows: int, n_phases: int):
    """Static (col_start, col_end, row_start) phase list for dead-row trim.

    Columns [c0, c1) only update rows [r0, rows) with r0 = c0 rounded DOWN
    to a sublane multiple.  This is EXACT: the elimination at pivot k only
    reads rows >= k (row k itself plus the trailing rows it updates), and
    the two outputs -- pivot A[k, k] read at iteration k and the quadratic
    form A[n, n] with n >= c1 -- always lie inside the updated window.
    Rows < r0 are finalized and never read again, so skipping their update
    cuts up to ~45% of the VPU work (triangular vs square profile).
    """
    bounds = sorted({min(n, (n * i) // n_phases) for i in range(n_phases)} | {n})
    out = []
    for c0, c1 in zip(bounds[:-1], bounds[1:]):
        if c0 < c1:
            out.append((c0, c1, (c0 // 8) * 8))
    return out


def _mvn_kernel(a_ref, out_ref, *, n: int, np_pad: int):
    """One batch chunk: a_ref (chunk, np_pad, np_pad) -> out_ref (chunk, 128).

    a_ref holds the augmented matrices; columns/rows >= n+1 are identity
    padding.  Writes lp = -0.5 * quad - logdet_half into out lane 0.
    """
    chunk = a_ref.shape[0]
    col_ids = lax.broadcasted_iota(jnp.int32, (chunk, np_pad), dimension=1)
    # Rows > n are inert identity padding: row r > n has zeros in every
    # column <= n, so u_r = 0 and the rank-1 update never touches it.
    # Restricting the update to the first sublane-aligned `rows` rows is
    # EXACT and skips up to (np_pad - rows)/np_pad of the work (the lane
    # padding 170 -> 256 at flagship shapes costs 31% otherwise).
    rows = min(_round_up(n + 1, 8), np_pad)

    def make_body(r0):
        def body(k, logdet_half):
            row = a_ref[:, k, :]  # (chunk, np_pad) -- symmetric: row k == col k
            # pivot A[k, k] via masked reduction (dynamic lane gather is not
            # lowerable on TPU; this is one cheap VPU reduce instead)
            pivot = jnp.sum(jnp.where(col_ids == k, row, 0.0), axis=1)
            logdet_half = logdet_half + 0.5 * jnp.log(pivot)
            u = jnp.where(col_ids > k, row, 0.0)  # only trailing lanes live
            # row factor: lane-vector u moved onto the sublane axis FIRST,
            # then sublane-sliced to [r0, rows) (a direct lane slice to a
            # non-multiple of 128 is not lowerable; a lane-offset dynamic
            # load is not lowerable either, so only rows are trimmed)
            u_rows = u[:, :, None][:, r0:rows, :]
            a_ref[:, r0:rows, :] = a_ref[:, r0:rows, :] - (
                u_rows * (u[:, None, :] / pivot[:, None, None])
            )
            return logdet_half

        return body

    # Phased dead-row trimming (see _phases): 1.4x over a single full-window
    # loop at flagship shapes (n=170: 12.3 -> 8.8 ms on v5e).
    logdet_half = jnp.zeros((chunk,), a_ref.dtype)
    for c0, c1, r0 in _phases(n, rows, N_PHASES):
        logdet_half = lax.fori_loop(
            c0, c1, make_body(r0), logdet_half, unroll=False
        )
    # After eliminating columns 0..n-1: A[n, n] = -y^T C^-1 y.
    quad = -a_ref[:, n, n]
    lp = -0.5 * quad - logdet_half
    i = pl.program_id(0)
    out_ref[pl.ds(i * chunk, chunk), :] = jnp.broadcast_to(
        lp[:, None], (chunk, _LANE)
    )


def _build_augmented(y: jnp.ndarray, cov: jnp.ndarray) -> jnp.ndarray:
    """Assemble [[C, y], [y^T, 0]] padded to a lane multiple with identity."""
    b, n = y.shape
    np_pad = _round_up(n + 1, _LANE)
    a = jnp.zeros((b, np_pad, np_pad), dtype=cov.dtype)
    a = a.at[:, :n, :n].set(cov)
    a = a.at[:, :n, n].set(y)
    a = a.at[:, n, :n].set(y)
    # identity on the padding diagonal keeps pivots finite (and log p = 0)
    diag_pad = jnp.arange(n + 1, np_pad)
    a = a.at[:, diag_pad, diag_pad].set(1.0)
    return a


def _pick_chunk(
    b: int, np_pad: int, itemsize: int = 4, vmem_budget: int = 6 * 2**20
) -> int:
    # The budget covers the INPUT block only; the rank-1 update in the body
    # materializes one more block-sized temporary, so the true VMEM need is
    # ~2x this plus the output block.  8 MiB overflowed the 16 MiB scoped
    # limit by 36 KiB on a (512, 256, 256) f32 batch; 6 MiB leaves headroom.
    # itemsize comes from the actual dtype: hardcoding 4 bytes would halve
    # the estimated footprint for f64 inputs and blow the scoped limit.
    per_mat = np_pad * np_pad * itemsize
    chunk = max(1, min(b, vmem_budget // max(per_mat, 1)))
    while b % chunk != 0:
        chunk -= 1
    return chunk


@partial(jax.custom_vjp, nondiff_argnums=())
def mvn_loglike_pallas(y: jnp.ndarray, cov: jnp.ndarray) -> jnp.ndarray:
    """Batched MVN log-likelihood via the fused Pallas kernel.

    y (b, n), cov (b, n, n) -> (b,).  Same semantics as
    :func:`..ops.linalg.mvn_loglike_batch`.
    """
    return _forward(y, cov)


def _forward(y, cov):
    b, n = y.shape
    a = _build_augmented(y, cov)
    np_pad = a.shape[-1]
    chunk = _pick_chunk(b, np_pad, jnp.dtype(a.dtype).itemsize)
    grid = (b // chunk,)
    out = pl.pallas_call(
        partial(_mvn_kernel, n=n, np_pad=np_pad),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (chunk, np_pad, np_pad),
                lambda i: (i, 0, 0),
                memory_space=pltpu.VMEM,
            )
        ],
        # full-array output block: each program writes its chunk via a
        # dynamic store (chunk may be < 8, below the min sublane tile)
        out_specs=pl.BlockSpec(
            (b, _LANE), lambda i: (0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, _LANE), cov.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * np_pad * np_pad * n,
            bytes_accessed=2 * b * np_pad * np_pad * 4 * n,
            transcendentals=b * n,
        ),
        interpret=INTERPRET,
    )(a)
    lp = out[:, 0]
    return jnp.where(jnp.isfinite(lp), lp, -jnp.inf)


def _fwd(y, cov):
    return _forward(y, cov), (y, cov)


def _bwd(res, g):
    y, cov = res
    # Closed-form gradients (Rasmussen & Williams eq. 5.9 style):
    #   d lp / dy   = -C^-1 y
    #   d lp / dC   = 1/2 (alpha alpha^T - C^-1),  alpha = C^-1 y
    chol = jnp.linalg.cholesky(cov)
    eye = jnp.eye(cov.shape[-1], dtype=cov.dtype)

    def one(c, yv):
        z = lax.linalg.triangular_solve(c, yv[:, None], left_side=True, lower=True)
        alpha = lax.linalg.triangular_solve(
            c, z, left_side=True, lower=True, transpose_a=True
        )[:, 0]
        cinv_half = lax.linalg.triangular_solve(c, eye, left_side=True, lower=True)
        cinv = cinv_half.T @ cinv_half
        return -alpha, 0.5 * (jnp.outer(alpha, alpha) - cinv)

    dy, dcov = jax.vmap(one)(chol, y)
    return g[:, None] * dy, g[:, None, None] * dcov


mvn_loglike_pallas.defvjp(_fwd, _bwd)


def mvn_loglike_best(y: jnp.ndarray, cov: jnp.ndarray) -> jnp.ndarray:
    """Dispatch to the Pallas kernel on TPU, XLA elsewhere."""
    if jax.default_backend() == "tpu" and cov.dtype == jnp.float32:
        return mvn_loglike_pallas(y, cov)
    return _xla_mvn_loglike_batch(y, cov)
