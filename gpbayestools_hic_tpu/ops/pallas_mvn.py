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
- The update ``A -= u u^T / p_k`` (u = masked row k) is applied blocked:
  a short VPU rank-1 loop inside each PANEL-column panel, then the panel's
  cumulative trailing (Schur) update as one batched MXU ``dot_general`` --
  ~n^3 flops per matrix with zero sequential solves, the bulk of them on
  the systolic array.
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


#: panel width for the blocked elimination.  Each panel is factored by a
#: short VPU rank-1 loop over its own rows, then the cumulative trailing
#: (Schur) update is applied as ONE batched MXU contraction.  32 won the
#: v5e sweep (16/32/64/128): wide enough to amortize the matmul, narrow
#: enough that the VPU panel work stays tiny.
PANEL = 32


def _mvn_kernel(a_ref, out_ref, *, n: int, np_pad: int):
    """One batch chunk: a_ref (chunk, np_pad, np_pad) -> out_ref (chunk, 128).

    a_ref holds the augmented matrices; columns/rows >= n+1 are identity
    padding.  Writes lp = -0.5 * quad - logdet_half into out lane 0.

    Blocked right-looking elimination, two stages per static PANEL-column
    panel [c0, c1):

    - **phase 1 (VPU)**: the classic rank-1 update restricted to the
      panel's own row tile [p_r0, p_r1) -- row k+1 must see column k's
      update before it is read as the next pivot row, but no row outside
      the panel tile is read until the panel is done.
    - **phase 2 (MXU)**: the trailing rows' cumulative update factors as
          A[i, j] -= sum_k U[k, i] * U[k, j] / p_k,
      U = the finished panel rows masked to columns > k -- one batched
      ``dot_general`` contracting the panel axis, which runs on the MXU
      instead of burning VPU cycles row by row.

    Exactness: rows above a panel are finalized and never read again
    (elimination at pivot k only reads rows >= k), and the two outputs --
    pivot A[k, k] read at iteration k and the quadratic form A[n, n] --
    always lie inside the updated window, so the restricted updates are
    EXACT, not approximations.  Trailing-row entries in columns <= c0 go
    stale after phase 2 of a later panel, but every later read masks to
    columns > k >= c0.  Measured on v5e at the flagship 170-observable
    block (512-matrix f32 batch): 12.3 ms for the square rank-1 kernel,
    8.6 ms with dead-row trimming alone, 7.4 ms blocked+MXU (this form).
    A lane-axis trim of the same kind is NOT lowerable (Mosaic rejects
    dynamic loads at a nonzero lane offset), so only rows are blocked.
    """
    chunk = a_ref.shape[0]
    col_ids = lax.broadcasted_iota(jnp.int32, (chunk, np_pad), dimension=1)
    # Rows > n are inert identity padding: row r > n has zeros in every
    # column <= n, so u_r = 0 and the rank-1 update never touches it.
    # Restricting updates to the first sublane-aligned `rows` rows is EXACT
    # and skips the lane padding (170 -> 256 at flagship shapes).
    rows = min(_round_up(n + 1, 8), np_pad)

    logdet_half = jnp.zeros((chunk,), a_ref.dtype)
    for c0 in range(0, n, PANEL):
        c1 = min(c0 + PANEL, n)
        p_r0 = (c0 // 8) * 8
        p_r1 = min(_round_up(c1, 8), rows)

        def body(k, logdet_half, p_r0=p_r0, p_r1=p_r1):
            row = a_ref[:, k, :]  # (chunk, np_pad) -- symmetric: row k == col k
            # pivot A[k, k] via masked reduction (dynamic lane gather is not
            # lowerable on TPU; this is one cheap VPU reduce instead)
            pivot = jnp.sum(jnp.where(col_ids == k, row, 0.0), axis=1)
            logdet_half = logdet_half + 0.5 * jnp.log(pivot)
            u = jnp.where(col_ids > k, row, 0.0)  # only trailing lanes live
            # row factor: lane-vector u moved onto the sublane axis FIRST,
            # then sublane-sliced (a direct lane slice to a non-multiple of
            # 128 is not lowerable)
            u_rows = u[:, :, None][:, p_r0:p_r1, :]
            a_ref[:, p_r0:p_r1, :] = a_ref[:, p_r0:p_r1, :] - (
                u_rows * (u[:, None, :] / pivot[:, None, None])
            )
            return logdet_half

        logdet_half = lax.fori_loop(c0, c1, body, logdet_half, unroll=False)

        if p_r1 < rows:
            pr = p_r1 - p_r0
            panel = a_ref[:, p_r0:p_r1, :]  # finished panel rows
            row_k = lax.broadcasted_iota(jnp.int32, (1, pr, np_pad), 1) + p_r0
            cols = lax.broadcasted_iota(jnp.int32, (1, pr, np_pad), 2)
            in_panel = (row_k >= c0) & (row_k < c1)
            u_panel = jnp.where(in_panel & (cols > row_k), panel, 0.0)
            # pivots: the panel rows' diagonal entries (1.0 on the tile rows
            # outside [c0, c1), whose u_panel rows are zero anyway)
            piv = jnp.sum(
                jnp.where((cols == row_k) & in_panel, panel, 0.0), axis=2
            )
            piv = jnp.where(piv != 0.0, piv, 1.0)
            w_panel = u_panel / piv[:, :, None]
            # delta[c, i, j] = sum_k U[c, k, i] * W[c, k, j]; HIGHEST keeps
            # the f32 multi-pass MXU path (bf16 products corrupt covariance
            # algebra, see package __init__) -- measured same speed here.
            delta = lax.dot_general(
                u_panel,
                w_panel,
                dimension_numbers=(((1,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
                precision=lax.Precision.HIGHEST,
            )
            a_ref[:, p_r1:rows, :] = (
                a_ref[:, p_r1:rows, :] - delta[:, p_r1:rows, :]
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
    b: int, np_pad: int, itemsize: int = 4, vmem_budget: int = 3 * 2**20
) -> int:
    # The budget covers the INPUT block only; the body materializes up to
    # two more block-sized temporaries (the rank-1 update and the phase-2
    # `delta`), so the true VMEM need is ~3x this plus the output block.
    # 8 MiB overflowed the 16 MiB scoped limit by 36 KiB on a
    # (512, 256, 256) f32 batch even before the MXU stage; 3 MiB compiles
    # with the delta temporary and measured fastest in the panel sweep.
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
    # Non-PD batch elements: the forward already mapped them to -inf
    # (rejection), so their gradient must be ZERO, not the NaN an
    # unguarded Cholesky would emit -- a NaN here rides through every
    # subsequent leapfrog update and invalidates the whole HMC trajectory
    # instead of just this rejected evaluation.
    good = jnp.all(
        jnp.isfinite(jnp.diagonal(chol, axis1=-2, axis2=-1)), axis=-1
    )
    chol = jnp.where(good[:, None, None], chol, eye)

    def one(c, yv):
        z = lax.linalg.triangular_solve(c, yv[:, None], left_side=True, lower=True)
        alpha = lax.linalg.triangular_solve(
            c, z, left_side=True, lower=True, transpose_a=True
        )[:, 0]
        cinv_half = lax.linalg.triangular_solve(c, eye, left_side=True, lower=True)
        cinv = cinv_half.T @ cinv_half
        return -alpha, 0.5 * (jnp.outer(alpha, alpha) - cinv)

    dy, dcov = jax.vmap(one)(chol, y)
    dy = jnp.where(good[:, None], dy, 0.0)
    dcov = jnp.where(good[:, None, None], dcov, 0.0)
    # a -inf forward also makes the incoming cotangent ill-defined
    # (0 * inf); sanitize it the same way
    g = jnp.where(jnp.isfinite(g) & good, g, 0.0)
    return g[:, None] * dy, g[:, None, None] * dcov


mvn_loglike_pallas.defvjp(_fwd, _bwd)


def mvn_loglike_best(y: jnp.ndarray, cov: jnp.ndarray) -> jnp.ndarray:
    """Dispatch to the Pallas kernel on TPU, XLA elsewhere."""
    if jax.default_backend() == "tpu" and cov.dtype == jnp.float32:
        return mvn_loglike_pallas(y, cov)
    return _xla_mvn_loglike_batch(y, cov)
