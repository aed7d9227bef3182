"""On-hardware numerical validation: f32 TPU posterior vs f64 ground truth.

Run on a real TPU (no arguments).  Builds the flagship benchmark problem
with the REAL production objects (nine trained Emulators in a Chain,
bench.build_or_load_chain), evaluates the fused f32 Woodbury log-posterior
on-device, recomputes the same quantity in float64 numpy from the identical
GP state, and checks the worst-case disagreement.

This check exists because it caught two real TPU-precision bugs during
development (bf16 default matmuls producing non-PSD covariances; a bf16
variance path whose catastrophic cancellation corrupted posteriors by
thousands of log-units).  Keep it passing: max error must stay < 0.5
log-units (measured healthy value: ~0.07).
"""

from __future__ import annotations

import sys

import numpy as np

# the reference's zeroed-extra_std constant kept in the posterior
_EXTRA_STD_CONST = 2.0 * np.log(1e-16)


def f64_log_posterior(chain, x: np.ndarray) -> np.ndarray:
    """Float64 host-numpy ground truth of the chain's fused log-posterior.

    Recomputes, from the identical trained GP state (kernel hyperparams,
    alpha_vec, explicit L^-1), the exact quantity the device program
    evaluates: per-emulator RBF cross-kernels, PC means/variances, the
    low-rank physical covariance ``A^T diag(v) A + cov_trunc + exp_var``,
    and a full f64 Cholesky log-likelihood per walker.  Used by the
    validation gate below and by precision experiments
    (tools/var_precision_experiment.py)."""
    x = np.asarray(x, np.float64)
    exp_mean_full = np.asarray(chain.expdata, np.float64).flatten()
    exp_var_full = np.diag(np.asarray(chain.expdata_cov, np.float64))
    offsets = np.cumsum([0] + [e.nobs for e in chain.emuList])
    lp64 = np.full(len(x), _EXTRA_STD_CONST)
    for e, i0, i1 in zip(chain.emuList, offsets[:-1], offsets[1:]):
        stt = e.gp_state
        ls = np.exp(np.asarray(stt.params["log_ls"], np.float64))
        amp = np.exp(np.asarray(stt.params["log_amp"], np.float64))
        noise = np.exp(np.asarray(stt.params["log_noise"], np.float64))
        xt = np.asarray(stt.x, np.float64)
        av = np.asarray(stt.alpha_vec, np.float64)
        linv = np.asarray(stt.linv, np.float64)
        kinv = np.einsum("kij,kil->kjl", linv, linv)  # K^-1 = G^T G
        a, cov_trunc = e.lowrank_parts()
        a = np.asarray(a, np.float64)
        cov_trunc = np.asarray(cov_trunc, np.float64)
        npc = av.shape[0]
        mean = np.zeros((len(x), i1 - i0))
        gv = np.zeros((len(x), npc))
        for k in range(npc):
            xs = xt / ls[k]
            qs = x / ls[k]
            d2 = np.maximum(
                np.sum(xs**2, 1)[:, None] + np.sum(qs**2, 1)[None, :]
                - 2 * xs @ qs.T, 0,
            )
            kstar = amp[k] * np.exp(-0.5 * d2)
            mean += np.outer(kstar.T @ av[k], a[k])
            gv[:, k] = np.maximum(
                amp[k] + noise[k] - np.sum(kstar * (kinv[k] @ kstar), 0), 0
            )
        mean += np.asarray(e.scaler.mean, np.float64)
        y = mean - exp_mean_full[i0:i1]
        c0 = cov_trunc + np.diag(exp_var_full[i0:i1])
        for i in range(len(x)):
            cov = (a.T * gv[i]) @ a + c0
            chol = np.linalg.cholesky(cov)
            alpha = np.linalg.solve(cov, y[i])
            lp64[i] += -0.5 * y[i] @ alpha - np.log(np.diag(chol)).sum()
    return lp64


def check_device_factor_split(chain) -> None:
    """TPU-compiled guard for the fused-kernel bf16 factor split.

    The device-side builder's integer-masked round-to-nearest-even split
    defends against an XLA:TPU algebraic-simplifier hazard (folding the
    f32->bf16->f32 convert chain would zero ``g_lo`` and silently degrade
    the 3-pass matmuls to 1-pass).  The CPU tier pins host==device bitwise
    (test_attach_factors_device_matches_host) but cannot see a TPU-compile
    -specific fold, so assert here -- on the real compiled program -- that
    ``g_lo`` is non-zero and both halves match the host split exactly."""
    import jax.numpy as jnp

    import gpbayestools_hic_tpu.ops.pallas_predict as pp

    gs = chain.emuList[0].gp_state
    params_np = {k: np.asarray(v, np.float64) for k, v in gs.params.items()}
    base = pp.build_fused_state(params_np, np.asarray(gs.x))
    fs_dev = pp.attach_fused_factors_device(
        dict(base), jnp.asarray(gs.linv, jnp.float32),
        jnp.asarray(gs.alpha_vec, jnp.float32),
    )
    fs_host = pp.attach_fused_factors(
        dict(base), np.asarray(gs.linv), np.asarray(gs.alpha_vec)
    )
    g_lo_dev = np.asarray(fs_dev["g_lo"], np.float32)
    assert np.abs(g_lo_dev).max() > 0, (
        "device-built g_lo is all-zero: the TPU compile folded the bf16 "
        "split -- 3-pass precision silently lost"
    )
    for key in ("g_hi", "g_lo"):
        a = np.asarray(fs_host[key], np.float32)
        b = np.asarray(fs_dev[key], np.float32)
        np.testing.assert_array_equal(a, b, err_msg=key)
    print("device bf16 factor split: g_lo non-zero, host==device bitwise")


def main(tol: float = 0.5) -> int:
    sys.path.insert(0, ".")
    import bench
    from gpbayestools_hic_tpu.config import enable_compilation_cache

    enable_compilation_cache()
    bench.wait_for_device()  # ride out transient tunnel outages
    chain, _, _, _ = bench.build_or_load_chain()
    check_device_factor_split(chain)
    rng = np.random.default_rng(9)
    x = rng.uniform(0.3, 0.7, (64, chain.ndim))

    # --- f32 on TPU through the production program -------------------------
    lp32 = chain.log_posterior(x)

    # --- f64 ground truth on host from the identical GP state --------------
    lp64 = f64_log_posterior(chain, x)

    d = np.abs(np.asarray(lp32) - lp64)
    print(f"f32 vs f64 log-posterior: max {d.max():.4f}, median "
          f"{np.median(d):.4f} (tolerance {tol})")
    if d.max() < tol:
        print("TPU PRECISION VALIDATION: PASS")
        return 0
    print("TPU PRECISION VALIDATION: FAIL")
    return 1


if __name__ == "__main__":
    raise SystemExit(main())
