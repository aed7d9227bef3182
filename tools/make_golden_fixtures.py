"""Generate the committed golden fixtures pinning the BAND heads' numerics.

Run on forced-CPU x64 JAX (deterministic LAPACK/XLA path):

    python tools/make_golden_fixtures.py

Writes ``tests/fixtures/band_golden.npz``: for each method (PCGP, PCSK) on a
fixed synthetic dataset, the fitted per-PC hyperparameters and the
predictions (mean + covariance diagonal) at fixed query points.  The paired
test ``tests/test_emulator_band.py::test_band_heads_match_golden_fixtures``
fails on any numerical drift of the rebuilt surmise heads (VERDICT round 1,
item 4; derivation notes in docs/SURMISE_PARITY.md).
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402


def build(out_path):
    from gpbayestools_hic_tpu.models import EmulatorBAND
    from gpbayestools_hic_tpu.utils.synthetic import (
        write_parameter_file,
        write_training_pickle,
    )

    rng = np.random.default_rng(20240816)
    nev, ndim, nobs = 50, 3, 10
    design = rng.uniform(0, 1, size=(nev, ndim))
    freqs = rng.uniform(1, 3, size=(ndim, nobs))
    base = 2.0 + np.sin(design @ freqs) + 0.3 * (design**2) @ freqs
    err = 0.02 * np.abs(base) * rng.uniform(0.5, 1.0, size=base.shape)
    xq = rng.uniform(0.1, 0.9, size=(6, ndim))

    tmp = tempfile.mkdtemp()
    parfile = write_parameter_file(os.path.join(tmp, "pars.txt"), ndim)
    pkl = write_training_pickle(
        os.path.join(tmp, "train.pkl"), design, base, err
    )

    out = {"design": design, "base": base, "err": err, "xq": xq}
    # third variant: surmise's own covariance family + MAP objective
    # (docs/SURMISE_PARITY.md items 5-6 as a selectable configuration)
    variants = [
        ("PCGP", {}),
        ("PCSK", {}),
        ("PCGP_surmise", dict(method="PCGP", kernel_kind="MaternProd",
                              map_prior_strength=1.0)),
    ]
    for tag, extra in variants:
        kwargs = dict(method=tag) if not extra else extra
        emu = EmulatorBAND(pkl, parfile, **kwargs)
        emu.trainEmulatorAutoMask()
        mean, cov = emu.predict(xq)
        out[f"{tag}_mean"] = mean
        out[f"{tag}_covdiag"] = np.diagonal(cov, axis1=1, axis2=2)
        out[f"{tag}_npc"] = np.asarray(emu._npc_used)
        for k, v in emu.gp_state.params.items():
            out[f"{tag}_{k}"] = np.asarray(v)
        print(tag, "npc =", int(emu._npc_used), "mean[0,:3] =", mean[0, :3])
    np.savez(out_path, **out)
    print("wrote", out_path)


def capture_reference(out_path):
    """Extend the fixture with ACTUAL surmise/emcee/pocoMC outputs.

    Cannot run in the build image (no pip, zero egress -- see
    docs/SURMISE_PARITY.md "Closure status"); run it once on any machine
    where ``pip install surmise==0.2.1 emcee pocomc`` works and commit the
    extended ``.npz`` -- the skip-gated tests in
    tests/test_emulator_band.py / tests/test_cross_library_golden.py pick
    the new keys up automatically.  Call contracts mirror the reference
    wrappers exactly: surmise as src/emulator_BAND.py:263-292 (x =
    arange(nobs) column, f = data.T, PCSK's ``simsd = err.T``), emcee as
    src/mcmc.py:354-426 (stretch move defaults), pocoMC as
    src/mcmc.py:752-819.
    """
    data = dict(np.load(out_path))
    design, base, err, xq = (
        data["design"], data["base"], data["err"], data["xq"]
    )
    nobs = base.shape[1]

    from surmise.emulation import emulator as surmise_emulator  # noqa: F401

    xobs = np.arange(nobs).reshape(-1, 1)
    for method, args in (("PCGP", {}), ("PCSK", {"simsd": err.T})):
        emu = surmise_emulator(
            x=xobs, theta=design, f=base.T, method=method, args=args
        )
        pred = emu.predict(x=xobs, theta=xq)
        data[f"surmise_{method}_mean"] = np.asarray(pred.mean()).T  # (m, nobs)
        data[f"surmise_{method}_var"] = np.asarray(pred.var()).T
        print(f"captured surmise {method}")

    # emcee: converged-run marginal moments on the analytic 3-d correlated
    # Gaussian below (exact chain equality is impossible across RNGs; the
    # paired test compares moments within MC error)
    import emcee

    cov = np.array([[1.0, 0.6, 0.0], [0.6, 2.0, 0.3], [0.0, 0.3, 0.5]])
    prec = np.linalg.inv(cov)

    def logp(t):
        return -0.5 * t @ prec @ t

    rng = np.random.default_rng(5)
    sampler = emcee.EnsembleSampler(64, 3, logp)
    sampler.run_mcmc(rng.normal(size=(64, 3)) * 0.1, 4000, progress=False)
    flat = sampler.get_chain(discard=1000, flat=True)
    data["emcee_gauss_mean"] = flat.mean(0)
    data["emcee_gauss_std"] = flat.std(0)
    data["emcee_gauss_tau"] = np.asarray(sampler.get_autocorr_time(tol=0))
    print("captured emcee moments")

    # pocoMC: evidence on the same Gaussian truncated to [-5, 5]^3
    import pocomc
    from scipy.stats import uniform

    prior = pocomc.Prior([uniform(-5.0, 10.0)] * 3)
    smp = pocomc.Sampler(prior=prior, likelihood=logp, vectorize=False,
                         random_state=0)
    smp.run()
    logz, logz_err = smp.evidence()
    data["pocomc_gauss_logz"] = np.asarray([logz, logz_err])
    print(f"captured pocomc logz {logz:.3f} +- {logz_err:.3f}")

    np.savez(out_path, **data)
    print("extended", out_path)


if __name__ == "__main__":
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    dest = os.path.join(here, "tests", "fixtures", "band_golden.npz")
    os.makedirs(os.path.dirname(dest), exist_ok=True)
    if "--capture-reference" in sys.argv:
        capture_reference(dest)
    else:
        build(dest)
