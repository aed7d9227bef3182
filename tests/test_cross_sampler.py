"""Sampler cross-validation: the same posterior via all four MCMC families.

The reference's de-facto integration test (SURVEY.md section 4.4): run the
identical calibration posterior with the ensemble sampler, PTLMC, the
flow-preconditioned SMC, and the (beyond-reference, headline-production)
preconditioned HMC, and require the marginals to agree within Monte Carlo
tolerance.
"""

import pickle

import numpy as np
import pytest


@pytest.fixture(scope="module")
def calibration(tmp_path_factory):
    """A well-identified 2-parameter calibration problem."""
    from gpbayestools_hic_tpu.models import Emulator
    from gpbayestools_hic_tpu.samplers import Chain

    tmp_path = tmp_path_factory.mktemp("cross")
    rng = np.random.default_rng(11)
    ndim, nev, nobs = 2, 40, 8
    design = rng.uniform(0, 1, size=(nev, ndim))
    freqs = rng.uniform(1.5, 3.0, size=(ndim, nobs))
    base = 2.0 + np.sin(design @ freqs) + 0.5 * design @ freqs
    err = 0.01 * np.abs(base)
    with open(tmp_path / "t.pkl", "wb") as f:
        pickle.dump({
            str(i): {"parameter": design[i], "obs": np.stack([base[i], err[i]])}
            for i in range(nev)
        }, f)
    parfile = tmp_path / "p.txt"
    parfile.write_text("".join(f"p{i}: l, 0, 1\n" for i in range(ndim)))
    emu = Emulator(str(tmp_path / "t.pkl"), str(parfile), npc=3)
    emu.trainEmulatorAutoMask()

    truth = np.array([0.45, 0.55])
    exp_mean = 2.0 + np.sin(truth @ freqs) + 0.5 * truth @ freqs
    with open(tmp_path / "exp.pkl", "wb") as f:
        pickle.dump(
            {"0": {"obs": np.stack([exp_mean, 0.02 * np.abs(exp_mean)])}}, f
        )

    def make_chain(name):
        c = Chain(
            mcmc_path=str(tmp_path / "mcmc" / name),
            expdata_path=str(tmp_path / "exp.pkl"),
            model_parafile=str(parfile),
        )
        c.loadEmulator([emu])
        return c

    return make_chain, truth


def _moments(samples, weights=None):
    mean = np.average(samples, axis=0, weights=weights)
    var = np.average((samples - mean) ** 2, axis=0, weights=weights)
    return mean, np.sqrt(var)


@pytest.mark.slow
def test_four_samplers_agree(calibration):
    """Ensemble, PTLMC, SMC, and the headline HMC sampler (windowed scheme
    with persistent momentum -- the exact production configuration bench.py
    headlines) agree on marginals of one shared calibration posterior
    (VERDICT r3 item 5: HMC was exactness-tested in isolation but never
    cross-validated against the other families)."""
    make_chain, truth = calibration

    c1 = make_chain("ens.pkl")
    c1.run_mcmc(nsteps=600, nburnsteps=400, nwalkers=32, nthin=2, seed=0)
    ens = c1.chain[:, 50:, :].reshape(-1, 2)

    c2 = make_chain("ptlmc.pkl")
    c2.run_MCMC_PTLMC(nsteps=400, nwalkers=16, ntemps=10, maxtemp=50,
                      nstartparameters=400)
    ptl = c2.chain[:, 100:, :].reshape(-1, 2)

    c3 = make_chain("smc.pkl")
    out = c3.run_pocoMC(n_effective=400, n_active=200, n_prior=800,
                        n_max_steps=25, n_total=3000, n_evidence=0)
    smc = out["chain"]

    c4 = make_chain("hmc.pkl")
    c4.run_MCMC_HMC(nsteps=400, nwalkers=32, nburnsteps="auto", seed=0,
                    scheme="windowed", persist=0.7)
    hmc = c4.chain[:, 50:, :].reshape(-1, 2)

    m_ens, s_ens = _moments(ens)
    m_ptl, s_ptl = _moments(ptl)
    m_smc, s_smc = _moments(smc, out["weights"])
    m_hmc, s_hmc = _moments(hmc)

    # all four agree on the posterior mean within a fraction of the width
    width = np.maximum.reduce([s_ens, s_ptl, s_smc, s_hmc])
    for name, m in [("ptlmc", m_ptl), ("smc", m_smc), ("hmc", m_hmc)]:
        assert np.all(np.abs(m_ens - m) < 3.0 * width), (name, m_ens, m, width)
    # posterior widths within a factor ~2 of each other
    for name, s in [("ptlmc", s_ptl), ("smc", s_smc), ("hmc", s_hmc)]:
        ratio = s_ens / s
        assert np.all(ratio < 3.0) and np.all(ratio > 1 / 3.0), (name, s_ens, s)
    # and all contain the truth
    for m, s in [(m_ens, s_ens), (m_ptl, s_ptl), (m_smc, s_smc),
                 (m_hmc, s_hmc)]:
        assert np.all(np.abs(m - truth) < 5.0 * s + 0.05), (m, truth, s)
