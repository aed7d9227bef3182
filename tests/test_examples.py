"""End-to-end smoke test of the documented example pipeline.

Drives the real example scripts (examples/*.py, SURVEY.md C19-C25 workflow
mirrors) in dependency order inside a temp directory, exactly as a user
would: synthetic dataset -> emulator training -> Bayesian analysis (emcee
and a small pocoMC run) -> MCMC plots -> closure test -> sensitivity ->
posterior clusters.  Sizes are shrunk via the examples' own keyword knobs;
the scripts' defaults reproduce the reference notebook scales.
"""

import importlib.util
from pathlib import Path

import numpy as np
import pytest

EXAMPLES = Path(__file__).resolve().parent.parent / "examples"


def _load(name):
    spec = importlib.util.spec_from_file_location(name, EXAMPLES / f"{name}.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.mark.slow
def test_example_pipeline_end_to_end(tmp_path, monkeypatch):
    import matplotlib

    matplotlib.use("Agg")
    monkeypatch.chdir(tmp_path)

    _load("make_synthetic_dataset").main()
    data = tmp_path / "synthetic_data"
    assert (data / "model_params.txt").exists()
    assert (data / "exp_data.pkl").exists()

    _load("emulator_training").main()
    for group in ("dNdy", "meanpT", "vn"):
        assert (data / f"emulator_sklearn_{group}.sav").exists()

    analysis = _load("run_bayesian_analysis")
    analysis.main("emcee", nsteps=200, nburnsteps=100, nwalkers=32, nthin=2)
    assert (data / "mcmc" / "chain_ensemble.pkl").exists()

    # small pocoMC run feeds the closure test and the cluster extraction
    analysis.main("pocoMC", n_effective=200, n_active=100, n_prior=400,
                  n_max_steps=10, n_total=1200, n_evidence=400)
    assert (data / "mcmc" / "chain_smc.pkl").exists()

    _load("plot_mcmc").main()
    assert (data / "plot_trace.png").exists()
    assert (data / "plot_corner.png").exists()

    _load("closure_test").main()
    assert (data / "corner.png").exists()

    _load("sensitivity_analysis").main()

    _load("generate_posterior_clusters").main(n_top_samples=300)
    centers = np.loadtxt(data / "cluster_centers.txt")
    assert centers.shape == (6, 3)  # one cluster per column, ndim rows
    obs = np.loadtxt(data / "cluster_observables.txt")
    assert obs.shape[1] == 3 and np.isfinite(obs).all()


@pytest.mark.slow
def test_example_validation_quick(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    _load("make_synthetic_dataset").main()
    _load("emulator_validation").main(n_test_points=8, test_sizes=(10, 20))


def test_example_lhd(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    _load("generate_LHD_Bayes").main(npoints=20)
    files = list((tmp_path / "design_points" / "main").iterdir())
    assert len(files) == 20
