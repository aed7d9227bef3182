"""EmulatorBAND (PCGP/PCSK/PCGPwImpute) tests."""

import numpy as np
import pytest

from gpbayestools_hic_tpu.models import EmulatorBAND


def _make_dataset(rng, nev=40, ndim=3, nobs=8, err_level=0.01):
    design = rng.uniform(0, 1, size=(nev, ndim))
    freqs = rng.uniform(1, 3, size=(ndim, nobs))
    base = 2.0 + np.sin(design @ freqs) + 0.3 * (design**2) @ freqs
    err = err_level * np.abs(base) * rng.uniform(0.5, 1.0, size=base.shape)
    return design, base, np.abs(err)


@pytest.fixture
def band_files(tmp_path, rng, training_pickle_factory):
    design, base, err = _make_dataset(rng)
    pkl = training_pickle_factory(tmp_path / "train.pkl", design, base, err)
    parfile = tmp_path / "pars.txt"
    parfile.write_text("".join(f"p{i}: l, 0.0, 1.0\n" for i in range(3)))
    return pkl, parfile, design, base, err


def test_unknown_method_raises(band_files):
    """Fixes the reference quirk: unknown methods must raise
    (src/emulator_BAND.py:293-294 constructs but never raises)."""
    pkl, parfile, *_ = band_files
    with pytest.raises(ValueError):
        EmulatorBAND(str(pkl), str(parfile), method="NoSuchMethod")


def test_pcgp_train_predict(band_files):
    pkl, parfile, design, base, err = band_files
    emu = EmulatorBAND(str(pkl), str(parfile), method="PCGP")
    emu.trainEmulatorAutoMask()
    mean, cov = emu.predict(design[:4])
    assert mean.shape == (4, 8)
    assert cov.shape == (4, 8, 8)
    rel = np.abs(mean - base[:4]) / np.abs(base[:4])
    assert np.median(rel) < 0.03
    # variance threshold, not a fixed npc
    assert emu._npc_used < 8


@pytest.mark.slow
def test_pcsk_uses_heteroskedastic_noise(tmp_path, rng, training_pickle_factory):
    """PCSK must down-weight noisy training points relative to PCGP."""
    design, base, err = _make_dataset(rng, err_level=0.02)
    # make half the points very noisy AND corrupt their values
    noisy = np.arange(0, 40, 2)
    corrupted = base.copy()
    corrupted[noisy] += rng.normal(0, 0.4, size=(len(noisy), base.shape[1]))
    err_het = err.copy()
    err_het[noisy] = 0.45 * np.abs(base[noisy])
    # keep the filter from dropping them
    pkl = training_pickle_factory(tmp_path / "t.pkl", design, corrupted, err_het)
    parfile = tmp_path / "p.txt"
    parfile.write_text("".join(f"p{i}: l, 0, 1\n" for i in range(3)))

    kwargs = dict(max_rel_uncertainty_data=10.0)
    pcgp = EmulatorBAND(str(pkl), str(parfile), method="PCGP", **kwargs)
    pcgp.trainEmulatorAutoMask()
    pcsk = EmulatorBAND(str(pkl), str(parfile), method="PCSK", **kwargs)
    pcsk.trainEmulatorAutoMask()

    clean = np.setdiff1d(np.arange(40), noisy)
    mean_gp, _ = pcgp.predict(design[clean])
    mean_sk, _ = pcsk.predict(design[clean])
    err_gp = np.median(np.abs(mean_gp - base[clean]) / np.abs(base[clean]))
    err_sk = np.median(np.abs(mean_sk - base[clean]) / np.abs(base[clean]))
    # stochastic kriging should be at least as accurate on the clean truth
    assert err_sk <= err_gp * 1.1, (err_sk, err_gp)


def test_pcgp_wimpute_fills_nans(tmp_path, rng, training_pickle_factory):
    design, base, err = _make_dataset(rng)
    holed = base.copy()
    holed[5, 2] = np.nan
    holed[17, 6] = np.nan
    pkl = training_pickle_factory(tmp_path / "t.pkl", design, holed, err)
    parfile = tmp_path / "p.txt"
    parfile.write_text("".join(f"p{i}: l, 0, 1\n" for i in range(3)))
    emu = EmulatorBAND(str(pkl), str(parfile), method="PCGPwImpute",
                       max_rel_uncertainty_data=10.0)
    # model_data keeps its NaNs: imputation runs PER FIT on the masked
    # subset (round-4 review: a one-shot init-time fill leaked
    # testEmulatorErrors' holdout rows into the training values)
    assert np.isnan(emu.model_data).any()
    assert emu._impute_mask[5, 2] and emu._impute_mask[17, 6]
    assert emu.method_ == "PCGPwImpute"
    emu.trainEmulatorAutoMask()
    mean, _ = emu.predict(design[:3])
    assert np.isfinite(mean).all()
    # the per-fit fill puts imputed entries near the uncorrupted truth
    filled = emu._training_data(np.ones(emu.nev, dtype=bool))
    assert not np.isnan(filled).any()
    assert abs(filled[5, 2] - base[5, 2]) < 0.5


def test_pcgpwm_missingness_aware(tmp_path, rng, training_pickle_factory):
    """PCGPwM imputes AND inflates GP noise at imputed entries."""
    design, base, err = _make_dataset(rng)
    holed = base.copy()
    holed[3, 1] = np.nan
    holed[11, 5] = np.nan
    pkl = training_pickle_factory(tmp_path / "t.pkl", design, holed, err)
    parfile = tmp_path / "p.txt"
    parfile.write_text("".join(f"p{i}: l, 0, 1\n" for i in range(3)))
    emu = EmulatorBAND(str(pkl), str(parfile), method="PCGPwM",
                       max_rel_uncertainty_data=10.0)
    assert emu.method_ == "PCGPwM"
    assert emu._impute_mask[3, 1] and emu._impute_mask[11, 5]
    emu.trainEmulatorAutoMask()
    assert emu._impute_col_var[1] > 0  # set by the per-fit imputation
    # the noise diag hook returns per-(PC, event) inflation only at imputed rows
    nd = np.asarray(emu._pc_noise_diag(np.ones(emu.nev, dtype=bool), emu._npc_used))
    assert nd.shape[1] == emu.nev
    assert nd[:, 3].sum() > 0 and nd[:, 11].sum() > 0
    clean_rows = [i for i in range(emu.nev) if i not in (3, 11)]
    assert np.allclose(nd[:, clean_rows], 0.0)
    mean, _ = emu.predict(design[:3])
    assert np.isfinite(mean).all()


def test_band_validation_harness(band_files):
    pkl, parfile, design, base, err = band_files
    emu = EmulatorBAND(str(pkl), str(parfile), method="PCGP")
    preds, preds_err, truth, truth_err = emu.testEmulatorErrors(
        number_test_points=5
    )
    assert preds.shape == (5, 8)
    rel = np.abs(preds - truth) / np.abs(truth)
    assert np.median(rel) < 0.2


def test_band_predict_test_emu_errors_layout(band_files):
    pkl, parfile, design, *_ = band_files
    emu = EmulatorBAND(str(pkl), str(parfile), method="PCGP")
    emu.trainEmulatorAutoMask()
    x = np.arange(emu.nobs).reshape(-1, 1)
    mean_t, cov = emu.predict_test_emu_errors(x, design[:4])
    # surmise layout: mean (nobs, m), cov (m, nobs, nobs)
    assert mean_t.shape == (8, 4)
    assert cov.shape == (4, 8, 8)


@pytest.mark.slow
def test_band_chain_integration(tmp_path, rng, training_pickle_factory):
    """A PCSK emulator drops into Chain with the Woodbury fast path."""
    import pickle
    from gpbayestools_hic_tpu.samplers import Chain

    design, base, err = _make_dataset(rng, nev=30, ndim=2, nobs=5)
    pkl = training_pickle_factory(tmp_path / "t.pkl", design, base, err)
    parfile = tmp_path / "p.txt"
    parfile.write_text("".join(f"p{i}: l, 0, 1\n" for i in range(2)))
    emu = EmulatorBAND(str(pkl), str(parfile), method="PCSK")
    emu.trainEmulatorAutoMask()
    assert emu.has_lowrank_cov

    truth_idx = 3
    exp_pkl = tmp_path / "exp.pkl"
    with open(exp_pkl, "wb") as f:
        pickle.dump({"0": {"obs": np.stack(
            [base[truth_idx], 0.05 * np.abs(base[truth_idx])])}}, f)
    chain = Chain(
        mcmc_path=str(tmp_path / "m" / "c.pkl"),
        expdata_path=str(exp_pkl),
        model_parafile=str(parfile),
    )
    chain.loadEmulator([emu])
    lp = chain.log_posterior(design[:6])
    assert np.isfinite(lp).all()
    assert lp[truth_idx] == lp.max()


@pytest.mark.slow
def test_full_flag_combination_roundtrip(tmp_path, rng, training_pickle_factory):
    """The works: PCSK + parameterTrafoPCA + logTrafo + exp_and_cov_diagonal,
    with save/load and retrain-after-load."""
    lo = np.zeros(20); hi = np.ones(20)
    lo[15:19], hi[15:19] = 0.01, 0.3
    lo[12:15], hi[12:15] = 0.01, 0.4
    lo[2:5], hi[2:5] = 0.5, 3.0
    design = lo + (hi - lo) * rng.uniform(size=(35, 20))
    freqs = rng.uniform(0.3, 1.0, size=(20, 6))
    base = np.exp(1.0 + 0.5 * np.sin(design @ freqs))
    pkl = training_pickle_factory(
        tmp_path / "t.pkl", design, base, 0.01 * np.abs(base)
    )
    parfile = tmp_path / "p.txt"
    parfile.write_text(
        "".join(f"p{i}: l, {lo[i]}, {hi[i]}\n" for i in range(20))
    )
    emu = EmulatorBAND(str(pkl), str(parfile), method="PCSK", logTrafo=True,
                       parameterTrafoPCA=True, exp_and_cov_diagonal=True,
                       gp_maxiter=20)
    emu.trainEmulatorAutoMask()
    mean, cov = emu.predict(design[:3])
    assert (mean > 0).all()  # exponentiated back to physical scale
    emu.save(tmp_path / "c.sav")
    e2 = EmulatorBAND.load(tmp_path / "c.sav")
    m2, _ = e2.predict(design[:3])
    np.testing.assert_allclose(mean, m2, rtol=1e-10)
    e2.trainEmulatorAutoMask()  # retrain-after-load with every flag active
    m3 = e2.predict(design[:3], return_cov=False)
    assert np.isfinite(m3).all()


# ---------------------------------------------------- reference dill import


def _band_standin(design, base, err, method="PCSK"):
    """Synthetic object mirroring the reference EmulatorBAND attribute
    layout (src/emulator_BAND.py: model_data, design_points, method_, flags,
    and a live surmise emulator in .emu)."""

    class RefEmulatorBAND:
        pass

    ndim = design.shape[1]
    obj = RefEmulatorBAND()
    obj.method_ = method
    obj.logTrafo_ = False
    obj.parameterTrafoPCA_ = False
    obj.exp_and_cov_diagonal_ = False
    obj.max_rel_uncertainty_data_ = 0.1
    obj.pardict = {f"p{i}": [f"$p_{i}$", 0.0, 1.0] for i in range(ndim)}
    obj.design_min = np.zeros(ndim)
    obj.design_max = np.ones(ndim)
    obj.model_data = base
    obj.model_data_err = err
    obj.design_points = design
    obj.nev, obj.nobs = base.shape
    obj.nparameters = ndim
    obj.emu = {"opaque": "surmise emulator stand-in"}
    return obj


def test_band_from_reference_standin(band_files, tmp_path):
    """Chain.loadEmulator's dill path (src/mcmc.py:145-150) must accept
    reference EmulatorBAND files: the native head is rebuilt from the
    object's stored training state."""
    import dill

    from gpbayestools_hic_tpu.models import Emulator
    from gpbayestools_hic_tpu.models.migrate import band_from_reference

    _, _, design, base, err = band_files
    obj = _band_standin(design, base, err, method="PCSK")
    sav = tmp_path / "band.sav"
    with open(sav, "wb") as f:
        dill.dump(obj, f)

    # the generic entry point dispatches BAND objects automatically
    emu = Emulator.from_reference(str(sav))
    assert isinstance(emu, EmulatorBAND)
    assert emu.method_ == "PCSK"
    mean, cov = emu.predict(design[:5])
    assert mean.shape == (5, 8) and cov.shape == (5, 8, 8)
    # rebuilt on the same training data: self-prediction is accurate
    rel = np.abs(mean - base[:5]) / np.abs(base[:5])
    assert np.median(rel) < 0.02, np.median(rel)

    # direct entry point, live object
    emu2 = band_from_reference(obj)
    m2, _ = emu2.predict(design[:5])
    np.testing.assert_allclose(m2, mean, rtol=1e-10)


def test_band_from_reference_missing_module_error(tmp_path):
    """A dill file that references an uninstalled module (the real failure
    mode for surmise-backed files) produces a targeted error naming the
    retrain path instead of a raw ModuleNotFoundError."""
    import subprocess
    import sys
    import textwrap

    from gpbayestools_hic_tpu.models import Emulator

    # Build the poisoned dill in a subprocess so the fake module never
    # enters THIS process's sys.modules.
    mod = tmp_path / "fake_surmise_pkg.py"
    mod.write_text("class FakeEmu:\n    pass\n")
    script = textwrap.dedent(f"""
        import sys, dill
        sys.path.insert(0, {str(tmp_path)!r})
        import fake_surmise_pkg
        with open({str(tmp_path / 'poisoned.sav')!r}, 'wb') as f:
            dill.dump(fake_surmise_pkg.FakeEmu(), f, byref=True)
    """)
    subprocess.run([sys.executable, "-c", script], check=True)
    mod.unlink()  # the module is now uninstalled

    with pytest.raises(ValueError, match="retrain natively"):
        Emulator.from_reference(str(tmp_path / "poisoned.sav"))


# ----------------------------------------- surmise kernel family + MAP knob


def test_maternprod_kernel_matches_manual(rng):
    """The "MaternProd" kind is surmise's separable product-Matern
    (docs/SURMISE_PARITY.md item 5): k = amp * prod_j (1+d_j) exp(-d_j)."""
    import jax.numpy as jnp

    from gpbayestools_hic_tpu.ops.kernels import KernelConfig, kernel_fn

    x = rng.uniform(0, 1, (7, 3))
    y = rng.uniform(0, 1, (5, 3))
    ls = np.array([0.5, 1.2, 0.8])
    amp, noise = 1.3, 0.07
    params = {
        "log_amp": jnp.log(amp),
        "log_ls": jnp.log(jnp.asarray(ls)),
        "log_noise": jnp.log(noise),
    }
    cfg = KernelConfig("MaternProd")
    k = kernel_fn(params, jnp.asarray(x), jnp.asarray(y), config=cfg,
                  include_noise=False)
    d = np.abs(x[:, None, :] - y[None, :, :]) / ls
    manual = amp * np.prod((1 + d) * np.exp(-d), axis=2)
    np.testing.assert_allclose(np.asarray(k), manual, rtol=1e-12)
    k_self = kernel_fn(params, jnp.asarray(x), config=cfg, include_noise=True)
    ds = np.abs(x[:, None, :] - x[None, :, :]) / ls
    manual_self = amp * np.prod((1 + ds) * np.exp(-ds), axis=2) + noise * np.eye(7)
    np.testing.assert_allclose(np.asarray(k_self), manual_self, rtol=1e-12)


@pytest.mark.slow
def test_map_prior_strength_pulls_hyperparams_to_center(rng):
    """map_prior_strength > 0 is a real MAP objective: an overwhelming
    penalty pins the optimum at the reference initialization, a moderate
    one lands between MLE and the center (surmise's penalized-likelihood
    role, docs/SURMISE_PARITY.md item 6)."""
    import jax.numpy as jnp

    from gpbayestools_hic_tpu.models.gp import GPConfig, gp_fit
    from gpbayestools_hic_tpu.ops.kernels import KernelConfig

    x = rng.uniform(0, 1, (30, 2))
    y = np.sin(4 * x[:, 0]) + 0.3 * x[:, 1]
    ptp = jnp.ones(2)

    def fit(strength):
        cfg = GPConfig(kernel=KernelConfig("MaternProd"), alpha=1e-6,
                       map_prior_strength=strength)
        return gp_fit(jnp.asarray(x), jnp.asarray(y)[None, :], ptp, config=cfg)

    mle = fit(0.0)
    hard = fit(1e8)
    soft = fit(5.0)
    # overwhelming prior -> the init point (log_ls = log ptp = 0, amp 1)
    np.testing.assert_allclose(np.asarray(hard.params["log_ls"][0]), 0.0,
                               atol=1e-3)
    np.testing.assert_allclose(float(hard.params["log_amp"][0]), 0.0,
                               atol=1e-3)
    # moderate prior shrinks toward the center relative to the MLE
    d_mle = float(jnp.sum(mle.params["log_ls"][0] ** 2))
    d_soft = float(jnp.sum(soft.params["log_ls"][0] ** 2))
    assert d_soft < d_mle + 1e-12
    assert mle.lml[0] >= soft.lml[0] - 1e-6  # MLE maximizes the pure LML


# ------------------------------------------------------------ golden pinning


@pytest.mark.slow
def test_band_heads_match_golden_fixtures(tmp_path):
    """Regression pin for the rebuilt surmise heads (VERDICT r1 item 4):
    fitted hyperparameters and predictions must match the committed golden
    arrays (tools/make_golden_fixtures.py; derivation notes in
    docs/SURMISE_PARITY.md).  Any drift in standardization, PC retention,
    noise propagation, or the GP optimizer shows up here."""
    import os
    import pickle

    fix = np.load(
        os.path.join(os.path.dirname(__file__), "fixtures", "band_golden.npz")
    )
    design, base, err, xq = fix["design"], fix["base"], fix["err"], fix["xq"]
    parfile = tmp_path / "pars.txt"
    parfile.write_text(
        "".join(f"p{i}: $p_{i}$, 0.0, 1.0\n" for i in range(design.shape[1]))
    )
    pkl = tmp_path / "train.pkl"
    with open(pkl, "wb") as f:
        pickle.dump(
            {
                str(i): {
                    "parameter": design[i],
                    "obs": np.stack([base[i], err[i]]),
                }
                for i in range(design.shape[0])
            },
            f,
        )
    variants = [
        ("PCGP", dict(method="PCGP")),
        ("PCSK", dict(method="PCSK")),
        ("PCGP_surmise", dict(method="PCGP", kernel_kind="MaternProd",
                              map_prior_strength=1.0)),
    ]
    for tag, kwargs in variants:
        if f"{tag}_npc" not in fix:
            continue  # older fixture file without the surmise variant
        emu = EmulatorBAND(str(pkl), str(parfile), **kwargs)
        emu.trainEmulatorAutoMask()
        assert int(emu._npc_used) == int(fix[f"{tag}_npc"])
        for k in ("log_ls", "log_amp", "log_noise"):
            np.testing.assert_allclose(
                np.asarray(emu.gp_state.params[k]), fix[f"{tag}_{k}"],
                rtol=1e-5, err_msg=f"{tag} {k} drifted",
            )
        mean, cov = emu.predict(xq)
        np.testing.assert_allclose(
            mean, fix[f"{tag}_mean"], rtol=1e-6,
            err_msg=f"{tag} predictive mean drifted",
        )
        np.testing.assert_allclose(
            np.diagonal(cov, axis1=1, axis2=2), fix[f"{tag}_covdiag"],
            rtol=1e-5, atol=1e-12,
            err_msg=f"{tag} predictive variance drifted",
        )
    # PCSK != PCGP on this data (the heteroskedastic nugget is live)
    assert np.max(np.abs(fix["PCSK_mean"] - fix["PCGP_mean"])) > 1e-4
    # the surmise kernel family is a real alternative, not an alias
    if "PCGP_surmise_mean" in fix:
        assert np.max(np.abs(fix["PCGP_surmise_mean"] - fix["PCGP_mean"])) > 1e-6


def test_pcgpwm_impute_state_survives_save_load(
    tmp_path, rng, training_pickle_factory
):
    """A loaded PCGPwM emulator must keep its imputation mask and
    retrain with imputation-noise inflation intact (model_data keeps its
    raw NaNs since the round-4 per-fit imputation change, so a retrain
    re-imputes; legacy saves with pre-filled model_data skip the fill and
    reuse the loaded column variances)."""
    design, base, err = _make_dataset(rng)
    holed = base.copy()
    holed[3, 1] = np.nan
    holed[11, 5] = np.nan
    pkl = training_pickle_factory(tmp_path / "t.pkl", design, holed, err)
    parfile = tmp_path / "p.txt"
    parfile.write_text("".join(f"p{i}: l, 0, 1\n" for i in range(3)))
    emu = EmulatorBAND(str(pkl), str(parfile), method="PCGPwM",
                       max_rel_uncertainty_data=10.0)
    emu.trainEmulatorAutoMask()
    path = tmp_path / "emu.sav"
    emu.save(str(path))

    from gpbayestools_hic_tpu.models import Emulator

    loaded = Emulator.load(str(path))
    assert loaded._impute_mask is not None
    assert loaded._impute_mask[3, 1] and loaded._impute_mask[11, 5]
    loaded.trainEmulatorAutoMask()
    nd = np.asarray(
        loaded._pc_noise_diag(np.ones(loaded.nev, dtype=bool),
                              loaded._npc_used)
    )
    assert nd[:, 3].sum() > 0 and nd[:, 11].sum() > 0


def test_imputed_entries_excluded_from_validation_truth(
    tmp_path, rng, training_pickle_factory
):
    """Holdout validation must not treat imputed (never observed) entries
    as truth: they are returned as NaN and the E/H metrics exclude them."""
    from gpbayestools_hic_tpu.utils.metrics import (
        honesty, rms_relative_error,
    )

    design, base, err = _make_dataset(rng)
    holed = base.copy()
    hold_row = base.shape[0] - 1  # the holdout row testEmulatorErrors uses
    holed[hold_row, 2] = np.nan
    pkl = training_pickle_factory(tmp_path / "t.pkl", design, holed, err)
    parfile = tmp_path / "p.txt"
    parfile.write_text("".join(f"p{i}: l, 0, 1\n" for i in range(3)))
    emu = EmulatorBAND(str(pkl), str(parfile), method="PCGPwImpute",
                       max_rel_uncertainty_data=10.0)
    pred, pred_err, truth, truth_err = emu.testEmulatorErrors(number_test_points=2)
    assert np.isnan(truth[-1, 2]) and np.isnan(truth_err[-1, 2])
    assert np.isfinite(pred).all()
    e = rms_relative_error(pred, truth)
    h = honesty(pred, pred_err, truth)
    assert np.isfinite(e).all() and np.isfinite(h).all()


def test_impute_does_not_leak_holdout_rows(tmp_path, rng,
                                           training_pickle_factory):
    """The SVD fill of training NaNs must not see holdout rows: perturbing
    the held-out events' values must leave the trained GP state bitwise
    identical (with the old init-time whole-matrix imputation it did not)."""
    design, base, err = _make_dataset(rng)
    holed = base.copy()
    holed[5, 2] = np.nan  # a NaN in a TRAINING row
    parfile = tmp_path / "p.txt"
    parfile.write_text("".join(f"p{i}: l, 0, 1\n" for i in range(3)))

    states = []
    for tag, bump in (("a", 0.0), ("b", 3.0)):
        data = holed.copy()
        data[-3:, :] += bump  # perturb only the holdout rows
        pkl = training_pickle_factory(tmp_path / f"t{tag}.pkl", design, data,
                                      err)
        emu = EmulatorBAND(str(pkl), str(parfile), method="PCGPwImpute",
                           max_rel_uncertainty_data=100.0)
        emu.testEmulatorErrors(number_test_points=3)
        states.append({k: np.asarray(v)
                       for k, v in emu.gp_state.params.items()})
    for k in states[0]:
        np.testing.assert_array_equal(states[0][k], states[1][k], err_msg=k)
