"""Emulator tests: reference-formula parity, contracts, round trips."""

import numpy as np
import pytest
from sklearn.decomposition import PCA as SkPCA
from sklearn.preprocessing import StandardScaler as SkScaler
from sklearn.gaussian_process import GaussianProcessRegressor as GPR
from sklearn.gaussian_process import kernels as skk

from gpbayestools_hic_tpu.models import Emulator


def _make_dataset(rng, nev=40, ndim=3, nobs=8, err_level=0.01):
    design = rng.uniform(0, 1, size=(nev, ndim))
    # smooth multi-output function of the design
    freqs = rng.uniform(1, 3, size=(ndim, nobs))
    base = 2.0 + np.sin(design @ freqs) + 0.3 * (design**2) @ freqs
    err = err_level * np.abs(base) * rng.uniform(0.5, 1.0, size=base.shape)
    return design, base, np.abs(err)


@pytest.fixture
def toy_emulator_files(tmp_path, rng, training_pickle_factory):
    design, base, err = _make_dataset(rng)
    pkl = training_pickle_factory(tmp_path / "train.pkl", design, base, err)
    parfile = tmp_path / "pars.txt"
    parfile.write_text("".join(f"p{i}: $p_{i}$, 0.0, 1.0\n" for i in range(3)))
    return pkl, parfile, design, base, err


def test_loader_filters_noisy_points(tmp_path, rng, training_pickle_factory):
    design, base, err = _make_dataset(rng, nev=20)
    err[3] = 10.0 * np.abs(base[3])  # one very noisy point
    pkl = training_pickle_factory(tmp_path / "t.pkl", design, base, err)
    parfile = tmp_path / "p.txt"
    parfile.write_text("".join(f"p{i}: l, 0, 1\n" for i in range(3)))
    emu = Emulator(str(pkl), str(parfile), npc=3)
    assert emu.nev == 19


def test_emulator_predict_matches_reference_pipeline(toy_emulator_files):
    """Golden parity: our fused predict vs a hand-built sklearn pipeline
    applying the reference's exact formulas (src/emulator.py:257-605) at the
    same fixed hyperparameters (optimizer disabled on both sides)."""
    pkl, parfile, design, base, err = toy_emulator_files
    npc = 4
    emu = Emulator(str(pkl), str(parfile), npc=npc, gp_maxiter=0)
    emu.trainEmulatorAutoMask()

    # Reference pipeline in sklearn with identical (initial) hyperparameters.
    scaler = SkScaler()
    std = scaler.fit_transform(base)
    pca = SkPCA(whiten=True, svd_solver="full")
    z_full = pca.fit_transform(std)
    z = z_full[:, :npc]
    ptp = np.ones(3)  # design ranges are [0, 1]
    kern = 1.0 * skk.RBF(length_scale=ptp) + skk.WhiteKernel(0.05)
    gps = [GPR(kernel=kern, alpha=0.1, optimizer=None).fit(design, zz) for zz in z.T]

    xq = np.random.default_rng(7).uniform(0.1, 0.9, size=(5, 3))
    gp_out = [g.predict(xq, return_cov=True) for g in gps]
    gp_mean = np.stack([m for m, _ in gp_out], axis=1)
    gp_var = np.stack([np.diag(c) for _, c in gp_out], axis=1)

    trans = (
        pca.components_
        * np.sqrt(pca.explained_variance_[:, None])
        * scaler.scale_
    )
    ref_mean = gp_mean @ trans[:npc] + scaler.mean_
    A = trans[:npc]
    var_trans = np.einsum("ki,kj->kij", A, A).reshape(npc, -1)
    B = trans[npc:]
    cov_trunc = B.T @ B
    cov_trunc[np.diag_indices_from(cov_trunc)] += 1e-4 * scaler.var_
    nobs = base.shape[1]
    ref_cov = (gp_var @ var_trans).reshape(len(xq), nobs, nobs) + cov_trunc

    mean, cov = emu.predict(xq, return_cov=True)
    np.testing.assert_allclose(mean, ref_mean, rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(cov, ref_cov, rtol=1e-4, atol=1e-7)


def test_emulator_self_consistency(toy_emulator_files):
    """Predicting the training points reproduces them closely (the
    reference's strongest implicit assertion, src/emulator.py:682-689)."""
    pkl, parfile, *_ = toy_emulator_files
    emu = Emulator(str(pkl), str(parfile), npc=5)
    preds, preds_err, truth, truth_err = emu.testEmulatorErrorsWithTrainingPoints(
        nTestPoints=3
    )
    rel = np.abs(preds - truth) / np.abs(truth)
    assert np.median(rel) < 0.02, np.median(rel)


def test_emulator_holdout_honest(toy_emulator_files):
    pkl, parfile, *_ = toy_emulator_files
    emu = Emulator(str(pkl), str(parfile), npc=5)
    preds, preds_err, truth, truth_err = emu.testEmulatorErrors(nTestPoints=5)
    assert preds.shape == truth.shape == (5, 8)
    rel = np.abs(preds - truth) / np.abs(truth)
    assert np.median(rel) < 0.2
    # claimed uncertainties should cover most errors within 4 sigma
    z = np.abs(preds - truth) / np.maximum(preds_err, 1e-12)
    assert np.mean(z < 4.0) > 0.8


@pytest.mark.slow
def test_emulator_logtrafo_roundtrip(tmp_path, rng, training_pickle_factory):
    design, base, err = _make_dataset(rng)
    pkl = training_pickle_factory(tmp_path / "t.pkl", design, base, err)
    parfile = tmp_path / "p.txt"
    parfile.write_text("".join(f"p{i}: l, 0, 1\n" for i in range(3)))
    emu = Emulator(str(pkl), str(parfile), npc=5, logTrafo=True)
    emu.trainEmulatorAutoMask()
    mean, cov = emu.predict(design[:4])
    # trained in log space: predictions exp'd by the validator
    preds, preds_err, truth, truth_err = emu.testEmulatorErrorsWithTrainingPoints(2)
    rel = np.abs(preds - truth) / np.abs(truth)
    assert np.median(rel) < 0.05


def test_emulator_exp_and_cov_diagonal(tmp_path, rng, training_pickle_factory):
    design, base, err = _make_dataset(rng)
    pkl = training_pickle_factory(tmp_path / "t.pkl", design, base, err)
    parfile = tmp_path / "p.txt"
    parfile.write_text("".join(f"p{i}: l, 0, 1\n" for i in range(3)))
    with pytest.raises(ValueError):
        Emulator(str(pkl), str(parfile), exp_and_cov_diagonal=True)
    emu = Emulator(str(pkl), str(parfile), npc=5, logTrafo=True,
                   exp_and_cov_diagonal=True)
    emu.trainEmulatorAutoMask()
    mean, cov = emu.predict(design[:3])
    assert np.all(mean > 0)  # exponentiated
    offdiag = cov.copy()
    for i in range(3):
        np.fill_diagonal(offdiag[i], 0.0)
    assert np.allclose(offdiag, 0.0)


def test_emulator_no_pca_mode(toy_emulator_files):
    pkl, parfile, design, base, err = toy_emulator_files
    emu = Emulator(str(pkl), str(parfile), perform_no_PCA=True)
    emu.trainEmulatorAutoMask()
    mean, cov = emu.predict(design[:4])
    assert mean.shape == (4, 8)
    assert cov.shape == (4, 8, 8)
    # no-PCA covariance is diagonal (src/emulator.py:589-592)
    for i in range(4):
        off = cov[i].copy()
        np.fill_diagonal(off, 0.0)
        assert np.allclose(off, 0.0)
    rel = np.abs(mean - base[:4]) / np.abs(base[:4])
    assert np.median(rel) < 0.05


@pytest.mark.slow
def test_emulator_matern_and_unknown_kernel(toy_emulator_files):
    pkl, parfile, design, *_ = toy_emulator_files
    emu = Emulator(str(pkl), str(parfile), npc=3)
    emu.trainEmulator(np.ones(emu.nev, dtype=bool), kernel_type="Matern")
    mean = emu.predict(design[:2], return_cov=False)
    assert mean.shape == (2, 8)
    with pytest.raises(ValueError):
        emu.trainEmulator(np.ones(emu.nev, dtype=bool), kernel_type="Banana")


@pytest.mark.slow
def test_emulator_sample_y_moments(toy_emulator_files):
    pkl, parfile, design, *_ = toy_emulator_files
    emu = Emulator(str(pkl), str(parfile), npc=4)
    emu.trainEmulatorAutoMask()
    xq = design[:3]
    samples = emu.sample_y(xq, n_samples=3000, random_state=0)
    assert samples.shape == (3, 3000, 8)
    mean, cov = emu.predict(xq)
    emp_mean = samples.mean(axis=1)
    np.testing.assert_allclose(emp_mean, mean, rtol=0.05, atol=0.05)


def test_emulator_save_load_roundtrip(toy_emulator_files, tmp_path):
    pkl, parfile, design, *_ = toy_emulator_files
    emu = Emulator(str(pkl), str(parfile), npc=4)
    emu.trainEmulatorAutoMask()
    xq = design[:4]
    mean0, cov0 = emu.predict(xq)
    path = tmp_path / "emu.sav"
    emu.save(path)
    emu2 = Emulator.load(path)
    mean1, cov1 = emu2.predict(xq)
    np.testing.assert_allclose(mean0, mean1, rtol=1e-10)
    np.testing.assert_allclose(cov0, cov1, rtol=1e-10)


def test_emulator_extra_std(toy_emulator_files):
    pkl, parfile, design, *_ = toy_emulator_files
    emu = Emulator(str(pkl), str(parfile), npc=4)
    emu.trainEmulatorAutoMask()
    _, cov0 = emu.predict(design[:2], extra_std=0.0)
    _, cov1 = emu.predict(design[:2], extra_std=0.5)
    # extra_std inflates the covariance diagonal
    assert np.all(np.diagonal(cov1, axis1=1, axis2=2)
                  >= np.diagonal(cov0, axis1=1, axis2=2))
    assert np.any(np.diagonal(cov1, axis1=1, axis2=2)
                  > np.diagonal(cov0, axis1=1, axis2=2) + 1e-6)


@pytest.mark.slow
def test_emulator_with_param_pca(tmp_path, rng, training_pickle_factory):
    """End-to-end with parameterTrafoPCA on a 20-parameter flagship-layout design."""
    nev, ndim, nobs = 35, 20, 6
    lo = np.zeros(ndim); hi = np.ones(ndim)
    lo[15:19], hi[15:19] = 0.01, 0.3
    lo[12:15], hi[12:15] = 0.01, 0.4
    lo[2:5], hi[2:5] = 0.5, 3.0
    design = lo + (hi - lo) * rng.uniform(size=(nev, ndim))
    freqs = rng.uniform(0.5, 1.5, size=(ndim, nobs))
    base = 2.0 + np.sin(design @ freqs)
    err = 0.01 * np.abs(base)
    pkl = training_pickle_factory(tmp_path / "t.pkl", design, base, err)
    parfile = tmp_path / "p.txt"
    parfile.write_text(
        "".join(f"p{i}: l, {lo[i]}, {hi[i]}\n" for i in range(ndim))
    )
    emu = Emulator(str(pkl), str(parfile), npc=4, parameterTrafoPCA=True)
    emu.trainEmulatorAutoMask()
    mean, cov = emu.predict(design[:3])
    assert mean.shape == (3, nobs)
    assert cov.shape == (3, nobs, nobs)
    rel = np.abs(mean - base[:3]) / np.abs(base[:3])
    assert np.median(rel) < 0.1


@pytest.mark.slow
def test_joint_training_matches_individual(tmp_path, rng, training_pickle_factory):
    """train_emulators_jointly must reproduce per-emulator training exactly."""
    from gpbayestools_hic_tpu.models import train_emulators_jointly

    design = rng.uniform(0, 1, size=(30, 3))
    parfile = tmp_path / "p.txt"
    parfile.write_text("".join(f"p{i}: l, 0, 1\n" for i in range(3)))
    emus_joint, emus_solo = [], []
    for b, nobs in enumerate([5, 7]):
        freqs = rng.uniform(1, 2.5, size=(3, nobs))
        base = 2.0 + np.sin(design @ freqs)
        pkl = training_pickle_factory(
            tmp_path / f"t{b}.pkl", design, base, 0.01 * np.abs(base)
        )
        emus_joint.append(Emulator(str(pkl), str(parfile), npc=3))
        emus_solo.append(Emulator(str(pkl), str(parfile), npc=3))

    train_emulators_jointly(emus_joint)
    for e in emus_solo:
        e.trainEmulatorAutoMask()

    xq = design[:4]
    for ej, es in zip(emus_joint, emus_solo):
        mj, cj = ej.predict(xq)
        ms, cs = es.predict(xq)
        # tiny fp differences from different vmap batch shapes are expected
        np.testing.assert_allclose(mj, ms, rtol=1e-5)
        np.testing.assert_allclose(cj, cs, rtol=1e-4, atol=1e-8)


@pytest.mark.slow
def test_joint_training_respects_band_kernel_config(
    tmp_path, rng, training_pickle_factory
):
    """train_emulators_jointly must use the emulators' OWN kernel/MAP
    configuration (it silently clobbered EmulatorBAND's MaternProd with
    RBF before) and reject mixed configurations."""
    from gpbayestools_hic_tpu.models import EmulatorBAND, train_emulators_jointly

    design = rng.uniform(0, 1, size=(25, 3))
    parfile = tmp_path / "p.txt"
    parfile.write_text("".join(f"p{i}: l, 0, 1\n" for i in range(3)))
    emus = []
    for b in range(2):
        base = 2.0 + np.sin(design @ rng.uniform(1, 2.5, size=(3, 5)))
        pkl = training_pickle_factory(
            tmp_path / f"b{b}.pkl", design, base, 0.01 * np.abs(base)
        )
        emus.append(EmulatorBAND(str(pkl), str(parfile), method="PCGP",
                                 kernel_kind="MaternProd",
                                 map_prior_strength=1.0))
    train_emulators_jointly(emus)
    for e in emus:
        assert e.gp_config.kernel.kind == "MaternProd"
        assert e.gp_config.map_prior_strength == 1.0

    solo = EmulatorBAND(str(tmp_path / "b0.pkl"), str(parfile), method="PCGP",
                        kernel_kind="MaternProd", map_prior_strength=1.0)
    solo.trainEmulatorAutoMask()
    mj, _ = emus[0].predict(design[:3])
    ms, _ = solo.predict(design[:3])
    np.testing.assert_allclose(mj, ms, rtol=1e-5)

    mixed = EmulatorBAND(str(tmp_path / "b1.pkl"), str(parfile), method="PCGP",
                         kernel_kind="Matern")
    with pytest.raises(ValueError, match="kernel_kind_"):
        train_emulators_jointly([emus[0], mixed])


def test_joint_training_rejects_mismatched_designs(tmp_path, rng, training_pickle_factory):
    from gpbayestools_hic_tpu.models import train_emulators_jointly

    parfile = tmp_path / "p.txt"
    parfile.write_text("".join(f"p{i}: l, 0, 1\n" for i in range(3)))
    emus = []
    for b in range(2):
        design = rng.uniform(0, 1, size=(25, 3))  # different per emulator
        base = 2.0 + design @ rng.uniform(1, 2, size=(3, 4))
        pkl = training_pickle_factory(
            tmp_path / f"m{b}.pkl", design, base, 0.01 * np.abs(base)
        )
        emus.append(Emulator(str(pkl), str(parfile), npc=2))
    with pytest.raises(ValueError):
        train_emulators_jointly(emus)


@pytest.mark.slow
def test_edge_cases(tmp_path, rng, training_pickle_factory):
    """Boundary configurations: nev<nobs, nobs=1, ndim=1, npc=1, tiny nev."""
    def build(nev, ndim, nobs, npc, tag):
        design = rng.uniform(0, 1, size=(nev, ndim))
        base = 2.0 + np.sin(design @ rng.uniform(1, 2, size=(ndim, nobs)))
        pkl = training_pickle_factory(
            tmp_path / f"{tag}.pkl", design, base, 0.01 * np.abs(base)
        )
        parfile = tmp_path / f"{tag}.txt"
        parfile.write_text("".join(f"p{i}: l, 0, 1\n" for i in range(ndim)))
        emu = Emulator(str(pkl), str(parfile), npc=npc, gp_maxiter=5)
        emu.trainEmulatorAutoMask()
        mean, cov = emu.predict(design[:2])
        assert mean.shape == (2, nobs) and cov.shape == (2, nobs, nobs)
        assert np.isfinite(mean).all()

    build(10, 2, 20, 4, "wide")    # nev < nobs
    build(15, 2, 1, 3, "one_obs")  # single observable
    build(15, 1, 4, 2, "one_dim")  # 1-D parameter space
    build(15, 2, 5, 1, "one_pc")   # single PC
    build(3, 2, 4, 2, "tiny")      # 3 design points


def test_all_points_filtered_raises(tmp_path, rng, training_pickle_factory):
    design = rng.uniform(0, 1, size=(5, 2))
    base = 2.0 + design @ rng.uniform(1, 2, size=(2, 4))
    pkl = training_pickle_factory(
        tmp_path / "t.pkl", design, base, 10.0 * np.abs(base)
    )
    parfile = tmp_path / "p.txt"
    parfile.write_text("p0: l, 0, 1\np1: l, 0, 1\n")
    with pytest.raises(ValueError, match="discarded"):
        Emulator(str(pkl), str(parfile))


@pytest.mark.slow
def test_loaded_emulator_can_retrain(toy_emulator_files, tmp_path):
    """Regression: load() must restore everything retraining APIs need."""
    pkl, parfile, design, *_ = toy_emulator_files
    emu = Emulator(str(pkl), str(parfile), npc=4, gp_maxiter=20)
    emu.trainEmulatorAutoMask()
    path = tmp_path / "e.sav"
    emu.save(path)
    e2 = Emulator.load(path)
    assert e2.gp_alpha == emu.gp_alpha
    preds, *_ = e2.testEmulatorErrors(nTestPoints=3)  # retrains internally
    assert preds.shape == (3, 8)


@pytest.mark.slow
def test_loaded_band_emulator_can_retrain(tmp_path, rng, training_pickle_factory):
    from gpbayestools_hic_tpu.models import EmulatorBAND

    design = rng.uniform(0, 1, size=(30, 3))
    base = 2.0 + np.sin(design @ rng.uniform(1, 2.5, size=(3, 6)))
    pkl_t = training_pickle_factory(
        tmp_path / "t.pkl", design, base, 0.01 * np.abs(base)
    )
    parfile = tmp_path / "p.txt"
    parfile.write_text("".join(f"p{i}: l, 0, 1\n" for i in range(3)))
    emu = EmulatorBAND(str(pkl_t), str(parfile), method="PCSK", gp_maxiter=20)
    emu.trainEmulatorAutoMask()
    emu.save(tmp_path / "b.sav")
    e2 = EmulatorBAND.load(tmp_path / "b.sav")
    assert e2.method_ == "PCSK"
    e2.trainEmulatorAutoMask()  # PCSK retrain needs _pc_noise_diag fields
    mean, _ = e2.predict(design[:2])
    assert np.isfinite(mean).all()

    # the BASE class loader must dispatch BAND save files to EmulatorBAND
    # (Chain.loadEmulator calls Emulator.load): a plain-Emulator instance
    # would silently retrain with the wrong head (fixed-count PC selection,
    # no stochastic-kriging noise)
    e3 = Emulator.load(tmp_path / "b.sav")
    assert isinstance(e3, EmulatorBAND)
    assert e3.method_ == "PCSK"
    assert e3._pc_noise_diag(np.ones(e3.nev, dtype=bool), e3._npc_used) is not None


def test_bad_likelihood_mode_raises(toy_emulator_files, tmp_path):
    import pickle as pkl_mod
    from gpbayestools_hic_tpu.samplers import Chain

    pkl, parfile, design, base, err = toy_emulator_files
    emu = Emulator(str(pkl), str(parfile), npc=3, gp_maxiter=10)
    emu.trainEmulatorAutoMask()
    exp_pkl = tmp_path / "exp.pkl"
    with open(exp_pkl, "wb") as f:
        pkl_mod.dump({"0": {"obs": np.stack([base[0], 0.05 * np.abs(base[0])])}}, f)
    chain = Chain(
        mcmc_path=str(tmp_path / "m" / "c.pkl"),
        expdata_path=str(exp_pkl),
        model_parafile=str(parfile),
    )
    chain.loadEmulator([emu])
    with pytest.raises(ValueError, match="likelihood_mode"):
        chain.likelihood_mode = "woodburry"  # typo -> rejected at assignment


@pytest.mark.slow
def test_print_learning_curve_protocol(tmp_path, rng, training_pickle_factory):
    """Reference learning-curve protocol (src/emulator.py:424-462): per-PC
    5-fold CV train/test R^2 at each train fraction, using the emulator's
    OWN GP configuration."""
    from gpbayestools_hic_tpu.models import Emulator

    ndim, nev, nobs = 2, 40, 6
    design = rng.uniform(0, 1, size=(nev, ndim))
    freqs = rng.uniform(1, 2.5, size=(ndim, nobs))
    base = 2.0 + np.sin(design @ freqs)
    pkl = training_pickle_factory(
        tmp_path / "t.pkl", design, base, 0.01 * np.abs(base)
    )
    parfile = tmp_path / "p.txt"
    parfile.write_text("".join(f"p{i}: l, 0, 1\n" for i in range(ndim)))
    emu = Emulator(str(pkl), str(parfile), npc=2, gp_maxiter=40)
    emu.trainEmulatorAutoMask()
    curves = emu.print_learning_curve(train_sizes=(0.4, 0.9), n_folds=4)
    assert len(curves) == 2  # one per PC
    for c in curves:
        assert c.shape == (2, 3)
        assert c[1, 0] > c[0, 0]        # more training points at 0.9
        assert c[1, 2] > 0.5            # test R^2 decent at the top size
        assert c[1, 1] > 0.9            # train R^2 high
