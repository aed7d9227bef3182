"""Golden-value tests for L1 numerics vs sklearn / scipy / numpy."""

import numpy as np
import jax.numpy as jnp
import pytest
from scipy import linalg as sla
from sklearn.decomposition import PCA as SkPCA
from sklearn.preprocessing import StandardScaler as SkScaler
from sklearn.gaussian_process import kernels as skk

from gpbayestools_hic_tpu.ops import (
    fit_standard_scaler,
    scaler_transform,
    scaler_inverse_transform,
    fit_pca,
    pca_transform,
    pca_inverse_transform,
    kernel_fn,
    KernelConfig,
    mvn_loglike,
    mvn_loglike_batch,
    lbfgsb_minimize,
)
from gpbayestools_hic_tpu.ops.scalers import n_components_for_variance
from gpbayestools_hic_tpu.ops.kernels import kernel_diag


def test_standard_scaler_matches_sklearn(rng):
    x = rng.normal(3.0, 2.5, size=(50, 7))
    sk = SkScaler().fit(x)
    st = fit_standard_scaler(jnp.asarray(x))
    np.testing.assert_allclose(st.mean, sk.mean_, rtol=1e-12)
    np.testing.assert_allclose(st.scale, sk.scale_, rtol=1e-12)
    np.testing.assert_allclose(
        scaler_transform(st, jnp.asarray(x)), sk.transform(x), rtol=1e-10, atol=1e-12
    )
    z = scaler_transform(st, jnp.asarray(x))
    np.testing.assert_allclose(
        scaler_inverse_transform(st, z), x, rtol=1e-10, atol=1e-12
    )


def test_pca_matches_sklearn_whiten(rng):
    x = rng.normal(size=(60, 12)) @ rng.normal(size=(12, 12))
    sk = SkPCA(whiten=True, svd_solver="full").fit(x)
    st = fit_pca(jnp.asarray(x), whiten=True)
    np.testing.assert_allclose(
        st.explained_variance, sk.explained_variance_, rtol=1e-9
    )
    np.testing.assert_allclose(
        st.explained_variance_ratio, sk.explained_variance_ratio_, rtol=1e-9
    )
    # Components match up to sign.
    ours = np.asarray(st.components)
    theirs = sk.components_
    for k in range(theirs.shape[0]):
        assert min(
            np.max(np.abs(ours[k] - theirs[k])), np.max(np.abs(ours[k] + theirs[k]))
        ) < 1e-6
    # Whitened scores round-trip exactly.
    z = pca_transform(st, jnp.asarray(x))
    np.testing.assert_allclose(
        pca_inverse_transform(st, z), x, rtol=1e-8, atol=1e-10
    )
    # Truncated round trip matches sklearn's truncated inverse.
    sk4 = SkPCA(n_components=4, whiten=True, svd_solver="full").fit(x)
    z4 = pca_transform(st, jnp.asarray(x), npc=4)
    np.testing.assert_allclose(
        pca_inverse_transform(st, z4), sk4.inverse_transform(sk4.transform(x)),
        rtol=1e-5, atol=1e-7,
    )


def test_pca_variance_threshold_selection(rng):
    x = rng.normal(size=(80, 10)) * np.array([10, 8, 5, 3, 1, 0.5, 0.2, 0.1, 0.05, 0.01])
    sk = SkPCA(n_components=0.99, svd_solver="full").fit(x)
    st = fit_pca(jnp.asarray(x))
    assert n_components_for_variance(st, 0.99) == sk.n_components_


@pytest.mark.parametrize("kind", ["RBF", "Matern"])
def test_kernel_matches_sklearn(rng, kind):
    d = 5
    x = rng.uniform(size=(20, d))
    y = rng.uniform(size=(15, d))
    ls = rng.uniform(0.5, 2.0, size=d)
    amp, noise = 1.7, 0.05
    if kind == "RBF":
        sk_kern = amp * skk.RBF(length_scale=ls) + skk.WhiteKernel(noise)
    else:
        sk_kern = amp * skk.Matern(length_scale=ls, nu=1.5) + skk.WhiteKernel(noise)
    params = {
        "log_amp": jnp.log(amp),
        "log_ls": jnp.log(jnp.asarray(ls)),
        "log_noise": jnp.log(noise),
    }
    cfg = KernelConfig(kind=kind)
    np.testing.assert_allclose(
        kernel_fn(params, jnp.asarray(x), config=cfg),
        sk_kern(x), rtol=1e-6, atol=1e-7,
    )
    np.testing.assert_allclose(
        kernel_fn(params, jnp.asarray(x), jnp.asarray(y), config=cfg),
        sk_kern(x, y), rtol=1e-6, atol=1e-7,
    )
    np.testing.assert_allclose(
        kernel_diag(params, jnp.asarray(x), config=cfg),
        np.diag(sk_kern(x)), rtol=1e-10,
    )


def test_mvn_loglike_matches_lapack_reference(rng):
    """Golden parity with the reference's dpotrf/dpotrs computation
    (reference: src/mcmc.py:23-65)."""
    n = 30
    a = rng.normal(size=(n, n))
    cov = a @ a.T + n * np.eye(n)
    y = rng.normal(size=n)
    # Reference computation via scipy LAPACK.
    L, info = sla.lapack.dpotrf(cov, clean=False)
    assert info == 0
    alpha, info = sla.lapack.dpotrs(L, y)
    expected = -0.5 * np.dot(y, alpha) - np.log(L.diagonal()).sum()
    got = mvn_loglike(jnp.asarray(y), jnp.asarray(cov))
    np.testing.assert_allclose(got, expected, rtol=1e-10)


def test_mvn_loglike_batch(rng):
    b, n = 8, 20
    covs, ys, expected = [], [], []
    for _ in range(b):
        a = rng.normal(size=(n, n))
        cov = a @ a.T + n * np.eye(n)
        y = rng.normal(size=n)
        L = np.linalg.cholesky(cov)
        alpha = np.linalg.solve(cov, y)
        expected.append(-0.5 * y @ alpha - np.log(np.diag(L)).sum())
        covs.append(cov)
        ys.append(y)
    got = mvn_loglike_batch(jnp.asarray(ys), jnp.asarray(covs))
    np.testing.assert_allclose(got, expected, rtol=1e-9)


def test_mvn_loglike_nonpd_gives_neg_inf():
    cov = -jnp.eye(4)
    y = jnp.ones(4)
    assert mvn_loglike(y, cov) == -jnp.inf


def test_lbfgsb_quadratic():
    target = jnp.asarray([1.0, -2.0, 3.0])

    def fun(x):
        return jnp.sum((x - target) ** 2)

    lower = -10.0 * jnp.ones(3)
    upper = 10.0 * jnp.ones(3)
    res = lbfgsb_minimize(fun, jnp.zeros(3), lower, upper, tol=1e-10)
    np.testing.assert_allclose(res.x, target, atol=1e-6)
    assert bool(res.converged)


def test_lbfgsb_active_bounds():
    target = jnp.asarray([5.0, -5.0])

    def fun(x):
        return jnp.sum((x - target) ** 2)

    lower = jnp.asarray([-1.0, -1.0])
    upper = jnp.asarray([1.0, 1.0])
    res = lbfgsb_minimize(fun, jnp.zeros(2), lower, upper, tol=1e-10)
    np.testing.assert_allclose(res.x, [1.0, -1.0], atol=1e-8)


def test_lbfgsb_rosenbrock_matches_scipy():
    from scipy.optimize import minimize as sp_minimize

    def rosen(x):
        return jnp.sum(100.0 * (x[1:] - x[:-1] ** 2) ** 2 + (1 - x[:-1]) ** 2)

    def rosen_np(x):
        return float(rosen(jnp.asarray(x)))

    # Start inside the global basin (4-d Rosenbrock has a second local
    # minimum near x1 = -0.77; landing there is legitimate optimizer
    # behavior, so pin the basin instead).
    x0 = jnp.asarray([0.5, 0.6, 0.4, 0.5])
    lower = -2.0 * jnp.ones(4)
    upper = 2.0 * jnp.ones(4)
    res = lbfgsb_minimize(rosen, x0, lower, upper, maxiter=500, tol=1e-10)
    sp = sp_minimize(rosen_np, np.asarray(x0), method="L-BFGS-B",
                     bounds=[(-2, 2)] * 4)
    assert float(res.fun) <= sp.fun + 1e-6
    np.testing.assert_allclose(res.x, np.ones(4), atol=1e-4)


def test_lbfgsb_vmappable():
    import jax

    def fun(x):
        return jnp.sum((x - 2.0) ** 2)

    x0s = jnp.stack([jnp.zeros(3), jnp.ones(3), -jnp.ones(3)])
    lower = -10.0 * jnp.ones(3)
    upper = 10.0 * jnp.ones(3)
    res = jax.vmap(lambda x0: lbfgsb_minimize(fun, x0, lower, upper))(x0s)
    np.testing.assert_allclose(res.x, 2.0 * np.ones((3, 3)), atol=1e-5)


def test_tri_matmul_lower_exact():
    """Blocked triangular matmuls equal the dense product exactly (the
    skipped blocks are exactly zero)."""
    import jax.numpy as jnp

    from gpbayestools_hic_tpu.ops.linalg import (
        tri_matmul_lower,
        tri_matmul_upper_t,
    )

    rng = np.random.default_rng(0)
    for n, m, nb in ((37, 5, 4), (64, 16, 4), (33, 7, 8), (6, 3, 4)):
        g = jnp.asarray(np.tril(rng.normal(size=(n, n))))
        k = jnp.asarray(rng.normal(size=(n, m)))
        np.testing.assert_allclose(
            np.asarray(tri_matmul_lower(g, k, nb=nb)), np.asarray(g @ k),
            rtol=1e-12, atol=1e-12,
        )
        np.testing.assert_allclose(
            np.asarray(tri_matmul_upper_t(g, k, nb=nb)), np.asarray(g.T @ k),
            rtol=1e-12, atol=1e-12,
        )


def test_spd_qform_logdet_matches_dense():
    """Unrolled capacitance solve == dense Cholesky solve, values and
    reverse gradients, across sizes and batch shapes (CPU x64)."""
    import jax
    import jax.numpy as jnp

    from gpbayestools_hic_tpu.ops.linalg import spd_qform_logdet

    rng = np.random.default_rng(3)
    for k, batch in ((1, (5,)), (2, (8,)), (4, (6,)), (7, (3, 4)), (12, (9,))):
        a = rng.normal(size=batch + (k, k))
        s = a @ np.swapaxes(a, -1, -2) + 3.0 * np.eye(k)  # SPD, well-cond
        z = rng.normal(size=batch + (k,))
        sj, zj = jnp.asarray(s), jnp.asarray(z)

        q, logdet = spd_qform_logdet(sj, zj)
        # dense reference
        sol = np.linalg.solve(s, z[..., :, None])[..., 0]
        q_ref = np.sum(z * sol, axis=-1)
        _, logdet_ref = np.linalg.slogdet(s)
        np.testing.assert_allclose(np.asarray(q), q_ref, rtol=1e-10)
        np.testing.assert_allclose(np.asarray(logdet), logdet_ref, rtol=1e-10)

        # unrolled path == XLA fallback path, values AND reverse grads
        def f_unroll(ss, zz):
            qq, ld = spd_qform_logdet(ss, zz)
            return jnp.sum(qq + 0.5 * ld)

        def f_fallback(ss, zz):
            qq, ld = spd_qform_logdet(ss, zz, max_unroll=0)
            return jnp.sum(qq + 0.5 * ld)

        np.testing.assert_allclose(
            float(f_unroll(sj, zj)), float(f_fallback(sj, zj)), rtol=1e-12
        )
        gs_u, gz_u = jax.grad(f_unroll, argnums=(0, 1))(sj, zj)
        gs_f, gz_f = jax.grad(f_fallback, argnums=(0, 1))(sj, zj)
        # the fallback's cholesky grad is symmetrized differently; compare
        # the symmetrized cotangent (S is used symmetrically by callers)
        sym = lambda g: 0.5 * (np.asarray(g) + np.swapaxes(np.asarray(g), -1, -2))
        np.testing.assert_allclose(sym(gs_u), sym(gs_f), rtol=1e-8, atol=1e-10)
        np.testing.assert_allclose(
            np.asarray(gz_u), np.asarray(gz_f), rtol=1e-8, atol=1e-10
        )


def test_spd_qform_logdet_nonpd_propagates_nan():
    import jax.numpy as jnp

    from gpbayestools_hic_tpu.ops.linalg import spd_qform_logdet

    s = jnp.asarray(np.array([[[1.0, 0.0], [0.0, -2.0]]]))  # non-PD
    z = jnp.asarray(np.ones((1, 2)))
    q, logdet = spd_qform_logdet(s, z)
    assert not np.isfinite(np.asarray(q)).any()
    assert not np.isfinite(np.asarray(logdet)).any()


def test_cholesky_jittered_gradient_finite_on_rescued_input(rng):
    """The jitter rescue must not leak NaN into the gradient: with a single
    where, the unselected plain factorization's backward turns its zero
    cotangent into 0 * NaN = NaN even though the rescued VALUE is finite
    (round-4 review finding; fixed with the double-where pattern)."""
    import jax

    from gpbayestools_hic_tpu.ops.linalg import cholesky_jittered

    n = 6
    a = rng.normal(size=(n, n))
    spd = a @ a.T + n * np.eye(n)
    # MARGINALLY non-PD (the roundoff-scale case the rescue is designed
    # for): push the smallest eigenvalue to about -1e-13 of the diagonal
    # scale, well inside the jitter bump's reach
    w, v = np.linalg.eigh(spd)
    deficit = w[0] + 1e-13 * np.mean(np.diag(spd))
    nonpd = spd - deficit * np.outer(v[:, 0], v[:, 0])
    assert np.linalg.eigvalsh(nonpd)[0] < 0  # genuinely non-PD
    x = jnp.asarray(nonpd)

    val = cholesky_jittered(x)
    assert np.all(np.isfinite(np.asarray(val)))  # the rescue worked
    g = jax.grad(lambda m: jnp.sum(cholesky_jittered(m) ** 2))(x)
    assert np.all(np.isfinite(np.asarray(g))), g


def test_scaler_pca_upcast_integer_inputs():
    """Integer training arrays must upcast to float (sklearn semantics):
    keeping the int dtype silently truncated a fitted scale of 0.8 to 0
    and produced division-by-zero transforms (round-4 review finding)."""
    from gpbayestools_hic_tpu.ops.scalers import (
        fit_pca,
        fit_standard_scaler,
        scaler_transform,
    )

    x = np.array([[0, 1], [1, 2], [2, 4]])
    st = fit_standard_scaler(x)
    assert np.issubdtype(np.asarray(st.scale).dtype, np.floating)
    assert np.all(np.asarray(st.scale) > 0)
    z = np.asarray(scaler_transform(st, x))
    assert np.all(np.isfinite(z))
    np.testing.assert_allclose(z.mean(axis=0), 0.0, atol=1e-12)
    pca = fit_pca(np.array([[0, 1, 1], [1, 2, 0], [2, 4, 3], [3, 5, 1]]))
    assert np.issubdtype(np.asarray(pca.components).dtype, np.floating)


def test_result_dtype_keeps_mldtypes_floats():
    """bf16 inputs must keep their dtype, not silently upcast to f64
    (ADVICE r4; the first fix used dt.kind == 'f', which is False for
    ml_dtypes' structured 'V' kind -- caught by the round-5 review)."""
    import ml_dtypes

    from gpbayestools_hic_tpu.ops.scalers import _result_dtype

    assert _result_dtype(np.zeros((4, 3), dtype=ml_dtypes.bfloat16)) == (
        np.dtype(ml_dtypes.bfloat16)
    )
    assert _result_dtype(np.zeros(3, dtype=np.float32)) == np.float32
    assert _result_dtype(np.zeros(3, dtype=np.int32)) == np.float64
    assert _result_dtype(np.zeros(3, dtype=bool)) == np.float64


def test_lbfgsb_never_returns_worse_than_start(rng):
    """The projected Armijo test clamps its directional term at zero, so a
    box-clipped uphill displacement can never be accepted as an 'Armijo
    pass' (round-4 review finding): for any start, the returned objective
    is <= the starting objective."""
    from gpbayestools_hic_tpu.ops.lbfgsb import lbfgsb_minimize

    d = 4
    aq = rng.normal(size=(d, d))
    q = aq @ aq.T + 0.1 * np.eye(d)
    b = rng.normal(size=d) * 5.0

    def fun(x):
        return 0.5 * x @ jnp.asarray(q) @ x + jnp.asarray(b) @ x

    lower = np.zeros(d)
    upper = np.ones(d)
    for seed in range(8):
        x0 = np.random.default_rng(seed).uniform(0, 1, d)
        res = lbfgsb_minimize(fun, jnp.asarray(x0), lower=lower, upper=upper,
                              maxiter=25)
        f0 = float(fun(jnp.asarray(x0)))
        assert float(res.fun) <= f0 + 1e-10, (seed, float(res.fun), f0)
        assert np.all(np.asarray(res.x) >= lower - 1e-12)
        assert np.all(np.asarray(res.x) <= upper + 1e-12)
