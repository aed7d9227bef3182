"""Flow-preconditioned sequential Monte Carlo (pocoMC-parity sampler).

From-scratch rebuild of the capability the reference gets from pocoMC 1.2.6
(src/mcmc.py:752-819): Preconditioned Monte Carlo -- an adaptive-temperature
SMC sampler whose MCMC moves run in the latent space of a normalizing flow
fit to the current particles.

Algorithm (one jitted program per phase; host loop only for the
data-dependent temperature schedule):

1. Draw ``n_prior`` particles from the prior; work in unbounded coordinates
   ``u = logit((x - lo) / (hi - lo))`` so every particle maps to a valid
   parameter point (this is why pocoMC needs the ``finite=True`` likelihood
   contract -- flows cannot digest -inf; src/mcmc.py:196-198).
2. Anneal ``beta`` 0 -> 1.  Each step: pick the next beta by bisection so
   the effective sample size of the incremental weights
   ``exp((beta' - beta) logl)`` equals ``n_effective``; systematic-resample
   the population; fit the RealNVP preconditioner to an ``n_active``
   subsample; run ``n_max_steps`` preconditioned Crank-Nicolson MCMC steps
   in flow-latent space with step size adapted toward 0.234 acceptance.
   ``sample="tpcn"`` runs the Student-t-preconditioned kernel: the latent
   dof is max-likelihood-fit to the particles each iteration and the
   proposal preserves t_nu(0, I) via its Gaussian scale-mixture conditional
   (nu -> inf recovers plain pCN, ``sample="pcn"``).
3. After beta = 1, keep running the pCN kernel and append decorrelated
   population snapshots until ``n_total`` samples are collected.
4. Evidence: the running SMC estimate ``sum log mean exp(dbeta * logl)``
   plus, when ``n_evidence > 0``, an importance-sampling refinement with
   flow draws (pocoMC's default); the IS weight variance gives the error.

Returns the reference's chain contract: ``samples (n, d), weights, logl,
logp, logz, logz_err`` (src/mcmc.py:816-819).
"""

from __future__ import annotations

import logging
from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from .flows import FlowConfig, fit_flow, flow_forward, flow_inverse, init_flow

logger = logging.getLogger(__name__)


# ---------------------------------------------------------------- transforms


def _to_unbounded(x, lo, hi):
    p = jnp.clip((x - lo) / (hi - lo), 1e-7, 1 - 1e-7)
    return jnp.log(p) - jnp.log1p(-p)


def _to_bounded(u, lo, hi):
    """u -> x plus log |dx/du| (per sample)."""
    sig = jax.nn.sigmoid(u)
    x = lo + (hi - lo) * sig
    logdet = jnp.sum(
        jnp.log(hi - lo) + jax.nn.log_sigmoid(u) + jax.nn.log_sigmoid(-u),
        axis=-1,
    )
    return x, logdet


# -------------------------------------------------------------- core kernels


@partial(jax.jit, static_argnums=(0, 1))
def _eval_u(log_likelihood, log_prior_fn, state, u, lo, hi, log_prior_x):
    """u-space particle evaluation: returns (x, logl, logp_u).

    ``logp_u`` is the prior density in u-coordinates:
    ``log p_x(x) + log|dx/du|``.  With no custom prior, log p_x is the
    uniform-box constant; otherwise ``log_prior_fn(x)`` (traceable) is used,
    floored at a large finite value so flow/pCN arithmetic never sees -inf.
    """
    x, logdet_xu = _to_bounded(u, lo, hi)
    logl = log_likelihood(state, x, True)
    if log_prior_fn is None:
        logp_x = log_prior_x
    else:
        logp_x = jnp.maximum(log_prior_fn(x), -1e30)
    logp_u = logp_x + logdet_xu
    return x, logl, logp_u


def _t_logpdf(z2: jnp.ndarray, nu: jnp.ndarray, d: int) -> jnp.ndarray:
    """log density (up to const) of a standard multivariate-t with dof nu,
    as a function of |z|^2."""
    return -0.5 * (nu + d) * jnp.log1p(z2 / nu)


@partial(
    jax.jit, static_argnums=(0, 1), static_argnames=("n_steps", "config")
)
def _pcn_rounds(
    log_likelihood,
    log_prior_fn,
    state,
    flow_params,
    u,
    logl,
    logp_u,
    beta,
    rho,
    nu,
    key,
    lo,
    hi,
    log_prior_x,
    *,
    n_steps: int,
    config: FlowConfig,
):
    """n_steps of t-preconditioned Crank-Nicolson in flow-latent space.

    Target in z-space: pi(z) = beta*logl + logp_u + log|du/dz|.  The tPCN
    proposal uses the Gaussian scale-mixture form of the multivariate-t
    reference measure with ``nu`` degrees of freedom: draw the per-particle
    scale from its conditional ``s | z ~ InvGamma((nu+d)/2, (nu+|z|^2)/2)``,
    then ``z' = sqrt(1-rho^2) z + rho sqrt(s) xi`` -- this preserves
    t_nu(0, I) exactly, so the MH ratio uses
    ``L(z) = log pi(z) - log t_nu(z)`` (pocoMC's ``sample="tpcn"``
    semantics; nu -> inf recovers Gaussian pCN).  Step size adapts toward
    0.234 acceptance.  Returns (u, logl, logp_u, rho, accept_rate).
    """
    n, d = u.shape
    z0, logdet_zu = flow_forward(flow_params, u, config)
    # log|du/dz| = -log|dz/du|
    logdet_uz0 = -logdet_zu

    def lfun(logl_v, logp_u_v, logdet_uz_v, z):
        z2 = jnp.sum(z**2, axis=-1)
        return (
            beta * logl_v + logp_u_v + logdet_uz_v - _t_logpdf(z2, nu, d)
        )

    def step(carry, k):
        z, logl_c, logp_c, logdet_c, rho, acc_sum = carry
        k1, k2, k3 = jax.random.split(k, 3)
        # s | z ~ InvGamma((nu+d)/2, (nu+|z|^2)/2)
        z2 = jnp.sum(z**2, axis=-1)
        g = jax.random.gamma(k3, 0.5 * (nu + d), (n,), z.dtype)
        s = 0.5 * (nu + z2) / g
        xi = jax.random.normal(k1, z.shape, z.dtype)
        zp = jnp.sqrt(1.0 - rho**2) * z + rho * jnp.sqrt(s)[:, None] * xi
        up, logdet_uzp = flow_inverse(flow_params, zp, config)
        _, logl_p, logp_p = _eval_u(
            log_likelihood, log_prior_fn, state, up, lo, hi, log_prior_x
        )
        l_cur = lfun(logl_c, logp_c, logdet_c, z)
        l_prop = lfun(logl_p, logp_p, logdet_uzp, zp)
        log_a = l_prop - l_cur
        accept = jnp.log(jax.random.uniform(k2, (n,), z.dtype)) < log_a
        z = jnp.where(accept[:, None], zp, z)
        logl_c = jnp.where(accept, logl_p, logl_c)
        logp_c = jnp.where(accept, logp_p, logp_c)
        logdet_c = jnp.where(accept, logdet_uzp, logdet_c)
        rate = jnp.mean(accept.astype(z.dtype))
        # Robbins-Monro toward 0.234 in logit space
        rho = jnp.clip(rho * jnp.exp(0.5 * (rate - 0.234)), 1e-4, 0.99)
        return (z, logl_c, logp_c, logdet_c, rho, acc_sum + rate), None

    keys = jax.random.split(key, n_steps)
    (z, logl, logp_u, logdet_uz, rho, acc_sum), _ = lax.scan(
        step, (z0, logl, logp_u, logdet_uz0, rho, 0.0), keys
    )
    u, _ = flow_inverse(flow_params, z, config)
    return u, logl, logp_u, rho, acc_sum / n_steps


def _estimate_dof(z: np.ndarray, grid=(3.0, 5.0, 8.0, 12.0, 20.0, 50.0, 1e6)):
    """Max-likelihood dof of a standard multivariate-t over a small grid.

    pocoMC fits the latent distribution's degrees of freedom each iteration;
    a coarse grid is enough to pick between heavy tails and Gaussian
    (nu = 1e6 ~ Gaussian pCN).
    """
    from scipy.special import gammaln

    z2 = np.sum(np.asarray(z, dtype=np.float64) ** 2, axis=1)
    d = z.shape[1]
    best_nu, best_ll = grid[-1], -np.inf
    for nu in grid:
        ll = (
            gammaln((nu + d) / 2) - gammaln(nu / 2) - 0.5 * d * np.log(nu)
            - 0.5 * (nu + d) * np.mean(np.log1p(z2 / nu))
        )
        if ll > best_ll:
            best_nu, best_ll = nu, ll
    return best_nu


def _ess_fraction(log_w):
    log_w = log_w - np.max(log_w)
    w = np.exp(log_w)
    return (w.sum() ** 2) / (np.sum(w**2) * len(w))


def _next_beta(logl, beta, target_ess_frac):
    """Bisect beta' in (beta, 1] so incremental-weight ESS hits the target."""
    logl = np.nan_to_num(np.asarray(logl, dtype=np.float64), neginf=-1e300)
    if _ess_fraction((1.0 - beta) * logl) >= target_ess_frac:
        return 1.0
    lo_b, hi_b = beta, 1.0
    for _ in range(60):
        mid = 0.5 * (lo_b + hi_b)
        if _ess_fraction((mid - beta) * logl) >= target_ess_frac:
            lo_b = mid
        else:
            hi_b = mid
    return max(lo_b, beta + 1e-6)


def _systematic_resample(rng, log_w, n):
    log_w = np.nan_to_num(np.asarray(log_w, dtype=np.float64), neginf=-1e300)
    w = np.exp(log_w - log_w.max())
    w = w / w.sum()
    positions = (rng.random() + np.arange(n)) / n
    return np.searchsorted(np.cumsum(w), positions).clip(0, len(w) - 1)


# -------------------------------------------------------------------- driver


def run_smc(
    log_likelihood: Callable,
    prior_lo: jnp.ndarray,
    prior_hi: jnp.ndarray,
    *,
    likelihood_state=None,
    n_effective: int = 1000,
    n_active: int = 250,
    n_prior: int = 2000,
    sample: str = "tpcn",
    n_max_steps: int = 200,
    n_total: int = 5000,
    n_evidence: int = 5000,
    seed: int = 42,
    custom_prior=None,
    flow_config: FlowConfig = FlowConfig(),
    flow_fit_steps: int = 300,
) -> dict:
    """Run the preconditioned SMC sampler; see module docstring.

    ``log_likelihood(state, x, finite)`` maps (m, d) -> (m,) and must return
    finite values (-1e300) outside the box.

    ``custom_prior``: a uniform box prior is the native fast path.  A custom
    prior must expose a JAX-traceable ``log_prior_jax(x) -> (m,)`` (plus
    ``rvs(n)`` for initial draws); it is then used in the MCMC target and
    the evidence weights.  Objects with only a numpy ``logpdf`` (e.g.
    pocomc.Prior) cannot be traced into the device programs -- they are
    rejected rather than silently sampling under the wrong prior.
    """
    if sample not in ("pcn", "tpcn", "rwm"):
        raise ValueError(f"unknown sample kernel: {sample}")
    if sample == "rwm":
        logger.warning("rwm kernel not implemented natively; using pcn")
    nu = 1e6  # until the first flow fit

    state = likelihood_state if likelihood_state is not None else ()
    ll_fn = log_likelihood
    dtype = prior_lo.dtype
    ndim = prior_lo.shape[0]
    rng = np.random.default_rng(seed)
    key = jax.random.PRNGKey(seed)
    log_prior_x = jnp.asarray(
        -np.sum(np.log(np.asarray(prior_hi) - np.asarray(prior_lo))), dtype=dtype
    )

    # population size: keep n_prior particles throughout so the ESS target
    # n_effective (<= n_prior by pocoMC's own default construction) is
    # attainable on the live population
    n_pop = max(n_prior, 2 * n_active)
    target_ess_frac = min(n_effective / n_pop, 0.95)

    logger.info(
        "SMC: %d particles, ESS target %d (%.2f), kernel %s",
        n_pop, n_effective, target_ess_frac, sample,
    )

    log_prior_fn = None
    if custom_prior is not None:
        if not hasattr(custom_prior, "log_prior_jax"):
            raise ValueError(
                "custom priors must expose a JAX-traceable log_prior_jax(x) "
                "(see utils.priors.ScipyPrior for scipy frozen-distribution "
                "lists); a numpy-only logpdf cannot enter the device "
                "programs and would silently be replaced by the uniform box"
            )
        log_prior_fn = custom_prior.log_prior_jax
        x0 = np.asarray(custom_prior.rvs(n_pop))
        x0 = np.clip(
            x0,
            np.asarray(prior_lo) + 1e-9,
            np.asarray(prior_hi) - 1e-9,
        )
    else:
        x0 = rng.uniform(np.asarray(prior_lo), np.asarray(prior_hi), (n_pop, ndim))
    u = _to_unbounded(jnp.asarray(x0, dtype=dtype), prior_lo, prior_hi)
    _, logl, logp_u = _eval_u(
        ll_fn, log_prior_fn, state, u, prior_lo, prior_hi, log_prior_x
    )

    key, k_flow = jax.random.split(key)
    flow_params = init_flow(k_flow, ndim, flow_config, dtype)
    rho = jnp.asarray(0.5, dtype)

    beta = 0.0
    logz_smc = 0.0
    iteration = 0
    while beta < 1.0:
        iteration += 1
        beta_new = _next_beta(logl, beta, target_ess_frac)
        log_w = (beta_new - beta) * np.nan_to_num(
            np.asarray(logl, dtype=np.float64), neginf=-1e300
        )
        # running SMC evidence: log mean exp of incremental weights
        m = log_w.max()
        logz_smc += m + np.log(np.mean(np.exp(log_w - m)))
        idx = _systematic_resample(rng, log_w, n_pop)
        u = u[idx]
        logl = logl[idx]
        logp_u = logp_u[idx]
        beta = beta_new

        # fit the preconditioner on an n_active subsample
        sub = rng.choice(n_pop, size=min(n_active, n_pop), replace=False)
        key, k_fit, k_mcmc = jax.random.split(key, 3)
        flow_params, flow_loss = fit_flow(
            flow_params, u[sub], jnp.ones(len(sub), dtype), k_fit,
            config=flow_config, steps=flow_fit_steps,
        )
        # t-preconditioning: fit the latent dof each iteration (tpcn);
        # nu = 1e6 is numerically Gaussian pCN
        if sample == "tpcn":
            z_cur, _ = flow_forward(flow_params, u, flow_config)
            nu = _estimate_dof(np.asarray(z_cur))
        else:
            nu = 1e6
        u, logl, logp_u, rho, acc = _pcn_rounds(
            ll_fn, log_prior_fn, state, flow_params, u, logl, logp_u,
            jnp.asarray(beta, dtype), rho, jnp.asarray(nu, dtype), k_mcmc,
            prior_lo, prior_hi,
            log_prior_x, n_steps=n_max_steps, config=flow_config,
        )
        logger.info(
            "SMC iter %d: beta=%.4f, accept=%.3f, rho=%.3f, nu=%g, "
            "flow loss=%.2f, logz=%.3f", iteration, beta, float(acc),
            float(rho), nu, float(flow_loss), logz_smc,
        )
        if iteration > 200:
            logger.warning("SMC: beta schedule did not converge in 200 steps")
            break

    # ------------------------------------------------- posterior collection
    xs, logls, logps = [], [], []

    def snapshot():
        x, logdet = _to_bounded(u, prior_lo, prior_hi)
        xs.append(np.asarray(x))
        logls.append(np.asarray(logl))
        # logp in x-space (pocoMC reports prior log-density of samples)
        logps.append(np.asarray(logp_u - logdet))

    snapshot()
    while sum(len(a) for a in xs) < n_total:
        key, k_mcmc = jax.random.split(key)
        u, logl, logp_u, rho, acc = _pcn_rounds(
            ll_fn, log_prior_fn, state, flow_params, u, logl, logp_u,
            jnp.asarray(1.0, dtype), rho,
            jnp.asarray(nu if sample == "tpcn" else 1e6, dtype), k_mcmc,
            prior_lo, prior_hi,
            log_prior_x, n_steps=max(n_max_steps // 4, 5), config=flow_config,
        )
        snapshot()
    samples = np.concatenate(xs)[:n_total]
    logl_out = np.concatenate(logls)[:n_total]
    logp_out = np.concatenate(logps)[:n_total]
    weights = np.full(n_total, 1.0 / n_total)

    # ------------------------------------------------------------- evidence
    logz, logz_err = logz_smc, np.nan
    if n_evidence and n_evidence > 0:
        key, k_ev = jax.random.split(key)
        z = jax.random.normal(k_ev, (n_evidence, ndim), dtype)
        u_ev, logdet_uz = flow_inverse(flow_params, z, flow_config)
        x_ev, logl_ev, logp_u_ev = _eval_u(
            ll_fn, log_prior_fn, state, u_ev, prior_lo, prior_hi, log_prior_x
        )
        # q(u) = N(z) / |du/dz|  =>  log q = logN(z) - logdet_uz
        log_n = -0.5 * jnp.sum(z**2, axis=1) - 0.5 * ndim * jnp.log(
            2.0 * jnp.pi
        )
        log_q = log_n - logdet_uz
        log_w_ev = np.asarray(logl_ev + logp_u_ev - log_q, dtype=np.float64)
        # non-finite weights (flow-tail overflow, NaN from extreme draws)
        # contribute zero mass; they must not poison the estimate
        log_w_ev = np.where(np.isfinite(log_w_ev), log_w_ev, -np.inf)
        if np.all(~np.isfinite(log_w_ev)):
            logger.warning("evidence IS: no finite weights; keeping SMC estimate")
        else:
            m = log_w_ev.max()
            w = np.exp(log_w_ev - m)
            logz = m + np.log(np.mean(w))
            logz_err = float(
                np.std(w) / (np.mean(w) * np.sqrt(n_evidence))
            )

    return {
        "samples": samples,
        "weights": weights,
        "logl": logl_out,
        "logp": logp_out,
        "logz": float(logz),
        "logz_err": float(logz_err),
        "beta_iterations": iteration,
    }
