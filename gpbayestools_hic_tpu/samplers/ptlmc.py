"""Parallel-tempering Langevin Monte Carlo (PTLMC), surmise semantics.

From-scratch rebuild of the sampler the reference vendors from surmise 0.2.1
(src/mcmc.py:431-693).  Semantics matched:

- temperature ladder ``exp(linspace(log maxtemp, log maxtemp/(numtemps+1),
  numtemps))`` followed by ``numchain`` ones (src/mcmc.py:491-495);
- pre-optimization: starts ranked by log-posterior plus ``ndim * N(0,1)^2``
  noise, per-chain bounded L-BFGS in whitened coordinates
  (src/mcmc.py:530-571) -- here ALL chains optimize as one vmapped batch --
  then jitter away from the mode with step-halving acceptance
  ``delta < 3 * ndim`` (src/mcmc.py:574-591; isotropic whitened jitter here,
  where the reference uses scipy's inverse-Hessian eigenbasis: same accept
  rule, curvature shaping comes from the whitening);
- proposal ``theta' = theta + sqrt(2) * adjrho * (N(0,1) @ hc)`` with
  ``hc = cov^1/2`` of the optimized starts (src/mcmc.py:608-627), tempered
  MH acceptance, 5 sequential temperature-swap passes per step
  (src/mcmc.py:654-658, 679-693), and rho adaptation every 10 tuning steps
  toward acceptance 0.25 (src/mcmc.py:525-528, 663-667);
- 2x tuning steps before ``sampperchain`` production steps; only the T=1
  chains are saved (src/mcmc.py:670).

The whole main loop is one jitted ``lax.scan`` over a
``(numtemps + numchain, ndim)`` state; the sequential swap pass is a
``lax.fori_loop`` (order-dependent by construction).
"""

from __future__ import annotations

import logging
from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..ops.lbfgsb import lbfgsb_minimize

logger = logging.getLogger(__name__)


def _temperature_ladder(numtemps: int, numchain: int, maxtemp: float, dtype):
    # host numpy (one-time setup; eager device ops pay a remote compile
    # each on this runtime), uploaded as a single device_put
    temps = np.exp(
        np.linspace(np.log(maxtemp), np.log(maxtemp) / (numtemps + 1), numtemps)
    )
    return jnp.asarray(np.concatenate([temps, np.ones(numchain)]), dtype=dtype)


def _temp_exchange(key, order, lpostf, temps, iters: int):
    """Sequential parallel-tempering swap pass (reference: src/mcmc.py:679-693).

    ``lpostf`` are UNtempered log posteriors indexed by chain id; ``order``
    maps ladder slot -> chain id.  Returns the revised order.
    """
    n = temps.shape[0]
    key_rt, key_u = jax.random.split(key)
    rtv = jax.random.randint(key_rt, (iters * n,), 1, n)
    log_u = jnp.log(jax.random.uniform(key_u, (iters * n,), dtype=lpostf.dtype))

    def body(i, order):
        rt = rtv[i]
        rhoh = 1.0 / temps[rt - 1] - 1.0 / temps[rt]
        diff = lpostf[order[rt]] - lpostf[order[rt - 1]]
        do_swap = diff * rhoh > log_u[i]
        a, b = order[rt - 1], order[rt]
        order = order.at[rt - 1].set(jnp.where(do_swap, b, a))
        order = order.at[rt].set(jnp.where(do_swap, a, b))
        return order

    return lax.fori_loop(0, iters * n, body, order)


def run_ptlmc(
    logpost_fn: Callable[..., jnp.ndarray],
    draw_fn: Callable[[int], jnp.ndarray],
    *,
    numtemps: int = 32,
    numchain: int = 16,
    sampperchain: int = 400,
    maxtemp: float = 30.0,
    nstartparameters: int = 1000,
    key: jax.Array,
    state=None,
    taracc: float | None = None,
    use_gradients: bool = False,
    preopt_maxiter: int = 100,
    mesh=None,
) -> jnp.ndarray:
    """Run PTLMC; returns the T=1 chains (numchain, sampperchain, ndim).

    ``logpost_fn(x)`` or ``logpost_fn(state, x)`` maps (m, ndim) -> (m,).
    ``draw_fn(n)`` draws approximate prior samples (host-side ok).

    ``mesh``: optional 1-D device mesh; the (numtemps + numchain) chain axis
    of the main scan is sharded over it and the likelihood state replicated
    (temperature swaps become XLA collectives; see :mod:`..parallel.mesh`).

    ``use_gradients=True`` enables the Langevin drift + MH correction
    (reference: src/mcmc.py:629-638, acceptance target 0.60 per :528) --
    the reference's vendored code supports this branch but can never take
    it because its posterior returns no gradients; here the fused posterior
    is differentiable end to end.
    """
    if taracc is None:
        taracc = 0.60 if use_gradients else 0.25
    # Normalize to the (state, x) convention so no device array is ever a
    # closure capture inside a jitted loop (see models/emulator.py on the
    # per-call constant re-upload penalty of this runtime).
    if state is None:
        base = logpost_fn
        logpost_fn = lambda s, x: base(x)  # noqa: E731
        state = ()
    # JITTED posterior wrapper for the driver-level calls: evaluating the
    # traceable fused posterior EAGERLY would pay a multi-second remote XLA
    # compile PER PRIMITIVE OP on this runtime (see Chain._check_initial_state
    # and CLAUDE.md) -- one jit compiles the whole program once instead.
    lp_jit = jax.jit(logpost_fn)
    lp_fn = lambda x: lp_jit(state, x)  # noqa: E731 (driver-level calls only)

    theta0 = jnp.asarray(draw_fn(nstartparameters))
    dtype = theta0.dtype
    ndim = theta0.shape[1]
    totnum = numtemps + numchain
    if nstartparameters < totnum:
        raise ValueError(
            f"nstartparameters ({nstartparameters}) must be >= numtemps + "
            f"numchain ({totnum}): every ladder slot needs a start point"
        )
    temps = _temperature_ladder(numtemps, numchain, maxtemp, dtype)

    # --- pre-optimization -------------------------------------------------
    # Driver-level setup math runs in HOST numpy (eager device ops pay a
    # remote compile each on this runtime); only the batched L-BFGS/jitter
    # and the main scan are device programs.
    logger.info("Begin PTLMC pre-optimization ...")
    key, k_noise, k_jit = jax.random.split(key, 3)
    # setup randomness is HOST numpy too (the eager jax.random.normal calls
    # each paid a remote compile), deterministically seeded from the key bits
    host_rng = np.random.default_rng(
        np.asarray(jax.random.key_data(k_noise), np.uint32)
    )
    lp0 = np.asarray(lp_fn(theta0), dtype=np.float64)
    noise = ndim * host_rng.standard_normal(nstartparameters) ** 2
    # nan=-1e300 too: a NaN log posterior must rank LAST, not at 0 (which
    # would beat every legitimate, typically strongly negative, value)
    order0 = np.argsort(
        -np.nan_to_num(lp0, nan=-1e300, neginf=-1e300) + noise
    )
    starts = np.asarray(theta0, np.float64)[order0[:totnum]]

    thetacen_np = starts.mean(axis=0)
    global_std = starts.std()
    thetas_np = np.maximum(starts.std(axis=0), 1e-8 * global_std)
    whitened_np = (starts - thetacen_np) / thetas_np
    bound_l_np = np.maximum(-10.0 * np.ones(ndim), whitened_np.min(axis=0))
    bound_u_np = np.minimum(10.0 * np.ones(ndim), whitened_np.max(axis=0))
    thetacen = jnp.asarray(thetacen_np, dtype)
    thetas = jnp.asarray(thetas_np, dtype)
    whitened = jnp.asarray(whitened_np, dtype)
    bound_l = jnp.asarray(bound_l_np, dtype)
    bound_u = jnp.asarray(bound_u_np, dtype)

    logger.info("Begin PTLMC chain optimization (vmapped L-BFGS) ...")
    xw_opt, l0 = _preopt(
        logpost_fn, state, whitened, thetacen, thetas, bound_l, bound_u,
        maxiter=preopt_maxiter,
    )

    # jitter off the modes: accept stepadj * r while delta < 3 * ndim,
    # halving stepadj; give up below 1/16.  The direction r is redrawn on
    # EVERY halving attempt like the reference (src/mcmc.py:577-591 draws
    # inside the while loop): one fixed draw pointing up a steep ridge
    # would be probed repeatedly at shrinking steps and give up where a
    # fresh direction succeeds.
    xw_jittered = _jitter(
        logpost_fn, state, xw_opt, l0, k_jit, thetacen, thetas, bound_l,
        bound_u,
    )
    # chain 0 keeps the raw optimum (reference: notmoved=False when k==0)
    thetac = thetacen + thetas * xw_jittered

    # --- proposal covariance (host numpy f64: one-time setup linalg) ------
    thetac_np = np.asarray(thetac, np.float64)
    covmat0_np = np.atleast_2d(np.cov(thetac_np.T))
    if ndim > 1:
        covmat0_np = 0.9 * covmat0_np + 0.1 * np.diag(np.diag(covmat0_np))
        w, v = np.linalg.eigh(covmat0_np)
        hc_np = v @ np.diag(np.sqrt(np.maximum(w, 0.0))) @ v.T
    else:
        hc_np = np.sqrt(covmat0_np).reshape(1, 1)
    hc = jnp.asarray(hc_np, dtype)
    covmat0 = jnp.asarray(covmat0_np, dtype)

    samptunning = int(np.ceil(sampperchain * 2.0))
    total_steps = samptunning + sampperchain

    logger.info(
        "Run PTLMC: %d chains (%d tempered + %d cold), %d tuning + %d "
        "production steps ...", totnum, numtemps, numchain, samptunning,
        sampperchain,
    )

    tau0 = jnp.asarray(-1.0, dtype)
    rho0 = 2.0 * (1.0 + jnp.tanh(tau0))
    if mesh is not None:
        from ..parallel.mesh import check_divisible, replicate, shard_batch

        check_divisible(mesh, totnum, "chains (numtemps + numchain)")
        state = replicate(mesh, state)
        thetac = shard_batch(mesh, thetac)
        fval0 = shard_batch(mesh, lp_fn(thetac) / temps)
    else:
        fval0 = lp_fn(thetac) / temps

    chain = _ptlmc_scan(
        logpost_fn,
        state,
        thetac,
        fval0,
        temps,
        hc,
        tau0,
        rho0,
        key,
        # the REAL proposal covariance in every dimension count: the old
        # ndim==1 identity fallback made the Langevin drift / MH correction
        # inconsistent with the hc-scaled proposal (biased 1-D chains)
        covmat0,
        total_steps=total_steps,
        samptunning=samptunning,
        numtemps=numtemps,
        taracc=taracc,
        use_gradients=use_gradients,
    )
    return chain  # (numchain, sampperchain, ndim)


@partial(jax.jit, static_argnums=(0,), static_argnames=("maxiter",))
def _preopt(logpost_fn, state, whitened, thetacen, thetas, bound_l, bound_u,
            *, maxiter: int):
    def nlp(xw):
        x = thetacen + thetas * xw
        return -logpost_fn(state, x[None, :])[0]

    res = jax.vmap(
        lambda x0: lbfgsb_minimize(nlp, x0, bound_l, bound_u, maxiter=maxiter)
    )(whitened)
    return res.x, res.fun


@partial(jax.jit, static_argnums=(0,))
def _jitter(logpost_fn, state, xw_opt, l0, key, thetacen, thetas, bound_l, bound_u):
    dtype = xw_opt.dtype
    ndim = xw_opt.shape[1]
    keys = jax.random.split(key, xw_opt.shape[0])

    def nlp(xw):
        x = thetacen + thetas * xw
        return -logpost_fn(state, x[None, :])[0]

    def jitter_one(xw, l0v, kv):
        def cond(carry):
            stepadj, accepted = carry[0], carry[2]
            return (~accepted) & (stepadj >= 1.0 / 16.0)

        def body(carry):
            stepadj, xw_cur, _, k = carry
            # fresh direction per attempt (reference redraws in-loop)
            k, k_draw = jax.random.split(k)
            rv = jax.random.normal(k_draw, (ndim,), dtype)
            trial = jnp.clip(xw + stepadj * rv, bound_l, bound_u)
            ok = (nlp(trial) - l0v) < 3.0 * ndim
            return (
                jnp.where(ok, stepadj, stepadj / 2.0),
                jnp.where(ok, trial, xw_cur),
                ok,
                k,
            )

        stepadj, xw_new, _, _ = lax.while_loop(
            cond, body, (jnp.asarray(4.0, dtype), xw, jnp.asarray(False), kv)
        )
        return xw_new

    out = jax.vmap(jitter_one)(xw_opt, l0, keys)
    # chain 0 keeps the raw optimum (reference: notmoved=False when k==0)
    return out.at[0].set(xw_opt[0])


@partial(
    jax.jit,
    static_argnums=(0,),
    static_argnames=(
        "total_steps", "samptunning", "numtemps", "taracc", "use_gradients"
    ),
)
def _ptlmc_scan(
    logpost_fn,
    state,
    thetac,
    fval0,
    temps,
    hc,
    tau0,
    rho0,
    key,
    covmat0,
    *,
    total_steps: int,
    samptunning: int,
    numtemps: int,
    taracc: float,
    use_gradients: bool = False,
):
    lp_fn = lambda x: logpost_fn(state, x)  # noqa: E731 (state is traced here)
    dtype = thetac.dtype
    totnum, ndim = thetac.shape
    adjrho0 = rho0 * temps ** (1.0 / 3.0)

    def grad_fn(x):
        # per-chain gradient of the log posterior (batched via vmap)
        single = lambda xi: logpost_fn(state, xi[None, :])[0]  # noqa: E731
        g = jax.vmap(jax.grad(single))(x)
        return jnp.nan_to_num(g, nan=0.0, posinf=0.0, neginf=0.0)

    def step(carry, inp):
        k, key = inp
        thetac, fval, dfval, tau, adjrho, numtimes = carry
        key, k_prop, k_acc, k_swap = jax.random.split(key, 4)

        rvalo = jax.random.normal(k_prop, (totnum, ndim), dtype)
        rval = jnp.sqrt(2.0) * adjrho[:, None] * (rvalo @ hc)
        thetap = thetac + rval
        if use_gradients:
            # Langevin drift + MH correction (reference: src/mcmc.py:629-638)
            diffval = (adjrho[:, None] ** 2) * (dfval @ covmat0)
            thetap = thetap + diffval
            fvalp = lp_fn(thetap) / temps
            dfvalp = grad_fn(thetap) / temps[:, None]
            term1 = rvalo / jnp.sqrt(2.0)
            term2 = (adjrho[:, None] / 2.0) * ((dfval + dfvalp) @ hc)
            qadj = -(
                2.0 * jnp.sum(term1 * term2, axis=1)
                + jnp.sum(term2**2, axis=1)
            )
        else:
            fvalp = lp_fn(thetap) / temps
            dfvalp = dfval
            qadj = jnp.zeros((totnum,), dtype)
        log_u = jnp.log(jax.random.uniform(k_acc, (totnum,), dtype=dtype))
        accept = log_u < (fvalp - fval + qadj)
        thetac = jnp.where(accept[:, None], thetap, thetac)
        fval = jnp.where(accept, fvalp, fval)
        if use_gradients:
            dfval = jnp.where(accept[:, None], dfvalp, dfval)
        numtimes = numtimes + jnp.sum(accept) / totnum

        # temperature swaps on untempered log posteriors
        fvaln = fval * temps
        order = _temp_exchange(
            k_swap, jnp.arange(totnum), fvaln, temps, iters=5
        )
        fval = fvaln[order] / temps
        thetac = thetac[order]
        if use_gradients:
            dfvaln = temps[:, None] * dfval
            dfval = dfvaln[order] / temps[:, None]

        # rho adaptation every 10 tuning steps
        tune_now = (k < samptunning) & (jnp.mod(k, 10) == 0)
        tau_new = tau + 1.0 / jnp.sqrt(1.0 + k / 10.0) * (numtimes / 10.0 - taracc)
        tau = jnp.where(tune_now, tau_new, tau)
        rho = 2.0 * (1.0 + jnp.tanh(tau))
        adjrho = jnp.where(tune_now, rho * temps ** (1.0 / 3.0), adjrho)
        numtimes = jnp.where(tune_now, 0.0, numtimes)

        return (thetac, fval, dfval, tau, adjrho, numtimes), thetac[numtemps:]

    dfval0 = (
        grad_fn(thetac) / temps[:, None]
        if use_gradients
        else jnp.zeros((totnum, ndim), dtype)
    )
    keys = jax.random.split(key, total_steps)
    ks = jnp.arange(total_steps)
    _, saved = lax.scan(
        step,
        (thetac, fval0, dfval0, tau0, adjrho0, jnp.asarray(0.0, dtype)),
        (ks, keys),
    )
    # keep only production steps; (steps, numchain, ndim) -> (numchain, steps, ndim)
    return jnp.transpose(saved[samptunning:], (1, 0, 2))
