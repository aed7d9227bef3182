"""Sweep (target_accept, n_leapfrog) for flagship HMC ESS/s.

The production default is target_accept=0.8 with L=8 (eps adapts to
~0.38, integration time eps*L ~ 3.1).  A lower acceptance target lets eps
grow, so the same integration time needs fewer gradients per step --
potentially more effective samples per gradient if tau holds.  This tool
measures it on the real flagship posterior (same protocol as
bench.bench_hmc: warmup charged, converged 512-step tau window).

Usage: python tools/accept_sweep.py [acc:L[:W[:P]] ...]  (default grid below)

An optional third token W >= 1 runs scheme="windowed" with that window
(the production bench scheme); omitted or 0 means the endpoint-Metropolis
scheme.  The windowed scheme changes the L trade-off: its Boltzmann
selection tolerates rougher endpoints, so shorter trajectories (fewer
gradients per step) may hold tau.  A fourth token P (percent, e.g. 90
for persist=0.9) adds Horowitz partial momentum refresh on top of the
windowed scheme.
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")
from bench import NDIM, NWALKERS, HMC_STEPS, HMC_WARMUP, build_or_load_chain, log


def run_config(chain, target_accept, n_leapfrog, window=0, persist=0.0,
               dtype=np.float32):
    import jax
    import jax.numpy as jnp

    from gpbayestools_hic_tpu.samplers.hmc import run_hmc
    from gpbayestools_hic_tpu.utils.metrics import integrated_autocorr_time

    log_post, like_state = chain.posterior_with_state()
    rng = np.random.default_rng(4)
    x0 = jnp.asarray(rng.uniform(0.3, 0.7, size=(NWALKERS, NDIM)).astype(dtype))
    kwargs = dict(state=like_state, lo=chain.min, hi=chain.max,
                  n_leapfrog=n_leapfrog, warmup=HMC_WARMUP,
                  target_accept=target_accept)
    tag = f"acc={target_accept} L={n_leapfrog}"
    if window:
        kwargs.update(scheme="windowed", window=int(window))
        tag += f" W={int(window)}"
    if persist:
        kwargs.update(persist=float(persist))
        tag += f" P={persist}"

    t0 = time.perf_counter()
    res = run_hmc(log_post, x0, HMC_STEPS, jax.random.PRNGKey(0), **kwargs)
    np.asarray(res.final_state)
    log(f"[{tag}] compile+first run: {time.perf_counter() - t0:.1f}s")

    t0 = time.perf_counter()
    res = run_hmc(log_post, res.final_state, HMC_STEPS, jax.random.PRNGKey(1),
                  **kwargs)
    chain_arr = np.asarray(res.chain)
    dt = time.perf_counter() - t0

    taus, convs = zip(*(
        integrated_autocorr_time(chain_arr[:, :, d], return_converged=True)
        for d in range(NDIM)
    ))
    tau = float(np.max(taus))
    ess_per_sec = (NWALKERS * HMC_STEPS / tau) / dt
    acc = float(np.mean(np.asarray(res.acceptance)))
    log(f"[{tag}] {dt:.2f}s, tau {tau:.2f} "
        f"({'converged' if all(convs) else 'WINDOW-LIMITED'}), acc {acc:.3f}, "
        f"eps {res.step_size:.4f}, ESS/s {ess_per_sec:.1f}")
    return ess_per_sec, tau, acc, res.step_size


def main():
    # both directions: lower acceptance -> bigger eps -> fewer gradients
    # per integration time; higher acceptance -> fewer rejection-repeats
    # (tau ~ (1+P_rej)/(1-P_rej) when accepted moves are near-iid, so at
    # acc 0.8 rejections alone explain most of tau ~ 1.9)
    grid = [(0.8, 8, 0, 0.0), (0.7, 7, 0, 0.0), (0.65, 6, 0, 0.0),
            (0.85, 8, 0, 0.0), (0.9, 8, 0, 0.0), (0.9, 9, 0, 0.0)]
    if len(sys.argv) > 1:
        grid = [tuple(map(float, (a.split(":") + ["0", "0"])[:4]))
                for a in sys.argv[1:]]
        grid = [(a, int(l), int(w), p / 100.0) for a, l, w, p in grid]

    log("building flagship problem ...")
    from bench import wait_for_device

    wait_for_device()  # ride out transient tunnel outages
    chain, _, _, _ = build_or_load_chain()
    results = {}
    for acc, L, W, P in grid:
        results[(acc, L, W, P)] = run_config(chain, acc, L, W, P)
    log("==== summary ====")
    for (acc, L, W, P), (ess, tau, a, eps) in sorted(
        results.items(), key=lambda kv: -kv[1][0]
    ):
        log(f"target {acc} L={L} W={W} P={P}: ESS/s {ess:.1f}, "
            f"tau {tau:.2f}, acc {a:.3f}, eps {eps:.4f}")


if __name__ == "__main__":
    main()
