"""Measure eval/grad throughput AND f64 posterior error per var_precision.

The predictive-variance product ``v = G @ k_*`` (models/gp.py:_norm_mean_var)
is ~99% of posterior-eval FLOPs on the flagship problem (36 matmuls of
(1000,1000)@(1000,1024) per walker batch).  Since 0.3.0 the quadratic form
is the cancellation-free norm ``|v|^2``, so a relative product error eps
perturbs the PC variance by only ~2 eps -- which re-opens the question this
tool answers empirically: does 1-pass bf16 ("default") now pass the
0.5-log-unit posterior validation, and what throughput does each precision
actually buy on the real chip?

Run on a real TPU: ``python tools/var_precision_experiment.py``.
Prints one line per precision:
  <prec>  value evals/s, value+grad evals/s, max|lp32-lp64|, median err
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, ".")

REPS = 7
BATCH = 1024
NSCAN = 32  # evals per compiled program: amortizes the ~25-30 ms per-call
            # tunnel dispatch latency that otherwise dominates (a single
            # 1024-walker eval takes ~6 us/eval of compute)


def rebind_precision(chain, prec: str) -> None:
    """Point every emulator's predict program at ``var_precision=prec`` and
    rebuild the chain's fused device functions."""
    for e in chain.emuList:
        e.gp_config = e.gp_config._replace(var_precision=prec)
        e._build_predict_fn()
    chain._device_fns = None  # force rebuild against the new programs


def measure(chain, x) -> tuple[float, float]:
    """(value evals/s, value+grad evals/s) on the current device programs.

    Each timed call runs NSCAN posterior evaluations inside ONE compiled
    ``lax.scan`` -- the shape the real samplers execute -- so the number is
    compute throughput, not the tunnel's per-dispatch latency.  The scan
    input is perturbed per iteration so XLA cannot collapse the loop body
    into a single hoisted evaluation."""
    import jax
    import jax.numpy as jnp

    log_post, state = chain.posterior_with_state()
    xd = jnp.asarray(x, dtype=chain._dtype)
    # ks is an ARGUMENT of the jitted programs, not a closure constant: a
    # closed-over device array pays the ~25 ms per-call re-upload this
    # runtime charges (CLAUDE.md), which would put the dispatch latency
    # right back into the timed calls.
    ks = jnp.arange(NSCAN, dtype=xd.dtype)

    @jax.jit
    def scan_val(s, x0, kk):
        def body(acc, k):
            lp = log_post(s, x0 + k * jnp.asarray(1e-6, x0.dtype))
            return acc + jnp.sum(lp), None

        tot, _ = jax.lax.scan(body, jnp.zeros((), x0.dtype), kk)
        return tot

    @jax.jit
    def scan_grad(s, x0, kk):
        def body(acc, k):
            xq = x0 + k * jnp.asarray(1e-6, x0.dtype)
            v, g = jax.value_and_grad(lambda q: jnp.sum(log_post(s, q)))(xq)
            return acc + v + jnp.sum(g), None

        tot, _ = jax.lax.scan(body, jnp.zeros((), x0.dtype), kk)
        return tot

    def timed(fn):
        jax.block_until_ready(fn(state, xd, ks))  # compile + warm
        times = []
        for _ in range(REPS):
            t0 = time.perf_counter()
            jax.block_until_ready(fn(state, xd, ks))
            times.append(time.perf_counter() - t0)
        return BATCH * NSCAN / float(np.median(times))

    return timed(scan_val), timed(scan_grad)


def main() -> int:
    import bench
    from gpbayestools_hic_tpu.config import enable_compilation_cache
    from tools.tpu_validation import f64_log_posterior

    enable_compilation_cache()
    bench.wait_for_device()
    chain, _, _, _ = bench.build_or_load_chain()

    rng = np.random.default_rng(9)
    x_val = rng.uniform(0.3, 0.7, (64, chain.ndim))
    x_thr = rng.uniform(0.3, 0.7, (BATCH, chain.ndim))
    lp64 = f64_log_posterior(chain, x_val)

    print(f"{'prec':>8}  {'value ev/s':>12}  {'val+grad ev/s':>13}  "
          f"{'max err':>9}  {'med err':>9}", flush=True)
    for prec in ("highest", "high", "default"):
        rebind_precision(chain, prec)
        lp32 = np.asarray(chain.log_posterior(x_val))
        err = np.abs(lp32 - lp64)
        v_rate, g_rate = measure(chain, x_thr)
        print(f"{prec:>8}  {v_rate:12.0f}  {g_rate:13.0f}  "
              f"{err.max():9.4f}  {np.median(err):9.4f}", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
