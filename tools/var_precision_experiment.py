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

REPS = 30
BATCH = 1024


def rebind_precision(chain, prec: str) -> None:
    """Point every emulator's predict program at ``var_precision=prec`` and
    rebuild the chain's fused device functions."""
    for e in chain.emuList:
        e.gp_config = e.gp_config._replace(var_precision=prec)
        e._build_predict_fn()
    chain._device_fns = None  # force rebuild against the new programs


def measure(chain, x, key) -> tuple[float, float]:
    """(value evals/s, value+grad evals/s) on the current device programs."""
    import jax
    import jax.numpy as jnp

    log_post, state = chain.posterior_with_state()
    xd = jnp.asarray(x, dtype=chain._dtype)

    val_fn = jax.jit(log_post)
    grad_fn = jax.jit(
        lambda s, q: jax.value_and_grad(lambda qq: jnp.sum(log_post(s, qq)))(q)
    )

    def timed(fn, *args):
        out = fn(*args)
        jax.block_until_ready(out)  # compile + warm
        times = []
        for _ in range(REPS):
            t0 = time.perf_counter()
            jax.block_until_ready(fn(*args))
            times.append(time.perf_counter() - t0)
        return BATCH / float(np.median(times))

    return timed(val_fn, state, xd), timed(grad_fn, state, xd)


def main() -> int:
    import bench
    from gpbayestools_hic_tpu.config import enable_compilation_cache
    from tools.tpu_validation import f64_log_posterior

    enable_compilation_cache()
    bench.wait_for_device()
    chain, _ = bench.build_chain()

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
        v_rate, g_rate = measure(chain, x_thr, None)
        print(f"{prec:>8}  {v_rate:12.0f}  {g_rate:13.0f}  "
              f"{err.max():9.4f}  {np.median(err):9.4f}", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
