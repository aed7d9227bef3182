"""Measure the bf16 fast-backward (GPConfig.grad_precision) on the real TPU.

For grad_precision in ("high", "default"), reports:
- in-scan value / value+grad posterior throughput (evals/s, 1024 walkers),
- full bench_hmc protocol: ESS/s (warmup charged), tau, acceptance, and the
  warm-start steady-state rate.

The expected picture: identical VALUE throughput (same forward program),
higher val+grad throughput at "default" (1-pass bf16 cotangent matmuls),
and unchanged tau/acceptance -- gradient noise at the 2^-9 level is far
below what the leapfrog integrator error budget notices at eps tuned for
0.8 acceptance.  Run: ``python tools/grad_speed_experiment.py``.
"""

from __future__ import annotations

import sys

import numpy as np

sys.path.insert(0, ".")


def rebind(chain, gp: str) -> None:
    for e in chain.emuList:
        e.gp_config = e.gp_config._replace(grad_precision=gp)
        e._build_predict_fn()
    chain._device_fns = None


def main() -> int:
    import bench
    from gpbayestools_hic_tpu.config import enable_compilation_cache
    from tools.flagship_cache import get_flagship_chain
    from tools.var_precision_experiment import measure

    enable_compilation_cache()
    bench.wait_for_device()
    chain = get_flagship_chain()

    rng = np.random.default_rng(9)
    x_thr = rng.uniform(0.3, 0.7, (1024, chain.ndim))

    for gp in ("high", "default"):
        rebind(chain, gp)
        v_rate, g_rate = measure(chain, x_thr)
        print(f"grad_precision={gp:>7}: value {v_rate:9.0f} ev/s, "
              f"val+grad {g_rate:9.0f} ev/s", flush=True)
        ess, tau, conv, warm_ess, warm_conv = bench.bench_hmc(
            chain, np.float32)
        print(f"  hmc: {ess:8.1f} ESS/s (tau {tau:.2f}, converged {conv}); "
              f"warm {warm_ess:8.1f} ESS/s (converged {warm_conv})",
              flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
