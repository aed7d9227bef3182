"""Stage-by-stage on-chip profile of the flagship gp_fit program.

Times, on the real TPU at flagship shapes (36 GPs x 1000 points x 17 dims,
the bench.py joint-training batch):

- gram:      batched kernel matrix build (36, 1000, 1000)
- chol:      gram + XLA batched Cholesky
- nll:       full gp_nll forward (gram + chol + solve + logdet)
- nll+grad:  value_and_grad of gp_nll -- the per-line-search-trial cost
             that dominates hyperparameter fitting
- finalize:  finalize_gp_state (rescue chol + whitened solve + explicit
             L^-1 via triangular solve against I)
- gp_fit:    the whole vmapped L-BFGS fit at maxiter=30 (bench setting)

Each timed program wraps NSCAN iterations in one lax.scan (inputs perturbed
per iteration) so the ~25-30 ms per-dispatch tunnel latency is amortized
out of every number.  Run: ``python tools/gp_fit_profile.py``.
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, ".")

NPC = 36
N = 1000
D = 17
MAXITER = 30
NSCAN = 8
REPS = 5


def main() -> int:
    import bench  # noqa: F401  (device wait helper)
    from gpbayestools_hic_tpu.config import enable_compilation_cache

    enable_compilation_cache()
    bench.wait_for_device()

    import jax
    import jax.numpy as jnp

    from gpbayestools_hic_tpu.models.gp import (
        GPConfig, _build_k, _pack, finalize_gp_state, gp_fit, gp_nll,
        init_kernel_params,
    )

    config = GPConfig()
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(0, 1, (N, D)), jnp.float32)
    y = jnp.asarray(rng.standard_normal((NPC, N)), jnp.float32)
    ptp = jnp.ones((D,), jnp.float32)
    theta0 = _pack(init_kernel_params(ptp, dtype=jnp.float32))
    thetas = jnp.tile(theta0[None], (NPC, 1))
    nd = jnp.zeros((NPC, N), jnp.float32)

    from gpbayestools_hic_tpu.models.gp import _unpack

    def unpack_b(tb):
        return jax.vmap(lambda v: _unpack(v, D))(tb)

    def gram_b(tb, yb):
        p = unpack_b(tb)
        return jax.vmap(lambda pp, yy, nn: _build_k(pp, x, config, nn))(
            p, yb, nd
        )

    def chol_b(tb, yb):
        return jnp.linalg.cholesky(gram_b(tb, yb))

    def nll_b(tb, yb):
        p = unpack_b(tb)
        return jax.vmap(
            lambda pp, yy, nn: gp_nll(pp, x, yy, config, nn)
        )(p, yb, nd)

    def nllgrad_b(tb, yb):
        return jax.value_and_grad(lambda t: jnp.sum(nll_b(t, yb)))(tb)

    def finalize_b(tb, yb):
        p = unpack_b(tb)
        st = finalize_gp_state(p, x, yb, config, nd)
        return st.lml, st.linv

    def scan_wrap(fn):
        @jax.jit
        def run(tb, yb, ks):
            def body(acc, k):
                out = fn(tb + k * jnp.asarray(1e-6, tb.dtype), yb)
                leaves = jax.tree.leaves(out)
                s = sum(jnp.sum(l) for l in leaves if l.dtype.kind == "f")
                return acc + s, None

            tot, _ = jax.lax.scan(body, jnp.zeros((), tb.dtype), ks)
            return tot

        return run

    ks = jnp.arange(NSCAN, dtype=jnp.float32)

    def timed(name, fn, nscan=NSCAN):
        run = scan_wrap(fn)
        kk = ks[:nscan]
        t0 = time.perf_counter()
        jax.block_until_ready(run(thetas, y, kk))
        compile_s = time.perf_counter() - t0
        times = []
        for _ in range(REPS):
            t0 = time.perf_counter()
            jax.block_until_ready(run(thetas, y, kk))
            times.append(time.perf_counter() - t0)
        per = float(np.median(times)) / nscan
        print(f"{name:>10}: {per * 1e3:9.2f} ms/call   "
              f"(compile {compile_s:.1f}s)", flush=True)
        return per

    timed("gram", gram_b)
    timed("chol", chol_b)
    timed("nll", nll_b)
    timed("nll+grad", nllgrad_b)
    timed("finalize", finalize_b, nscan=2)

    # whole fit (one call, no scan: it is already 15 s scale)
    fit = jax.jit(
        lambda xx, yb: gp_fit(xx, yb, ptp, config=config, maxiter=MAXITER)
    )
    t0 = time.perf_counter()
    jax.block_until_ready(fit(x, y))
    print(f"{'gp_fit':>10}: compile+run {time.perf_counter() - t0:.1f}s",
          flush=True)
    t0 = time.perf_counter()
    jax.block_until_ready(fit(x, y + 1e-6))
    print(f"{'gp_fit':>10}: warm {time.perf_counter() - t0:.2f}s", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
