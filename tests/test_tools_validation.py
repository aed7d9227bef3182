"""Guard the f64 ground-truth evaluator behind tools/tpu_validation.

``f64_log_posterior`` is the foundation of the on-hardware precision gate
(and of tools/var_precision_experiment.py): it must reproduce exactly what
the fused device program computes.  On CPU with x64 enabled both paths run
in float64, so they must agree to round-off -- any drift here means the
validator is checking the wrong quantity.
"""

import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]


def _import_f64():
    sys.path.insert(0, str(REPO))
    try:
        from tools.tpu_validation import f64_log_posterior
    finally:
        sys.path.remove(str(REPO))
    return f64_log_posterior


def test_f64_ground_truth_matches_fused_program(tmp_path):
    f64_log_posterior = _import_f64()
    from gpbayestools_hic_tpu.utils.synthetic import build_synthetic_chain

    chain, _ = build_synthetic_chain(
        nev=30, ndim=3, nobs_blocks=(5, 8), npc=2, gp_maxiter=12, seed=3,
        tmpdir=str(tmp_path),
    )
    x = np.random.default_rng(7).uniform(0.25, 0.75, (16, chain.ndim))
    lp_dev = np.asarray(chain.log_posterior(x))
    lp64 = f64_log_posterior(chain, x)
    np.testing.assert_allclose(lp_dev, lp64, rtol=1e-9, atol=1e-6)
