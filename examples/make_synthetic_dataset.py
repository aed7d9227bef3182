"""Build a synthetic heavy-ion-like calibration dataset.

Produces the reference's on-disk contracts so every other example runs
without the (expensive, external) physics simulator:

- ``training_data_<group>.pkl``: {event_id: {"parameter", "obs" (2, nobs)}}
- ``exp_data.pkl``: one pseudo-experiment assembled from a held-out truth
  point (the closure-test construction, EmulatorTraining.ipynb cells 9-12)
- ``model_params.txt``: the parameter space

Observable groups mimic the flagship block structure (several observable
families per beam energy).
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

GROUPS = {"dNdy": 10, "meanpT": 8, "vn": 6}
NDIM = 6
NPOINTS = 120


def smooth_model(design, freqs, amps):
    return 2.0 + amps * np.sin(design @ freqs) + 0.2 * (design**2) @ freqs


def main(outdir="synthetic_data", seed=1):
    out = Path(outdir)
    out.mkdir(exist_ok=True)
    rng = np.random.default_rng(seed)

    # the on-disk contracts live in utils/synthetic (single source of
    # truth shared with bench.py / tools); this example only composes them
    from gpbayestools_hic_tpu.utils.synthetic import (
        write_exp_pickle, write_parameter_file, write_training_pickle,
    )

    parfile = out / "model_params.txt"
    write_parameter_file(parfile, NDIM)

    design = rng.uniform(0, 1, size=(NPOINTS, NDIM))
    truth = rng.uniform(0.35, 0.65, size=NDIM)
    np.savetxt(out / "truth_parameters.txt", truth)

    exp_blocks = []
    for group, nobs in GROUPS.items():
        freqs = rng.uniform(0.5, 2.0, size=(NDIM, nobs))
        amps = rng.uniform(0.5, 1.5)
        base = smooth_model(design, freqs, amps)
        err = 0.02 * np.abs(base) * rng.uniform(0.5, 1.0, size=base.shape)
        noisy = base + err * rng.normal(size=base.shape)
        write_training_pickle(
            out / f"training_data_{group}.pkl", design, noisy, err
        )
        exp_blocks.append(smooth_model(truth[None], freqs, amps)[0])

    exp_mean = np.concatenate(exp_blocks)
    exp_err = 0.03 * np.abs(exp_mean)
    write_exp_pickle(out / "exp_data.pkl", exp_mean, exp_err)
    print(f"synthetic dataset written to {out}/ "
          f"({len(GROUPS)} groups, truth at {np.round(truth, 3)})")


if __name__ == "__main__":
    main()
