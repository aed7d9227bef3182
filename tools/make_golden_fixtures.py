"""Generate the committed golden fixtures pinning the BAND heads' numerics.

Run on forced-CPU x64 JAX (deterministic LAPACK/XLA path):

    python tools/make_golden_fixtures.py

Writes ``tests/fixtures/band_golden.npz``: for each method (PCGP, PCSK) on a
fixed synthetic dataset, the fitted per-PC hyperparameters and the
predictions (mean + covariance diagonal) at fixed query points.  The paired
test ``tests/test_emulator_band.py::test_band_heads_match_golden_fixtures``
fails on any numerical drift of the rebuilt surmise heads (VERDICT round 1,
item 4; derivation notes in docs/SURMISE_PARITY.md).
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402


def build(out_path):
    from gpbayestools_hic_tpu.models import EmulatorBAND
    from gpbayestools_hic_tpu.utils.synthetic import (
        write_parameter_file,
        write_training_pickle,
    )

    rng = np.random.default_rng(20240816)
    nev, ndim, nobs = 50, 3, 10
    design = rng.uniform(0, 1, size=(nev, ndim))
    freqs = rng.uniform(1, 3, size=(ndim, nobs))
    base = 2.0 + np.sin(design @ freqs) + 0.3 * (design**2) @ freqs
    err = 0.02 * np.abs(base) * rng.uniform(0.5, 1.0, size=base.shape)
    xq = rng.uniform(0.1, 0.9, size=(6, ndim))

    tmp = tempfile.mkdtemp()
    parfile = write_parameter_file(os.path.join(tmp, "pars.txt"), ndim)
    pkl = write_training_pickle(
        os.path.join(tmp, "train.pkl"), design, base, err
    )

    out = {"design": design, "base": base, "err": err, "xq": xq}
    # third variant: surmise's own covariance family + MAP objective
    # (docs/SURMISE_PARITY.md items 5-6 as a selectable configuration)
    variants = [
        ("PCGP", {}),
        ("PCSK", {}),
        ("PCGP_surmise", dict(method="PCGP", kernel_kind="MaternProd",
                              map_prior_strength=1.0)),
    ]
    for tag, extra in variants:
        kwargs = dict(method=tag) if not extra else extra
        emu = EmulatorBAND(pkl, parfile, **kwargs)
        emu.trainEmulatorAutoMask()
        mean, cov = emu.predict(xq)
        out[f"{tag}_mean"] = mean
        out[f"{tag}_covdiag"] = np.diagonal(cov, axis1=1, axis2=2)
        out[f"{tag}_npc"] = np.asarray(emu._npc_used)
        for k, v in emu.gp_state.params.items():
            out[f"{tag}_{k}"] = np.asarray(v)
        print(tag, "npc =", int(emu._npc_used), "mean[0,:3] =", mean[0, :3])
    np.savez(out_path, **out)
    print("wrote", out_path)


if __name__ == "__main__":
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    dest = os.path.join(here, "tests", "fixtures", "band_golden.npz")
    os.makedirs(os.path.dirname(dest), exist_ok=True)
    build(dest)
