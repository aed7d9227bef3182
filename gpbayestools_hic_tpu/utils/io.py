"""Host-side IO honoring the reference's on-disk data contracts.

Contracts (SURVEY.md section 1):

1. Training pickle: ``{event_id(str-int): {"parameter": (ndim,),
   "obs": (2, nobs)}}`` with row 0 = mean, row 1 = stat error
   (reference loader: src/emulator.py:378-415, src/emulator_BAND.py:73-108,
   src/mcmc.py:302-324).
2. Chain pickle: ``{"chain": (nwalkers, nsteps, ndim)}``; SMC adds
   ``weights, logl, logp, logz, logz_err`` (src/mcmc.py:414-426, 816-819).
3. Serialized emulator: here a *pytree of arrays* (not a dill'd Python
   object) -- robust across versions, loadable on any backend.
"""

from __future__ import annotations

import logging
import pickle
from typing import NamedTuple

import numpy as np

logger = logging.getLogger(__name__)


class TrainingData(NamedTuple):
    design_points: np.ndarray      # (nev, ndim) possibly-transformed copy
    design_points_org: np.ndarray  # (nev, ndim) original parameters
    model_data: np.ndarray         # (nev, nobs) observables (log if logTrafo)
    model_data_err: np.ndarray     # (nev, nobs) stat errors (relative if logTrafo)
    discarded: int                 # number of high-noise points dropped


def load_training_pickle(
    path,
    *,
    max_rel_uncertainty: float = 0.1,
    log_trafo: bool = False,
) -> TrainingData:
    """Load a training pickle with the reference's filter/transform semantics.

    - events sorted by integer id (src/emulator.py:388);
    - events whose max relative stat error exceeds ``max_rel_uncertainty``
      are discarded (src/emulator.py:393-397);
    - with ``log_trafo``: data -> ``log(|y| + 1e-30)`` and errors -> relative
      errors ``|err / (y + 1e-30)|`` (src/emulator.py:400-407);
    - errors pass through ``nan_to_num(abs(.))`` (src/emulator.py:411-412).
    """
    logger.info("loading training data from %s ...", path)
    with open(path, "rb") as fp:
        data_dict = pickle.load(fp)

    sorted_ids = sorted(data_dict.keys(), key=lambda x: int(x))
    design, data, err = [], [], []
    discarded = 0
    for event_id in sorted_ids:
        obs = np.asarray(data_dict[event_id]["obs"]).transpose()  # (nobs, 2)
        stat_err_max = np.abs(obs[:, 1] / (obs[:, 0] + 1e-16)).max()
        if stat_err_max > max_rel_uncertainty:
            logger.info(
                "Discard Parameter %s, stat err = %.2f", event_id, stat_err_max
            )
            discarded += 1
            continue
        design.append(np.asarray(data_dict[event_id]["parameter"], dtype=float))
        if log_trafo:
            data.append(np.log(np.abs(obs[:, 0]) + 1e-30))
            err.append(np.abs(obs[:, 1] / (obs[:, 0] + 1e-30)))
        else:
            data.append(obs[:, 0])
            err.append(obs[:, 1])
    design = np.array(design)
    data = np.array(data)
    err = np.nan_to_num(np.abs(np.array(err)))
    logger.info(
        "Training dataset size: %d, discarded points: %d", len(data), discarded
    )
    if len(data) == 0:
        raise ValueError(
            f"all {discarded} training points were discarded by the "
            f"max_rel_uncertainty={max_rel_uncertainty} noise filter; "
            "raise the threshold or check the error columns"
        )
    return TrainingData(
        design_points=design,
        design_points_org=design.copy(),
        model_data=data,
        model_data_err=err,
        discarded=discarded,
    )


def load_exp_data_pickle(path) -> tuple[np.ndarray, np.ndarray]:
    """Load experimental data: returns (mean (1, nobs), diagonal cov (nobs, nobs)).

    Mirrors the reference (src/mcmc.py:302-324): covariance is built
    diagonal-only from the squared stat errors; dense blocks may be added by
    the caller.
    """
    with open(path, "rb") as fp:
        data_dict = pickle.load(fp)
    if len(data_dict) != 1:
        # the (reference-inherited) covariance assembly is only meaningful
        # for ONE event: with several, fill_diagonal would silently truncate
        # the flattened errors to the first event's and the returned mean
        # would violate the (1, nobs) contract -- fail loudly instead of
        # computing garbage likelihoods (the reference has the same flaw
        # silently, src/mcmc.py:302-324)
        raise ValueError(
            f"experimental-data pickle {path} has {len(data_dict)} event "
            "entries; exactly one is supported (concatenate observables "
            "into a single event's 'obs' array instead)"
        )
    means, errs = [], []
    for event_id in data_dict.keys():
        obs = np.asarray(data_dict[event_id]["obs"]).transpose()
        means.append(obs[:, 0])
        errs.append(obs[:, 1])
    means = np.array(means)
    errs = np.nan_to_num(np.abs(np.array(errs))).flatten()
    nobs = means.shape[1]
    cov = np.zeros((nobs, nobs))
    np.fill_diagonal(cov, errs**2)
    return means, cov


def _to_numpy_tree(tree):
    import jax

    return jax.tree.map(lambda x: np.asarray(x), tree)


def save_pytree(path, tree, meta: dict | None = None) -> None:
    """Serialize a pytree of arrays (+ static metadata) to a pickle file."""
    payload = {"tree": _to_numpy_tree(tree), "meta": meta or {}}
    with open(path, "wb") as f:
        pickle.dump(payload, f)


def load_pytree(path):
    """Load a pytree saved by :func:`save_pytree`; returns (tree, meta)."""
    with open(path, "rb") as f:
        payload = pickle.load(f)
    return payload["tree"], payload["meta"]


def delete_parameters_from_pickle(in_path, out_path, param_indices) -> int:
    """Remove parameter columns from a training pickle, write a new file.

    Library version of the reference's parameter-deletion workflow
    (EmulatorTraining.ipynb cells 15-16: dropping bulk_max_rhob2/4 from every
    dataset).  Returns the number of events written.
    """
    with open(in_path, "rb") as f:
        data = pickle.load(f)
    keep = None
    for event_id, entry in data.items():
        params = np.asarray(entry["parameter"])
        if keep is None:
            keep = np.delete(np.arange(params.shape[0]), list(param_indices))
        entry["parameter"] = params[keep]
    with open(out_path, "wb") as f:
        pickle.dump(data, f)
    logger.info(
        "wrote %s with parameters %s removed (%d events)",
        out_path, list(param_indices), len(data),
    )
    return len(data)
