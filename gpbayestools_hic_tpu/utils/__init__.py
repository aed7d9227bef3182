"""Shared utilities: IO contracts, metrics, clustering, sensitivity."""

from .io import load_training_pickle, load_exp_data_pickle, save_pytree, load_pytree  # noqa: F401
