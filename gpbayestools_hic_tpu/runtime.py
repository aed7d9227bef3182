"""Common runtime: logging, working directories, parameter-file parsing.

Replaces the reference's L1 layer (/root/reference/src/__init__.py:1-33) with
the same environment contract:

- ``LOGLEVEL`` env var selects the stdout logging level (default ``info``).
- ``WORKDIR`` env var selects the working directory (default ``.``); a
  ``cache`` subdirectory is used for memoized artifacts such as LHS designs.
- Parameter files are plain text, one parameter per line::

      name: label, min, max   # optional comment

  parsed into ``{name: [label, float(min), float(max)]}``
  (reference: src/__init__.py:21-33).

Unlike the reference, directory creation is lazy (no import-time mkdir side
effect) and JAX precision configuration lives in :mod:`.config`.
"""

from __future__ import annotations

import logging
import os
import sys
from pathlib import Path

_LOG_CONFIGURED = False


def _configure_logging() -> None:
    global _LOG_CONFIGURED
    if _LOG_CONFIGURED:
        return
    logging.basicConfig(
        stream=sys.stdout,
        format="[%(levelname)s][%(module)s] %(message)s",
        level=os.getenv("LOGLEVEL", "info").upper(),
    )
    _LOG_CONFIGURED = True


_configure_logging()

workdir = Path(os.getenv("WORKDIR", "."))


def _cachedir() -> Path:
    """Cache directory under the workdir (created on first use)."""
    path = workdir / "cache"
    path.mkdir(parents=True, exist_ok=True)
    return path


class _LazyCacheDir:
    """Path-like proxy that creates the cache dir on first real use."""

    def __fspath__(self) -> str:
        return str(_cachedir())

    def __truediv__(self, other) -> Path:
        return _cachedir() / other

    def __str__(self) -> str:
        return str(workdir / "cache")

    def __repr__(self) -> str:
        return f"LazyCacheDir({str(self)!r})"


cachedir = _LazyCacheDir()


def parse_model_parameter_file(parfile) -> dict:
    """Parse a model-parameter file into ``{name: [label, min, max]}``.

    Same text format and semantics as the reference parser
    (src/__init__.py:21-33): ``#`` starts a comment, each non-empty line is
    ``name: label, min, max`` and min/max are converted to float.
    """
    pardict = {}
    with open(parfile, "r") as f:
        for lineno, line in enumerate(f, start=1):
            par = line.split("#")[0]
            if par == "" or par.strip() == "":
                continue
            name, sep, rest = par.partition(":")
            vals = [v.strip() for v in rest.split(",")]
            if not sep or len(vals) < 3:
                raise ValueError(
                    f"{parfile}:{lineno}: expected 'name: label, min, max', "
                    f"got {line.strip()!r}"
                )
            try:
                vals[1] = float(vals[1])
                vals[2] = float(vals[2])
            except ValueError as e:
                raise ValueError(
                    f"{parfile}:{lineno}: min/max must be numbers in "
                    f"{line.strip()!r}"
                ) from e
            pardict[name] = vals
    return pardict
