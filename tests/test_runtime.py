"""Tests for the L1 runtime layer (parameter parsing, config)."""

import jax.numpy as jnp

from gpbayestools_hic_tpu import parse_model_parameter_file
from gpbayestools_hic_tpu.config import working_dtype, x64_enabled


def test_parse_model_parameter_file(toy_parfile):
    pardict = parse_model_parameter_file(toy_parfile)
    assert list(pardict.keys()) == ["p0", "p1", "p2"]
    assert pardict["p0"] == ["$p_0$", 0.0, 1.0]
    assert pardict["p1"] == ["$p_1$", -2.0, 2.0]
    assert pardict["p2"] == ["$p_2$", 10.0, 30.0]


def test_parse_comment_only_lines_skipped(tmp_path):
    p = tmp_path / "pars.txt"
    p.write_text("# only a comment\nA: a, 1, 2\n\n")
    pardict = parse_model_parameter_file(p)
    assert list(pardict.keys()) == ["A"]


def test_working_dtype_x64():
    assert x64_enabled()
    assert working_dtype() == jnp.float64


def test_version_matches_pyproject():
    """pyproject.toml's static version must track the package version
    (they drifted once: 0.3.2 vs 0.3.8)."""
    import re
    from pathlib import Path

    import gpbayestools_hic_tpu as pkg

    text = (Path(pkg.__file__).parents[1] / "pyproject.toml").read_text()
    m = re.search(r'^version = "([^"]+)"', text, re.M)
    assert m is not None
    assert m.group(1) == pkg.__version__
