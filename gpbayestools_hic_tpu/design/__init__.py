"""L2 experiment design: native Latin-hypercube generation."""

from .lhd import Design, generate_lhs  # noqa: F401
