"""Build-or-load the flagship benchmark Chain from the on-disk cache.

Thin delegate to :func:`bench.build_or_load_chain` (the cache now lives in
bench.py itself so the benchmark is driver-proof -- VERDICT r3 item 1).
gp_fit's remote compile on the shared axon tunnel costs minutes (CLAUDE.md);
``Emulator.save``/``load`` round-trips skip it entirely: the first call
trains the flagship problem once and saves the nine emulators plus the
parameter/exp-data files under ``cache/flagship/``; later processes
reconstruct the identical Chain in seconds.

Usage from a tool:

    from tools.flagship_cache import get_flagship_chain
    chain = get_flagship_chain()
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench

CACHE_DIR = bench.CACHE_DIR


def get_flagship_chain(cache_dir: str = CACHE_DIR):
    """Flagship Chain (bench.py shapes), from cache when available.

    Skips the split-timing warm retrain on a cold cache (that second
    joint fit exists only to separate compile from compute for the bench
    record, which tools don't need)."""
    chain, _, _, _ = bench.build_or_load_chain(
        cache_dir=cache_dir, measure_timings=False
    )
    return chain
