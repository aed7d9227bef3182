"""Build-or-load the flagship benchmark Chain from an on-disk cache.

gp_fit's remote compile on the shared axon tunnel costs minutes (CLAUDE.md);
Emulator.save/load round-trips skip it entirely.  First call trains the
flagship problem once (bench.build_chain) and saves the nine emulators plus
the parameter/exp-data files under ``cache/flagship/``; later processes
reconstruct the identical Chain in seconds.

Usage from a tool:

    from tools.flagship_cache import get_flagship_chain
    chain = get_flagship_chain()
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CACHE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "cache", "flagship",
)


def get_flagship_chain(cache_dir: str = CACHE_DIR):
    """Flagship Chain (bench.py shapes), from cache when available."""
    from gpbayestools_hic_tpu.models import Emulator
    from gpbayestools_hic_tpu.samplers import Chain

    import bench

    marker = os.path.join(cache_dir, "ok")
    n_emus = len(bench.BLOCKS)
    if os.path.exists(marker):
        tmp = tempfile.mkdtemp(prefix="flagship_cached_")
        chain = Chain(
            mcmc_path=os.path.join(tmp, "mcmc", "chain.pkl"),
            expdata_path=os.path.join(cache_dir, "exp.pkl"),
            model_parafile=os.path.join(cache_dir, "pars.txt"),
        )
        chain.loadEmulator(
            [os.path.join(cache_dir, f"emu{i}.npz") for i in range(n_emus)]
        )
        return chain

    from gpbayestools_hic_tpu.utils.synthetic import build_synthetic_chain

    src_dir = tempfile.mkdtemp(prefix="bench_flagship_")
    chain, _ = build_synthetic_chain(
        nev=bench.NEV, ndim=bench.NDIM, nobs_blocks=bench.BLOCKS,
        npc=bench.NPC, gp_maxiter=30, seed=0, tmpdir=src_dir,
    )
    os.makedirs(cache_dir, exist_ok=True)
    for name in ("pars.txt", "exp.pkl"):
        shutil.copy(os.path.join(src_dir, name), os.path.join(cache_dir, name))
    for i, e in enumerate(chain.emuList):
        e.save(os.path.join(cache_dir, f"emu{i}.npz"))
    with open(marker, "w") as f:
        f.write("flagship cache complete\n")
    return chain
