"""Sort an SMC chain by likelihood and extract posterior k-means clusters.

Mirror of the reference script (examples/generate_posterior_clusters.py:7-93;
SURVEY.md C18).  Run the full pipeline examples first.
"""

from pathlib import Path

import numpy as np

from gpbayestools_hic_tpu.models import Emulator
from gpbayestools_hic_tpu.utils import generate_posterior_clusters

DATA = Path("synthetic_data")
GROUPS = ("dNdy", "meanpT", "vn")

def main(chain_name: str = "chain_smc.pkl", n_clusters: int = 3,
         n_top_samples: int = 1000):
    centers, labels = generate_posterior_clusters(
        DATA / "mcmc" / chain_name,
        n_clusters=n_clusters,
        n_top_samples=n_top_samples,
        output_dir=DATA,
    )
    print("cluster centers (one per row):\n", centers.round(4))
    print(f"centers written to {DATA / 'cluster_centers.txt'} "
          "(one cluster per column, reference layout)")

    # propagate the cluster parameters through the emulators to observables
    # (the reference README's "propagate model uncertainties" step)
    emus = [Emulator.load(DATA / f"emulator_sklearn_{g}.sav") for g in GROUPS]
    preds = np.concatenate(
        [e.predict(centers, return_cov=False) for e in emus], axis=1
    )
    np.savetxt(DATA / "cluster_observables.txt", preds.T)
    print(f"cluster-center observables written to "
          f"{DATA / 'cluster_observables.txt'} (one cluster per column)")


if __name__ == "__main__":
    main()
