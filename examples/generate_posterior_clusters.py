"""Sort an SMC chain by likelihood and extract posterior k-means clusters.

Mirror of the reference script (examples/generate_posterior_clusters.py:7-93;
SURVEY.md C18).  Run the full pipeline examples first.
"""

from pathlib import Path

from gpbayestools_hic_tpu.utils import generate_posterior_clusters

DATA = Path("synthetic_data")

if __name__ == "__main__":
    centers, labels = generate_posterior_clusters(
        DATA / "mcmc" / "chain_smc.pkl",
        n_clusters=3,
        n_top_samples=1000,
        output_dir=DATA,
    )
    print("cluster centers (one per row):\n", centers.round(4))
    print(f"centers written to {DATA / 'cluster_centers.txt'} "
          "(one cluster per column, reference layout)")
