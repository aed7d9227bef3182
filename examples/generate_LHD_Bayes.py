"""Generate a Latin-hypercube design and write per-point input files.

Mirror of the reference script (examples/generate_LHD_Bayes.py:1-10), using
the native maximin/MaxPro generator instead of the R subprocess.
"""

from pathlib import Path

from gpbayestools_hic_tpu.design import Design

def main(npoints: int = 100, seed: int = 42):
    design = Design(
        Path(__file__).parent / "modelDesign_example.txt",
        npoints=npoints,
        seed=seed,
    )
    design.write_files(Path("./design_points"))
    print(f"wrote {len(design.points)} design points to ./design_points/main")


if __name__ == "__main__":
    main()
