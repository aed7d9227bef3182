"""Side-by-side emulator validation with the E and H metrics.

Mirror of EmulatorValidation.ipynb (SURVEY.md C21): compares the sklearn-GP
head against PCGP and PCSK on held-out points, printing the RMS relative
error E and uncertainty honesty H.  Run ``make_synthetic_dataset.py`` first.
"""

from pathlib import Path

from gpbayestools_hic_tpu.models import Emulator, EmulatorBAND
from gpbayestools_hic_tpu.models.validation import (
    holdout_scan,
    validate_multiple_emulators,
)

DATA = Path("synthetic_data")


def main(group: str = "dNdy", n_test_points: int = 20,
         test_sizes=(10, 30, 60)):
    train_pkl = str(DATA / f"training_data_{group}.pkl")
    parfile = str(DATA / "model_params.txt")
    factories = {
        "sklearn-GP": lambda: Emulator(train_pkl, parfile, npc=4),
        "PCGP": lambda: EmulatorBAND(train_pkl, parfile, method="PCGP"),
        "PCSK": lambda: EmulatorBAND(train_pkl, parfile, method="PCSK"),
    }
    results = validate_multiple_emulators(factories, n_test_points=n_test_points)
    print(f"\n{'variant':12s} {'mean E':>8s} {'<log H>':>8s}")
    for name, res in results.items():
        print(f"{name:12s} {res['mean_E']:8.4f} {res['mean_log_H']:8.3f}")

    scan = holdout_scan(
        lambda: Emulator(train_pkl, parfile, npc=4), test_sizes=test_sizes
    )
    print("\nholdout scan:", dict(zip(scan["test_sizes"], scan["mean_E"].round(4))))


if __name__ == "__main__":
    main()
