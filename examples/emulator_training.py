"""Train and serialize emulators per observable group.

Mirror of EmulatorTraining.ipynb (SURVEY.md C20): one emulator per group,
trained and saved as array pytrees (replacing the reference's dill dumps).
Run ``make_synthetic_dataset.py`` first.
"""

from pathlib import Path

from gpbayestools_hic_tpu.models import Emulator, EmulatorBAND

DATA = Path("synthetic_data")
GROUPS = ("dNdy", "meanpT", "vn")


def main():
    parfile = DATA / "model_params.txt"
    for group in GROUPS:
        train_pkl = DATA / f"training_data_{group}.pkl"

        emu = Emulator(str(train_pkl), str(parfile), npc=4)
        emu.trainEmulatorAutoMask()
        emu.save(DATA / f"emulator_sklearn_{group}.sav")

        pcsk = EmulatorBAND(str(train_pkl), str(parfile), method="PCSK")
        pcsk.trainEmulatorAutoMask()
        pcsk.save(DATA / f"emulator_pcsk_{group}.sav")
        print(f"{group}: sklearn-head LML {emu.gp_state.lml.sum():.1f}, "
              f"PCSK {pcsk._npc_used} PCs")


if __name__ == "__main__":
    main()
