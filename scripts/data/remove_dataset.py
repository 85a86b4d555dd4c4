"""Remove a dataset's data and source directories by name
(reference ``scripts/data/remove_dataset.py``)."""

import argparse
import os
import shutil

from blvm_tpu.settings import DATA_DIRECTORY, SOURCE_DIRECTORY


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("name", type=str, help="dataset name (e.g. timit)")
    parser.add_argument("--yes", action="store_true", help="skip confirmation")
    args = parser.parse_args()

    targets = [os.path.join(str(DATA_DIRECTORY), args.name), os.path.join(str(SOURCE_DIRECTORY), args.name)]
    existing = [t for t in targets if os.path.exists(t)]
    if not existing:
        print(f"Nothing to remove for dataset {args.name!r}.")
        return

    if not args.yes:
        answer = input(f"Remove {existing}? [y/N] ")
        if answer.lower() not in ("y", "yes"):
            print("Aborted.")
            return

    for t in existing:
        shutil.rmtree(t)
        print(f"Removed {t}")


if __name__ == "__main__":
    main()
