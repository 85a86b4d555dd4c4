"""Create random subsets of a source file by cumulative sample length.

Rebuild of reference ``scripts/data/create_short_subsets.py``: sample rows
until the cumulative audio length reaches the budget (57.6M samples = 1h at
16 kHz), writing e.g. ``train_1h.txt``/``train_10m.txt``.
"""

import argparse
import csv
import os
import random

from blvm_tpu.settings import SOURCE_DIRECTORY


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--source", type=str, required=True, help="source file path or name under SOURCE_DIRECTORY")
    parser.add_argument("--length_field", type=str, default="length.wav.samples")
    parser.add_argument("--hours", type=float, nargs="+", default=[1.0, 1 / 6], help="subset sizes in hours")
    parser.add_argument("--sample_rate", type=int, default=16000)
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args()

    source = args.source if os.path.exists(args.source) else os.path.join(str(SOURCE_DIRECTORY), args.source)
    with open(source, newline="") as f:
        reader = csv.DictReader(f)
        fieldnames = reader.fieldnames
        rows = list(reader)

    rng = random.Random(args.seed)
    for hours in args.hours:
        budget = int(hours * 3600 * args.sample_rate)
        order = rows[:]
        rng.shuffle(order)

        picked, total = [], 0
        for row in order:
            length = int(float(row[args.length_field]))
            if total + length > budget and picked:
                break
            picked.append(row)
            total += length

        tag = f"{int(hours)}h" if hours >= 1 else f"{int(hours * 60)}m"
        out = source.replace(".txt", f"_{tag}.txt")
        with open(out, "w", newline="") as f:
            writer = csv.DictWriter(f, fieldnames=fieldnames)
            writer.writeheader()
            writer.writerows(picked)
        print(f"Saved {out}: {len(picked)} examples, {total / args.sample_rate / 3600:.2f} hours")


if __name__ == "__main__":
    main()
