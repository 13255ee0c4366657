"""Merge per-object BOP19 result CSVs into one submission file.

CLI parity with the reference `tools_for_BOP/merge_csv.py` (glob every *.csv
in --input_dir, concatenate, write --output_fn) without the pandas
dependency; the concat itself is `eval/csv_writer.py::merge_csv`.
"""
from __future__ import annotations

import argparse
import glob
import os

from checkerpose_tpu.eval.csv_writer import merge_csv


def main():
    ap = argparse.ArgumentParser(description="merge per-object BOP19 CSVs")
    ap.add_argument("--input_dir", type=str, required=True)
    ap.add_argument("--output_fn", type=str, required=True)
    args = ap.parse_args()

    out = args.output_fn
    if not os.path.isabs(out):
        out = os.path.join(args.input_dir, out)
    paths = sorted(p for p in glob.glob(os.path.join(args.input_dir, "*.csv"))
                   if os.path.abspath(p) != os.path.abspath(out))
    print([os.path.basename(p) for p in paths])
    merge_csv(paths, out)
    print("merged ->", out)


if __name__ == "__main__":
    main()
