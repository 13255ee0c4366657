#!/usr/bin/env python3
"""Aggregate cutover eval reports into one markdown table.

Scans eval-output directories (each variant subdir holds the
``report_*.json`` that ``cli.test`` / ``cli.test_lm`` write) and prints ONE
STACKED ROW PER VARIANT (hard/adaptive variants appear as adjacent rows for
comparison, not merged columns). Per-bit errors render for single-object
reports and for the LM AVERAGE row (test_lm keeps bit_err at the report's
top level; per-object sub-dicts carry only pose metrics, so their bits
column is "—" by construction). Tolerant of missing fields so it works on
partial sweeps.

Usage:
    python tools/make_round_report.py [dir ...]   # default: eval_output_synth_r4
"""
from __future__ import annotations

import glob
import json
import os
import sys


def _fmt(v, nd=3):
    if isinstance(v, (int, float)):
        return f"{v:.{nd}f}"
    return "—"


def _row(tag, rep):
    if "adx10" in rep:          # already a flat metrics dict (LM per-object)
        mode = rep
    else:
        mode = rep.get("visib") or rep.get("full") or rep.get("none") or {}
    be = rep.get("bit_err")
    if isinstance(be, list) and len(be) >= 3:
        L = (len(be) - 1) // 2
        bits = " ".join(f"{v:.2f}" for v in be[1:1 + L])
    else:
        bits = "—"
    return (f"| {tag} | {_fmt(mode.get('adx10'))} | {_fmt(mode.get('adx05'))} "
            f"| {_fmt(mode.get('adx02'))} | {_fmt(mode.get('auc_posecnn'))} "
            f"| {_fmt(mode.get('mean_re_deg'), 1)} | {_fmt(mode.get('mean_te_mm'), 1)} "
            f"| {_fmt(mode.get('rete2'))} | {_fmt(mode.get('rete5'))} | {bits} |")


def collect(root):
    rows = []
    for rp in sorted(glob.glob(os.path.join(root, "*", "report_*.json"))):
        variant = os.path.basename(os.path.dirname(rp))
        with open(rp) as f:
            rep = json.load(f)
        # test_lm writes {"per_object": {name: flat}, "average": flat};
        # test writes a flat per-mode report
        if "per_object" in rep:
            for obj, sub in sorted(rep["per_object"].items()):
                rows.append(_row(f"{variant}/{obj}", sub))
            if "average" in rep:
                avg = dict(rep["average"])
                # bit_err lives at the full report's top level, not in the
                # per-object/average sub-dicts — surface it on the AVERAGE row
                if "bit_err" in rep and "bit_err" not in avg:
                    avg["bit_err"] = rep["bit_err"]
                rows.append(_row(f"{variant}/AVERAGE", avg))
        else:
            rows.append(_row(variant, rep))
    return rows


def main():
    roots = sys.argv[1:] or ["eval_output_synth_r4"]
    print("| variant | adx10 | adx05 | adx02 | AUC | re° | te mm | rete2 | rete5 | x bit_err MSB→LSB |")
    print("|---|---|---|---|---|---|---|---|---|---|")
    for root in roots:
        for row in collect(root):
            print(row)


if __name__ == "__main__":
    main()
