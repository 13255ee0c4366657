"""Legacy ZebraPose correspondence-dict utilities.

The reference keeps a vestigial tool that coarsens 16-bit ZebraPose
class-id -> 3D-point dicts by averaging the children of each coarser cell
(`binary_code_helper/generate_new_dict.py:4-33`). Provided for data
compatibility with ZebraPose-era artifacts.
"""
from __future__ import annotations

import numpy as np


def coarsen_corres_dict(dict_16bit: dict, new_bits: int) -> dict:
    """{id16: (3,) point} -> {id_new: mean of its 2**(16-new_bits) children}."""
    assert 0 < new_bits <= 16
    shift = 16 - new_bits
    out = {}
    acc = {}
    cnt = {}
    for cid, pt in dict_16bit.items():
        nid = int(cid) >> shift
        acc[nid] = acc.get(nid, np.zeros(3)) + np.asarray(pt, np.float64)
        cnt[nid] = cnt.get(nid, 0) + 1
    for nid in acc:
        out[nid] = acc[nid] / cnt[nid]
    return out


def load_corres_dict(path: str):
    """Parse a ZebraPose class-id -> 3D-point txt dict.

    Format (reference `binary_code_helper/CNN_output_to_pose.py:6-28`):
    a header line `total_classes divide_per_iter n_iters`, then one
    `class_id x y z` line per entry. Returns
    (total_classes, divide_per_iter, n_iters, {int id: (3,) float64 array}).
    Ids are ints here (the reference keeps them as floats, an artifact of
    its float() parsing); values are mm-scale model points.
    """
    table = {}
    with open(path, "r") as f:
        header = f.readline().split()
        if len(header) != 3:
            raise ValueError(f"bad legacy dict header in {path!r}: {header}")
        total_classes, divide_per_iter, n_iters = (float(v) for v in header)
        for ln, line in enumerate(f, start=2):
            parts = line.split()
            if not parts:
                continue
            if len(parts) != 4:
                raise ValueError(f"{path}:{ln}: expected 'id x y z', got {line!r}")
            cid, x, y, z = (float(v) for v in parts)
            table[int(cid)] = np.array([x, y, z], np.float64)
    return total_classes, divide_per_iter, n_iters, table
