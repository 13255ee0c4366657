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
