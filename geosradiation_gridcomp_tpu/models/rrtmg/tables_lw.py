"""RRTMG-LW table assembly: reduced k-tables flattened to gather layout.

The reduced per-band npz (tools/reduce_rrtmg_g.py) stores ka as
(neta, 5, 13, ng) / kb as (neta, 5, 47, ng) in the reference's Fortran
dimension order. The taumol interpolation indexes the EQUIVALENCEd flat
arrays absa(585, ng)/absb(1175, ng) with
ind = ((jp-1)*5 + (jt-1))*nspa + js  (rrtmg_lw_taumol.F90:226-228 etc.),
i.e. column-major flattening over (eta, jt, jp). We reproduce exactly that
layout with an order='F' reshape so the +/-1, +8..+11 eta-straddling offsets
of the 0.125/0.875 special interpolation match the reference bit-for-bit.
"""

import functools

import numpy as np

from ...tables import load

NG_LW = [10, 12, 16, 14, 16, 8, 12, 8, 12, 6, 8, 8, 4, 2, 2, 2]
NGS_LW = np.concatenate([[0], np.cumsum(NG_LW)])  # g offsets per band
NGPTLW = 140
NBNDLW = 16
# nspa/nspb from lwdatinit (rrtmg_lw_init.F90:193-195)
NSPA = [1, 1, 9, 9, 9, 1, 9, 1, 9, 1, 1, 9, 9, 1, 9, 9]
NSPB = [1, 1, 5, 5, 5, 0, 1, 1, 1, 1, 1, 0, 0, 1, 0, 0]


def _flat(arr):
    """(eta?, jt, jp, ng) -> (eta*jt*jp, ng) column-major (Fortran flat)."""
    ng = arr.shape[-1]
    return np.reshape(arr, (-1, ng), order="F")


@functools.lru_cache(maxsize=1)
def lw_tables():
    """Returns dict: band index (1-based) -> dict of numpy float32 tables."""
    red = load("rrtmg_lw_reduced")
    ref = load("rrtmg_lw_ref")
    out = {"chi_mls": ref["chi_mls"],           # (7, 59)
           "pref": ref["pref"], "preflog": ref["preflog"],
           "tref": ref["tref"],
           "totplnk": ref["totplnk"],           # (181, 16)
           "totplk16": ref["totplk16"],
           "totplnkderiv": ref["totplnkderiv"],
           "totplk16deriv": ref["totplk16deriv"]}
    for b in range(1, 17):
        p = f"band{b:02d}_"
        d = {}
        for k in red:
            if k.startswith(p):
                d[k[len(p):]] = red[k]
        tabs = {}
        if "ka" in d:
            tabs["absa"] = _flat(d["ka"])
        if "kb" in d:
            tabs["absb"] = _flat(d["kb"])
        for k, v in d.items():
            if k in ("ka", "kb"):
                continue
            tabs[k] = v
        out[b] = tabs
    return out
