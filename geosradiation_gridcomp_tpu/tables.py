"""Lazy loading of numerical tables (npz artifacts) as jnp constant arrays.

The artifacts are produced once by tools/extract_fortran_data.py +
tools/reduce_rrtmg_g.py from the reference's Fortran DATA statements
(soradconstants.F90, irradconstants.F90, radconstants.F90,
rrtmg_{lw,sw}_k_g_*.F90, rrtmg_{lw,sw}_init/setcoef.F90,
cloud_condensate_inhomogeneity.F90). Arrays are embedded in jitted programs
as XLA constants, so they live in HBM and are fetched through the normal
compiler-managed pipeline.
"""

import functools
import os

import numpy as np

_DATA_DIR = os.path.join(os.path.dirname(__file__), "data")


@functools.lru_cache(maxsize=None)
def load(tag: str):
    """Load an npz artifact as a dict of float32 numpy arrays.

    Integer-valued metadata arrays (ngc, ngs, ...) are returned as int32.
    """
    path = os.path.join(_DATA_DIR, f"{tag}.npz")
    raw = np.load(path)
    out = {}
    for k in raw.files:
        a = raw[k]
        if k.endswith("__lo") or k in ("ngc", "ngs", "ngm", "ngn", "ngb",
                                       "ng", "nspa", "nspb", "mw", "icxa"):
            out[k] = np.asarray(a, dtype=np.int32)
        else:
            out[k] = np.asarray(a, dtype=np.float32)
    return out


@functools.lru_cache(maxsize=None)
def load64(tag: str):
    """Float64 variant (for numpy reference-path validation)."""
    path = os.path.join(_DATA_DIR, f"{tag}.npz")
    raw = np.load(path)
    return {k: np.asarray(raw[k]) for k in raw.files}
