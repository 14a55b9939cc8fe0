"""Runtime input validation + NaN containment.

Equivalent of the reference's fail-fast input checking: RRTMG-LW hard
`error stop` range asserts on every input field (rrtmg_lw_rad.F90:209-318)
and the pervasive VERIFY_/_ASSERT macros. Two layers:

* `validate_inputs(inp)` — host-side (numpy) range checks on an
  AtmosInputs batch, run OUTSIDE jit at the refresh boundary. Raises
  ValueError naming the offending field, its bad extremum, and the legal
  range. Opt-in (costs a device->host transfer of the input pytree).
* `check_finite(tree, what)` — host-side divergence guard on a produced
  state: any non-finite leaf raises FloatingPointError instead of letting
  NaN fluxes propagate into the model (the reference dies via error
  stop; we fail on export).
"""

import numpy as np
import jax

# (field, min, max) physical ranges, after
# rrtmg_lw_rad.F90:209-318 (pressures in Pa here, vmr unitless, T in K,
# radii in micron). Mass mixing ratios use generous vmr-equivalent caps.
_RANGES = [
    ("ple", 1.0e-2, 1.1e6),
    ("t", 120.0, 360.0),
    ("qv", 0.0, 0.5),
    ("ql", 0.0, 0.1),
    ("qi", 0.0, 0.1),
    ("qr", 0.0, 0.1),
    ("qs", 0.0, 0.1),
    ("o3", 0.0, 1.0e-2),
    ("fcld", 0.0, 1.0),
    ("ch4", 0.0, 1.0e-3),
    ("n2o", 0.0, 1.0e-3),
    ("cfc11", 0.0, 1.0e-5),
    ("cfc12", 0.0, 1.0e-5),
    ("hcfc22", 0.0, 1.0e-5),
    ("co2", 0.0, 0.1),
    ("ts", 120.0, 360.0),
    ("tsinst", 120.0, 360.0),
    ("t2m", 120.0, 360.0),
    ("emis", 0.0, 1.0),
    ("albvr", 0.0, 1.0),
    ("albvf", 0.0, 1.0),
    ("albnr", 0.0, 1.0),
    ("albnf", 0.0, 1.0),
    ("rl", 0.0, 1000.0),
    ("ri", 0.0, 1000.0),
    ("rr", 0.0, 10000.0),
    ("rs", 0.0, 10000.0),
]


def validate_inputs(inp):
    """Range-check an AtmosInputs batch (host-side, outside jit).

    Mirrors rrtmg_lw_rad.F90:209-318: every field must be finite and
    inside its physical range; edge pressure must additionally increase
    monotonically from TOA to surface.
    """
    for name, lo, hi in _RANGES:
        a = np.asarray(getattr(inp, name))
        if not np.isfinite(a).all():
            raise ValueError(f"AtmosInputs.{name}: non-finite values")
        amin, amax = float(a.min()), float(a.max())
        if amin < lo or amax > hi:
            raise ValueError(
                f"AtmosInputs.{name}: range [{amin:.6g}, {amax:.6g}] "
                f"outside physical bounds [{lo:.6g}, {hi:.6g}] "
                f"(rrtmg_lw_rad.F90:209-318 equivalent)")
    ple = np.asarray(inp.ple)
    if not (np.diff(ple, axis=-1) > 0.0).all():
        raise ValueError(
            "AtmosInputs.ple: edge pressures must increase TOA->surface")


def check_finite(tree, what="radiation state"):
    """Raise FloatingPointError if any array leaf holds NaN/Inf.

    NaN containment at the refresh boundary: the reference's VERIFY_
    idiom dies before corrupt fields reach the Export state; here a bad
    refresh is caught before its state replaces the previous good one.
    Returns the tree (device arrays untouched) so it chains.
    """
    # UNDEF (1e15) markers are legal; only NaN/Inf are faults.
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        a = np.asarray(leaf)
        if np.issubdtype(a.dtype, np.floating) and not np.isfinite(a).all():
            name = jax.tree_util.keystr(path)
            raise FloatingPointError(
                f"{what}{name}: non-finite values after refresh")
    return tree
