"""Checkpoint save/restore for the radiation internal state.

The reference checkpoints its MAPL Internal states (159 Solar fields of
normalized fluxes, GEOS_SolarGridComp.F90:694-701; 26 Irrad fields of
fluxes + dF/dTs + Ts, GEOS_IrradGridComp.F90:1370-1387). Here the
internal state is the (SolarState, IrradState[, RatsState]) pytrees plus
the host clock; a checkpoint is a single .npz with a flat
"<tree>/<field>" namespace plus a JSON header for the clock.

Restart caveat (as documented by the reference at
GEOS_SolarGridComp.F90:117-119): a restart reproduces the uninterrupted
run exactly only when the checkpoint was written at a heartbeat boundary
— which is the only place this API can be called, so the stronger caveat
(refresh-boundary-only seamlessness) of the reference's
time-averaged-import path does not apply here: AtmosInputs are
instantaneous, so any heartbeat boundary is seamless.
"""

import io
import json
import os

import numpy as np
import jax

from .state import SolarState, IrradState, RatsState
from .clock import RadiationClock

_CLASSES = {"solar": SolarState, "irrad": IrradState, "rats": RatsState}


def save_checkpoint(path, *, solar=None, irrad=None, rats=None, clock=None,
                    extra=None):
    """Write a radiation checkpoint .npz (atomically via temp+rename)."""
    arrays = {}
    header = {"format": 1}
    for name, tree in (("solar", solar), ("irrad", irrad), ("rats", rats)):
        if tree is None:
            continue
        header[name] = type(tree).__name__
        for field, value in tree._asdict().items():
            arrays[f"{name}/{field}"] = np.asarray(value)
    if clock is not None:
        header["clock"] = clock.state_dict()
    if extra:
        header["extra"] = extra
    arrays["__header__"] = np.frombuffer(
        json.dumps(header).encode(), dtype=np.uint8)
    tmp = f"{path}.tmp.{os.getpid()}"
    with open(tmp, "wb") as f:
        np.savez(f, **arrays)
    os.replace(tmp, path)


def load_checkpoint(path, device_put=True):
    """Read a checkpoint. Returns dict with any of solar/irrad/rats/clock
    /extra keys present in the file."""
    with np.load(path) as z:
        header = json.loads(bytes(z["__header__"].tobytes()).decode())
        out = {}
        for name, cls in _CLASSES.items():
            prefix = name + "/"
            fields = {k[len(prefix):]: z[k] for k in z.files
                      if k.startswith(prefix)}
            if fields:
                tree = cls(**{f: fields[f] for f in cls._fields})
                if device_put:
                    tree = jax.device_put(tree)
                out[name] = tree
    if "clock" in header:
        out["clock"] = RadiationClock.from_state_dict(header["clock"])
    if "extra" in header:
        out["extra"] = header["extra"]
    return out
