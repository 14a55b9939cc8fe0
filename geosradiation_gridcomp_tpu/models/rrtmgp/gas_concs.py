"""Gas concentrations container (mo_gas_concentrations equivalent).

The reference GCs fill it via gas_concs%init([...names]) + set_vmr
(GEOS_SolarGridComp.F90:4586-4601, GEOS_IrradGridComp.F90:2122-2138).
Here it is a thin validated dict of volume mixing ratios; scalars
broadcast to the column batch at use time.
"""

from typing import Dict, Union

import jax.numpy as jnp

KNOWN_GASES = ("h2o", "co2", "o3", "n2o", "co", "ch4", "o2", "n2",
               "cfc11", "cfc12", "hcfc22", "ccl4")


class GasConcs:
    """Volume mixing ratios by gas name (lowercase)."""

    def __init__(self, names=KNOWN_GASES):
        for n in names:
            if n.lower() not in KNOWN_GASES:
                raise ValueError(f"unknown gas {n!r}")
        self._names = tuple(n.lower() for n in names)
        self._vmr: Dict[str, Union[float, jnp.ndarray]] = {}

    @property
    def names(self):
        return self._names

    def set_vmr(self, gas: str, vmr):
        gas = gas.lower()
        if gas not in self._names:
            raise KeyError(f"gas {gas!r} not initialized")
        self._vmr[gas] = vmr
        return self

    def get_vmr(self, gas: str, like=None, default=0.0):
        """vmr broadcast to `like`'s shape when given."""
        v = self._vmr.get(gas.lower(), default)
        if like is None:
            return v
        arr = jnp.asarray(v, like.dtype)
        return jnp.broadcast_to(arr, like.shape) if arr.ndim == 0 else arr
