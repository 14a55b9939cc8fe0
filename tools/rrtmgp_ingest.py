"""Convert an RRTMGP NetCDF k-distribution to the engine's npz schema.

Usage:  python tools/rrtmgp_ingest.py rrtmgp-gas-lw-g256.nc out_lw.npz

The reference loads these files at runtime through the external RRTMGP
library (load_and_init, GEOS_SolarGridComp.F90:4609-4621); this tool
ingests the same files offline into the plain-array schema consumed by
geosradiation_gridcomp_tpu.models.rrtmgp.gas_optics (schema documented
there). RRTMGP coefficient files are NetCDF4/HDF5; h5py reads them
directly (no netCDF4 dependency).

Axis conventions in the source files (rrtmgp data repo):
  kmajor [temp, eta, press+1, gpt] (some releases store gpt first -
  both layouts are detected by dimension sizes)
  kminor_lower/upper [temp, eta, contributor-gpt]
  plank_fraction like kmajor; totplnk [temp_planck, band]
"""

import sys

import numpy as np


def _read_nc(path):
    import h5py
    f = h5py.File(path, "r")
    return {k: np.asarray(v) for k, v in f.items()}


def _str(a):
    """Decode a NetCDF char-array [n, strlen] to a list of str."""
    if a.dtype.kind in "SU":
        if a.ndim == 2:
            return ["".join(c.decode() if isinstance(c, bytes) else c
                            for c in row).strip() for row in a]
        return [s.decode().strip() if isinstance(s, bytes)
                else str(s).strip() for s in a]
    raise ValueError(a.dtype)


def _minor_block(nc, which):
    """Assemble one atmosphere-half's minor-contributor block."""
    km = nc.get(f"kminor_{which}")
    if km is None or km.size == 0:
        return None
    gas_names = _str(nc["gas_names"])
    minor_gases = _str(nc[f"minor_gases_{which}"])
    scaling_gas = _str(nc[f"scaling_gas_{which}"])
    gidx = np.array([gas_names.index(g) + 1 for g in minor_gases],
                    np.int64)
    sidx = np.array([0 if not g else gas_names.index(g) + 1
                     for g in scaling_gas], np.int64)
    return dict(
        kminor=np.asarray(km, np.float32),
        gpt_limits=np.asarray(
            nc[f"minor_limits_gpt_{which}"], np.int64),
        gas_idx=gidx,
        scales_with_density=np.asarray(
            nc[f"minor_scales_with_density_{which}"], bool),
        scaling_gas=sidx,
        scale_by_complement=np.asarray(
            nc[f"scale_by_complement_{which}"], bool),
    )


def convert(path_in, path_out):
    nc = _read_nc(path_in)
    gas_names = _str(nc["gas_names"])
    out = dict(
        gas_names=np.array(gas_names),
        h2o_idx=np.int64(gas_names.index("h2o") + 1),
        press_ref=np.asarray(nc["press_ref"], np.float64),
        press_ref_trop=np.float64(nc["press_ref_trop"]),
        temp_ref=np.asarray(nc["temp_ref"], np.float64),
        vmr_ref=np.asarray(nc["vmr_ref"], np.float64),
        flavor=np.asarray(nc["flavor"], np.int64).T,
        gpoint_flavor=np.asarray(nc["gpoint_flavor"], np.int64),
        kmajor=np.asarray(nc["kmajor"], np.float32),
        band_lims_gpt=np.asarray(nc["bnd_limits_gpt"], np.int64),
        band_lims_wvn=np.asarray(nc["bnd_limits_wavenumber"],
                                 np.float64),
    )
    for which in ("lower", "upper"):
        blk = _minor_block(nc, which)
        if blk:
            for k, v in blk.items():
                out[f"minor_{which}_{k}"] = v
    if "totplnk" in nc:
        out["totplnk"] = np.asarray(nc["totplnk"], np.float64)
        out["planck_frac"] = np.asarray(nc["plank_fraction"],
                                        np.float32)
        out["temp_ref_planck"] = np.asarray(
            nc.get("temperature_Planck",
                   np.arange(160.0, 160.0 + out["totplnk"].shape[0])),
            np.float64)
    if "solar_source_quiet" in nc or "solar_source" in nc:
        q = nc.get("solar_source", nc.get("solar_source_quiet"))
        out["solar_src"] = np.asarray(q, np.float64)
        out["rayl"] = np.stack(
            [np.asarray(nc["rayl_lower"], np.float32),
             np.asarray(nc["rayl_upper"], np.float32)])
    np.savez_compressed(path_out, **out)
    print(f"wrote {path_out}: "
          f"{out['kmajor'].shape[-1]} g-points, "
          f"{out['band_lims_gpt'].shape[0]} bands, "
          f"{len(gas_names)} gases")


if __name__ == "__main__":
    convert(sys.argv[1], sys.argv[2])
