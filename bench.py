#!/usr/bin/env python
"""Benchmark: RRTMG SW+LW all-sky McICA refresh throughput on one chip.

Prints one JSON line: columns/s/chip on the north-star workload
(BASELINE.json config 3: all-sky SW+LW, McICA, 72 levels).
"""

import json
import time

import numpy as np


def main():
    import jax
    from geosradiation_gridcomp_tpu.config import RadiationConfig
    from geosradiation_gridcomp_tpu.driver.step import radiation_refresh
    from __graft_entry__ import _example_inputs

    ncol = int(__import__("os").environ.get("BENCH_NCOL", "8192"))
    nlev = 72
    inp = _example_inputs(ncol=ncol, nlev=nlev)
    cfg = RadiationConfig()
    pmid = 0.5 * (np.asarray(inp.ple)[0, 1:] + np.asarray(inp.ple)[0, :-1])
    ict, icb = cfg.superlayer_indices(pmid)
    inp = jax.device_put(inp)

    def step(doy):
        return radiation_refresh(inp, doy, 12.0, config=cfg, ict=ict,
                                 icb=icb)

    # warmup / compile
    sol, irr = step(172.0)
    jax.block_until_ready((sol.flxn, irr.flx))

    n_iter = 10
    t0 = time.perf_counter()
    for i in range(n_iter):
        sol, irr = step(172.0 + i * 1e-3)
    jax.block_until_ready((sol.flxn, irr.flx))
    dt = (time.perf_counter() - t0) / n_iter

    cols_per_s = ncol / dt
    # no published reference throughput exists (BASELINE.md: none published);
    # vs_baseline reports against a 1e5 columns/s/chip design target.
    target = 1.0e5
    print(json.dumps({
        "metric": "columns_per_s_per_chip_rrtmg_swlw_allsky",
        "value": round(cols_per_s, 1),
        "unit": "columns/s",
        "vs_baseline": round(cols_per_s / target, 4),
    }))


if __name__ == "__main__":
    main()
