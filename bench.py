#!/usr/bin/env python
"""Benchmark: RRTMG SW+LW all-sky McICA refresh throughput on one chip.

Prints one JSON line: columns/s/chip on the north-star workload
(BASELINE.json config 3: all-sky SW+LW, McICA, 72 levels).
"""

import json
import time

import numpy as np


def scaling_main():
    """Weak-scaling efficiency over a device mesh (BASELINE config 5
    harness). Fixed columns per device; reports columns/s and efficiency
    vs the 1-device rate at each mesh size. Runs on the virtual CPU mesh
    (JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8)
    or on real TPU slices unchanged."""
    import os
    if os.environ.get("BENCH_CPU_MESH"):
        n = os.environ["BENCH_CPU_MESH"]
        os.environ["JAX_PLATFORMS"] = "cpu"
        os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                                   + f" --xla_force_host_platform_device"
                                     f"_count={n}").strip()
        import jax
        jax.config.update("jax_platforms", "cpu")
    import jax
    from geosradiation_gridcomp_tpu.config import RadiationConfig
    from geosradiation_gridcomp_tpu.driver.step import radiation_refresh
    from geosradiation_gridcomp_tpu.parallel.sharding import (
        column_mesh, shard_columns)
    from __graft_entry__ import _example_inputs

    env = __import__("os").environ
    percol = int(env.get("BENCH_NCOL_PER_DEV", "256"))
    # weak scaling (fixed cols/device) is the real-hardware mode; on the
    # virtual CPU mesh the 8 "devices" share one core pool, so weak
    # scaling measures the host, not the sharding - use strong scaling
    # (fixed global cols; efficiency = throughput ratio, ~1.0 when
    # sharding adds no overhead) there.
    mode = env.get("BENCH_SCALING_MODE",
                   "strong" if jax.default_backend() == "cpu" else "weak")
    nlev = 72
    cfg = RadiationConfig()
    devs = jax.devices()
    sizes = [n for n in (1, 2, 4, 8, 16, 32) if n <= len(devs)]
    base = None
    rows = []
    for n in sizes:
        mesh = column_mesh(devs[:n])
        ncol = percol * n if mode == "weak" else percol * sizes[-1]
        inp = _example_inputs(ncol=ncol, nlev=nlev)
        pmid = 0.5 * (np.asarray(inp.ple)[0, 1:]
                      + np.asarray(inp.ple)[0, :-1])
        ict, icb = cfg.superlayer_indices(pmid)
        inp = shard_columns(mesh, inp)
        step = lambda d: radiation_refresh(inp, d, 12.0, config=cfg,
                                           ict=ict, icb=icb)
        sol, irr = step(172.0)
        jax.block_until_ready((sol.flxn, irr.flx))
        n_iter = 5
        t0 = time.perf_counter()
        for i in range(n_iter):
            sol, irr = step(172.0 + i * 1e-3)
        jax.block_until_ready((sol.flxn, irr.flx))
        dt = (time.perf_counter() - t0) / n_iter
        cps = ncol / dt
        if base is None:
            base = cps
        # weak: fixed cols/device, ideal = n * base throughput.
        # strong: fixed global cols, ideal = base throughput scaled by n
        # devices -> eff = T1/(n*Tn) = cps/(base*n)... except on the
        # virtual CPU mesh, where the n "devices" share one core pool
        # and the honest statement is sharding overhead (cps/base ~ 1.0
        # when resharding adds nothing).
        if mode == "weak":
            eff = cps / (base * n)
        elif jax.default_backend() == "cpu":
            eff = cps / base
        else:
            eff = cps / (base * n)
        rows.append({"devices": n, "cols_per_s": round(cps, 1),
                     "efficiency": round(eff, 4)})
        print(f"# mesh={n:2d}  {cps:12.1f} cols/s  eff={eff:.3f}")
    metric = (f"{mode}_scaling_efficiency"
              if mode == "weak" or jax.default_backend() != "cpu"
              else "sharding_overhead_ratio")
    print(json.dumps({
        "metric": metric,
        "value": rows[-1]["efficiency"],
        "unit": "fraction", "vs_baseline": rows[-1]["efficiency"] / 0.9,
        "detail": rows}))


def speed_of_light_cols_per_s(nlev=72, hbm_gbps=819.0):
    """Memory-bandwidth speed-of-light estimate for this workload
    (BASELINE.json criterion). Counts the per-g-point HBM traffic the
    current fused design cannot avoid: LW taug+pfracs are written by
    taumol and read twice by the two rtrnmc sweeps, taucmc written once
    and read twice (9 cell-passes x 140 g); SW taug+taur (3 passes
    each), the 3 cloud-optics fields (3 passes), and the 4 stored
    adding-composites (1 write + 1 read) (26 x 112 g). Everything else
    (column inputs, flux outputs, coefficients) is O(nlay) per column
    and negligible. hbm_gbps: v5e HBM2 ~819 GB/s."""
    lw_bytes = nlev * 140 * 9 * 4
    sw_bytes = nlev * 112 * (3 * 2 + 3 * 3 + 4 * 2) * 4
    per_col = lw_bytes + sw_bytes
    return hbm_gbps * 1e9 / per_col


def stages_main():
    """Per-stage timing (LW full, SW full) so driver-captured benches
    can attribute regressions without the offline tools."""
    import subprocess
    import sys
    out = subprocess.run(
        [sys.executable, "tools/profiling/stage_times2.py"],
        capture_output=True, text=True,
        cwd=__import__("os").path.dirname(__import__("os").path.abspath(
            __file__)))
    print(out.stdout[-4000:])
    if out.returncode:
        print(out.stderr[-2000:])


def staged_main():
    """BASELINE config 4 evidence: steady-state throughput with
    host->device input staging OVERLAPPED with compute (StagedFeed /
    run_steps_overlapped) vs the serial transfer->compute->block loop,
    streaming distinct host-resident batches through the full refresh."""
    import jax
    from geosradiation_gridcomp_tpu.config import RadiationConfig
    from geosradiation_gridcomp_tpu.driver.step import radiation_refresh
    from geosradiation_gridcomp_tpu.parallel.distributed import (
        run_steps_overlapped)
    from __graft_entry__ import _example_inputs

    env = __import__("os").environ
    ncol = int(env.get("BENCH_NCOL", "4096"))
    nbatch = int(env.get("BENCH_NBATCH", "8"))
    nlev = 72
    cfg = RadiationConfig()
    # distinct host-resident (numpy) batches: every step really stages
    # its inputs over PCIe; seeds differ so no transfer is elided
    batches = [jax.tree_util.tree_map(
        np.asarray, _example_inputs(ncol=ncol, nlev=nlev, seed=s))
        for s in range(nbatch)]
    pmid = 0.5 * (batches[0].ple[0, 1:] + batches[0].ple[0, :-1])
    ict, icb = cfg.superlayer_indices(pmid)

    def step(inp):
        return radiation_refresh(inp, 172.0, 12.0, config=cfg, ict=ict,
                                 icb=icb)

    # warmup / compile
    out = step(jax.device_put(batches[0]))
    jax.block_until_ready((out[0].flxn, out[1].flx))

    t0 = time.perf_counter()
    outs = run_steps_overlapped(step, batches)
    jax.block_until_ready([(s.flxn, i.flx) for s, i in outs])
    dt_ov = (time.perf_counter() - t0) / nbatch

    t0 = time.perf_counter()
    for b in batches:
        sol, irr = step(jax.device_put(b))
        jax.block_until_ready((sol.flxn, irr.flx))
    dt_serial = (time.perf_counter() - t0) / nbatch

    print(json.dumps({
        "metric": "staged_overlap_cols_per_s",
        "value": round(ncol / dt_ov, 1),
        "unit": "columns/s",
        "vs_baseline": round((ncol / dt_ov) / 1.0e5, 4),
        "serial_cols_per_s": round(ncol / dt_serial, 1),
        "overlap_speedup": round(dt_serial / dt_ov, 3),
        "workload": {"ncol": ncol, "nlev": nlev, "nbatch": nbatch}}))


def main():
    import jax
    from geosradiation_gridcomp_tpu.config import RadiationConfig
    from geosradiation_gridcomp_tpu.driver.step import (radiation_refresh,
                                                        sw_partition_bounds)
    from __graft_entry__ import _example_inputs

    env = __import__("os").environ
    ncol = int(env.get("BENCH_NCOL", "8192"))
    nlev = 72
    inp = _example_inputs(ncol=ncol, nlev=nlev)
    scene = env.get("BENCH_SCENE", "realistic")
    if scene == "overcast":
        # every column cloudy at every deck: the clear-block McICA skip
        # and cloudy-first sort buy nothing; contrast with the default
        # realistic scene quantifies the clear-column exploitation
        # (rrtmg_sw_rad.F90:1130-1204's goal, VERDICT r3 next #3)
        import jax.numpy as jnp
        fcld = np.clip(np.asarray(inp.fcld) + 0.45, 0.45, 1.0)
        ql = np.maximum(np.asarray(inp.ql), 2e-5)
        qi = np.maximum(np.asarray(inp.qi), 5e-6)
        inp = inp._replace(fcld=jnp.asarray(fcld.astype(np.float32)),
                           ql=jnp.asarray(ql.astype(np.float32)),
                           qi=jnp.asarray(qi.astype(np.float32)))
    cfg = RadiationConfig()
    pmid = 0.5 * (np.asarray(inp.ple)[0, 1:] + np.asarray(inp.ple)[0, :-1])
    ict, icb = cfg.superlayer_indices(pmid)
    inp = jax.device_put(inp)

    # SW daylight packing + clear/cloudy solver split (NumLit,
    # GEOS_SolarGridComp.F90:3684-3687 / rrtmg_sw_rad.F90:1130-1204):
    # host-side bucketed bounds; max over the bench's doy range so the
    # bounds stay valid as the terminator drifts
    sw_nlit = sw_ncld = None
    if not env.get("BENCH_NO_DAYPACK"):
        bounds = [sw_partition_bounds(inp.lons, inp.lats, inp.fcld, d,
                                      12.0, cfg)
                  for d in (172.0, 172.01)]
        if not any(b[0] is None for b in bounds):
            sw_nlit = max(b[0] for b in bounds)
        if not any(b[1] is None for b in bounds):
            sw_ncld = max(b[1] for b in bounds)

    def step(doy):
        return radiation_refresh(inp, doy, 12.0, config=cfg, ict=ict,
                                 icb=icb, sw_nlit=sw_nlit,
                                 sw_ncld=sw_ncld)

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
    # sol = the memory-bandwidth speed-of-light for this chip/workload
    # (see speed_of_light_cols_per_s); the gap to it is algorithmic
    # (gather/compute-bound taumol, VPU-bound McICA), not bandwidth.
    target = 1.0e5
    sol = speed_of_light_cols_per_s(nlev)
    fcld = np.asarray(inp.fcld)
    print(json.dumps({
        "metric": "columns_per_s_per_chip_rrtmg_swlw_allsky",
        "value": round(cols_per_s, 1),
        "unit": "columns/s",
        "vs_baseline": round(cols_per_s / target, 4),
        "pct_of_mem_bw_speed_of_light": round(100 * cols_per_s / sol, 2),
        "workload": {
            "ncol": ncol, "nlev": nlev,
            "scene": scene,
            "cloudy_layer_fraction": round(float((fcld > 0).mean()), 3),
            "mean_cldfrac_in_cloudy": round(
                float(fcld[fcld > 0].mean()), 3),
            "day_night": "mixed (lons span 0..6 rad)",
            "sw_nlit": sw_nlit, "sw_ncld": sw_ncld},
    }))


if __name__ == "__main__":
    import sys
    if "--scaling" in sys.argv:
        scaling_main()
    elif "--staged" in sys.argv:
        staged_main()
    elif "--stages" in sys.argv:
        stages_main()
    else:
        main()
