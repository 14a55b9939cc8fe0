"""Analytic test atmospheres (midlatitude-summer-like) for solver tests."""

import numpy as np


def make_profile(ncol=4, nlev=72, seed=0, cloudy=False):
    """Build a batch of plausible atmospheric columns.

    Returns a dict of numpy arrays: ple [ncol, nlev+1] (Pa), ta/wa/oa
    [ncol, nlev], tb/ts [ncol], fcld/cwc/reff, trace gas vmrs.
    """
    rng = np.random.default_rng(seed)
    # level pressures: smooth log spacing from 1 Pa to ~101325 Pa
    ptop, psfc = 1.0, 101325.0
    a = np.linspace(0.0, 1.0, nlev + 1) ** 1.6
    ple1 = ptop * (psfc / ptop) ** a
    ple = np.tile(ple1, (ncol, 1))
    # per-column surface pressure jitter
    ple = ple * (1.0 + 0.02 * rng.standard_normal((ncol, 1)) * a[None, :])
    ple = np.sort(ple, axis=1)

    pmid = 0.5 * (ple[:, 1:] + ple[:, :-1])

    # temperature: US-standard-like, skin ~294K
    t_sfc = 294.0 + 3.0 * rng.standard_normal(ncol)
    ta = np.zeros((ncol, nlev))
    for i in range(ncol):
        p = pmid[i]
        t = np.where(p > 22632.0,
                     t_sfc[i] - 6.5e-3 * 287.0 * t_sfc[i] / 9.81
                     * np.log(ple[i, -1] / p) / 1.0,
                     216.65)
        # simple lapse in pressure coordinates
        t = t_sfc[i] * (p / ple[i, -1]) ** 0.19
        t = np.maximum(t, 216.65)
        # stratopause warming
        t = t + 55.0 * np.exp(-0.5 * ((np.log10(p) - 2.0) / 0.55) ** 2)
        ta[i] = t
    ta = np.clip(ta, 170.0, 320.0)

    # specific humidity: ~80% RH-ish decay with altitude
    wa = 0.016 * (pmid / pmid[:, -1:]) ** 3.2 + 3e-6
    # ozone mass mixing ratio peaked near 10 hPa
    oa = 1.0e-5 * np.exp(-0.5 * ((np.log10(pmid) - 3.0) / 0.42) ** 2) + 2e-8

    prof = dict(
        ple=ple.astype(np.float32),
        ta=ta.astype(np.float32),
        wa=wa.astype(np.float32),
        oa=oa.astype(np.float32),
        tb=(t_sfc + 0.5).astype(np.float32),
        ts=t_sfc.astype(np.float32),
        co2=np.full((ncol, nlev), 410e-6, np.float32),
        n2o=np.full((ncol, nlev), 320e-9, np.float32),
        ch4=np.full((ncol, nlev), 1.8e-6, np.float32),
        cfc11=np.full((ncol, nlev), 230e-12, np.float32),
        cfc12=np.full((ncol, nlev), 520e-12, np.float32),
        cfc22=np.full((ncol, nlev), 240e-12, np.float32),
    )

    fcld = np.zeros((ncol, nlev), np.float32)
    cwc = np.zeros((ncol, nlev, 4), np.float32)
    reff = np.zeros((ncol, nlev, 4), np.float32)
    reff[..., 0] = 30.0
    reff[..., 1] = 10.0
    reff[..., 2] = 100.0
    reff[..., 3] = 80.0
    if cloudy:
        for i in range(ncol):
            # a mid-level water cloud and a high ice cloud
            mid = np.argmin(np.abs(pmid[i] - 60000.0))
            high = np.argmin(np.abs(pmid[i] - 25000.0))
            fcld[i, mid - 1:mid + 2] = 0.7
            cwc[i, mid - 1:mid + 2, 1] = 2e-4
            fcld[i, high] = 0.4
            cwc[i, high, 0] = 1e-5
    prof["fcld"] = fcld
    prof["cwc"] = cwc
    prof["reff"] = reff

    # super-layer boundaries: level indices nearest 400 and 700 hPa
    icts = [int(np.argmin(np.abs(pmid[i] - 40000.0))) + 1 for i in range(ncol)]
    icbs = [int(np.argmin(np.abs(pmid[i] - 70000.0))) + 1 for i in range(ncol)]
    prof["ict"] = int(np.median(icts))
    prof["icb"] = int(np.median(icbs))
    return prof
