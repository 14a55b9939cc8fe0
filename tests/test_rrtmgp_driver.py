"""Driver-level RRTMGP scheme dispatch (Scheme.RRTMGP end to end)."""

import numpy as np
import pytest

from geosradiation_gridcomp_tpu.config import (RadiationConfig, Scheme,
                                               choose_scheme)


def test_choose_scheme_precedence():
    assert choose_scheme(True, True) == Scheme.RRTMGP
    assert choose_scheme(False, True) == Scheme.RRTMG
    assert choose_scheme() == Scheme.CHOU


def test_full_refresh_with_rrtmgp_scheme():
    import __graft_entry__ as g
    from geosradiation_gridcomp_tpu.driver.step import (radiation_refresh,
                                                        radiation_update)
    inp = g._example_inputs(ncol=8, nlev=48)
    cfg = RadiationConfig(sw_scheme=Scheme.RRTMGP,
                          lw_scheme=Scheme.RRTMGP)
    pmid = 0.5 * (np.asarray(inp.ple)[0, 1:] + np.asarray(inp.ple)[0, :-1])
    ict, icb = cfg.superlayer_indices(pmid)
    sol, irr = radiation_refresh(inp, 172.0, 12.0, config=cfg, ict=ict,
                                 icb=icb)
    out = radiation_update(sol, irr, inp.tsinst, inp.lons, inp.lats,
                           inp.ple, 172.0, 12.5, config=cfg)
    dtdt = np.asarray(out["dtdt"]) * 86400.0
    assert np.isfinite(dtdt).all()
    pmid2 = 0.5 * (np.asarray(inp.ple)[:, 1:] + np.asarray(inp.ple)[:, :-1])
    sel = pmid2 > 10000.0     # troposphere+; thin top layers swing hard
    assert (np.abs(dtdt[sel]) < 40.0).all(), np.abs(dtdt[sel]).max()
    olr = np.asarray(out["lw"]["olr"])
    assert ((olr > 150.0) & (olr < 350.0)).all()


def test_rrtmgp_vs_rrtmg_driver_close():
    """The two schemes share k-tables: driver-level OLR and net SW must
    agree to a few W/m^2 (differences: McICA sampling + solar source)."""
    import __graft_entry__ as g
    from geosradiation_gridcomp_tpu.driver.step import radiation_refresh
    inp = g._example_inputs(ncol=8, nlev=48)
    pmid = 0.5 * (np.asarray(inp.ple)[0, 1:] + np.asarray(inp.ple)[0, :-1])
    outs = {}
    for sch in (Scheme.RRTMG, Scheme.RRTMGP):
        cfg = RadiationConfig(sw_scheme=sch, lw_scheme=sch)
        ict, icb = cfg.superlayer_indices(pmid)
        sol, irr = radiation_refresh(inp, 172.0, 12.0, config=cfg,
                                     ict=ict, icb=icb)
        outs[sch] = (np.asarray(sol.flcn), np.asarray(irr.flc))
    sw_g, lw_g = outs[Scheme.RRTMG]
    sw_gp, lw_gp = outs[Scheme.RRTMGP]
    # clear-sky normalized SW net within 1%; clear LW within 0.5 W/m^2
    np.testing.assert_allclose(sw_gp, sw_g, atol=0.01)
    np.testing.assert_allclose(lw_gp, lw_g, atol=0.5)
