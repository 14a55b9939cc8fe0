"""MISR simulator: stereo cloud-top-height x optical-depth histograms.

Re-derivation of the reference's MISR_simulator.f:1-473. The per-level
CTH state machine (first-cloud trigger, penetration-height update,
distinctive-water-layer / thick-column termination) becomes a lax.scan
over levels with (point, subcolumn) lanes vectorized; the serial
neighbor-matching "pattern matcher" adjustment and the 7 x 16 tau-CTH
histogram are masked vector ops.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from .icarus import TAU_EDGES, MISSING, _TAUCHK

N_MISR_CTH = 16
# CTH bin boundaries [km] (MISR_simulator.f DATA MISR_CTH_boundaries);
# bin 0 = "detected, no height", bins 1..15 by height
CTH_BOUNDARIES_KM = np.array([-99., 0., 0.5, 1., 1.5, 2., 2.5, 3.,
                              4., 5., 7., 9., 11., 13., 15., 17., 99.])


def _cth_bin(z_m):
    """MISR CTH bin index (0-based into the 16 bins) for a height in m:
    iMISR_ztop=2 + count(z > 1000*bound[l+1], l=2..16) in Fortran, i.e.
    1-based bin 2..16 -> 0-based 1..15."""
    edges = jnp.asarray(1000.0 * CTH_BOUNDARIES_KM[2:-1])   # 14 edges
    return 1 + jnp.sum(z_m[..., None] > edges, axis=-1)


@jax.jit
def misr_simulator(frac_out, zfull, at, dtau_s, dtau_c, sunlit):
    """MISR CTH-tau joint histogram + summary diagnostics.

    Args:
      frac_out: [np, ncol, nlev] int (0/1/2) subcolumn codes (TOA-first).
      zfull: [np, nlev] layer mid heights (m); at: [np, nlev] temperature.
      dtau_s/dtau_c: [np, nlev] in-cloud visible optical depths.
      sunlit: [np] 1/0.

    Returns dict: fq_misr [np, 7, 16] (tau x CTH), cldarea, mean_ztop
    [np], dist_model_layertops [np, 16], box_misr_ztop [np, ncol].
    """
    npnt, ncol, nlev = frac_out.shape
    dtype = zfull.dtype

    # distribution of model layer tops over MISR bins (f:99-123)
    ztest = jnp.concatenate(
        [zfull[:, :1], 0.5 * (zfull[:, 1:-1] + zfull[:, :-2]),
         zfull[:, -1:]], axis=-1)
    top_bins = _cth_bin(ztest)          # [np, nlev]
    dist_tops = jnp.zeros((npnt, N_MISR_CTH), dtype).at[
        jnp.arange(npnt)[:, None], top_bins].add(1.0)

    # per-subcolumn layer optical depth
    dtau = jnp.where(frac_out == 1, dtau_s[:, None, :],
                     jnp.where(frac_out == 2, dtau_c[:, None, :], 0.0))

    # layer-top-interpolated penetration height for the OD=1 rule
    # (f:186-197): 0.5*(z_l + z_{l-1}) - 0.5*(z_{l-1} - z_{l+1})/dtau
    z_prev = jnp.concatenate([zfull[:, :1], zfull[:, :-1]], axis=-1)
    z_next = jnp.concatenate([zfull[:, 1:], zfull[:, -1:]], axis=-1)
    is_edge = jnp.zeros((nlev,), bool).at[0].set(True).at[-1].set(True)

    def step(carry, xs):
        crossed, cloud_dtau, tau_sum, ztop = carry
        d, z, zp, zn, edge, t_lay = xs          # each [np, nsub] or [np]
        tau_sum = tau_sum + d
        # first cloud encountered starts the counter (f:160-166)
        start = (crossed == 0) & (d > 0.0)
        crossed = jnp.where(start, 1, crossed)
        cloud_dtau = jnp.where(start, 0.0, cloud_dtau)
        active = (crossed > 0) & (crossed < 99)
        # continuity counter (f:169-181)
        new_cdtau = jnp.where(d == 0.0, 0.0, cloud_dtau + d)
        cloud_dtau = jnp.where(active, new_cdtau, cloud_dtau)
        # penetration height when cloud above this layer is thin (<1)
        pen_mid = jnp.broadcast_to(z[:, None], d.shape)
        pen_od1 = (0.5 * (z + zp)[:, None]
                   - 0.5 * (zp - zn)[:, None] / jnp.maximum(d, 1e-30))
        pen = jnp.where((d < 1.0) | edge, pen_mid, pen_od1)
        set_pen = active & (d > 0.0) & (cloud_dtau - d < 1.0)
        ztop = jnp.where(set_pen, pen, ztop)
        # distinctive water layer or opaque column terminates (f:200-215)
        term = active & (((d > 1.0) & (t_lay[:, None] > 273.0))
                         | (tau_sum > 5.0))
        crossed = jnp.where(term, 99, crossed)
        return (crossed, cloud_dtau, tau_sum, ztop), None

    shape = (npnt, ncol)
    carry0 = (jnp.zeros(shape, jnp.int32), jnp.zeros(shape, dtype),
              jnp.zeros(shape, dtype), jnp.zeros(shape, dtype))
    xs = (jnp.moveaxis(dtau, -1, 0), zfull.T, z_prev.T, z_next.T,
          is_edge, at.T)
    (crossed, _, tau, ztop), _ = lax.scan(step, carry0, xs)

    # unterminated thin clouds (f:222-243)
    ztop = jnp.where(crossed == 1,
                     jnp.where(tau > 0.5, ztop,
                               jnp.where(tau > 0.2, -1.0, 0.0)),
                     ztop)

    # neighbor pattern-matcher adjustment over the subcolumn axis
    # (f: "Modify MISR CTH for satellite spatial / pattern matcher")
    zl = ztop[:, :-2]
    zr = ztop[:, 2:]
    zc = ztop[:, 1:-1]
    adj = (zl > 0) & (zr > 0) & (jnp.abs(zl - zr) < 500.0) & (zc < zr)
    ztop = ztop.at[:, 1:-1].set(jnp.where(adj, zr, zc))

    box_cloudy = tau > _TAUCHK
    itau = jnp.where(box_cloudy,
                     jnp.digitize(tau, jnp.asarray(TAU_EDGES)), 0)

    detected = ztop != 0.0
    no_height = ztop == -1.0
    icth = jnp.where(no_height, 0, _cth_bin(ztop))
    # histogram counts: "no height" bin needs only detection; height bins
    # also require an ISCCP-cloudy column (f:355-410)
    contrib = detected & (no_height | box_cloudy)
    cell = itau * N_MISR_CTH + icth
    onehot = cell[..., None] == jnp.arange(7 * N_MISR_CTH)[None, None, :]
    fq = jnp.sum(jnp.where(contrib[..., None], onehot, False),
                 axis=1) / ncol
    fq_misr = fq.reshape(npnt, 7, N_MISR_CTH).astype(dtype)

    cldarea = detected.sum(axis=-1) / ncol
    mean_ztop = jnp.where(
        cldarea > 0.0,
        jnp.sum(jnp.where(detected, ztop, 0.0), axis=-1) / ncol
        / jnp.maximum(cldarea, 1e-12), 0.0)

    day = sunlit == 1
    m1 = lambda x: jnp.where(day, x, MISSING)
    return dict(
        fq_misr=jnp.where(day[:, None, None], fq_misr, MISSING),
        dist_model_layertops=jnp.where(day[:, None], dist_tops, MISSING),
        cldarea=m1(cldarea.astype(dtype)), mean_ztop=m1(mean_ztop),
        box_misr_ztop=ztop)
