"""McICA cloud sampling (mo_cloud_sampling equivalents).

The reference drives the external library's sampled_mask_max_ran /
sampled_urand_gen_max_ran / draw_samples from the Solar GC
(GEOS_SolarGridComp.F90:5229-5299) and the Irrad GC. Re-derived here as
pure vectorized ops: the layer-correlation chains are lax.scans over
levels; draw_samples is a static band->gpoint gather.
"""

import jax.numpy as jnp
from jax import lax


def sampled_mask_max_ran(urand, cloud_frac):
    """Maximum-random overlap cloud mask.

    Adjacent cloudy layers are maximally overlapped by REUSING the
    random deviate of the layer above, rescaled into the cloudy part;
    layers separated by clear sky are randomly overlapped.

    urand: [ncol, ngpt, nlay]; cloud_frac: [ncol, nlay].
    Returns cld_mask bool [ncol, nlay, ngpt].
    """
    cf = jnp.broadcast_to(cloud_frac[:, None, :], urand.shape)

    def step(carry, xs):
        r_prev, cf_prev = carry
        r_here, cf_here = xs
        # maximum overlap where the layer above was cloudy: reuse its
        # deviate; otherwise a fresh deviate rescaled into the clear
        # part of the layer above (Raisanen et al. 2004 generator)
        reuse = r_prev < cf_prev
        r = jnp.where(reuse, r_prev,
                      cf_prev + (1.0 - cf_prev) * r_here)
        return (r, cf_here), r < cf_here

    xs = (jnp.moveaxis(urand[..., 1:], -1, 0),
          jnp.moveaxis(cf[..., 1:], -1, 0))
    r0 = urand[..., 0]
    (_, _), masks = lax.scan(step, (r0, cf[..., 0]), xs)
    mask0 = (r0 < cf[..., 0])[None]
    masks = jnp.concatenate([mask0, masks], axis=0)
    # [nlay, ncol, ngpt] -> [ncol, nlay, ngpt]
    return jnp.moveaxis(masks, 0, 1)


def sampled_urand_gen_max_ran(alpha, urand, urand_aux):
    """Generalized maximum-random correlation of uniform deviates
    (Oreopoulos et al. 2012; GEOS_SolarGridComp.F90:5243-5249): where
    the auxiliary deviate falls below the layer-pair correlation
    alpha(k-1), the deviate from the layer above is reused.

    alpha: [ncol, nlay-1]; urand/urand_aux: [ncol, ngpt, nlay].
    Returns the correlated urand (same shape).
    """
    a = alpha[:, None, :]                # [ncol, 1, nlay-1]

    def step(r_prev, xs):
        r_here, aux_here, a_here = xs
        r = jnp.where(aux_here < a_here, r_prev, r_here)
        return r, r

    xs = (jnp.moveaxis(urand[..., 1:], -1, 0),
          jnp.moveaxis(urand_aux[..., 1:], -1, 0),
          jnp.moveaxis(jnp.broadcast_to(a, urand[..., 1:].shape), -1, 0))
    _, rest = lax.scan(step, urand[..., 0], xs)
    return jnp.concatenate(
        [urand[..., :1], jnp.moveaxis(rest, 0, -1)], axis=-1)


def draw_samples(cld_mask, props_bnd, band_lims_gpt):
    """Band -> g-point McICA sampling (mo_cloud_sampling draw_samples):
    each g-point of a cloudy cell receives its band's cloud optical
    properties; clear cells get zero.

    cld_mask: [ncol, nlay, ngpt] bool; props_bnd: dict of
    [ncol, nlay, nbnd] arrays (e.g. tau/ssa/g); band_lims_gpt:
    [nbnd, 2] 1-based inclusive g-point limits per band (static).

    Returns dict of [ncol, nlay, ngpt] arrays.
    """
    import numpy as np
    lims = np.asarray(band_lims_gpt)
    ngpt = int(lims[:, 1].max())
    gpt2band = np.zeros(ngpt, np.int32)
    for b, (g1, g2) in enumerate(lims):
        gpt2band[int(g1) - 1:int(g2)] = b
    idx = jnp.asarray(gpt2band)
    out = {}
    for k, v in props_bnd.items():
        out[k] = jnp.where(cld_mask, v[..., idx], 0.0)
    return out
