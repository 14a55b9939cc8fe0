"""Solar geometry: zenith angle and insolation averaging.

Replaces MAPL_SunGetInsolation (SURVEY.md: cross-cutting infrastructure).
Uses the standard low-precision solar ephemeris (declination/eq.-of-time
Fourier fits, Spencer 1971); interval means are Gauss-Legendre quadrature
of max(cos zenith, 0) over the averaging window, matching the reference's
"mean insolation over the next refresh interval" semantics
(GEOS_SolarGridComp.F90:3643-3650).
"""

import jax.numpy as jnp
import numpy as np

_GL4_X = np.array([-0.8611363116, -0.3399810436, 0.3399810436, 0.8611363116])
_GL4_W = np.array([0.3478548451, 0.6521451549, 0.6521451549, 0.3478548451])


def declination_eqtime(doy_frac):
    """Solar declination [rad] and equation of time [rad] (Spencer 1971).

    doy_frac: fractional day of year in [0, 366).
    """
    g = 2.0 * jnp.pi * doy_frac / 365.0
    decl = (0.006918 - 0.399912 * jnp.cos(g) + 0.070257 * jnp.sin(g)
            - 0.006758 * jnp.cos(2 * g) + 0.000907 * jnp.sin(2 * g)
            - 0.002697 * jnp.cos(3 * g) + 0.00148 * jnp.sin(3 * g))
    eqt = (0.000075 + 0.001868 * jnp.cos(g) - 0.032077 * jnp.sin(g)
           - 0.014615 * jnp.cos(2 * g) - 0.040849 * jnp.sin(2 * g))
    return decl, eqt


def earth_sun_factor(doy_frac):
    """(a/r)^2 inverse-square distance factor (Spencer 1971)."""
    g = 2.0 * jnp.pi * doy_frac / 365.0
    return (1.000110 + 0.034221 * jnp.cos(g) + 0.001280 * jnp.sin(g)
            + 0.000719 * jnp.cos(2 * g) + 0.000077 * jnp.sin(2 * g))


def cos_zenith(lon, lat, doy_frac, utc_hours):
    """Instantaneous cosine of solar zenith angle.

    lon/lat in radians; utc_hours in [0, 24).
    """
    decl, eqt = declination_eqtime(doy_frac)
    hour_angle = (2.0 * jnp.pi * (utc_hours - 12.0) / 24.0) + lon + eqt
    mu = (jnp.sin(lat) * jnp.sin(decl)
          + jnp.cos(lat) * jnp.cos(decl) * jnp.cos(hour_angle))
    return mu


def mean_cos_zenith(lon, lat, doy_frac, utc_hours, interval_hours):
    """Mean of max(cos zenith, 0) and lit fraction over an interval.

    4-point Gauss-Legendre over [utc_hours, utc_hours + interval_hours].
    Returns (mean_mu0, lit_fraction): the reference's ZTH (mean over lit
    part) and SLR convention is recovered as:
      slr = mean_mu0  (insolation fraction), zth = mean_mu0 / lit_fraction.
    """
    mid = utc_hours + 0.5 * interval_hours
    half = 0.5 * interval_hours
    mu_acc = 0.0
    lit_acc = 0.0
    for x, w in zip(_GL4_X, _GL4_W):
        t = mid + half * x
        mu = cos_zenith(lon, lat, doy_frac + t / 24.0 - utc_hours / 24.0, t)
        mu_pos = jnp.maximum(mu, 0.0)
        mu_acc = mu_acc + 0.5 * w * mu_pos
        lit_acc = lit_acc + 0.5 * w * (mu > 0.0)
    return mu_acc, lit_acc
