"""Solar geometry: declination, instantaneous and timestep-averaged cosine
of the solar zenith angle, and daylength.

TPU-native rebuild of
``/root/reference/src/physics/incident_shortwave.cc:14-121`` (derived from
shr_orb_mod.F90's shr_orb_avg_cosz) and ``day_length.cc`` (DaylengthMod).
All functions are elementwise jnp, usable per-cell on device or host.

Parity note (ledgered in PARITY.md): the reference's ``daylength``
clamps latitude with ``max(1.0 * offset_pole, lat)``
(``day_length.cc:30``; the Fortran original DaylengthMod.F90 has
``max(-1._r8 * offset_pole, lat)``), making ``my_lat`` always ≈ +π/2 —
every latitude gets the north pole's daylength (0 or 86400 s), and the
southern hemisphere gets ``max_dayl = 0`` so the driver's
``dayl_factor = (dayl/max_dayl)^2`` is 0/0 = **NaN** (any southern
column NaNs out within a day of model time).  The production default
here fixes the clamp (real daylengths at every latitude); the
reference's quirk remains available as ``elm_clamp_quirk=True`` for
golden-fixture parity (tests/test_misc_modules.py).
"""

from __future__ import annotations

import jax.numpy as jnp

from elmkernels_tpu import constants as c

_TWO_PI = 2.0 * c.ELM_PI
_PI = c.ELM_PI


def declination_angle_sin(doy):
    """Reference: incident_shortwave.cc:17."""
    return 23.45 * _PI / 180.0 * jnp.sin(_TWO_PI * (284.0 + doy) / 365.0)


def coszen(latrad, lonrad, jday):
    """Instantaneous cos(zenith), floored at 0.001.

    Reference: incident_shortwave.cc:20-24.
    """
    decrad = declination_angle_sin(jnp.floor(jday))
    cosz = (jnp.sin(latrad) * jnp.sin(decrad)
            - jnp.cos(latrad) * jnp.cos(decrad)
            * jnp.cos((jday - jnp.floor(jday)) * _TWO_PI + lonrad))
    return jnp.maximum(cosz, 0.001)


def _ensure_tan_defined(var):
    half = _PI / 2.0
    return jnp.where(var == half, var - 1.0e-05,
                     jnp.where(var == -half, var + 1.0e-05, var))


def average_cosz(latrad, lonrad, dt, jday):
    """Timestep-averaged cos(zenith) by hour-angle integration.

    Reference: incident_shortwave.cc:34-121 (``average_cosz`` chain).
    """
    dtrad = dt * _TWO_PI / 86400.0
    t_start = (jday - jnp.floor(jday)) * _TWO_PI + lonrad - _PI
    t_start = jnp.where(t_start >= _PI, t_start - _TWO_PI,
                        jnp.where(t_start < -_PI, t_start + _TWO_PI,
                                  t_start))
    t_end = t_start + dtrad
    declin = declination_angle_sin(jnp.floor(jday))
    cos_h_raw = (-jnp.tan(_ensure_tan_defined(latrad))
                 * jnp.tan(_ensure_tan_defined(declin)))
    cos_h = jnp.where(cos_h_raw <= -1.0, _PI,
                      jnp.where(cos_h_raw >= 1.0, 0.0,
                                jnp.arccos(jnp.clip(cos_h_raw, -1.0, 1.0))))

    # hour angles (incident_shortwave.cc:62-95)
    case1 = (t_end >= _PI) & (t_start <= _PI) & (_PI - cos_h <= dtrad)
    case2 = (t_end >= -_PI) & (t_start <= -_PI) & (_PI - cos_h <= dtrad)

    ha0_1 = jnp.clip(t_start, -cos_h, cos_h)
    ha1_1 = cos_h
    ha2_1 = _TWO_PI - cos_h
    ha3_1 = jnp.clip(t_end, _TWO_PI - cos_h, _TWO_PI + cos_h)

    ha0_2 = jnp.clip(t_start, -_TWO_PI - cos_h, -_TWO_PI + cos_h)
    ha1_2 = -_TWO_PI + cos_h
    ha2_2 = -cos_h
    ha3_2 = jnp.clip(t_end, -cos_h, cos_h)

    ts_wrap = jnp.where(t_start > _PI, t_start - _TWO_PI,
                        jnp.where(t_start < -_PI, t_start + _TWO_PI,
                                  t_start))
    te_wrap = jnp.where(t_end > _PI, t_end - _TWO_PI,
                        jnp.where(t_end < -_PI, t_end + _TWO_PI, t_end))
    ha0_3 = jnp.clip(ts_wrap, -cos_h, cos_h)
    ha1_3 = jnp.clip(te_wrap, -cos_h, cos_h)

    ha0 = jnp.where(case1, ha0_1, jnp.where(case2, ha0_2, ha0_3))
    ha1 = jnp.where(case1, ha1_1, jnp.where(case2, ha1_2, ha1_3))
    ha2 = jnp.where(case1, ha2_1, jnp.where(case2, ha2_2, 0.0))
    ha3 = jnp.where(case1, ha3_1, jnp.where(case2, ha3_2, 0.0))

    aa = jnp.sin(latrad) * jnp.sin(declin)
    bb = jnp.cos(latrad) * jnp.cos(declin)
    val = ((aa * (ha1 - ha0) + bb * (jnp.sin(ha1) - jnp.sin(ha0))) / dtrad
           + (aa * (ha3 - ha2) + bb * (jnp.sin(ha3) - jnp.sin(ha2))) / dtrad)
    return jnp.where((ha1 > ha0) | (ha3 > ha2), val, 0.0)


def daylength(lat, decl, elm_clamp_quirk: bool = False):
    """Daylength in seconds.  Reference: day_length.cc (``daylength``).

    The default fixes the reference's latitude-clamp typo (see module
    docstring: with the quirk every latitude collapses to the north
    pole's 0-or-24h daylength and southern ``dayl_factor`` is NaN);
    ``elm_clamp_quirk=True`` reproduces ``day_length.cc:30`` exactly
    for golden parity."""
    secs_per_radian = 13750.9871
    lat_epsilon = 10.0 * jnp.finfo(jnp.float64).eps
    pole = _PI / 2.0
    offset_pole = pole - lat_epsilon
    sign = 1.0 if elm_clamp_quirk else -1.0
    my_lat = jnp.minimum(offset_pole,
                         jnp.maximum(sign * offset_pole, lat))
    temp = jnp.clip(-(jnp.sin(my_lat) * jnp.sin(decl))
                    / (jnp.cos(my_lat) * jnp.cos(decl)), -1.0, 1.0)
    return 2.0 * secs_per_radian * jnp.arccos(temp)


def max_daylength(lat, elm_clamp_quirk: bool = False):
    """Reference: day_length.cc (``max_daylength``)."""
    return jnp.where(
        lat < 0.0, daylength(lat, -0.409571, elm_clamp_quirk),
        daylength(lat, 0.409571, elm_clamp_quirk))
