"""Cold-start initialization: snow layers/state, soil temperature/water,
root fraction, topography factors, and per-step init — batched.

TPU-native rebuild of
``/root/reference/src/physics/init_snow_state_impl.hh``,
``init_soil_state_impl.hh``, ``init_topography_impl.hh``, and
``init_timestep_impl.hh`` (from initVerticalMod/ColumnDataType/clm_driver).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from elmkernels_tpu import constants as c
from elmkernels_tpu.physics.math_utils import safe_tanh
from elmkernels_tpu.physics.math_utils import take_layer

_NSNO = c.NLEVSNO


class InitSnowLayersOut(NamedTuple):
    snl: jnp.ndarray
    dz: jnp.ndarray   # [ncol, NLEVSNO] snow part
    z: jnp.ndarray
    zi: jnp.ndarray   # [ncol, NLEVSNO+1] (zi[NLEVSNO] = 0)


def init_snow_layers(snow_depth, lakpoi: bool) -> InitSnowLayersOut:
    """Snow layer structure from initial snow depth.

    Reference: ``init_snow_state_impl.hh`` (``init_snow_layers``),
    the 8-interval depth ladder.
    """
    d = snow_depth
    ncol = d.shape[0]
    dz = jnp.zeros((ncol, _NSNO), d.dtype)
    if lakpoi:
        z = jnp.zeros((ncol, _NSNO), d.dtype)
        zi = jnp.zeros((ncol, _NSNO + 1), d.dtype)
        return InitSnowLayersOut(jnp.zeros_like(d, dtype=jnp.int32), dz, z,
                                 zi)

    snl = jnp.select(
        [d < 0.01, d <= 0.03, d <= 0.07, d <= 0.18, d <= 0.41],
        [0, 1, 2, 3, 4], 5).astype(jnp.int32)

    d4 = jnp.select(
        [d < 0.01,
         d <= 0.03,               # snl=1: all in layer 4
         d <= 0.04,               # snl=2: half/half
         d <= 0.07,               # snl=2: 0.02 + rest
         d <= 0.12,               # snl=3
         d <= 0.18,               # snl=3
         d <= 0.29,               # snl=4
         d <= 0.41,               # snl=4
         d <= 0.64],              # snl=5
        [0.0, d, d / 2.0, d - 0.02, (d - 0.02) / 2.0, d - 0.07,
         (d - 0.07) / 2.0, d - 0.18, (d - 0.18) / 2.0],
        d - 0.41)
    d3 = jnp.select(
        [d <= 0.03, d <= 0.04, d <= 0.07, d <= 0.12, d <= 0.18, d <= 0.29,
         d <= 0.41, d <= 0.64],
        [0.0, d / 2.0, 0.02, (d - 0.02) / 2.0, 0.05, (d - 0.07) / 2.0,
         0.11, (d - 0.18) / 2.0], 0.23)
    d2 = jnp.select(
        [d <= 0.07, d <= 0.18, d <= 0.41], [0.0, 0.02, 0.05], 0.11)
    d1 = jnp.select([d <= 0.18, d <= 0.41], [0.0, 0.02], 0.05)
    d0 = jnp.where(d <= 0.41, 0.0, 0.02)
    dz = jnp.stack([d0, d1, d2, d3, d4], axis=1)

    # reference semantics: with snow present, layers above the top active
    # layer keep the SPVAL sentinel; the no-snow branch zeroes everything
    top = _NSNO - snl
    lev = jnp.arange(_NSNO)[None, :]
    inactive = lev < top[:, None]
    none = (d < 0.01)[:, None]
    dz = jnp.where(none, 0.0, jnp.where(inactive, c.SPVAL, dz))

    zi = jnp.full((ncol, _NSNO + 1), c.SPVAL, d.dtype)
    zi = zi.at[:, _NSNO].set(0.0)
    z = jnp.full((ncol, _NSNO), c.SPVAL, d.dtype)
    for i in range(_NSNO - 1, -1, -1):
        act = i >= top
        z = z.at[:, i].set(jnp.where(act, zi[:, i + 1] - 0.5 * dz[:, i],
                                     z[:, i]))
        zi = zi.at[:, i].set(jnp.where(act, zi[:, i + 1] - dz[:, i],
                                       zi[:, i]))
    z = jnp.where(none, 0.0, z)
    zi = jnp.where(jnp.broadcast_to(none, zi.shape), 0.0, zi)
    return InitSnowLayersOut(snl, dz, z, zi)


def init_snow_state(land: c.LandType, snl, snow_depth, h2osno):
    """Initial frac_sno and snw_rds.  Reference: ``init_snow_state_impl.hh``
    (``init_snow_state``; the other fields init to 0)."""
    if land.urbpoi:
        frac_sno = jnp.minimum(snow_depth / 0.05, 1.0)
    else:
        snowbd = jnp.minimum(
            400.0, h2osno / jnp.where(snow_depth > 0.0, snow_depth, 1.0))
        fmelt = snowbd / 100.0
        frac_sno = jnp.where(
            snow_depth > 0.0,
            safe_tanh(snow_depth / (2.5 * c.ZLND * fmelt)), 0.0)
    lev = jnp.arange(_NSNO)[None, :]
    active = lev >= (_NSNO - snl)[:, None]
    thin = ((snl == 0) & (h2osno > 0.0))[:, None] & (lev == _NSNO - 1)
    snw_rds = jnp.where(active | thin, c.SNW_RDS_MIN, 0.0)
    return frac_sno, snw_rds


def init_soil_temp(land: c.LandType, snl, ncol, dtype=jnp.float64):
    """Cold-start temperature profile + t_grnd.

    Reference: ``init_soil_state_impl.hh`` (``init_soil_temp``).
    """
    ice = c.ltype_mask(land, c.ISTICE, c.ISTICE_MEC)
    wet = c.ltype_mask(land, c.ISTWET)
    if isinstance(ice, bool):
        t_soil = 250.0 if ice else (277.0 if wet else 274.0)
    else:
        t_soil = jnp.where(ice, 250.0,
                           jnp.where(wet, 277.0, 274.0))[:, None]
    lev = jnp.arange(c.NLEVTOT)[None, :]
    snow_active = (lev < _NSNO) & (lev >= (_NSNO - snl)[:, None])
    t = jnp.where(lev >= _NSNO, t_soil, jnp.where(snow_active, 250.0, 0.0))
    t = jnp.broadcast_to(t, (ncol, c.NLEVTOT)).astype(dtype)
    t_grnd = take_layer(t, _NSNO - snl)
    return t, t_grnd


def init_soilh2o_state(land: c.LandType, snl, watsat, t_soisno, dz):
    """Cold-start soil water from volumetric content.

    Reference: ``init_soil_state_impl.hh`` (``init_soilh2o_state``),
    soil/crop path.
    """
    lev_g = jnp.arange(c.NLEVGRND)[None, :]
    sc = c.ltype_mask(land, c.ISTSOIL, c.ISTCROP)
    wet = c.ltype_mask(land, c.ISTWET)
    if sc is True:
        vol0 = jnp.where(lev_g >= c.NLEVBED, 0.0, 0.15)
    elif wet is True:
        vol0 = jnp.where(lev_g >= c.NLEVBED, 0.0, 1.0)
    elif isinstance(sc, bool) and isinstance(wet, bool):
        vol0 = jnp.ones_like(watsat)
    else:
        vol0 = c.lsel(sc, jnp.where(lev_g >= c.NLEVBED, 0.0, 0.15),
                      c.lsel(wet, jnp.where(lev_g >= c.NLEVBED, 0.0, 1.0),
                             jnp.ones_like(watsat)))
    h2osoi_vol = jnp.minimum(jnp.broadcast_to(vol0, watsat.shape), watsat)

    dz_soil = dz[:, _NSNO:]
    frozen = t_soisno[:, _NSNO:] <= c.TFRZ
    ice_soil = jnp.where(frozen, dz_soil * c.DENICE * h2osoi_vol, 0.0)
    liq_soil = jnp.where(frozen, 0.0, dz_soil * c.DENH2O * h2osoi_vol)

    lev_s = jnp.arange(_NSNO)[None, :]
    active = lev_s >= (_NSNO - snl)[:, None]
    ice_snow = jnp.where(active, dz[:, :_NSNO] * 250.0, 0.0)
    liq_snow = jnp.zeros_like(ice_snow)

    h2osoi_ice = jnp.concatenate([ice_snow, ice_soil], axis=1)
    h2osoi_liq = jnp.concatenate([liq_snow, liq_soil], axis=1)
    return h2osoi_vol, h2osoi_liq, h2osoi_ice


def init_vegrootfr(vtype, roota_par, rootb_par, zi_soil):
    """Zeng (2001) root fraction profile [ncol, NLEVGRND].

    Reference: ``init_soil_state_impl.hh`` (``init_vegrootfr``);
    ``zi_soil`` holds soil interfaces (zi at combined index i+NLEVSNO).
    ``vtype`` is an int or [ncol] PFT array; NOVEG columns get an
    all-zero profile per column (no trace-static early-out — a scalar
    branch would broadcast one column's PFT over a heterogeneous batch).
    """
    ncol = zi_soil.shape[0]
    out = jnp.zeros((ncol, c.NLEVGRND), zi_soil.dtype)
    for i in range(c.NLEVSOI - 1):
        val = 0.5 * (jnp.exp(-roota_par * zi_soil[:, i])
                     + jnp.exp(-rootb_par * zi_soil[:, i])
                     - jnp.exp(-roota_par * zi_soil[:, i + 1])
                     - jnp.exp(-rootb_par * zi_soil[:, i + 1]))
        out = out.at[:, i].set(val)
    last = 0.5 * (jnp.exp(-roota_par * zi_soil[:, c.NLEVSOI - 1])
                  + jnp.exp(-rootb_par * zi_soil[:, c.NLEVSOI - 1]))
    out = out.at[:, c.NLEVSOI - 1].set(last)
    noveg = jnp.asarray(vtype) == c.NOVEG
    noveg = noveg[:, None] if noveg.ndim else noveg
    return jnp.where(noveg, jnp.zeros_like(out), out)


def init_topo_slope(raw_topo_slope):
    """Reference: ``init_topography_impl.hh``."""
    return jnp.maximum(raw_topo_slope, 0.2)


def init_melt_factor(land: c.LandType, topo_std):
    """Reference: ``init_topography_impl.hh``."""
    icemec = c.ltype_mask(land, c.ISTICE_MEC)
    return c.lsel(icemec, jnp.full_like(topo_std, 10.0),
                  200.0 / jnp.maximum(10.0, topo_std))


def init_micro_sigma(topo_slope):
    """Reference: ``init_topography_impl.hh``."""
    slopebeta = 3.0
    slopemax = 0.4
    slope0 = slopemax ** (-1.0 / slopebeta)
    return (topo_slope + slope0) ** (-slopebeta)


class InitTimestepOut(NamedTuple):
    do_capsnow: jnp.ndarray
    frac_veg_nosno: jnp.ndarray
    frac_iceold: jnp.ndarray


def init_timestep(land: c.LandType, veg_active, frac_veg_nosno_alb, snl,
                  h2osno, h2osoi_ice, h2osoi_liq,
                  frac_iceold) -> InitTimestepOut:
    """Per-step resets: snow capping flag, exposed-vegetation flag, ice
    fraction of snow from previous step.

    Reference: ``init_timestep_impl.hh`` (``init_timestep``).
    """
    do_capsnow = (h2osno > c.H2OSNO_MAX).astype(jnp.int32)
    frac_veg_nosno = jnp.where(veg_active, frac_veg_nosno_alb, 0)
    lev = jnp.arange(_NSNO)[None, :]
    active = lev >= (_NSNO - snl)[:, None]
    tot = h2osoi_liq[:, :_NSNO] + h2osoi_ice[:, :_NSNO]
    frac = h2osoi_ice[:, :_NSNO] / jnp.where(tot != 0.0, tot, 1.0)
    frac_iceold = jnp.where(active, frac, frac_iceold[:, :_NSNO])
    return InitTimestepOut(do_capsnow, frac_veg_nosno, frac_iceold)
