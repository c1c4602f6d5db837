"""Satellite phenology interpolation with snow-burial adjustment.

TPU-native rebuild of
``/root/reference/src/physics/phenology_physics_impl.hh`` (from ELM's
SatellitePhenologyMod.F90).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from elmkernels_tpu import constants as c


class PhenologyOut(NamedTuple):
    tlai: jnp.ndarray
    tsai: jnp.ndarray
    htop: jnp.ndarray
    hbot: jnp.ndarray
    elai: jnp.ndarray
    esai: jnp.ndarray
    frac_veg_nosno_alb: jnp.ndarray


def compute_phenology(mlai1, mlai2, msai1, msai2, mhtop1, mhtop2, mhbot1,
                      mhbot2, snow_depth, frac_sno, vtype, wt1,
                      wt2) -> PhenologyOut:
    """Interpolate monthly LAI/SAI/heights and bury by snow
    (Wang & Zeng 2007 for short vegetation).

    Reference: ``phenology_physics_impl.hh`` (``ComputePhenology``);
    m*1/m*2 are the two bracketing monthly slices [ncol].
    """
    veg = vtype != c.NOVEG
    tlai = jnp.where(veg, wt1 * mlai1 + wt2 * mlai2, 0.0)
    tsai = jnp.where(veg, wt1 * msai1 + wt2 * msai2, 0.0)
    htop = jnp.where(veg, wt1 * mhtop1 + wt2 * mhtop2, 0.0)
    hbot = jnp.where(veg, wt1 * mhbot1 + wt2 * mhbot2, 0.0)

    tall = (vtype > c.NOVEG) & (vtype <= c.NBRDLF_DCD_BRL_SHRUB)
    ol = jnp.clip(snow_depth - hbot, 0.0, jnp.maximum(htop - hbot, 0.0))
    fb_tall = 1.0 - ol / jnp.maximum(1.e-06, htop - hbot)
    fb_short = 1.0 - jnp.clip(snow_depth, 0.0, 0.2) / 0.2
    fb = jnp.where(tall, fb_tall, fb_short)

    elai = jnp.maximum(tlai * (1.0 - frac_sno) + tlai * fb * frac_sno, 0.0)
    esai = jnp.maximum(tsai * (1.0 - frac_sno) + tsai * fb * frac_sno, 0.0)
    elai = jnp.where(elai < 0.05, 0.0, elai)
    esai = jnp.where(esai < 0.05, 0.0, esai)
    frac_veg_nosno_alb = ((elai + esai) >= 0.05).astype(jnp.int32)
    return PhenologyOut(tlai, tsai, htop, hbot, elai, esai,
                        frac_veg_nosno_alb)
