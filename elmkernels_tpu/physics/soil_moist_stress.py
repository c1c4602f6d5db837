"""Root-zone soil moisture stress (btran) and per-layer root resistance.

TPU-native rebuild of
``/root/reference/src/physics/soil_moist_stress_impl.hh:5-135`` (from ELM's
SoilMoistStressMod.F90).  PERCHROOT/PERCHROOT_ALT are static config (both 0
by default, matching ``ELMconfig``).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from elmkernels_tpu import constants as c
from elmkernels_tpu.physics.math_utils import safe_div


def soil_suction(smpsat, s, bsw):
    """Reference: ``soil_moist_stress_impl.hh:22-23``."""
    return -smpsat * s ** (-bsw)


def calc_effective_soilporosity(watsat, h2osoi_ice, dz):
    """Effective porosity = watsat - vol_ice, per soil layer [ncol, nlevgrnd].

    Reference: ``soil_moist_stress_impl.hh:60-73``.  watsat is soil-only;
    ice/dz are combined snow+soil arrays.
    """
    i0 = c.NLEVSNO
    vol_ice = jnp.minimum(
        watsat, h2osoi_ice[:, i0:] / (c.DENICE * dz[:, i0:]))
    return watsat - vol_ice


def calc_volumetric_h2oliq(eff_por, h2osoi_liq, dz):
    """Volumetric liquid water content per soil layer [ncol, nlevgrnd].

    Reference: ``soil_moist_stress_impl.hh:75-85``.
    """
    i0 = c.NLEVSNO
    return jnp.minimum(eff_por, h2osoi_liq[:, i0:] / (dz[:, i0:] * c.DENH2O))


class RootMoistStressOut(NamedTuple):
    rootr: jnp.ndarray  # [ncol, nlevgrnd]
    btran: jnp.ndarray


def calc_root_moist_stress(h2osoi_liqvol, rootfr, t_soisno, tc_stress,
                           sucsat, watsat, bsw, smpso, smpsc, eff_porosity,
                           altmax_indx, altmax_lastyear_indx,
                           btran) -> RootMoistStressOut:
    """Per-layer root water stress and integrated transpiration factor.

    Reference: ``soil_moist_stress_impl.hh:87-133``; with
    perchroot = perchroot_alt = 0 the unfrozen-root normalization reduces
    to using rootfr directly.  ``h2osoi_liqvol`` is soil-only here
    (layer 0 = top soil), unlike the reference's snow-offset scratch.
    """
    i0 = c.NLEVSNO
    t_soil = t_soisno[:, i0:]

    wet = (h2osoi_liqvol > 0.0) & (t_soil > c.TFRZ + tc_stress)
    s_node = jnp.maximum(
        safe_div(h2osoi_liqvol, eff_porosity, eff_porosity > 0.0), 0.01)
    smp_node = jnp.maximum(smpsc, soil_suction(sucsat, s_node, bsw))
    rresis = jnp.minimum(
        (eff_porosity / watsat) * (smp_node - smpsc) / (smpso - smpsc), 1.0)
    rootr = jnp.where(wet, rootfr * rresis, 0.0)

    btran_new = btran + jnp.sum(jnp.maximum(rootr, 0.0) * wet, axis=-1)
    rootr = jnp.where((btran_new > 0.0)[:, None],
                      rootr / jnp.where(btran_new > 0.0,
                                        btran_new, 1.0)[:, None], 0.0)
    return RootMoistStressOut(rootr, btran_new)
