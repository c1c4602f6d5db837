"""Water and energy conservation evaluators — the model's observability
primitives, batched over columns.

TPU-native rebuild of
``/root/reference/src/physics/conserved_quantity_evaluators_impl.hh:3-110``.
In the driver these become per-step asserted/logged metrics (the reference
only prints them).
"""

from __future__ import annotations

import jax.numpy as jnp

from elmkernels_tpu import constants as c


def column_water_mass(h2ocan, h2osno, h2osfc, h2osoi_ice, h2osoi_liq):
    """Total column water [kg/m2].  Reference: lines 5-15."""
    return (h2ocan + h2osno + h2osfc
            + jnp.sum(h2osoi_ice + h2osoi_liq, axis=-1))


def column_water_mass_tracked(h2ocan, h2osno, h2osfc, h2osoi_ice,
                              h2osoi_liq):
    """Total column water [kg/m2] without the reference's double count.

    The reference's ``column_water_mass`` adds ``h2osno`` *and* sums
    ice/liq over all ``nlevsno + nlevgrnd`` layers — but when snow layers
    are active (snl > 0) the pack is stored in the snow rows of
    h2osoi_ice/liq *and* aggregated in h2osno, so the evaluator counts it
    twice and errh2o spikes by the pack mass at layer creation (the
    reference only prints errh2o, so the artifact goes unnoticed there).
    The driver uses this corrected version — the pack enters via h2osno
    only; the layer sum covers soil rows — so errh2o can be asserted.
    """
    return (h2ocan + h2osno + h2osfc
            + jnp.sum(h2osoi_ice[..., c.NLEVSNO:]
                      + h2osoi_liq[..., c.NLEVSNO:], axis=-1))


def dh2o_dt(begwb, endwb, dtime):
    """Reference: lines 18-22."""
    return (endwb - begwb) / dtime


def column_water_balance_error(begwb, endwb, hydrology_source_sink,
                               forc_rain, forc_snow, qflx_evap_tot,
                               qflx_snwcp_ice, dtime):
    """Reference: lines 25-33."""
    return ((endwb - begwb)
            - (forc_rain + forc_snow - hydrology_source_sink - qflx_evap_tot
               - qflx_snwcp_ice) * dtime)


def snow_water_balance_error(snl, qflx_dew_snow, qflx_dew_grnd,
                             qflx_sub_snow, qflx_evap_grnd, qflx_snow_melt,
                             qflx_snwcp_ice, qflx_snwcp_liq,
                             qflx_sl_top_soil, frac_sno_eff, qflx_rain_grnd,
                             qflx_snow_grnd, qflx_h2osfc_ice, h2osno,
                             h2osno_old, dtime, do_capsnow):
    """Reference: lines 36-68."""
    src_cap = (frac_sno_eff * (qflx_dew_snow + qflx_dew_grnd)
               + qflx_h2osfc_ice + qflx_snow_grnd + qflx_rain_grnd)
    snk_cap = (frac_sno_eff * (qflx_sub_snow + qflx_evap_grnd)
               + qflx_snwcp_ice + qflx_snwcp_liq + qflx_snow_melt
               + qflx_sl_top_soil)
    src_nc = (qflx_snow_grnd
              + frac_sno_eff * (qflx_rain_grnd + qflx_dew_snow
                                + qflx_dew_grnd) + qflx_h2osfc_ice)
    snk_nc = (frac_sno_eff * (qflx_sub_snow + qflx_evap_grnd)
              + qflx_snow_melt + qflx_sl_top_soil)
    cap = do_capsnow != 0
    src = jnp.where(cap, src_cap, src_nc)
    snk = jnp.where(cap, snk_cap, snk_nc)
    err = (h2osno - h2osno_old) - (src - snk) * dtime
    return jnp.where(snl > 0, err, 0.0)


def solar_shortwave_balance_error(fsa, fsr, forc_solad, forc_solai):
    """Reference: lines 71-80."""
    return fsa + fsr - (forc_solad[:, 0] + forc_solad[:, 1]
                        + forc_solai[:, 0] + forc_solai[:, 1])


def solar_longwave_balance_error(eflx_lwrad_out, eflx_lwrad_net, forc_lwrad):
    """Reference: lines 83-91."""
    return eflx_lwrad_out - eflx_lwrad_net - forc_lwrad


def surface_energy_balance_error(sabv, sabg_chk, forc_lwrad, eflx_lwrad_out,
                                 eflx_sh_tot, eflx_lh_tot, eflx_soil_grnd):
    """Reference: lines 94-101."""
    return (sabv + sabg_chk + forc_lwrad - eflx_lwrad_out - eflx_sh_tot
            - eflx_lh_tot - eflx_soil_grnd)


def net_radiation(fsa, eflx_lwrad_net):
    """Reference: lines 104-108."""
    return fsa - eflx_lwrad_net
