"""Monin-Obukhov friction velocity and profile factors (Zeng et al. 1998).

TPU-native rebuild of
``/root/reference/src/physics/friction_velocity_impl.hh:13-175`` (from
ELM's FrictionVelocityMod.F90).  The four-regime flux-gradient relations
become ``jnp.where`` ladders; all regimes are evaluated for every column
(cheap scalar math on the VPU) and the applicable one is selected.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from elmkernels_tpu import constants as c

_ZETAM = 1.574  # transition point, wind profile
_ZETAT = 0.465  # transition point, temperature profile


def stability_func1(zeta):
    """ψ_m used in the wind profile.  Reference: lines 16-23."""
    chik2 = jnp.sqrt(jnp.maximum(1.0 - 16.0 * zeta, 0.0))
    chik = jnp.sqrt(chik2)
    return (2.0 * jnp.log((1.0 + chik) * 0.5) + jnp.log((1.0 + chik2) * 0.5)
            - 2.0 * jnp.arctan(chik) + c.ELM_PI * 0.5)


def stability_func2(zeta):
    """ψ_h used in the scalar profiles.  Reference: lines 26-32."""
    chik2 = jnp.sqrt(jnp.maximum(1.0 - 16.0 * zeta, 0.0))
    return 2.0 * jnp.log((1.0 + chik2) * 0.5)


class MOLengthOut(NamedTuple):
    um: jnp.ndarray
    obu: jnp.ndarray


def monin_obukhov_length(ur, thv, dthv, zldis, z0m) -> MOLengthOut:
    """Initial wind-speed magnitude and Monin-Obukhov length.

    Reference: lines 34-59 (``monin_obukhov_length``).
    """
    wc = 0.5
    um = jnp.where(dthv >= 0.0, jnp.maximum(ur, 0.1),
                   jnp.sqrt(ur * ur + wc * wc))
    rib = c.GRAV * zldis * dthv / (thv * um * um)
    zeta_stable = jnp.clip(
        rib * jnp.log(zldis / z0m) / (1.0 - 5.0 * jnp.minimum(rib, 0.19)),
        0.01, 2.0)
    zeta_unstable = jnp.clip(rib * jnp.log(zldis / z0m), -100.0, -0.01)
    zeta = jnp.where(rib >= 0.0, zeta_stable, zeta_unstable)
    return MOLengthOut(um, zldis / zeta)


def _safe_log(x):
    return jnp.log(jnp.maximum(x, 1e-300))


def _safe_npow(x, p):
    # pow of a possibly-negative base in a branch not selected
    return jnp.maximum(x, 1e-300) ** p


def friction_velocity_wind(forc_hgt_u_patch, displa, um, obu, z0m):
    """u* from the 4-regime wind profile.  Reference: lines 61-81."""
    zldis = forc_hgt_u_patch - displa
    zeta = zldis / obu

    very_unstable = c.VKC * um / (
        _safe_log(-_ZETAM * obu / z0m) - stability_func1(-_ZETAM)
        + stability_func1(z0m / obu)
        + 1.14 * (_safe_npow(-zeta, 0.333) - _ZETAM ** 0.333))
    unstable = c.VKC * um / (
        _safe_log(zldis / z0m) - stability_func1(zeta)
        + stability_func1(z0m / obu))
    stable = c.VKC * um / (
        _safe_log(zldis / z0m) + 5.0 * zeta - 5.0 * z0m / obu)
    very_stable = c.VKC * um / (
        _safe_log(obu / z0m) + 5.0 - 5.0 * z0m / obu
        + (5.0 * _safe_log(zeta) + zeta - 1.0))

    return jnp.where(
        zeta < -_ZETAM, very_unstable,
        jnp.where(zeta < 0.0, unstable,
                  jnp.where(zeta <= 1.0, stable, very_stable)))


def _profile_factor(zldis, obu, z0):
    """Shared 4-regime scalar profile factor (temp/humidity variants)."""
    zeta = zldis / obu
    very_unstable = c.VKC / (
        _safe_log(-_ZETAT * obu / z0) - stability_func2(-_ZETAT)
        + stability_func2(z0 / obu)
        + 0.8 * (_ZETAT ** -0.333 - _safe_npow(-zeta, -0.333)))
    unstable = c.VKC / (
        _safe_log(zldis / z0) - stability_func2(zeta)
        + stability_func2(z0 / obu))
    stable = c.VKC / (_safe_log(zldis / z0) + 5.0 * zeta - 5.0 * z0 / obu)
    very_stable = c.VKC / (
        _safe_log(obu / z0) + 5.0 - 5.0 * z0 / obu
        + (5.0 * _safe_log(zeta) + zeta - 1.0))
    return jnp.where(
        zeta < -_ZETAT, very_unstable,
        jnp.where(zeta < 0.0, unstable,
                  jnp.where(zeta <= 1.0, stable, very_stable)))


def friction_velocity_temp(forc_hgt_t_patch, displa, obu, z0h):
    """Temperature profile factor temp1.  Reference: lines 83-102."""
    return _profile_factor(forc_hgt_t_patch - displa, obu, z0h)


def friction_velocity_humidity(forc_hgt_q_patch, forc_hgt_t_patch, displa,
                               obu, z0h, z0q, temp1):
    """Humidity profile factor temp2.  Reference: lines 104-128."""
    same = (forc_hgt_q_patch == forc_hgt_t_patch) & (z0q == z0h)
    return jnp.where(same, temp1,
                     _profile_factor(forc_hgt_q_patch - displa, obu, z0q))


def friction_velocity_temp2m(obu, z0h):
    """2m temperature profile factor temp12m.  Reference: lines 130-148."""
    return _profile_factor(2.0 + z0h, obu, z0h)


def friction_velocity_humidity2m(obu, z0h, z0q, temp12m):
    """2m humidity profile factor temp22m.  Reference: lines 150-173."""
    return jnp.where(z0q == z0h, temp12m, _profile_factor(2.0 + z0q, obu, z0q))
