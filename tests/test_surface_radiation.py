"""Golden tests for surface_radiation + canopy_sunshade_fractions vs the
reference kernels (fixtures from tools/goldengen)."""

import jax

from elmkernels_tpu import constants as c
from elmkernels_tpu.physics import surface_radiation as sr
from elmkernels_tpu.utils.golden import GoldenFile, compare

from helpers import batch, batch_int, unbatch

LAND = c.LandType(ltype=1, ctype=1, vtype=12)


@jax.jit
def _rad_step(a):
    tot = sr.total_absorbed_radiation(
        LAND, a["snl"], a["ftdd"], a["ftid"], a["ftii"], a["forc_solad"],
        a["forc_solai"], a["fabd"], a["fabi"], a["albsod"], a["albsoi"],
        a["albsnd_hst"], a["albsni_hst"], a["albgrd"], a["albgri"])
    sabg_lyr = sr.layer_absorbed_radiation(
        LAND, a["snl"], tot.sabg, tot.sabg_snow, a["snow_depth"],
        a["flx_absdv"], a["flx_absdn"], a["flx_absiv"], a["flx_absin"],
        tot.trd, tot.tri)
    fsr = sr.reflected_radiation(LAND, a["albd"], a["albi"], a["forc_solad"],
                                 a["forc_solai"])
    return {"sabg_soil": tot.sabg_soil, "sabg_snow": tot.sabg_snow,
            "sabg": tot.sabg, "sabv": tot.sabv, "fsa": tot.fsa,
            "fsr": fsr, "sabg_lyr": sabg_lyr, "trd": tot.trd, "tri": tot.tri}


def test_surface_radiation_golden(golden_dirs):
    ref_data_dir, fixture_dir = golden_dirs
    gin = GoldenFile(str(ref_data_dir / "SurfaceRadiation_IN.txt"))
    gref = GoldenFile(str(fixture_dir / "SurfaceRadiation_REF.txt"))

    float_keys = ["ftdd", "ftid", "ftii", "forc_solad", "forc_solai", "fabd",
                  "fabi", "albsod", "albsoi", "albsnd_hst", "albsni_hst",
                  "albgrd", "albgri", "flx_absdv", "flx_absdn", "flx_absiv",
                  "flx_absin", "albd", "albi", "snow_depth"]
    errors = []
    for t in gref.steps:
        blk = gin.state(t)
        a = {k: batch(blk, k) for k in float_keys}
        a["snl"] = batch_int(blk, "snl")
        got = _rad_step(a)
        want = gref.state(t)
        for name, val in got.items():
            compare(f"step {t}: {name}", unbatch(val), want[name],
                    rtol=1e-12, atol=1e-15, errors=errors)
    assert not errors, "\n".join(errors)


@jax.jit
def _sunshade_step(a):
    out = sr.canopy_sunshade_fractions(
        LAND, a["nrad"], a["elai"], a["tlai_z"], a["fsun_z"],
        a["forc_solad"], a["forc_solai"], a["fabd_sun_z"], a["fabd_sha_z"],
        a["fabi_sun_z"], a["fabi_sha_z"])
    return out._asdict()


def test_canopy_sunshade_golden(golden_dirs):
    ref_data_dir, fixture_dir = golden_dirs
    gin = GoldenFile(str(ref_data_dir / "CanopySunShadeFractions_IN.txt"))
    gref = GoldenFile(str(fixture_dir / "CanopySunShadeFractions_REF.txt"))

    float_keys = ["elai", "tlai_z", "fsun_z", "forc_solad", "forc_solai",
                  "fabd_sun_z", "fabd_sha_z", "fabi_sun_z", "fabi_sha_z"]
    errors = []
    for t in gref.steps:
        blk = gin.state(t)
        a = {k: batch(blk, k) for k in float_keys}
        a["nrad"] = batch_int(blk, "nrad")
        got = _sunshade_step(a)
        want = gref.state(t)
        for name, val in got.items():
            compare(f"step {t}: {name}", unbatch(val), want[name],
                    rtol=1e-12, atol=1e-15, errors=errors)
    assert not errors, "\n".join(errors)
