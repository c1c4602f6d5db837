"""Round-trip test for the SNICAR optics / snow-aging NetCDF readers.

The reference reads `snicar_optics_5bnd_mam*.nc` with the variable names
mapped in ``initialize_elm_kokkos.cc:23-60`` and fixed start-0 hyperslab
counts (``snicar_data_impl.hh:55-131``); no optics .nc ships with the
repo, so this synthesizes one from the text-fixture tables and asserts
the NetCDF path reproduces them bit-exactly — including the hyperslab
contract (extra file extent is ignored) and the bc1==bc2 quirk (both BC
table sets are read from the same ``*_bc_mam`` variables).
"""

import numpy as np
import pytest

from elmkernels_tpu.data import netcdf_io, snicar_data
from elmkernels_tpu.data.params import load_snicar_from_text

SNICAR_TXT = "/root/reference/test/data/SnowOptics_IN.txt"


@pytest.fixture(scope="module")
def text_tables():
    return load_snicar_from_text(SNICAR_TXT)


def _write_optics_nc(path, t, pad=0):
    """Write the tables under the reference's file variable names; `pad`
    grows every dimension beyond the required hyperslab with trash."""
    nb, nmie = snicar_data.NUMRAD_SNW, snicar_data.IDX_MIE_SNW_MX
    nbc, nice = snicar_data.N_BC_NCLRDS, snicar_data.N_BCINT_ICERDS
    dims = {"numrad_snw": nb + pad, "idx_Mie_snw_mx": nmie + pad,
            "idx_bc_nclrds": nbc + pad, "idx_bcint_icerds": nice + pad}

    def padded(arr, shape_dims):
        arr = np.asarray(arr, np.float64)
        if pad == 0:
            return arr
        out = np.full([dims[d] for d in shape_dims], 999.0)
        out[tuple(slice(0, s) for s in arr.shape)] = arr
        return out

    variables = {}
    aer = {"oc1": "ocphil", "oc2": "ocphob", "dst1": "dust01",
           "dst2": "dust02", "dst3": "dust03", "dst4": "dust04"}
    for slot, fname in aer.items():
        for p in ("ss_alb", "asm_prm", "ext_cff_mss"):
            variables[f"{p}_{fname}"] = (
                ("numrad_snw",),
                padded(getattr(t, f"{p}_{slot}"), ("numrad_snw",)))
    for kind in ("drc", "dfs"):
        for p in ("ss_alb", "asm_prm", "ext_cff_mss"):
            variables[f"{p}_ice_{kind}"] = (
                ("numrad_snw", "idx_Mie_snw_mx"),
                padded(getattr(t, f"{p}_snw_{kind}"),
                       ("numrad_snw", "idx_Mie_snw_mx")))
    # one bc_mam variable set feeds BOTH bc1 and bc2 slots — use the
    # text fixture's bc1 tables as the file contents
    for p in ("ss_alb", "asm_prm", "ext_cff_mss"):
        variables[f"{p}_bc_mam"] = (
            ("idx_bc_nclrds", "numrad_snw"),
            padded(getattr(t, f"{p}_bc1"), ("idx_bc_nclrds", "numrad_snw")))
    variables["bcint_enh_mam"] = (
        ("idx_bcint_icerds", "idx_bc_nclrds", "numrad_snw"),
        padded(t.bcenh, ("idx_bcint_icerds", "idx_bc_nclrds",
                         "numrad_snw")))
    netcdf_io.write_nc(str(path), dims, variables)


@pytest.mark.parametrize("pad", [0, 3])
def test_optics_roundtrip(tmp_path, text_tables, pad):
    path = tmp_path / "snicar_optics_5bnd_synthetic.nc"
    _write_optics_nc(path, text_tables, pad=pad)
    rt = snicar_data.read_snicar_data(str(path))
    for field in text_tables._fields:
        got = np.asarray(getattr(rt, field))
        if field.endswith("_bc2"):
            # file contract: bc2 slots are filled from the same bc_mam
            # variables as bc1 (snicar_data_impl.hh:96-116)
            want = np.asarray(getattr(text_tables, field[:-1] + "1"))
        else:
            want = np.asarray(getattr(text_tables, field))
        np.testing.assert_array_equal(got, want, err_msg=field)


def test_optics_missing_variable(tmp_path, text_tables):
    path = tmp_path / "optics_incomplete.nc"
    _write_optics_nc(path, text_tables)
    # rewrite without bcenh
    f = netcdf_io.open_nc(str(path))
    variables = {n: (v.dimensions, np.asarray(v[:]))
                 for n, v in f.variables.items() if n != "bcint_enh_mam"}
    dims = dict(f.dimensions)
    path2 = tmp_path / "optics_missing.nc"
    netcdf_io.write_nc(str(path2), dims, variables)
    with pytest.raises(KeyError):
        snicar_data.read_snicar_data(str(path2))


def test_optics_short_extent_rejected(tmp_path, text_tables):
    # complete file, but the ice tables carry only 100 Mie bins (< 1471)
    path = tmp_path / "optics_full.nc"
    _write_optics_nc(path, text_tables)
    f = netcdf_io.open_nc(str(path))
    dims = dict(f.dimensions)
    dims["idx_Mie_snw_mx"] = 100
    variables = {}
    for n, v in f.variables.items():
        arr = np.asarray(v[:])
        if "idx_Mie_snw_mx" in v.dimensions:
            arr = arr[..., :100]
        variables[n] = (v.dimensions, arr)
    path2 = tmp_path / "optics_short.nc"
    netcdf_io.write_nc(str(path2), dims, variables)
    with pytest.raises(ValueError, match="smaller than"):
        snicar_data.read_snicar_data(str(path2))


def test_optics_feed_model_identical(tmp_path, text_tables):
    """NetCDF-loaded tables must drive the albedo pipeline identically
    to the text-fixture tables (they are the same numbers)."""
    import jax
    path = tmp_path / "optics.nc"
    _write_optics_nc(path, text_tables)
    rt = snicar_data.read_snicar_data(str(path))

    from elmkernels_tpu.driver.model import Model
    from elmkernels_tpu.utils.dates import Date
    m = Model(ncol=2)
    m.run(Date.from_ymd(1985, 1, 5), 3)  # build up a snow pack
    forc = jax.tree.map(np.asarray, m.forcing.window(
        Date.from_ymd(1985, 1, 5, 3 * 1800), m.dtime))
    phen = jax.tree.map(np.asarray, m.phenology.window(
        Date.from_ymd(1985, 1, 5)))
    from elmkernels_tpu.driver import step as step_mod
    step = jax.jit(lambda sn, st, f, p: step_mod.advance(
        m.land, m.psnveg, m.albveg, sn, m.params, st, f, p, m.dtime))
    out_txt = step(m.snicar, m.state, forc, phen)
    out_nc = step(rt._replace(
        **{f: getattr(m.snicar, f) for f in m.snicar._fields
           if f.endswith("_bc2")}), m.state, forc, phen)
    np.testing.assert_array_equal(np.asarray(out_txt[0].t_grnd),
                                  np.asarray(out_nc[0].t_grnd))
    np.testing.assert_array_equal(np.asarray(out_txt[1].fsa),
                                  np.asarray(out_nc[1].fsa))


def test_snowrds_roundtrip(tmp_path):
    shape = (snicar_data.N_AGING_T, snicar_data.N_AGING_TGRD,
             snicar_data.N_AGING_RHOS)
    rng = np.random.default_rng(0)
    tau = rng.random(shape)
    kappa = rng.random(shape)
    drdt0 = rng.random(shape)
    path = tmp_path / "snicar_drdt_bst_synthetic.nc"
    dims = dict(zip(("idx_T", "idx_Tgrd", "idx_rhos"), shape))
    vd = ("idx_T", "idx_Tgrd", "idx_rhos")
    netcdf_io.write_nc(str(path), dims,
                       {"tau": (vd, tau), "kappa": (vd, kappa),
                        "drdsdt0": (vd, drdt0)})
    rtau, rkappa, rdrdt0 = snicar_data.read_snowrds_data(str(path))
    np.testing.assert_array_equal(np.asarray(rtau), tau)
    np.testing.assert_array_equal(np.asarray(rkappa), kappa)
    np.testing.assert_array_equal(np.asarray(rdrdt0), drdt0)
