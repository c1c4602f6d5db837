// Golden fixtures for the soil-temperature chain: thermal properties,
// surface heat fluxes, penta-diagonal CN solve, phase change, t_grnd —
// mirroring the 7-stage sequence in
// /root/reference/driver/kokkos/soil_temperature_kokkos.cc (serial build).
//
// No reference test exists for this group, so states are synthesized
// deterministically, covering snl = 0..5, thin-snow, standing-water, and
// melt/freeze regimes.  All inputs are written into the fixture alongside
// outputs, so the Python test is self-contained.
#include "goldengen.hh"

#include "array.hh"
#include "elm_constants.h"
#include "land_data.h"

namespace ELM {
  using ViewB1 = ELM::Array<bool, 1>;
  using ViewI1 = ELM::Array<int, 1>;
  using ViewI2 = ELM::Array<int, 2>;
  using ViewD1 = ELM::Array<double, 1>;
  using ViewD2 = ELM::Array<double, 2>;
  using ViewD3 = ELM::Array<double, 3>;
}
using ELM::ViewD1;
using ELM::ViewD2;
using ELM::ViewD3;
using ELM::ViewI1;

// the reference's serial invoke_kernel.hh references this Kokkos-only
// symbol unconditionally; provide a stub so the header parses
#include <utility>
namespace ELM::impl {
template <typename F, typename T, std::size_t... I>
constexpr int apply_parallel_for_tuple_impl(F&&, T&&,
                                            std::index_sequence<I...>) {
  return 0;
}
}  // namespace ELM::impl

#include "soil_temperature.h"

using namespace goldengen;
using namespace ELM::ELMdims;

static std::vector<double> row(const ViewD2& v, int c) {
  std::vector<double> out(v.extent(1));
  for (size_t i = 0; i < v.extent(1); ++i) out[i] = v(c, i);
  return out;
}
static std::vector<double> rowi(const ELM::Array<int, 2>& v, int c) {
  std::vector<double> out(v.extent(1));
  for (size_t i = 0; i < v.extent(1); ++i) out[i] = v(c, i);
  return out;
}

int main(int argc, char** argv) {
  if (argc != 2) { std::fprintf(stderr, "usage: %s OUT\n", argv[0]); return 1; }

  const int ncols = 60;
  const int nlev = nlevgrnd() + nlevsno();
  const double dtime = 1800.0;

  ViewI1 ltype("ltype", ncols);
  ViewI1 snl("snl", ncols);
  ViewI1 frac_veg_nosno("frac_veg_nosno", ncols);
  ViewD1 dlrad("dlrad", ncols), emg("emg", ncols), forc_lwrad("forc_lwrad", ncols);
  ViewD1 htvp("htvp", ncols), cgrnd("cgrnd", ncols);
  ViewD1 eflx_sh_soil("eflx_sh_soil", ncols), qflx_ev_soil("qflx_ev_soil", ncols);
  ViewD1 eflx_sh_h2osfc("eflx_sh_h2osfc", ncols), qflx_ev_h2osfc("qflx_ev_h2osfc", ncols);
  ViewD1 eflx_sh_grnd("eflx_sh_grnd", ncols), qflx_evap_soi("qflx_evap_soi", ncols);
  ViewD1 eflx_sh_snow("eflx_sh_snow", ncols), qflx_ev_snow("qflx_ev_snow", ncols);
  ViewD1 frac_sno_eff("frac_sno_eff", ncols), frac_sno("frac_sno", ncols);
  ViewD1 frac_h2osfc("frac_h2osfc", ncols);
  ViewD1 sabg_snow("sabg_snow", ncols), sabg_soil("sabg_soil", ncols);
  ViewD2 sabg_lyr("sabg_lyr", ncols, nlevsno() + 1);
  ViewD2 watsat("watsat", ncols, nlevgrnd()), sucsat("sucsat", ncols, nlevgrnd());
  ViewD2 bsw("bsw", ncols, nlevgrnd()), tkmg("tkmg", ncols, nlevgrnd());
  ViewD2 tkdry("tkdry", ncols, nlevgrnd());
  // reference indexes csol with the COMBINED snow+soil index
  // (soil_thermal_properties_impl.hh:185 / elm_state_impl.hh:114)
  ViewD2 csol("csol", ncols, nlev);
  ViewD2 dz("dz", ncols, nlev), zsoi("zsoi", ncols, nlev), zisoi("zisoi", ncols, nlev + 1);
  ViewD1 h2osfc("h2osfc", ncols), h2osno("h2osno", ncols);
  ViewD1 snow_depth("snow_depth", ncols), int_snow("int_snow", ncols);
  ViewD1 t_h2osfc("t_h2osfc", ncols), t_grnd("t_grnd", ncols);
  ViewD1 xmf_h2osfc("xmf_h2osfc", ncols), xmf("xmf", ncols);
  ViewD1 qflx_h2osfc_to_ice("qflx_h2osfc_to_ice", ncols);
  ViewD1 eflx_h2osfc_to_snow("eflx_h2osfc_to_snow", ncols);
  ViewD1 qflx_snofrz("qflx_snofrz", ncols), qflx_snow_melt("qflx_snow_melt", ncols);
  ViewD1 qflx_snomelt("qflx_snomelt", ncols), eflx_snomelt("eflx_snomelt", ncols);
  ELM::Array<int, 2> imelt("imelt", ncols, nlev);
  ViewD2 h2osoi_liq("h2osoi_liq", ncols, nlev), h2osoi_ice("h2osoi_ice", ncols, nlev);
  ViewD2 qflx_snofrz_lyr("qflx_snofrz_lyr", ncols, nlevsno());
  ViewD2 t_soisno("t_soisno", ncols, nlev);
  ViewD1 sabg_chk("sabg_chk", ncols);
  ViewD2 fact("fact", ncols, nlev);

  // ---------------- synthesize deterministic states ------------------------
  for (int c = 0; c < ncols; ++c) {
    ltype(c) = 1;
    snl(c) = c % 6;
    frac_veg_nosno(c) = c % 2;
    const int top = nlevsno() - snl(c);

    // soil grid: standard-ish exponentially growing layers
    double zprev = 0.0;
    for (int j = 0; j < nlevgrnd(); ++j) {
      dz(c, nlevsno() + j) = 0.0175 * std::pow(1.53, j);
    }
    // snow layers (active only; inactive zeroed)
    for (int i = 0; i < nlevsno(); ++i) {
      dz(c, i) = (i >= top) ? 0.01 * (2.0 + ((c + i) % 5)) : 0.0;
    }
    // interfaces: soil from 0 downward, snow upward from 0
    zisoi(c, nlevsno()) = 0.0;
    for (int j = 0; j < nlevgrnd(); ++j) {
      zisoi(c, nlevsno() + 1 + j) = zisoi(c, nlevsno() + j) + dz(c, nlevsno() + j);
      zsoi(c, nlevsno() + j) = 0.5 * (zisoi(c, nlevsno() + j) + zisoi(c, nlevsno() + 1 + j));
    }
    for (int i = nlevsno() - 1; i >= 0; --i) {
      zisoi(c, i) = zisoi(c, i + 1) - dz(c, i);
      zsoi(c, i) = zisoi(c, i + 1) - 0.5 * dz(c, i);
    }

    double swe = 0.0, sdep = 0.0;
    for (int i = 0; i < nlevsno(); ++i) {
      if (i >= top) {
        h2osoi_ice(c, i) = 4.0 + ((c * 3 + i) % 9);
        h2osoi_liq(c, i) = ((c + i) % 3 == 0) ? 0.8 + 0.1 * i : 0.0;
        t_soisno(c, i) = 267.0 + ((c * 5 + i * 3) % 9);  // 267..275 K
        swe += h2osoi_ice(c, i) + h2osoi_liq(c, i);
        sdep += dz(c, i);
      } else {
        h2osoi_ice(c, i) = 0.0;
        h2osoi_liq(c, i) = 0.0;
        t_soisno(c, i) = 0.0;
      }
    }
    for (int j = 0; j < nlevgrnd(); ++j) {
      int i = nlevsno() + j;
      h2osoi_liq(c, i) = 5.0 + 3.0 * j + (c % 7);
      h2osoi_ice(c, i) = ((c + j) % 4 == 1) ? 10.0 + j : 0.0;
      t_soisno(c, i) = 269.0 + ((c * 7 + j * 2) % 10);  // 269..278 K
      watsat(c, j) = 0.35 + 0.01 * (c % 6);
      sucsat(c, j) = 80.0 + 10.0 * (j % 4) + c;
      bsw(c, j) = 4.0 + 0.2 * (j % 5);
      tkmg(c, j) = 1.2 + 0.05 * (c % 8);
      tkdry(c, j) = 0.15 + 0.01 * (j % 4);
      csol(c, nlevsno() + j) = 1.8e6 + 1.0e4 * (c % 10);
    }

    if (snl(c) > 0) {
      h2osno(c) = swe;
      snow_depth(c) = sdep;
      frac_sno(c) = 0.4 + 0.09 * (c % 7);
    } else {
      h2osno(c) = (c % 3 == 0) ? 0.004 + 0.001 * c : 0.0;  // thin snow case
      snow_depth(c) = h2osno(c) / 250.0;
      frac_sno(c) = (h2osno(c) > 0.0) ? 0.02 : 0.0;
    }
    frac_sno_eff(c) = frac_sno(c);
    int_snow(c) = h2osno(c) * 1.5;

    frac_h2osfc(c) = (c % 4 == 1) ? 0.25 : ((c % 4 == 3) ? 0.04 : 0.0);
    h2osfc(c) = (frac_h2osfc(c) > 0.0) ? 15.0 + c : 0.0;
    t_h2osfc(c) = 271.5 + (c % 5);  // some below freezing -> h2osfc freeze

    sabg_soil(c) = 40.0 * (c % 4);
    sabg_snow(c) = 30.0 * (c % 3);
    for (int i = 0; i <= nlevsno(); ++i) {
      sabg_lyr(c, i) = (i >= top) ? sabg_snow(c) * ((i == top) ? 0.7 : 0.3 / std::max(1, nlevsno() - top)) : 0.0;
    }
    dlrad(c) = 250.0 + 2.0 * c;
    emg(c) = 0.96 + 0.01 * (c % 2);
    forc_lwrad(c) = 280.0 + 3.0 * (c % 10);
    htvp(c) = (c % 2) ? 2.501e6 : 2.8347e6;
    cgrnd(c) = 15.0 + c;
    eflx_sh_soil(c) = -20.0 + 2.0 * (c % 20);
    eflx_sh_snow(c) = -15.0 + 1.5 * (c % 20);
    eflx_sh_h2osfc(c) = -10.0 + 1.0 * (c % 20);
    eflx_sh_grnd(c) = -18.0 + 2.0 * (c % 18);
    qflx_ev_soil(c) = -2.0e-5 + 4.0e-6 * (c % 10);
    qflx_ev_snow(c) = -1.0e-5 + 2.0e-6 * (c % 10);
    qflx_ev_h2osfc(c) = -1.5e-5 + 3.0e-6 * (c % 10);
    qflx_evap_soi(c) = -1.8e-5 + 3.0e-6 * (c % 12);
    t_grnd(c) = t_soisno(c, (snl(c) > 0) ? top : nlevsno());
  }

  // ---------------- snapshot inputs before in-place mutation ---------------
  std::vector<Block> inputs(ncols);
  for (int c = 0; c < ncols; ++c) {
    Block& b = inputs[c];
    b.nstep = c;
    b.set("in_snl", (double)snl(c));
    b.set("in_frac_veg_nosno", (double)frac_veg_nosno(c));
    b.set("in_dlrad", dlrad(c));
    b.set("in_emg", emg(c));
    b.set("in_forc_lwrad", forc_lwrad(c));
    b.set("in_htvp", htvp(c));
    b.set("in_cgrnd", cgrnd(c));
    b.set("in_eflx_sh_soil", eflx_sh_soil(c));
    b.set("in_eflx_sh_snow", eflx_sh_snow(c));
    b.set("in_eflx_sh_h2osfc", eflx_sh_h2osfc(c));
    b.set("in_qflx_ev_soil", qflx_ev_soil(c));
    b.set("in_qflx_ev_snow", qflx_ev_snow(c));
    b.set("in_qflx_ev_h2osfc", qflx_ev_h2osfc(c));
    b.set("in_frac_sno_eff", frac_sno_eff(c));
    b.set("in_frac_sno", frac_sno(c));
    b.set("in_frac_h2osfc", frac_h2osfc(c));
    b.set("in_sabg_snow", sabg_snow(c));
    b.set("in_sabg_soil", sabg_soil(c));
    b.set("in_sabg_lyr", row(sabg_lyr, c));
    b.set("in_watsat", row(watsat, c));
    b.set("in_sucsat", row(sucsat, c));
    b.set("in_bsw", row(bsw, c));
    b.set("in_tkmg", row(tkmg, c));
    b.set("in_tkdry", row(tkdry, c));
    { std::vector<double> cs(nlevgrnd());
      for (int j = 0; j < nlevgrnd(); ++j) cs[j] = csol(c, nlevsno() + j);
      b.set("in_csol", cs); }
    b.set("in_dz", row(dz, c));
    b.set("in_zsoi", row(zsoi, c));
    b.set("in_zisoi", row(zisoi, c));
    b.set("in_h2osfc", h2osfc(c));
    b.set("in_h2osno", h2osno(c));
    b.set("in_snow_depth", snow_depth(c));
    b.set("in_int_snow", int_snow(c));
    b.set("in_t_h2osfc", t_h2osfc(c));
    b.set("in_t_grnd", t_grnd(c));
    b.set("in_h2osoi_liq", row(h2osoi_liq, c));
    b.set("in_h2osoi_ice", row(h2osoi_ice, c));
    b.set("in_t_soisno", row(t_soisno, c));
  }

  // ---------------- run the reference 7-stage chain ------------------------
  ViewD2 tk("tk", ncols, nlev), cv("cv", ncols, nlev), thk("thk", ncols, nlev);
  ViewD1 tk_h2osfc("tk_h2osfc", ncols), c_h2osfc("c_h2osfc", ncols), dz_h2osfc("dz_h2osfc", ncols);
  for (int c = 0; c < ncols; ++c) {
    ELM::soil_thermal::calc_soil_tk(c, ltype(c), h2osoi_liq, h2osoi_ice, t_soisno, dz, watsat, tkmg, tkdry, thk);
    ELM::soil_thermal::calc_snow_tk(c, snl(c), frac_sno(c), h2osoi_liq, h2osoi_ice, dz, thk);
    ELM::soil_thermal::calc_face_tk(c, snl(c), thk, zsoi, zisoi, tk);
    ELM::soil_thermal::calc_soil_heat_capacity(c, ltype(c), snl(c), h2osno(c), watsat, h2osoi_ice, h2osoi_liq, dz, csol, cv);
    ELM::soil_thermal::calc_snow_heat_capacity(c, snl(c), frac_sno(c), h2osoi_ice, h2osoi_liq, cv);
    tk_h2osfc(c) = ELM::soil_thermal::calc_h2osfc_tk(c, h2osfc(c), thk, zsoi);
    c_h2osfc(c) = ELM::soil_thermal::calc_h2osfc_heat_capacity(snl(c), h2osfc(c), frac_h2osfc(c));
    dz_h2osfc(c) = ELM::soil_thermal::calc_h2osfc_height(snl(c), h2osfc(c), frac_h2osfc(c));
  }

  ViewD1 hs_soil("hs_soil", ncols), hs_h2osfc("hs_h2osfc", ncols);
  ViewD1 hs_top_snow("hs_top_snow", ncols), dhsdT("dhsdT", ncols);
  const int soitop = nlevsno();
  for (int c = 0; c < ncols; ++c) {
    const int snotop = nlevsno() - snl(c);
    sabg_chk(c) = ELM::soil_temp::check_absorbed_solar(frac_sno_eff(c), sabg_snow(c), sabg_soil(c));
    hs_soil(c) = ELM::soil_temp::calc_surface_heat_flux(frac_veg_nosno(c), dlrad(c), emg(c), forc_lwrad(c), htvp(c),
        sabg_soil(c), t_soisno(c, soitop), eflx_sh_soil(c), qflx_ev_soil(c));
    hs_h2osfc(c) = ELM::soil_temp::calc_surface_heat_flux(frac_veg_nosno(c), dlrad(c), emg(c), forc_lwrad(c), htvp(c),
        sabg_soil(c), t_h2osfc(c), eflx_sh_h2osfc(c), qflx_ev_h2osfc(c));
    hs_top_snow(c) = ELM::soil_temp::calc_surface_heat_flux(frac_veg_nosno(c), dlrad(c), emg(c), forc_lwrad(c), htvp(c),
        sabg_lyr(c, snotop), t_soisno(c, snotop), eflx_sh_snow(c), qflx_ev_snow(c));
    dhsdT(c) = ELM::soil_temp::calc_dhsdT(cgrnd(c), emg(c), t_grnd(c));
  }

  ViewD2 fn("fn", ncols, nlev);
  for (int c = 0; c < ncols; ++c) {
    ELM::soil_temp::calc_diffusive_heat_flux(snl(c), tk[c], t_soisno[c], zsoi[c], fn[c]);
    ELM::soil_temp::calc_heat_flux_matrix_factor(snl(c), dtime, cv[c], dz[c], zsoi[c], zisoi[c], fact[c]);
  }

  const int N = nlevgrnd() + nlevsno() + 1;
  ViewD2 rhs_vector("rhs_vector", ncols, N);
  ViewD3 lhs_matrix("lhs_matrix", ncols, N, nband());
  {
    // serial build lacks the named apply_parallel_for overload used by the
    // set_RHS/set_LHS wrappers; call the per-column detail kernels directly
    ViewD1 fn_h2osfc("fn_h2osfc", ncols);
    // padded one row: reference get_rhs_snow writes rt_snow(c, nlevsno())
    // when snl == 0 (benign overrun in the unchecked Kokkos build)
    ViewD2 rt_snow("rt_snow", ncols, nlevsno() + 1);
    ViewD1 rt_ssw("rt_ssw", ncols);
    ViewD2 rt_soil("rt_soil", ncols, nlevgrnd());
    ViewD3 bmatrix_snow("bm_snow", ncols, nlevsno(), nband());
    ViewD3 bmatrix_soil("bm_soil", ncols, nlevgrnd(), nband());
    ViewD2 bmatrix_ssw("bm_ssw", ncols, nband());
    ViewD2 bmatrix_snow_soil("bm_snow_soil", ncols, nband());
    ViewD2 bmatrix_ssw_soil("bm_ssw_soil", ncols, nband());
    ViewD2 bmatrix_soil_snow("bm_soil_snow", ncols, nband());
    ViewD2 bmatrix_soil_ssw("bm_soil_ssw", ncols, nband());
    namespace dt = ELM::soil_temp::detail;
    for (int c = 0; c < ncols; ++c) {
      dt::get_rhs_snow(c, snl, hs_top_snow, dhsdT, t_soisno, fact, fn, sabg_lyr, rt_snow);
      dt::get_rhs_ssw(c, dtime, tk_h2osfc, t_h2osfc, dz_h2osfc, c_h2osfc, hs_h2osfc, dhsdT, t_soisno, zsoi, fn_h2osfc, rt_ssw);
      dt::get_rhs_soil(c, snl, hs_soil, hs_top_snow, frac_sno_eff, dhsdT, t_soisno, fact, fn, sabg_lyr, rt_soil);
      dt::assemble_rhs(c, rt_snow, rt_ssw, rt_soil, rhs_vector);
      dt::get_matrix_snow(c, snl, dhsdT, zsoi, fact, tk, bmatrix_snow);
      dt::get_matrix_snow_soil(c, snl, zsoi, fact, tk, bmatrix_snow_soil);
      dt::get_matrix_soil(c, snl, dhsdT, frac_sno_eff, frac_h2osfc, dz_h2osfc, tk_h2osfc, zsoi, fact, tk, bmatrix_soil);
      dt::get_matrix_soil_snow(c, snl, frac_sno_eff, zsoi, fact, tk, bmatrix_soil_snow);
      dt::get_matrix_ssw(c, dtime, dz_h2osfc, c_h2osfc, tk_h2osfc, dhsdT, zsoi, bmatrix_ssw);
      dt::get_matrix_ssw_soil(c, dtime, dz_h2osfc, c_h2osfc, tk_h2osfc, zsoi, bmatrix_ssw_soil);
      dt::get_matrix_soil_ssw(c, dtime, frac_h2osfc, dz_h2osfc, tk_h2osfc, fact, zsoi, bmatrix_soil_ssw);
      dt::assemble_lhs(c, bmatrix_snow_soil, bmatrix_ssw_soil, bmatrix_soil_snow,
          bmatrix_soil_ssw, bmatrix_ssw, bmatrix_snow, bmatrix_soil, lhs_matrix);
    }
  }

  // keep pre-solve copies for the fixture
  ViewD2 rhs_presolve("rhs_presolve", ncols, N);
  for (int c = 0; c < ncols; ++c)
    for (int i = 0; i < N; ++i) rhs_presolve(c, i) = rhs_vector(c, i);

  ViewD2 A("A", ncols, N - 1), B("B", ncols, N - 2), Z("Z", ncols, N);
  for (int c = 0; c < ncols; ++c) {
    ELM::solver::PDMA(c, snl, lhs_matrix, A, B, Z, rhs_vector);
  }

  for (int c = 0; c < ncols; ++c) {
    ELM::soil_temp::update_temperature(c, snl, frac_h2osfc, rhs_vector, t_h2osfc, t_soisno);
  }

  // record state between solve and phase change
  ViewD2 t_soisno_postsolve("tps", ncols, nlev);
  ViewD1 t_h2osfc_postsolve("thps", ncols);
  for (int c = 0; c < ncols; ++c) {
    for (int i = 0; i < nlev; ++i) t_soisno_postsolve(c, i) = t_soisno(c, i);
    t_h2osfc_postsolve(c) = t_h2osfc(c);
  }

  for (int c = 0; c < ncols; ++c) {
    for (int i = 0; i < nlev; ++i) imelt(c, i) = 0;
    ELM::soil_temp::phase_change_h2osfc(snl(c), dtime, frac_sno(c), frac_h2osfc(c), dhsdT(c), c_h2osfc(c),
        fact(c, nlevsno() - 1), t_h2osfc(c), h2osfc(c), xmf_h2osfc(c), qflx_h2osfc_to_ice(c),
        eflx_h2osfc_to_snow(c), h2osno(c), int_snow(c), snow_depth(c), h2osoi_ice(c, nlevsno() - 1),
        t_soisno(c, nlevsno() - 1));
    ELM::soil_temp::phase_change_soisno(snl(c), ltype(c), dtime, dhsdT(c), frac_h2osfc(c), frac_sno_eff(c),
        fact[c], watsat[c], sucsat[c], bsw[c], dz[c], h2osno(c), snow_depth(c), xmf(c), qflx_snofrz(c),
        qflx_snow_melt(c), qflx_snomelt(c), eflx_snomelt(c), imelt[c], qflx_snofrz_lyr[c], h2osoi_ice[c],
        h2osoi_liq[c], t_soisno[c]);
  }

  for (int c = 0; c < ncols; ++c) {
    ELM::soil_temp::update_t_grnd(c, snl, frac_h2osfc, frac_sno_eff, t_h2osfc, t_soisno, t_grnd);
  }

  // ---------------- write fixture (inputs + outputs per case) --------------
  // note: several state arrays were mutated in place; inputs were recorded
  // into *_in vectors during synthesis via the blocks below.
  std::vector<Block> out;
  for (int c = 0; c < ncols; ++c) {
    Block o = inputs[c];
    // outputs
    o.set("sabg_chk", sabg_chk(c));
    o.set("hs_soil", hs_soil(c));
    o.set("hs_h2osfc", hs_h2osfc(c));
    o.set("hs_top_snow", hs_top_snow(c));
    o.set("dhsdT", dhsdT(c));
    o.set("thk", row(thk, c));
    o.set("tk", row(tk, c));
    o.set("cv", row(cv, c));
    o.set("tk_h2osfc", tk_h2osfc(c));
    o.set("c_h2osfc", c_h2osfc(c));
    o.set("dz_h2osfc", dz_h2osfc(c));
    o.set("fn", row(fn, c));
    o.set("fact", row(fact, c));
    o.set("rhs_presolve", row(rhs_presolve, c));
    std::vector<double> lhsrow(N * nband());
    for (int i = 0; i < N; ++i)
      for (int b = 0; b < nband(); ++b) lhsrow[i * nband() + b] = lhs_matrix(c, i, b);
    o.set("lhs_matrix", lhsrow);
    o.set("tvector", row(rhs_vector, c));
    o.set("t_soisno_postsolve", row(t_soisno_postsolve, c));
    o.set("t_h2osfc_postsolve", t_h2osfc_postsolve(c));
    o.set("t_soisno", row(t_soisno, c));
    o.set("t_h2osfc", t_h2osfc(c));
    o.set("t_grnd", t_grnd(c));
    o.set("h2osfc", h2osfc(c));
    o.set("h2osno", h2osno(c));
    o.set("int_snow", int_snow(c));
    o.set("snow_depth", snow_depth(c));
    o.set("xmf_h2osfc", xmf_h2osfc(c));
    o.set("qflx_h2osfc_to_ice", qflx_h2osfc_to_ice(c));
    o.set("eflx_h2osfc_to_snow", eflx_h2osfc_to_snow(c));
    o.set("xmf", xmf(c));
    o.set("qflx_snofrz", qflx_snofrz(c));
    o.set("qflx_snow_melt", qflx_snow_melt(c));
    o.set("qflx_snomelt", qflx_snomelt(c));
    o.set("eflx_snomelt", eflx_snomelt(c));
    o.set("imelt", rowi(imelt, c));
    o.set("qflx_snofrz_lyr", row(qflx_snofrz_lyr, c));
    o.set("h2osoi_ice", row(h2osoi_ice, c));
    o.set("h2osoi_liq", row(h2osoi_liq, c));
    out.push_back(o);
  }
  write_blocks(argv[1], out);
  std::printf("wrote %zu blocks to %s\n", out.size(), argv[1]);
  return 0;
}
