// Golden fixtures for the snow-hydrology chain, mirroring
// /root/reference/driver/kokkos/snow_hydrology_kokkos.cc:
//   snow_water -> aerosol deposition -> aerosol_phase_change ->
//   transpiration -> snow_compaction -> combine_layers -> divide_layers ->
//   prune_snow_layers -> aerosol mass/concen update -> snow_aging
//
// Deviation: the reference snow_water percolation clamp reads
// vol_ice[i+i] (snow_hydrology_impl.hh:388) — an out-of-bounds/wrong-layer
// access (UB for snl >= 2).  A corrected local copy (vol_ice[i+1]) is used
// here; the TPU port implements the same corrected formula.
//
// States are synthesized deterministically to exercise layer elimination,
// pack dissolution, combination, and subdivision.  All inputs are embedded
// in the fixture (in_*).
#include "goldengen.hh"

#include "array.hh"
#include "elm_constants.h"
#include "land_data.h"

namespace ELM {
  using ViewI1 = ELM::Array<int, 1>;
  using ViewD1 = ELM::Array<double, 1>;
  using ViewD2 = ELM::Array<double, 2>;
  using ViewD3 = ELM::Array<double, 3>;
}
using ELM::ViewD1;
using ELM::ViewD2;
using ELM::ViewD3;
using ELM::ViewI1;

#include <utility>
namespace ELM::impl {
template <typename F, typename T, std::size_t... I>
constexpr int apply_parallel_for_tuple_impl(F&&, T&&, std::index_sequence<I...>) { return 0; }
}

#include "snicar_data.h"
#include "snow_hydrology.h"
#include "transpiration.h"

using namespace goldengen;
using namespace ELM::ELMdims;

// corrected snow_water (reference impl:262-484 with vol_ice[i+1] fix)
template <typename Sub>
static void snow_water_fixed(const int do_capsnow, const int snl,
                             const double dtime, const double frac_sno_eff,
                             const double h2osno, const double qflx_sub_snow,
                             const double qflx_evap_grnd,
                             const double qflx_dew_snow,
                             const double qflx_dew_grnd,
                             const double qflx_rain_grnd,
                             const double qflx_snomelt,
                             double& qflx_snow_melt, double& qflx_top_soil,
                             double& int_snow, double& frac_sno,
                             double& mflx_neg_snow, Sub h2osoi_liq,
                             Sub h2osoi_ice, Sub mss_bcphi, Sub mss_bcpho,
                             Sub mss_dst1, Sub mss_dst2, Sub mss_dst3,
                             Sub mss_dst4, Sub dz) {
  using ELM::ELMconst::DENICE;
  using ELM::ELMconst::DENH2O;
  mflx_neg_snow = 0.0;
  const int top = nlevsno() - snl;
  if (do_capsnow) {
    const double wgdif = h2osoi_ice(top) - frac_sno_eff * qflx_sub_snow * dtime;
    h2osoi_ice(top) = wgdif;
    if (wgdif < 0.0) { h2osoi_ice(top) = 0.9; h2osoi_liq(top) += wgdif; }
    h2osoi_liq(top) -= frac_sno_eff * qflx_evap_grnd * dtime;
  } else {
    const double wgdif = h2osoi_ice(top) + frac_sno_eff * (qflx_dew_snow - qflx_sub_snow) * dtime;
    h2osoi_ice(top) = wgdif;
    if (wgdif < 0.0) { h2osoi_ice(top) = 0.9; h2osoi_liq(top) += wgdif; }
    h2osoi_liq(top) += frac_sno_eff * (qflx_rain_grnd + qflx_dew_grnd - qflx_evap_grnd) * dtime;
  }
  if (h2osoi_liq(top) < 0.0) {
    for (int i = top; i <= nlevsno(); ++i) {
      double wgdif = h2osoi_liq(i);
      if (wgdif >= 0.0) break;
      h2osoi_liq(i) = 0.0;
      mflx_neg_snow = wgdif / dtime;
    }
  }
  double vol_ice[nlevsno()], vol_liq[nlevsno()], eff_porosity[nlevsno()];
  for (int i = top; i < nlevsno(); ++i) {
    vol_ice[i] = std::min(1.0, h2osoi_ice(i) / (dz(i) * frac_sno_eff * DENICE()));
    eff_porosity[i] = 1.0 - vol_ice[i];
    vol_liq[i] = std::min(eff_porosity[i], h2osoi_liq(i) / (dz(i) * frac_sno_eff * DENH2O()));
  }
  static constexpr double scv[6] = {0.20, 0.03, 0.02, 0.02, 0.01, 0.01};
  static constexpr double wimp = 0.05, ssi = 0.033;
  double qin = 0.0, qin_a[6] = {0, 0, 0, 0, 0, 0};
  double qout = 0.0;
  Sub* msses[6] = {&mss_bcphi, &mss_bcpho, &mss_dst1, &mss_dst2, &mss_dst3, &mss_dst4};
  for (int i = top; i < nlevsno(); ++i) {
    h2osoi_liq(i) += qin;
    for (int s = 0; s < 6; ++s) (*msses[s])(i) += qin_a[s];
    if (i < nlevsno() - 1) {
      if (eff_porosity[i] < wimp || eff_porosity[i + 1] < wimp) {
        qout = 0.0;
      } else {
        qout = std::max(0.0, (vol_liq[i] - ssi * eff_porosity[i]) * dz(i) * frac_sno_eff);
        qout = std::min(qout, (1.0 - vol_ice[i + 1] - vol_liq[i + 1]) * dz(i + 1) * frac_sno_eff);
      }
    } else {
      qout = std::max(0.0, (vol_liq[i] - ssi * eff_porosity[i]) * dz(i) * frac_sno_eff);
    }
    qout *= 1000.0;
    h2osoi_liq(i) -= qout;
    qin = qout;
    double mss_liqice = std::max(h2osoi_liq(i) + h2osoi_ice(i), 1.0e-30);
    for (int s = 0; s < 6; ++s) {
      double qa = qout * scv[s] * ((*msses[s])(i) / mss_liqice);
      if (qa > (*msses[s])(i)) qa = (*msses[s])(i);
      (*msses[s])(i) -= qa;
      qin_a[s] = qa;
    }
  }
  for (int i = top; i < nlevsno(); ++i) {
    dz(i) = std::max(dz(i), h2osoi_liq(i) / DENH2O() + h2osoi_ice(i) / DENICE());
  }
  if (snl > 0) {
    qflx_snow_melt += qout / dtime;
    qflx_top_soil = (qout / dtime) + (1.0 - frac_sno_eff) * qflx_rain_grnd;
    int_snow += frac_sno_eff * (qflx_dew_snow + qflx_dew_grnd + qflx_rain_grnd) * dtime;
  } else {
    qflx_snow_melt = qflx_snomelt;
    qflx_top_soil = qflx_rain_grnd + qflx_snomelt;
    if (h2osno <= 0.0) int_snow = 0.0;
    if (h2osno <= 0.0) frac_sno = 0.0;
  }
}

static std::vector<double> row(const ViewD2& v, int c) {
  std::vector<double> out(v.extent(1));
  for (size_t i = 0; i < v.extent(1); ++i) out[i] = v(c, i);
  return out;
}

int main(int argc, char** argv) {
  if (argc != 2) { std::fprintf(stderr, "usage: %s OUT\n", argv[0]); return 1; }

  const int ncols = 96;
  const int nlev = nlevgrnd() + nlevsno();
  const double dtime = 1800.0;

  ELM::LandType Land;
  Land.ltype = 1; Land.ctype = 1; Land.vtype = 12;

  // deterministic synthetic snow-aging tables
  ELM::SnwRdsTable<ViewD3> snw_table;
  for (int i = 0; i <= 10; ++i)
    for (int j = 0; j <= 30; ++j)
      for (int k = 0; k <= 7; ++k) {
        snw_table.snowage_tau(i, j, k) = 100.0 + 3.0 * i + 1.5 * j + 7.0 * k;
        snw_table.snowage_kappa(i, j, k) = 1.0 + 0.05 * i + 0.01 * j + 0.02 * k;
        snw_table.snowage_drdt0(i, j, k) = 1.0 + 0.1 * i + 0.02 * j + 0.05 * k;
      }

  std::vector<Block> out;
  for (int cse = 0; cse < ncols; ++cse) {
    int snl = cse % 6;
    const int top0 = nlevsno() - snl;
    int do_capsnow = (cse % 7 == 3) ? 1 : 0;

    std::vector<double> liq(nlev, 0.0), ice(nlev, 0.0), t(nlev, 0.0);
    std::vector<double> dzv(nlev, 0.0), zv(nlev, 0.0), ziv(nlev + 1, 0.0);
    std::vector<double> rds(nlevsno(), 0.0);
    std::vector<double> mss[6];
    for (int s = 0; s < 6; ++s) mss[s].assign(nlevsno(), 0.0);
    std::vector<double> imelt_d(nlev, 0.0), swe_old(nlevsno(), 0.0);
    std::vector<double> frac_iceold(nlev, 0.0), snofrz(nlevsno(), 0.0);
    std::vector<double> rootr(nlevgrnd(), 0.0);

    // soil grid
    ziv[nlevsno()] = 0.0;
    for (int j = 0; j < nlevgrnd(); ++j) {
      dzv[nlevsno() + j] = 0.0175 * std::pow(1.53, j);
      ziv[nlevsno() + 1 + j] = ziv[nlevsno() + j] + dzv[nlevsno() + j];
      zv[nlevsno() + j] = 0.5 * (ziv[nlevsno() + j] + ziv[nlevsno() + 1 + j]);
      liq[nlevsno() + j] = 8.0 + 2.0 * j + (cse % 5);
      ice[nlevsno() + j] = ((cse + j) % 5 == 2) ? 6.0 + j : 0.0;
      t[nlevsno() + j] = 270.0 + ((cse * 3 + j) % 8);
      rootr[j] = 1.0 / nlevgrnd();
    }

    double swe = 0.0, sdep = 0.0;
    for (int i = top0; i < nlevsno(); ++i) {
      // mix of regimes: thin-ice layers (elimination), thin dz (combine),
      // thick dz (divide), wet layers (percolation)
      int r = (cse * 5 + i * 3) % 10;
      if (r == 0) {
        ice[i] = 0.005;  // near-zero ice -> layer elimination
        liq[i] = 0.002;
        dzv[i] = 0.004;
      } else if (r < 4) {
        ice[i] = 30.0 + 2.0 * i + (cse % 9);  // thick -> divide candidates
        liq[i] = (r == 2) ? 12.0 : 0.5;
        dzv[i] = 0.12 + 0.08 * ((cse + i) % 4);
      } else {
        ice[i] = 8.0 + ((cse * 3 + i) % 6);
        liq[i] = ((cse + i) % 3 == 0) ? 3.0 + 0.5 * i : 0.1;
        dzv[i] = 0.02 + 0.01 * ((cse + i) % 5);
      }
      t[i] = 265.0 + ((cse * 5 + i * 3) % 9);
      rds[i] = 54.526 + ((cse + i) % 40) * 10.0;
      for (int s = 0; s < 6; ++s) mss[s][i] = 1.0e-7 * (1 + s) * (1 + i + cse % 4);
      imelt_d[i] = ((cse + i) % 3 == 1) ? 1.0 : 0.0;
      swe_old[i] = (ice[i] + liq[i]) * (1.0 + 0.1 * ((cse + i) % 3));
      frac_iceold[i] = 0.6 + 0.05 * ((cse + i) % 6);
      snofrz[i] = ((cse + i) % 4 == 2) ? 2.0e-6 : 0.0;
      swe += ice[i] + liq[i];
      sdep += dzv[i];
    }
    for (int i = nlevsno() - 1; i >= top0; --i) {
      ziv[i] = ziv[i + 1] - dzv[i];
      zv[i] = ziv[i + 1] - 0.5 * dzv[i];
    }

    double h2osno = (snl > 0) ? swe : ((cse % 3 == 0) ? 0.002 * (cse + 1) : 0.0);
    double snow_depth = (snl > 0) ? sdep : h2osno / 250.0;
    double frac_sno = (snl > 0) ? 0.35 + 0.09 * (cse % 7)
                                : ((h2osno > 0.0) ? 0.02 : 0.0);
    double frac_sno_eff = frac_sno;
    double int_snow = h2osno * 1.4 + 1.0;
    double n_melt = 0.7 + 0.2 * (cse % 4);
    double qflx_sub_snow = ((cse % 4) == 1) ? 8.0e-6 : 1.0e-6 * (cse % 3);
    double qflx_evap_grnd = 1.0e-6 * (cse % 4);
    double qflx_dew_snow = ((cse % 5) == 2) ? 4.0e-6 : 0.0;
    double qflx_dew_grnd = ((cse % 6) == 3) ? 2.0e-6 : 0.0;
    double qflx_rain_grnd = ((cse % 3) == 0) ? 3.0e-5 : 0.0;
    double qflx_snomelt = ((cse % 4) == 2) ? 2.5e-5 : 0.0;
    double qflx_snow_melt = 1.0e-6 * (cse % 5);
    double qflx_snwcp_ice = do_capsnow ? 1.5e-5 : 0.0;
    double qflx_snow_grnd = ((cse % 2) == 0) ? 2.0e-5 : 0.0;
    double qflx_tran_veg = 1.0e-6 * (cse % 7);
    int veg_active = (cse % 2);
    double aero_in[11];  // bcphi bcpho bcdep dst1_1 dst1_2 ... dst4_2
    for (int s = 0; s < 11; ++s) aero_in[s] = 1.0e-12 * (s + 1) * (1 + cse % 5);

    Block b;
    b.nstep = cse;
    b.set("in_snl", (double)snl);
    b.set("in_do_capsnow", (double)do_capsnow);
    b.set("in_veg_active", (double)veg_active);
    b.set("in_frac_sno_eff", frac_sno_eff);
    b.set("in_frac_sno", frac_sno);
    b.set("in_h2osno", h2osno);
    b.set("in_snow_depth", snow_depth);
    b.set("in_int_snow", int_snow);
    b.set("in_n_melt", n_melt);
    b.set("in_qflx_sub_snow", qflx_sub_snow);
    b.set("in_qflx_evap_grnd", qflx_evap_grnd);
    b.set("in_qflx_dew_snow", qflx_dew_snow);
    b.set("in_qflx_dew_grnd", qflx_dew_grnd);
    b.set("in_qflx_rain_grnd", qflx_rain_grnd);
    b.set("in_qflx_snomelt", qflx_snomelt);
    b.set("in_qflx_snow_melt", qflx_snow_melt);
    b.set("in_qflx_snwcp_ice", qflx_snwcp_ice);
    b.set("in_qflx_snow_grnd", qflx_snow_grnd);
    b.set("in_qflx_tran_veg", qflx_tran_veg);
    b.set("in_h2osoi_liq", liq);
    b.set("in_h2osoi_ice", ice);
    b.set("in_t_soisno", t);
    b.set("in_dz", dzv);
    b.set("in_z", zv);
    b.set("in_zi", ziv);
    b.set("in_snw_rds", rds);
    b.set("in_imelt", imelt_d);
    b.set("in_swe_old", swe_old);
    b.set("in_frac_iceold", frac_iceold);
    b.set("in_qflx_snofrz_lyr", snofrz);
    b.set("in_rootr", rootr);
    b.set("in_mss_bcphi", mss[0]);
    b.set("in_mss_bcpho", mss[1]);
    b.set("in_mss_dst1", mss[2]);
    b.set("in_mss_dst2", mss[3]);
    b.set("in_mss_dst3", mss[4]);
    b.set("in_mss_dst4", mss[5]);
    b.set("in_aero", std::vector<double>(aero_in, aero_in + 11));

    // ---------------- run the chain --------------------------------------
    double qflx_top_soil = 0.0, mflx_neg_snow = 0.0;
    snow_water_fixed(do_capsnow, snl, dtime, frac_sno_eff, h2osno,
                     qflx_sub_snow, qflx_evap_grnd, qflx_dew_snow,
                     qflx_dew_grnd, qflx_rain_grnd, qflx_snomelt,
                     qflx_snow_melt, qflx_top_soil, int_snow, frac_sno,
                     mflx_neg_snow, span(liq), span(ice), span(mss[0]),
                     span(mss[1]), span(mss[2]), span(mss[3]), span(mss[4]),
                     span(mss[5]), span(dzv));

    // aerosol deposition into top layer (aerosol_physics_impl.hh:47-58)
    if (snl > 0) {
      const int j = nlevsno() - snl;
      mss[0][j] += aero_in[0] * dtime;
      mss[1][j] += (aero_in[1] + aero_in[2]) * dtime;
      mss[2][j] += (aero_in[3] + aero_in[4]) * dtime;
      mss[3][j] += (aero_in[5] + aero_in[6]) * dtime;
      mss[4][j] += (aero_in[7] + aero_in[8]) * dtime;
      mss[5][j] += (aero_in[9] + aero_in[10]) * dtime;
    }

    ELM::snow::aerosol_phase_change(snl, dtime, qflx_sub_snow, span(liq),
                                    span(ice), span(mss[0]), span(mss[1]));

    std::vector<double> qflx_rootsoi(nlevgrnd(), 0.0);
    ELM::trans::transpiration(veg_active, qflx_tran_veg, span(rootr),
                              span(qflx_rootsoi));

    std::vector<int> imelt_i(nlev);
    for (int i = 0; i < nlev; ++i) imelt_i[i] = (int)imelt_d[i];
    struct SpanI { int* p; int& operator()(int i) const { return p[i]; } };
    ELM::snow::snow_compaction(snl, Land.ltype, dtime, int_snow, n_melt,
                               frac_sno, SpanI{imelt_i.data()},
                               span(swe_old), span(liq), span(ice), span(t),
                               span(frac_iceold), span(dzv));

    double qflx_sl_top_soil = 0.0, qflx_snow2topsoi = 0.0, mflx_snowlyr = 0.0;
    ELM::snow::combine_layers(Land.urbpoi, Land.ltype, dtime, snl, h2osno,
                              snow_depth, frac_sno_eff, frac_sno, int_snow,
                              qflx_sl_top_soil, qflx_snow2topsoi,
                              mflx_snowlyr, span(t), span(ice), span(liq),
                              span(rds), span(mss[0]), span(mss[1]),
                              span(mss[2]), span(mss[3]), span(mss[4]),
                              span(mss[5]), span(dzv), span(zv), span(ziv));

    ELM::snow::divide_layers(frac_sno, snl, span(ice), span(liq), span(t),
                             span(rds), span(mss[0]), span(mss[1]),
                             span(mss[2]), span(mss[3]), span(mss[4]),
                             span(mss[5]), span(dzv), span(zv), span(ziv));

    ELM::snow::prune_snow_layers(snl, span(ice), span(liq), span(t),
                                 span(dzv), span(zv), span(ziv));

    // aerosol mass/concentration update (aerosol_physics_impl.hh:78-105)
    std::vector<double> cnc[6];
    for (int s = 0; s < 6; ++s) cnc[s].assign(nlevsno(), 0.0);
    {
      const int snotop = nlevsno() - snl;
      for (int sl = 0; sl < nlevsno(); ++sl) {
        const double snowmass = (sl < snotop) ? 1.e-12 : ice[sl] + liq[sl];
        const double fct = (sl == snotop && do_capsnow)
            ? (snowmass / (snowmass + qflx_snwcp_ice * dtime))
            : ((sl < snotop) ? 0.0 : 1.0);
        for (int s = 0; s < 6; ++s) {
          mss[s][sl] *= fct;
          cnc[s][sl] = mss[s][sl] / snowmass;
        }
      }
    }

    ELM::snow::snow_aging(do_capsnow, snl, frac_sno, dtime, qflx_snwcp_ice,
                          qflx_snow_grnd, h2osno, span(dzv), span(liq),
                          span(ice), span(t), span(snofrz), snw_table,
                          span(rds));

    // ---------------- outputs --------------------------------------------
    b.set("snl", (double)snl);
    b.set("h2osno", h2osno);
    b.set("snow_depth", snow_depth);
    b.set("frac_sno", frac_sno);
    b.set("frac_sno_eff", frac_sno_eff);
    b.set("int_snow", int_snow);
    b.set("qflx_snow_melt", qflx_snow_melt);
    b.set("qflx_top_soil", qflx_top_soil);
    b.set("mflx_neg_snow", mflx_neg_snow);
    b.set("qflx_sl_top_soil", qflx_sl_top_soil);
    b.set("qflx_snow2topsoi", qflx_snow2topsoi);
    b.set("mflx_snowlyr_col", mflx_snowlyr);
    b.set("h2osoi_liq", liq);
    b.set("h2osoi_ice", ice);
    b.set("t_soisno", t);
    b.set("dz", dzv);
    b.set("z", zv);
    b.set("zi", ziv);
    b.set("snw_rds", rds);
    b.set("qflx_rootsoi", qflx_rootsoi);
    b.set("mss_bcphi", mss[0]);
    b.set("mss_bcpho", mss[1]);
    b.set("mss_dst1", mss[2]);
    b.set("mss_dst2", mss[3]);
    b.set("mss_dst3", mss[4]);
    b.set("mss_dst4", mss[5]);
    b.set("cnc_bcphi", cnc[0]);
    b.set("cnc_bcpho", cnc[1]);
    b.set("cnc_dst1", cnc[2]);
    b.set("cnc_dst2", cnc[3]);
    b.set("cnc_dst3", cnc[4]);
    b.set("cnc_dst4", cnc[5]);
    out.push_back(b);
  }
  write_blocks(argv[1], out);
  std::printf("wrote %zu blocks to %s\n", out.size(), argv[1]);
  return 0;
}
