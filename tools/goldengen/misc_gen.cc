// Golden fixtures for the remaining leaf modules: surface_fluxes,
// conservation evaluators, solar geometry (coszen/average_cosz/daylength),
// init_* cold-start kernels, soil_texture pedotransfer, atm_physics
// functors, and phenology interpolation.  One synthetic case per block.
#include "goldengen.hh"

#include "array.hh"
#include "elm_constants.h"
#include "land_data.h"

#include "surface_fluxes.h"
#include "conserved_quantity_evaluators.h"
#include "incident_shortwave.h"
#include "day_length.h"
#include "init_snow_state.h"
#include "init_soil_state.h"
#include "init_topography.h"
#include "init_timestep.h"
#include "soil_texture_hydraulic_model.h"
#include "atm_physics.h"
#include "phenology_physics.h"

using namespace goldengen;
using namespace ELM::ELMdims;

int main(int argc, char** argv) {
  if (argc != 2) { std::fprintf(stderr, "usage: %s OUT\n", argv[0]); return 1; }

  const int ncols = 80;
  const int nlev = nlevgrnd() + nlevsno();
  const double dtime = 1800.0;

  ELM::LandType Land;
  Land.ltype = 1; Land.ctype = 1; Land.vtype = 12;

  std::vector<Block> out;
  for (int cse = 0; cse < ncols; ++cse) {
    Block b;
    b.nstep = cse;
    int snl = cse % 6;
    const int top = nlevsno() - snl;

    // ---------------- surface_fluxes -----------------------------------
    double frac_sno_eff = (snl > 0) ? 0.3 + 0.1 * (cse % 7) : 0.0;
    double frac_h2osfc = (cse % 4 == 1) ? 0.2 : 0.0;
    double t_h2osfc_bef = 272.0 + (cse % 6);
    double tssbef_snotop = 265.0 + (cse % 9);
    double tssbef_soitop = 270.0 + (cse % 8);
    double t_grnd = 271.0 + (cse % 7);
    double cgrnds = 10.0 + cse, cgrndl = 1.0e-4 * (1 + cse % 5);
    double eflx_sh_grnd = -15.0 + 2.0 * (cse % 15);
    double qflx_evap_soi = -2.0e-5 + 5.0e-6 * (cse % 9);
    double qflx_ev_snow = -1.0e-5 + 3.0e-6 * (cse % 8);
    double qflx_ev_soil = -1.2e-5 + 3.0e-6 * (cse % 7);
    double qflx_ev_h2osfc = -1.4e-5 + 4.0e-6 * (cse % 6);
    double h2osoi_ice_snotop = 3.0 + (cse % 10);
    double h2osoi_liq_snotop = 0.5 * (cse % 4);
    double htvp = (cse % 2) ? 2.501e6 : 2.8347e6;
    double sabg_soil = 30.0 * (cse % 4), sabg_snow = 25.0 * (cse % 3);
    double dlrad = 250.0 + cse;
    double frac_veg_nosno = cse % 2;
    double emg = 0.96, forc_lwrad = 290.0 + (cse % 12);
    double eflx_sh_veg = 5.0 * (cse % 5), qflx_evap_veg = 1.0e-5 * (cse % 3);
    double qflx_snwcp_liq = 1.0e-6 * (cse % 3);
    double qflx_snwcp_ice = 1.0e-6 * (cse % 4);
    int do_capsnow = (cse % 5 == 2) ? 1 : 0;
    double ulrad = 40.0 + cse % 20;

    b.set("in_snl", (double)snl);
    b.set("in_do_capsnow", (double)do_capsnow);
    b.set("in_frac_sno_eff", frac_sno_eff);
    b.set("in_frac_h2osfc", frac_h2osfc);
    b.set("in_t_h2osfc_bef", t_h2osfc_bef);
    b.set("in_tssbef_snotop", tssbef_snotop);
    b.set("in_tssbef_soitop", tssbef_soitop);
    b.set("in_t_grnd", t_grnd);
    b.set("in_cgrnds", cgrnds);
    b.set("in_cgrndl", cgrndl);
    b.set("in_eflx_sh_grnd", eflx_sh_grnd);
    b.set("in_qflx_evap_soi", qflx_evap_soi);
    b.set("in_qflx_ev_snow", qflx_ev_snow);
    b.set("in_qflx_ev_soil", qflx_ev_soil);
    b.set("in_qflx_ev_h2osfc", qflx_ev_h2osfc);
    b.set("in_h2osoi_ice_snotop", h2osoi_ice_snotop);
    b.set("in_h2osoi_liq_snotop", h2osoi_liq_snotop);
    b.set("in_htvp", htvp);
    b.set("in_sabg_soil", sabg_soil);
    b.set("in_sabg_snow", sabg_snow);
    b.set("in_dlrad", dlrad);
    b.set("in_frac_veg_nosno", frac_veg_nosno);
    b.set("in_emg", emg);
    b.set("in_forc_lwrad", forc_lwrad);
    b.set("in_eflx_sh_veg", eflx_sh_veg);
    b.set("in_qflx_evap_veg", qflx_evap_veg);
    b.set("in_qflx_snwcp_liq", qflx_snwcp_liq);
    b.set("in_qflx_snwcp_ice", qflx_snwcp_ice);
    b.set("in_ulrad", ulrad);

    namespace sf = ELM::surface_fluxes;
    sf::initial_flux_calc(Land.urbpoi, snl, frac_sno_eff, frac_h2osfc,
                          t_h2osfc_bef, tssbef_snotop, tssbef_soitop, t_grnd,
                          cgrnds, cgrndl, eflx_sh_grnd, qflx_evap_soi,
                          qflx_ev_snow, qflx_ev_soil, qflx_ev_h2osfc);
    double eflx_soil_grnd = 0, eflx_sh_tot = 0, qflx_evap_tot = 0;
    double eflx_lh_tot = 0, qflx_evap_grnd = 0, qflx_sub_snow = 0;
    double qflx_dew_snow = 0, qflx_dew_grnd = 0;
    sf::update_surface_fluxes(Land.urbpoi, do_capsnow, snl, dtime, t_grnd,
                              htvp, frac_sno_eff, frac_h2osfc, t_h2osfc_bef,
                              sabg_soil, sabg_snow, dlrad, frac_veg_nosno,
                              emg, forc_lwrad, tssbef_snotop, tssbef_soitop,
                              h2osoi_ice_snotop, h2osoi_liq_snotop,
                              eflx_sh_veg, qflx_evap_veg, qflx_evap_soi,
                              eflx_sh_grnd, qflx_ev_snow, qflx_ev_soil,
                              qflx_ev_h2osfc, eflx_soil_grnd, eflx_sh_tot,
                              qflx_evap_tot, eflx_lh_tot, qflx_evap_grnd,
                              qflx_sub_snow, qflx_dew_snow, qflx_dew_grnd,
                              qflx_snwcp_liq, qflx_snwcp_ice);
    double eflx_lwrad_out = 0, eflx_lwrad_net = 0;
    sf::lwrad_outgoing(Land.urbpoi, snl, (int)frac_veg_nosno, forc_lwrad,
                       frac_sno_eff, tssbef_snotop, tssbef_soitop,
                       frac_h2osfc, t_h2osfc_bef, t_grnd, ulrad, emg,
                       eflx_lwrad_out, eflx_lwrad_net);

    b.set("eflx_sh_grnd", eflx_sh_grnd);
    b.set("qflx_evap_soi", qflx_evap_soi);
    b.set("qflx_ev_snow", qflx_ev_snow);
    b.set("qflx_ev_soil", qflx_ev_soil);
    b.set("qflx_ev_h2osfc", qflx_ev_h2osfc);
    b.set("eflx_soil_grnd", eflx_soil_grnd);
    b.set("eflx_sh_tot", eflx_sh_tot);
    b.set("qflx_evap_tot", qflx_evap_tot);
    b.set("eflx_lh_tot", eflx_lh_tot);
    b.set("qflx_evap_grnd", qflx_evap_grnd);
    b.set("qflx_sub_snow", qflx_sub_snow);
    b.set("qflx_dew_snow", qflx_dew_snow);
    b.set("qflx_dew_grnd", qflx_dew_grnd);
    b.set("qflx_snwcp_liq", qflx_snwcp_liq);
    b.set("qflx_snwcp_ice", qflx_snwcp_ice);
    b.set("eflx_lwrad_out", eflx_lwrad_out);
    b.set("eflx_lwrad_net", eflx_lwrad_net);

    // ---------------- conservation evaluators ---------------------------
    std::vector<double> ice(nlev), liq(nlev);
    for (int i = 0; i < nlev; ++i) {
      ice[i] = (i >= top && i < nlevsno()) ? 5.0 + i : ((i >= nlevsno() && (cse + i) % 3 == 0) ? 8.0 + i : 0.0);
      liq[i] = (i >= nlevsno()) ? 10.0 + i : 0.1 * (i >= top && i < nlevsno());
    }
    b.set("in_ice", ice);
    b.set("in_liq", liq);
    double h2ocan = 0.1 * (cse % 5), h2osno_c = 20.0 + cse, h2osfc_c = 2.0 * (cse % 3);
    b.set("in_h2ocan", h2ocan);
    b.set("in_h2osno_c", h2osno_c);
    b.set("in_h2osfc_c", h2osfc_c);
    double wtot = ELM::conservation_eval::column_water_mass(
        h2ocan, h2osno_c, h2osfc_c, span(ice), span(liq));
    b.set("column_water_mass", wtot);
    double err_snow = ELM::conservation_eval::snow_water_balance_error(
        snl, qflx_dew_snow, qflx_dew_grnd, qflx_sub_snow, qflx_evap_grnd,
        1.0e-6 * cse, qflx_snwcp_ice, qflx_snwcp_liq, 2.0e-6, frac_sno_eff,
        3.0e-5, 2.0e-5, 1.0e-6, h2osno_c, h2osno_c - 0.01, dtime, do_capsnow);
    b.set("snow_water_balance_error", err_snow);
    double err_seb = ELM::conservation_eval::surface_energy_balance_error(
        50.0 + cse, 30.0, forc_lwrad, eflx_lwrad_out, eflx_sh_tot,
        eflx_lh_tot, eflx_soil_grnd);
    b.set("surface_energy_balance_error", err_seb);

    // ---------------- solar geometry ------------------------------------
    double latrad = (-80.0 + 2.0 * cse) * ELM::ELMconst::ELM_PI() / 180.0;
    double lonrad = (5.0 * cse) * ELM::ELMconst::ELM_PI() / 180.0;
    double jday = 1.0 + cse * 4.5 + (cse % 48) / 48.0;
    b.set("in_latrad", latrad);
    b.set("in_lonrad", lonrad);
    b.set("in_jday", jday);
    b.set("coszen", ELM::incident_shortwave::coszen(latrad, lonrad, jday));
    b.set("avg_cosz", ELM::incident_shortwave::average_cosz(latrad, lonrad, dtime, jday));
    double decl = ELM::incident_shortwave::declination_angle_sin((int)jday);
    b.set("declination", decl);
    b.set("daylength", ELM::daylength(latrad * 0.9, decl * 0.9));
    b.set("max_daylength", ELM::max_daylength(latrad * 0.9));

    // ---------------- init modules ---------------------------------------
    double snow_depth0 = 0.005 + 0.009 * cse;  // spans the layer ladder
    b.set("in_snow_depth0", snow_depth0);
    {
      std::vector<double> dzi(nlevsno(), 0.0), zzi(nlevsno(), 0.0), zii(nlevsno() + 1, 0.0);
      int snl_i = 0;
      ELM::init_snow_layers(snow_depth0, false, snl_i, span(dzi), span(zzi), span(zii));
      b.set("init_snl", (double)snl_i);
      b.set("init_dz", dzi);
      b.set("init_z", zzi);
      b.set("init_zi", zii);
    }
    b.set("init_topo_slope", ELM::init_topo_slope(0.1 + 0.05 * cse));
    b.set("init_melt_factor", ELM::init_melt_factor(Land.ltype, 5.0 + 3.0 * cse));
    b.set("init_micro_sigma", ELM::init_micro_sigma(0.1 + 0.05 * cse));

    // ---------------- soil texture pedotransfer --------------------------
    {
      std::vector<double> sand(nlevsoi()), clay(nlevsoi()), organic(nlevsoi());
      std::vector<double> zsoi_s(nlev, 0.0);
      for (int i = 0; i < nlevsoi(); ++i) {
        sand[i] = 20.0 + (cse + i) % 60;
        clay[i] = 10.0 + (cse * 2 + i) % 40;
        organic[i] = (cse + i) % 50;
      }
      double zprev = 0.0;
      for (int j = 0; j < nlevgrnd(); ++j) {
        double dzj = 0.0175 * std::pow(1.53, j);
        zsoi_s[nlevsno() + j] = zprev + 0.5 * dzj;
        zprev += dzj;
      }
      const double organic_max = 130.0;
      std::vector<double> watsat(nlevgrnd()), bsw(nlevgrnd()), sucsat(nlevgrnd());
      std::vector<double> watdry(nlevgrnd()), watopt(nlevgrnd()), watfc(nlevgrnd());
      std::vector<double> tkmg(nlevgrnd()), tkdry(nlevgrnd()), csol(nlevgrnd());
      ELM::init_soil_hydraulics(organic_max, span(sand), span(clay),
                                span(organic), span(zsoi_s), span(watsat),
                                span(bsw), span(sucsat), span(watdry),
                                span(watopt), span(watfc), span(tkmg),
                                span(tkdry), span(csol));
      b.set("in_sand", sand);
      b.set("in_clay", clay);
      b.set("in_organic", organic);
      b.set("in_zsoi", zsoi_s);
      b.set("watsat", watsat);
      b.set("bsw", bsw);
      b.set("sucsat", sucsat);
      b.set("watdry", watdry);
      b.set("watopt", watopt);
      b.set("watfc", watfc);
      b.set("tkmg", tkmg);
      b.set("tkdry", tkdry);
      b.set("csol", csol);

      // root fraction (uses zi at soil interfaces)
      std::vector<double> zii_full(nlev + 1, 0.0);
      zprev = 0.0;
      for (int j = 0; j < nlevgrnd(); ++j) {
        zprev += 0.0175 * std::pow(1.53, j);
        zii_full[nlevsno() + 1 + j] = zprev;
      }
      std::vector<double> rootfr(nlevgrnd(), 0.0);
      double roota = 6.0 + 0.1 * (cse % 10), rootb = 2.0 + 0.05 * (cse % 8);
      ELM::init_vegrootfr(Land.vtype, roota, rootb, span(zii_full), span(rootfr));
      b.set("in_roota", roota);
      b.set("in_rootb", rootb);
      b.set("in_zi_full", zii_full);
      b.set("rootfr", rootfr);
    }

    // ---------------- atm physics ----------------------------------------
    {
      double wt1 = 0.25 + 0.5 * ((cse % 3) / 2.0), wt2 = 1.0 - wt1;
      double tb1 = 260.0 + cse % 40, tb2 = 262.0 + cse % 38;
      double pb1 = 8.0e4 + 100.0 * cse, pb2 = 8.1e4 + 90.0 * cse;
      double qb1 = 1.0e-3 + 1.0e-5 * cse, qb2 = 1.1e-3 + 1.2e-5 * cse;
      double fl1 = 40.0 + 8.0 * cse, fl2 = 45.0 + 8.0 * cse;  // some <50 -> synth branch
      double fs1 = 100.0 + 10.0 * (cse % 30);
      double pr1 = 1.0e-5 * (cse % 6);
      double wd1 = 1.0 + 0.3 * (cse % 10), wd2 = 1.2 + 0.3 * (cse % 9);
      double cosz = 0.001 + 0.01 * (cse % 90);
      b.set("in_wt1", wt1);
      b.set("in_tb", std::vector<double>{tb1, tb2});
      b.set("in_pb", std::vector<double>{pb1, pb2});
      b.set("in_qb", std::vector<double>{qb1, qb2});
      b.set("in_fl", std::vector<double>{fl1, fl2});
      b.set("in_fs", fs1);
      b.set("in_pr", pr1);
      b.set("in_wd", std::vector<double>{wd1, wd2});
      b.set("in_cosz", cosz);

      namespace ap = ELM::atm_forcing_physics;
      double forc_t = std::min(ap::interp_forcing(wt1, wt2, tb1, tb2), 323.0);
      double forc_p = std::max(ap::interp_forcing(wt1, wt2, pb1, pb2), 4.0e4);
      double forc_q = std::max(ap::interp_forcing(wt1, wt2, qb1, qb2), 1.0e-9);
      // RH conversion branch
      double rh_in = 40.0 + (cse % 60);
      b.set("in_rh", rh_in);
      double e = (forc_t > ELM::ELMconst::TFRZ()) ? ap::esatw(ap::tdc(forc_t)) : ap::esati(ap::tdc(forc_t));
      double qsat_rh = 0.622 * e / (forc_p - 0.378 * e);
      double forc_q_rh = std::max(rh_in, 1.0e-9) * qsat_rh / 100.0;
      double flds = ap::interp_forcing(wt1, wt2, fl1, fl2);
      double forc_lw;
      if (flds <= 50.0 || flds >= 600.0) {
        const double ee = forc_p * forc_q / (0.622 + 0.378 * forc_q);
        const double ea = 0.70 + 5.95e-5 * 0.01 * ee * std::exp(1500.0 / forc_t);
        forc_lw = ea * ELM::ELMconst::STEBOL() * std::pow(forc_t, 4.0);
      } else {
        forc_lw = flds;
      }
      const double swndr = std::max(fs1 * cosz * 0.5, 0.0);
      const double rv = std::min(0.99, std::max(0.17639 + 0.00380 * swndr - 9.0039e-06 * std::pow(swndr, 2.0) + 8.1351e-09 * std::pow(swndr, 3.0), 0.01));
      const double rn = std::min(0.99, std::max(0.29548 + 0.00504 * swndr - 1.4957e-05 * std::pow(swndr, 2.0) + 1.4881e-08 * std::pow(swndr, 3.0), 0.01));
      const double frac1 = (forc_t - ELM::ELMconst::TFRZ()) * 0.5;
      const double frac2 = std::min(1.0, std::max(0.0, frac1));
      double rho = ap::derive_forc_rho(forc_p, forc_q, forc_t);
      b.set("forc_t", forc_t);
      b.set("forc_p", forc_p);
      b.set("forc_q", forc_q);
      b.set("forc_q_rh", forc_q_rh);
      b.set("forc_lw", forc_lw);
      b.set("solad", std::vector<double>{rv * swndr, rn * swndr});
      b.set("solai", std::vector<double>{(1.0 - rv) * swndr, (1.0 - rn) * swndr});
      b.set("rain", frac2 * std::max(pr1, 0.0));
      b.set("snow", (1.0 - frac2) * std::max(pr1, 0.0));
      b.set("wind_u", ap::interp_forcing(wt1, wt2, wd1, wd2));
      b.set("rho", rho);
      b.set("po2", ap::derive_forc_po2(forc_p));
      b.set("pco2", ap::derive_forc_pco2(forc_p));
    }
    out.push_back(b);
  }
  write_blocks(argv[1], out);
  std::printf("wrote %zu blocks to %s\n", out.size(), argv[1]);
  return 0;
}
