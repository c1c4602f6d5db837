// Golden fixtures for canopy_fluxes (+photosynthesis, +soil_moist_stress),
// mirroring test_CanFlux.cc.  Pass-through scratch (air, bir, wtg, ...)
// zero-initialized each step.  PFTDataPSN params passed via argv
// (tools/goldengen/pft_psn.py).
#include "goldengen.hh"

#include "elm_constants.h"
#include "land_data.h"
#include "pft_data.h"
#include "canopy_fluxes.h"

using namespace goldengen;
using namespace ELM::ELMdims;

int main(int argc, char** argv) {
  if (argc != 3 + 27) {
    std::fprintf(stderr, "usage: %s IN OUT <27 psn params>\n", argv[0]);
    return 1;
  }
  auto blocks = read_blocks(argv[1]);

  ELM::PFTDataPSN psnveg;
  int k = 3;
  psnveg.fnr = std::atof(argv[k++]);
  psnveg.act25 = std::atof(argv[k++]);
  psnveg.kcha = std::atof(argv[k++]);
  psnveg.koha = std::atof(argv[k++]);
  psnveg.cpha = std::atof(argv[k++]);
  psnveg.vcmaxha = std::atof(argv[k++]);
  psnveg.jmaxha = std::atof(argv[k++]);
  psnveg.tpuha = std::atof(argv[k++]);
  psnveg.lmrha = std::atof(argv[k++]);
  psnveg.vcmaxhd = std::atof(argv[k++]);
  psnveg.jmaxhd = std::atof(argv[k++]);
  psnveg.tpuhd = std::atof(argv[k++]);
  psnveg.lmrhd = std::atof(argv[k++]);
  psnveg.lmrse = std::atof(argv[k++]);
  psnveg.qe = std::atof(argv[k++]);
  psnveg.theta_cj = std::atof(argv[k++]);
  psnveg.bbbopt = std::atof(argv[k++]);
  psnveg.mbbopt = std::atof(argv[k++]);
  psnveg.c3psn = std::atof(argv[k++]);
  psnveg.slatop = std::atof(argv[k++]);
  psnveg.leafcn = std::atof(argv[k++]);
  psnveg.flnr = std::atof(argv[k++]);
  psnveg.fnitr = std::atof(argv[k++]);
  psnveg.dleaf = std::atof(argv[k++]);
  psnveg.smpso = std::atof(argv[k++]);
  psnveg.smpsc = std::atof(argv[k++]);
  psnveg.tc_stress = std::atof(argv[k++]);

  ELM::LandType Land;
  Land.ltype = 1; Land.ctype = 1; Land.vtype = 12;

  std::vector<Block> out;
  const double dtime = 1800.0;

  for (auto& b : blocks) {
    if (b.nstep < 1) continue;

    int snl = b.i("snl");
    int frac_veg_nosno = b.i("frac_veg_nosno");
    int nrad = b.i("nrad");
    int altmax_indx = b.i("altmax_indx");
    int altmax_lastyear_indx = b.i("altmax_lastyear_indx");

    double btran = b.s("btran"), displa = b.s("displa");
    double z0mv = b.s("z0mv"), z0hv = b.s("z0hv"), z0qv = b.s("z0qv");
    double t_veg = b.s("t_veg");
    double qflx_tran_veg = b.s("qflx_tran_veg");
    double qflx_evap_veg = b.s("qflx_evap_veg");
    double eflx_sh_veg = b.s("eflx_sh_veg");
    double h2ocan = b.s("h2ocan");
    double eflx_sh_grnd = b.s("eflx_sh_grnd"), eflx_sh_snow = b.s("eflx_sh_snow");
    double eflx_sh_soil = b.s("eflx_sh_soil"), eflx_sh_h2osfc = b.s("eflx_sh_h2osfc");
    double qflx_evap_soi = b.s("qflx_evap_soi"), qflx_ev_snow = b.s("qflx_ev_snow");
    double qflx_ev_soil = b.s("qflx_ev_soil"), qflx_ev_h2osfc = b.s("qflx_ev_h2osfc");
    double dlrad = b.s("dlrad"), ulrad = b.s("ulrad");
    double cgrnds = b.s("cgrnds"), cgrndl = b.s("cgrndl"), cgrnd = b.s("cgrnd");
    double t_ref2m = b.s("t_ref2m"), q_ref2m = b.s("q_ref2m"), rh_ref2m = b.s("rh_ref2m");

    // zero-init scratch passed between the three kernels
    double dayl_factor = 0, air = 0, bir = 0, cir = 0, el = 0, qsatl = 0;
    double qsatldT = 0, taf = 0, qaf = 0, um = 0, ur = 0, obu = 0, zldis = 0;
    double delq = 0, wtg = 0, wtl0 = 0, wta0 = 0, wtal = 0, dth = 0, dqh = 0;
    double temp1 = 0, temp2 = 0, temp12m = 0, temp22m = 0, tlbef = 0;
    double dt_veg = 0, wtgq = 0, wtalq = 0, wtlq0 = 0, wtaq0 = 0;

    auto rootr = b.v("rootr");
    auto eff_porosity = b.v("eff_porosity");
    auto tlai_z = b.v("tlai_z");
    auto parsha_z = b.v("parsha_z"), parsun_z = b.v("parsun_z");
    auto laisha_z = b.v("laisha_z"), laisun_z = b.v("laisun_z");
    auto t_soisno = b.v("t_soisno");
    auto h2osoi_ice = b.v("h2osoi_ice"), h2osoi_liq = b.v("h2osoi_liq");
    auto dz = b.v("dz"), rootfr = b.v("rootfr");
    auto sucsat = b.v("sucsat"), watsat = b.v("watsat"), bsw = b.v("bsw");

    namespace cfx = ELM::canopy_fluxes;
    cfx::initialize_flux(
        Land, snl, frac_veg_nosno, b.s("frac_sno"), b.s("forc_hgt_u_patch"),
        b.s("thm"), b.s("thv"), b.s("max_dayl"), b.s("dayl"), altmax_indx,
        altmax_lastyear_indx, span(t_soisno), span(h2osoi_ice),
        span(h2osoi_liq), span(dz), span(rootfr), psnveg.tc_stress,
        span(sucsat), span(watsat), span(bsw), psnveg.smpso, psnveg.smpsc,
        b.s("elai"), b.s("esai"), b.s("emv"), b.s("emg"), b.s("qg"),
        b.s("t_grnd"), b.s("forc_t"), b.s("forc_pbot"), b.s("forc_lwrad"),
        b.s("forc_u"), b.s("forc_v"), b.s("forc_q"), b.s("forc_th"),
        b.s("z0mg"), btran, displa, z0mv, z0hv, z0qv, span(rootr),
        span(eff_porosity), dayl_factor, air, bir, cir, el, qsatl, qsatldT,
        taf, qaf, um, ur, obu, zldis, delq, t_veg);

    cfx::stability_iteration(
        Land, dtime, snl, frac_veg_nosno, b.s("frac_sno"),
        b.s("forc_hgt_u_patch"), b.s("forc_hgt_t_patch"),
        b.s("forc_hgt_q_patch"), b.s("fwet"), b.s("fdry"), b.s("laisun"),
        b.s("laisha"), b.s("forc_rho"), b.s("snow_depth"), b.s("soilbeta"),
        b.s("frac_h2osfc"), b.s("t_h2osfc"), b.s("sabv"), h2ocan,
        b.s("htop"), span(t_soisno), air, bir, cir, ur, zldis, displa,
        b.s("elai"), b.s("esai"), b.s("t_grnd"), b.s("forc_pbot"),
        b.s("forc_q"), b.s("forc_th"), b.s("z0mg"), z0mv, z0hv, z0qv,
        b.s("thm"), b.s("thv"), b.s("qg"), psnveg, nrad, b.s("t10"),
        span(tlai_z), b.s("vcmaxcintsha"), b.s("vcmaxcintsun"),
        span(parsha_z), span(parsun_z), span(laisha_z), span(laisun_z),
        b.s("forc_pco2"), b.s("forc_po2"), dayl_factor, btran,
        qflx_tran_veg, qflx_evap_veg, eflx_sh_veg, wtg, wtl0, wta0, wtal,
        el, qsatl, qsatldT, taf, qaf, um, dth, dqh, obu, temp1, temp2,
        temp12m, temp22m, tlbef, delq, dt_veg, t_veg, wtgq, wtalq, wtlq0,
        wtaq0);

    cfx::compute_flux(
        Land, dtime, snl, frac_veg_nosno, b.s("frac_sno"), span(t_soisno),
        b.s("frac_h2osfc"), b.s("t_h2osfc"), b.s("sabv"), b.s("qg_snow"),
        b.s("qg_soil"), b.s("qg_h2osfc"), b.s("dqgdT"), b.s("htvp"), wtg,
        wtl0, wta0, wtal, air, bir, cir, qsatl, qsatldT, dth, dqh, temp1,
        temp2, temp12m, temp22m, tlbef, delq, dt_veg, t_veg, b.s("t_grnd"),
        b.s("forc_pbot"), qflx_tran_veg, qflx_evap_veg, eflx_sh_veg,
        b.s("forc_q"), b.s("forc_rho"), b.s("thm"), b.s("emv"), b.s("emg"),
        b.s("forc_lwrad"), wtgq, wtalq, wtlq0, wtaq0, h2ocan, eflx_sh_grnd,
        eflx_sh_snow, eflx_sh_soil, eflx_sh_h2osfc, qflx_evap_soi,
        qflx_ev_snow, qflx_ev_soil, qflx_ev_h2osfc, dlrad, ulrad, cgrnds,
        cgrndl, cgrnd, t_ref2m, q_ref2m, rh_ref2m);

    Block o;
    o.nstep = b.nstep;
    o.set("btran", btran);
    o.set("displa", displa);
    o.set("z0mv", z0mv);
    o.set("z0hv", z0hv);
    o.set("z0qv", z0qv);
    o.set("rootr", rootr);
    o.set("eff_porosity", eff_porosity);
    o.set("dayl_factor", dayl_factor);
    o.set("t_veg", t_veg);
    o.set("qflx_tran_veg", qflx_tran_veg);
    o.set("qflx_evap_veg", qflx_evap_veg);
    o.set("eflx_sh_veg", eflx_sh_veg);
    o.set("h2ocan", h2ocan);
    o.set("eflx_sh_grnd", eflx_sh_grnd);
    o.set("eflx_sh_snow", eflx_sh_snow);
    o.set("eflx_sh_soil", eflx_sh_soil);
    o.set("eflx_sh_h2osfc", eflx_sh_h2osfc);
    o.set("qflx_evap_soi", qflx_evap_soi);
    o.set("qflx_ev_snow", qflx_ev_snow);
    o.set("qflx_ev_soil", qflx_ev_soil);
    o.set("qflx_ev_h2osfc", qflx_ev_h2osfc);
    o.set("dlrad", dlrad);
    o.set("ulrad", ulrad);
    o.set("cgrnds", cgrnds);
    o.set("cgrndl", cgrndl);
    o.set("cgrnd", cgrnd);
    o.set("t_ref2m", t_ref2m);
    o.set("q_ref2m", q_ref2m);
    o.set("rh_ref2m", rh_ref2m);
    // iteration-state diagnostics, useful for debugging parity
    o.set("wtg", wtg);
    o.set("wtl0", wtl0);
    o.set("wta0", wta0);
    o.set("wtal", wtal);
    o.set("wtgq", wtgq);
    o.set("wtalq", wtalq);
    o.set("wtlq0", wtlq0);
    o.set("wtaq0", wtaq0);
    o.set("taf", taf);
    o.set("qaf", qaf);
    o.set("um", um);
    o.set("obu", obu);
    o.set("dth", dth);
    o.set("dqh", dqh);
    o.set("delq", delq);
    o.set("el", el);
    o.set("qsatl", qsatl);
    o.set("qsatldT", qsatldT);
    o.set("temp1", temp1);
    o.set("temp2", temp2);
    o.set("temp12m", temp12m);
    o.set("temp22m", temp22m);
    o.set("tlbef", tlbef);
    o.set("dt_veg", dt_veg);
    out.push_back(o);
  }
  write_blocks(argv[2], out);
  std::printf("wrote %zu blocks to %s\n", out.size(), argv[2]);
  return 0;
}
