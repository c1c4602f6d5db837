// Golden fixtures for canopy_temperature (mirrors test_CanTemp.cc).
#include "goldengen.hh"

#include "canopy_temperature.h"
#include "elm_constants.h"
#include "land_data.h"

using namespace goldengen;
using namespace ELM::ELMdims;

int main(int argc, char** argv) {
  if (argc != 3) { std::fprintf(stderr, "usage: %s IN OUT\n", argv[0]); return 1; }
  auto blocks = read_blocks(argv[1]);
  std::vector<Block> out;

  ELM::LandType Land;
  Land.ltype = 1; Land.ctype = 1; Land.vtype = 12;

  for (auto& b : blocks) {
    if (b.nstep == 0) continue;
    double qred, hr;
    bool veg_active = b.i("veg_active");
    int snl = b.i("snl");
    int frac_veg_nosno = b.i("frac_veg_nosno");
    double t_h2osfc = b.s("t_h2osfc"), t_h2osfc_bef = b.s("t_h2osfc_bef");
    double t_grnd = b.s("t_grnd");
    double soilalpha = b.s("soilalpha"), soilbeta = b.s("soilbeta");
    double qg_snow = b.s("qg_snow"), qg_soil = b.s("qg_soil"), qg = b.s("qg");
    double qg_h2osfc = b.s("qg_h2osfc"), dqgdT = b.s("dqgdT");
    double emg = b.s("emg"), emv = b.s("emv"), htvp = b.s("htvp");
    double z0mg = b.s("z0mg"), z0hg = b.s("z0hg"), z0qg = b.s("z0qg");
    double z0mv = b.s("z0mv"), z0hv = b.s("z0hv"), z0qv = b.s("z0qv");
    double thv = b.s("thv"), z0m = b.s("z0m"), displa = b.s("displa");
    double thm = b.s("thm");
    double eflx_sh_tot = b.s("eflx_sh_tot"), eflx_lh_tot = b.s("eflx_lh_tot");
    double eflx_sh_veg = b.s("eflx_sh_veg");
    double qflx_evap_tot = b.s("qflx_evap_tot");
    double qflx_evap_veg = b.s("qflx_evap_veg");
    double qflx_tran_veg = b.s("qflx_tran_veg");
    double forc_hgt_u_patch = b.s("forc_hgt_u");
    double forc_hgt_t_patch = b.s("forc_hgt_t");
    double forc_hgt_q_patch = b.s("forc_hgt_q");

    auto t_soisno = b.v("t_soisno");
    auto tssbef = b.v("tssbef");
    auto h2osoi_liq = b.v("h2osoi_liq");
    auto h2osoi_ice = b.v("h2osoi_ice");
    auto dz = b.v("dz");
    auto watsat = b.v("watsat"), sucsat = b.v("sucsat"), bsw = b.v("bsw");
    auto watdry = b.v("watdry"), watopt = b.v("watopt"), watfc = b.v("watfc");
    auto displar = b.v("displar"), z0mr = b.v("z0mr");

    namespace ct = ELM::canopy_temperature;
    ct::old_ground_temp(Land, t_h2osfc, span(t_soisno), t_h2osfc_bef,
                        span(tssbef));
    ct::ground_temp(Land, snl, b.s("frac_sno_eff"), b.s("frac_h2osfc"),
                    t_h2osfc, span(t_soisno), t_grnd);
    ct::calc_soilalpha(Land, b.s("frac_sno"), b.s("frac_h2osfc"),
                       span(h2osoi_liq), span(h2osoi_ice), span(dz),
                       span(t_soisno), span(watsat), span(sucsat), span(bsw),
                       span(watdry), span(watopt), qred, hr, soilalpha);
    ct::calc_soilbeta(Land, b.s("frac_sno"), b.s("frac_h2osfc"), span(watsat),
                      span(watfc), span(h2osoi_liq), span(h2osoi_ice),
                      span(dz), soilbeta);
    ct::humidities(Land, snl, b.s("forc_q"), b.s("forc_pbot"), t_h2osfc,
                   t_grnd, b.s("frac_sno"), b.s("frac_sno_eff"),
                   b.s("frac_h2osfc"), qred, hr, span(t_soisno), qg_snow,
                   qg_soil, qg, qg_h2osfc, dqgdT);
    ct::ground_properties(Land, snl, b.s("frac_sno"), b.s("forc_th"),
                          b.s("forc_q"), b.s("elai"), b.s("esai"),
                          b.s("htop"), span(displar), span(z0mr),
                          span(h2osoi_liq), span(h2osoi_ice), emg, emv, htvp,
                          z0mg, z0hg, z0qg, z0mv, z0hv, z0qv, thv, z0m,
                          displa);
    ct::forcing_height(Land, veg_active, frac_veg_nosno, z0m, z0mg,
                       b.s("forc_t"), displa, forc_hgt_u_patch,
                       forc_hgt_t_patch, forc_hgt_q_patch, thm);
    ct::init_energy_fluxes(Land, eflx_sh_tot, eflx_lh_tot, eflx_sh_veg,
                           qflx_evap_tot, qflx_evap_veg, qflx_tran_veg);

    Block o;
    o.nstep = b.nstep;
    o.set("t_h2osfc_bef", t_h2osfc_bef);
    o.set("tssbef", tssbef);
    o.set("t_grnd", t_grnd);
    o.set("qred", qred);
    o.set("hr", hr);
    o.set("soilalpha", soilalpha);
    o.set("soilbeta", soilbeta);
    o.set("qg_snow", qg_snow);
    o.set("qg_soil", qg_soil);
    o.set("qg", qg);
    o.set("qg_h2osfc", qg_h2osfc);
    o.set("dqgdT", dqgdT);
    o.set("emg", emg);
    o.set("emv", emv);
    o.set("htvp", htvp);
    o.set("z0mg", z0mg);
    o.set("z0hg", z0hg);
    o.set("z0qg", z0qg);
    o.set("z0mv", z0mv);
    o.set("z0hv", z0hv);
    o.set("z0qv", z0qv);
    o.set("thv", thv);
    o.set("z0m", z0m);
    o.set("displa", displa);
    o.set("forc_hgt_u_patch", forc_hgt_u_patch);
    o.set("forc_hgt_t_patch", forc_hgt_t_patch);
    o.set("forc_hgt_q_patch", forc_hgt_q_patch);
    o.set("thm", thm);
    o.set("eflx_sh_tot", eflx_sh_tot);
    o.set("eflx_lh_tot", eflx_lh_tot);
    o.set("eflx_sh_veg", eflx_sh_veg);
    o.set("qflx_evap_tot", qflx_evap_tot);
    o.set("qflx_evap_veg", qflx_evap_veg);
    o.set("qflx_tran_veg", qflx_tran_veg);
    out.push_back(o);
  }
  write_blocks(argv[2], out);
  std::printf("wrote %zu blocks to %s\n", out.size(), argv[2]);
  return 0;
}
