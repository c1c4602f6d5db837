// Golden fixtures for bareground_fluxes (mirrors test_BGFlux.cc;
// frac_veg_nosno hardwired to 0 as in the reference test).
#include "goldengen.hh"

#include "bareground_fluxes.h"
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
    int frac_veg_nosno = 0;
    int snl = b.i("snl");
    double dlrad = b.s("dlrad"), ulrad = b.s("ulrad");
    double zldis = 0.0, displa = 0.0, dth = 0.0, dqh = 0.0, obu = 0.0;
    double ur = 0.0, um = 0.0;
    double z0hg = b.s("z0hg"), z0qg = b.s("z0qg");
    double temp1 = 0.0, temp2 = 0.0, temp12m = 0.0, temp22m = 0.0, ustar = 0.0;
    double cgrnds = b.s("cgrnds"), cgrndl = b.s("cgrndl"), cgrnd = b.s("cgrnd");
    double eflx_sh_grnd = b.s("eflx_sh_grnd"), eflx_sh_tot = b.s("eflx_sh_tot");
    double eflx_sh_snow = b.s("eflx_sh_snow"), eflx_sh_soil = b.s("eflx_sh_soil");
    double eflx_sh_h2osfc = b.s("eflx_sh_h2osfc");
    double qflx_evap_soi = b.s("qflx_evap_soi"), qflx_evap_tot = b.s("qflx_evap_tot");
    double qflx_ev_snow = b.s("qflx_ev_snow"), qflx_ev_soil = b.s("qflx_ev_soil");
    double qflx_ev_h2osfc = b.s("qflx_ev_h2osfc");
    double t_ref2m = b.s("t_ref2m"), q_ref2m = b.s("q_ref2m"), rh_ref2m = b.s("rh_ref2m");
    auto t_soisno = b.v("t_soisno");

    namespace bg = ELM::bareground_fluxes;
    bg::initialize_flux(Land, frac_veg_nosno, b.s("forc_u"), b.s("forc_v"),
                        b.s("forc_q"), b.s("forc_th"), b.s("forc_hgt_u_patch"),
                        b.s("thm"), b.s("thv"), b.s("t_grnd"), b.s("qg"),
                        b.s("z0mg"), dlrad, ulrad, zldis, displa, dth, dqh,
                        obu, ur, um);
    bg::stability_iteration(Land, frac_veg_nosno, b.s("forc_hgt_t_patch"),
                            b.s("forc_hgt_u_patch"), b.s("forc_hgt_q_patch"),
                            b.s("z0mg"), zldis, displa, dth, dqh, ur,
                            b.s("forc_q"), b.s("forc_th"), b.s("thv"), z0hg,
                            z0qg, obu, um, temp1, temp2, temp12m, temp22m,
                            ustar);
    bg::compute_flux(Land, frac_veg_nosno, snl, b.s("forc_rho"),
                     b.s("soilbeta"), b.s("dqgdT"), b.s("htvp"),
                     b.s("t_h2osfc"), b.s("qg_snow"), b.s("qg_soil"),
                     b.s("qg_h2osfc"), span(t_soisno), b.s("forc_pbot"), dth,
                     dqh, temp1, temp2, temp12m, temp22m, ustar,
                     b.s("forc_q"), b.s("thm"), cgrnds, cgrndl, cgrnd,
                     eflx_sh_grnd, eflx_sh_tot, eflx_sh_snow, eflx_sh_soil,
                     eflx_sh_h2osfc, qflx_evap_soi, qflx_evap_tot,
                     qflx_ev_snow, qflx_ev_soil, qflx_ev_h2osfc, t_ref2m,
                     q_ref2m, rh_ref2m);

    Block o;
    o.nstep = b.nstep;
    o.set("dlrad", dlrad);
    o.set("ulrad", ulrad);
    o.set("zldis", zldis);
    o.set("displa", displa);
    o.set("dth", dth);
    o.set("dqh", dqh);
    o.set("obu", obu);
    o.set("ur", ur);
    o.set("um", um);
    o.set("z0hg", z0hg);
    o.set("z0qg", z0qg);
    o.set("temp1", temp1);
    o.set("temp2", temp2);
    o.set("temp12m", temp12m);
    o.set("temp22m", temp22m);
    o.set("ustar", ustar);
    o.set("cgrnds", cgrnds);
    o.set("cgrndl", cgrndl);
    o.set("cgrnd", cgrnd);
    o.set("eflx_sh_grnd", eflx_sh_grnd);
    o.set("eflx_sh_tot", eflx_sh_tot);
    o.set("eflx_sh_snow", eflx_sh_snow);
    o.set("eflx_sh_soil", eflx_sh_soil);
    o.set("eflx_sh_h2osfc", eflx_sh_h2osfc);
    o.set("qflx_evap_soi", qflx_evap_soi);
    o.set("qflx_evap_tot", qflx_evap_tot);
    o.set("qflx_ev_snow", qflx_ev_snow);
    o.set("qflx_ev_soil", qflx_ev_soil);
    o.set("qflx_ev_h2osfc", qflx_ev_h2osfc);
    o.set("t_ref2m", t_ref2m);
    o.set("q_ref2m", q_ref2m);
    o.set("rh_ref2m", rh_ref2m);
    out.push_back(o);
  }
  write_blocks(argv[2], out);
  std::printf("wrote %zu blocks to %s\n", out.size(), argv[2]);
  return 0;
}
