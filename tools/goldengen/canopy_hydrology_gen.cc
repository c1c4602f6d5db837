// Generate golden fixtures for the canopy_hydrology physics group by running
// the reference kernels (serial build) over CanopyHydrology_IN.txt.
// Mirrors the call sequence of /root/reference/test/test_CanHydro.cc.
//
// Build/run: see tools/goldengen/Makefile.
#include "goldengen.hh"

#include "canopy_hydrology.h"
#include "elm_constants.h"
#include "land_data.h"

using namespace goldengen;
using namespace ELM::ELMdims;

int main(int argc, char** argv) {
  if (argc != 3) {
    std::fprintf(stderr, "usage: %s IN.txt OUT_REF.txt\n", argv[0]);
    return 1;
  }
  auto blocks = read_blocks(argv[1]);
  std::vector<Block> out;

  ELM::LandType Land;
  Land.ltype = 1;
  Land.ctype = 1;
  Land.vtype = 12;

  for (auto& b : blocks) {
    if (b.nstep == 0) continue;  // reference tests run steps 1..48
    const double dtime = 1800.0;

    int frac_veg_nosno = b.i("frac_veg_nosno");
    int oldfflag = b.i("oldfflag");
    int do_capsnow = b.i("do_capsnow");
    int snl = b.i("snl");
    double h2ocan = b.s("h2ocan");
    double qflx_candrip, qflx_through_snow, qflx_through_rain, fracsnow, fracrain;
    double qflx_snwcp_liq = b.s("qflx_snwcp_liq");
    double qflx_snwcp_ice = b.s("qflx_snwcp_ice");
    double qflx_snow_grnd = b.s("qflx_snow_grnd");
    double qflx_rain_grnd = b.s("qflx_rain_grnd");
    double fwet = 0.0, fdry = 0.0;
    double snow_depth = b.s("snow_depth");
    double h2osno = b.s("h2osno");
    double int_snow = b.s("int_snow");
    double frac_sno_eff = b.s("frac_sno_eff");
    double frac_sno = b.s("frac_sno");
    double h2osfc = b.s("h2osfc");
    double frac_h2osfc = b.s("frac_h2osfc");

    auto dz = b.v("dz");
    auto z = b.v("z");
    auto zi = b.v("zi");
    auto swe_old = b.v("swe_old");
    auto h2osoi_liq = b.v("h2osoi_liq");
    auto h2osoi_ice = b.v("h2osoi_ice");
    auto t_soisno = b.v("t_soisno");
    auto frac_iceold = b.v("frac_iceold");
    auto snw_rds = b.v("snw_rds");

    ELM::canopy_hydrology::interception(
        Land, frac_veg_nosno, b.s("forc_rain"), b.s("forc_snow"), b.s("dewmx"),
        b.s("elai"), b.s("esai"), dtime, h2ocan, qflx_candrip,
        qflx_through_snow, qflx_through_rain, fracsnow, fracrain);

    ELM::canopy_hydrology::ground_flux(
        Land, do_capsnow, frac_veg_nosno, b.s("forc_rain"), b.s("forc_snow"),
        b.s("qflx_irrig"), qflx_candrip, qflx_through_snow, qflx_through_rain,
        fracsnow, fracrain, qflx_snwcp_liq, qflx_snwcp_ice, qflx_snow_grnd,
        qflx_rain_grnd);

    ELM::canopy_hydrology::fraction_wet(Land, frac_veg_nosno, b.s("dewmx"),
                                        b.s("elai"), b.s("esai"), h2ocan, fwet,
                                        fdry);

    ELM::canopy_hydrology::snow_init(
        Land, dtime, do_capsnow, oldfflag, b.s("forc_t"), b.s("t_grnd"),
        qflx_snow_grnd, b.s("qflx_snow_melt"), b.s("n_melt"), snow_depth,
        h2osno, int_snow, span(swe_old), span(h2osoi_liq), span(h2osoi_ice),
        span(t_soisno), span(frac_iceold), snl, span(dz), span(z), span(zi),
        span(snw_rds), frac_sno_eff, frac_sno);

    ELM::canopy_hydrology::fraction_h2osfc(Land, b.s("micro_sigma"), h2osno,
                                           h2osfc, span(h2osoi_liq), frac_sno,
                                           frac_sno_eff, frac_h2osfc);

    Block o;
    o.nstep = b.nstep;
    o.set("h2ocan", h2ocan);
    o.set("qflx_snwcp_liq", qflx_snwcp_liq);
    o.set("qflx_snwcp_ice", qflx_snwcp_ice);
    o.set("qflx_snow_grnd", qflx_snow_grnd);
    o.set("qflx_rain_grnd", qflx_rain_grnd);
    o.set("fwet", fwet);
    o.set("fdry", fdry);
    o.set("snow_depth", snow_depth);
    o.set("h2osno", h2osno);
    o.set("int_snow", int_snow);
    o.set("frac_sno_eff", frac_sno_eff);
    o.set("frac_sno", frac_sno);
    o.set("snl", (double)snl);
    o.set("h2osfc", h2osfc);
    o.set("frac_h2osfc", frac_h2osfc);
    o.set("dz", dz);
    o.set("z", z);
    o.set("zi", zi);
    o.set("swe_old", swe_old);
    o.set("h2osoi_liq", h2osoi_liq);
    o.set("h2osoi_ice", h2osoi_ice);
    o.set("t_soisno", t_soisno);
    o.set("frac_iceold", frac_iceold);
    o.set("snw_rds", snw_rds);
    out.push_back(o);
  }
  write_blocks(argv[2], out);
  std::printf("wrote %zu blocks to %s\n", out.size(), argv[2]);
  return 0;
}
