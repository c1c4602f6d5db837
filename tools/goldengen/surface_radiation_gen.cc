// Golden fixtures for surface_radiation (mirrors test_SurfRad.cc call order).
#include "goldengen.hh"

#include "surface_radiation.h"
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
    double sabg_soil = b.s("sabg_soil"), sabg_snow = b.s("sabg_snow");
    double sabg = b.s("sabg"), sabv = b.s("sabv"), fsa = b.s("fsa");
    double fsr = b.s("fsr");
    int snl = b.i("snl");
    auto sabg_lyr = b.v("sabg_lyr");
    std::vector<double> trd(numrad(), 0.0), tri(numrad(), 0.0);

    ELM::surface_radiation::initialize_flux(Land, sabg_soil, sabg_snow, sabg,
                                            sabv, fsa, span(sabg_lyr));

    auto ftdd = b.v("ftdd"), ftid = b.v("ftid"), ftii = b.v("ftii");
    auto forc_solad = b.v("forc_solad"), forc_solai = b.v("forc_solai");
    auto fabd = b.v("fabd"), fabi = b.v("fabi");
    auto albsod = b.v("albsod"), albsoi = b.v("albsoi");
    auto albsnd_hst = b.v("albsnd_hst"), albsni_hst = b.v("albsni_hst");
    auto albgrd = b.v("albgrd"), albgri = b.v("albgri");
    auto flx_absdv = b.v("flx_absdv"), flx_absdn = b.v("flx_absdn");
    auto flx_absiv = b.v("flx_absiv"), flx_absin = b.v("flx_absin");
    auto albd = b.v("albd"), albi = b.v("albi");

    ELM::surface_radiation::total_absorbed_radiation(
        Land, snl, span(ftdd), span(ftid), span(ftii), span(forc_solad),
        span(forc_solai), span(fabd), span(fabi), span(albsod), span(albsoi),
        span(albsnd_hst), span(albsni_hst), span(albgrd), span(albgri), sabv,
        fsa, sabg, sabg_soil, sabg_snow, span(trd), span(tri));

    ELM::surface_radiation::layer_absorbed_radiation(
        Land, snl, sabg, sabg_snow, b.s("snow_depth"), span(flx_absdv),
        span(flx_absdn), span(flx_absiv), span(flx_absin), span(trd),
        span(tri), span(sabg_lyr));

    ELM::surface_radiation::reflected_radiation(Land, span(albd), span(albi),
                                                span(forc_solad),
                                                span(forc_solai), fsr);

    Block o;
    o.nstep = b.nstep;
    o.set("sabg_soil", sabg_soil);
    o.set("sabg_snow", sabg_snow);
    o.set("sabg", sabg);
    o.set("sabv", sabv);
    o.set("fsa", fsa);
    o.set("fsr", fsr);
    o.set("sabg_lyr", sabg_lyr);
    o.set("trd", trd);
    o.set("tri", tri);
    out.push_back(o);
  }
  write_blocks(argv[2], out);
  std::printf("wrote %zu blocks to %s\n", out.size(), argv[2]);
  return 0;
}
