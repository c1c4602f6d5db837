// Golden fixtures for canopy_sunshade_fractions (mirrors test_CanSunShade.cc).
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
    int nrad = b.i("nrad");
    double laisun = b.s("laisun"), laisha = b.s("laisha");
    auto tlai_z = b.v("tlai_z");
    auto fsun_z = b.v("fsun_z");
    auto forc_solad = b.v("forc_solad"), forc_solai = b.v("forc_solai");
    auto fabd_sun_z = b.v("fabd_sun_z"), fabd_sha_z = b.v("fabd_sha_z");
    auto fabi_sun_z = b.v("fabi_sun_z"), fabi_sha_z = b.v("fabi_sha_z");
    auto parsun_z = b.v("parsun_z"), parsha_z = b.v("parsha_z");
    auto laisun_z = b.v("laisun_z"), laisha_z = b.v("laisha_z");

    ELM::surface_radiation::canopy_sunshade_fractions(
        Land, nrad, b.s("elai"), span(tlai_z), span(fsun_z), span(forc_solad),
        span(forc_solai), span(fabd_sun_z), span(fabd_sha_z), span(fabi_sun_z),
        span(fabi_sha_z), span(parsun_z), span(parsha_z), span(laisun_z),
        span(laisha_z), laisun, laisha);

    Block o;
    o.nstep = b.nstep;
    o.set("laisun", laisun);
    o.set("laisha", laisha);
    o.set("parsun_z", parsun_z);
    o.set("parsha_z", parsha_z);
    o.set("laisun_z", laisun_z);
    o.set("laisha_z", laisha_z);
    out.push_back(o);
  }
  write_blocks(argv[2], out);
  std::printf("wrote %zu blocks to %s\n", out.size(), argv[2]);
  return 0;
}
