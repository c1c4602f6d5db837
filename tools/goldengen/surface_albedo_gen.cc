// Golden fixtures for surface_albedo + snow_snicar (mirrors test_SurfAlb.cc).
//
// Differences from the reference test (deliberate, documented):
//  - All scratch buffers the reference test carries across steps
//    (flx_abs_lcl, flx_absd_snw, g_star, ...) are zero-initialized before
//    every step, so entries the reference leaves stale/uninitialized are
//    deterministically zero in the fixture.
//  - PFT albedo parameters (rhol/rhos/taul/taus vis+nir, xl for the test's
//    vtype=12) are passed via argv (extracted from clm_params NetCDF by
//    tools/goldengen/pft_alb.py), avoiding a NetCDF build dependency.
#include "goldengen.hh"

#include "elm_constants.h"
#include "land_data.h"
#include "pft_data.h"
#include "surface_albedo.h"
#include "snow_snicar.h"

using namespace goldengen;
using namespace ELM::ELMdims;

namespace {
struct Span2 {
  double* p;
  int ncols;
  double& operator()(int i, int j) const { return p[i * ncols + j]; }
};
struct Span3 {
  double* p;
  int s0, s1;
  double& operator()(int i, int j, int k) const { return p[i * s0 + j * s1 + k]; }
};
struct SpanI {
  int* p;
  int& operator()(int i) const { return p[i]; }
};
Span2 span2(std::vector<double>& v, int ncols) { return Span2{v.data(), ncols}; }
Span3 span3(std::vector<double>& v, int s0, int s1) { return Span3{v.data(), s0, s1}; }
}  // namespace

int main(int argc, char** argv) {
  if (argc != 13) {
    std::fprintf(stderr,
                 "usage: %s SNOWOPTICS_IN SURFALB_IN OUT rholvis rholnir "
                 "rhosvis rhosnir taulvis taulnir tausvis tausnir xl\n",
                 argv[0]);
    return 1;
  }
  auto optics = read_blocks(argv[1]);
  auto blocks = read_blocks(argv[2]);
  Block& opt = optics.at(0);

  ELM::PFTDataAlb albveg;
  albveg.rhol[0] = std::atof(argv[4]);
  albveg.rhol[1] = std::atof(argv[5]);
  albveg.rhos[0] = std::atof(argv[6]);
  albveg.rhos[1] = std::atof(argv[7]);
  albveg.taul[0] = std::atof(argv[8]);
  albveg.taul[1] = std::atof(argv[9]);
  albveg.taus[0] = std::atof(argv[10]);
  albveg.taus[1] = std::atof(argv[11]);
  albveg.xl = std::atof(argv[12]);

  ELM::LandType Land;
  Land.ltype = 1; Land.ctype = 1; Land.vtype = 12;

  const int nsnw = ELM::snow_snicar::numrad_snw();
  const int nmie = ELM::snow_snicar::detail::idx_Mie_snw_mx;

  std::vector<Block> out;

  for (auto& b : blocks) {
    if (b.nstep < 2) continue;  // reference test loops t = 2..48

    int snl = b.i("snl");
    int snl_top = 0, snl_btm = 0, nrad = 0, flg_nosnl = 0;
    double vcmaxcintsun = 0.0, vcmaxcintsha = 0.0, mu_not = 0.0;
    double t_grnd = 0.0;  // not parsed by the reference test; unused for soil

    auto albsod = b.v("albsod"), albsoi = b.v("albsoi");
    auto albsnd = b.v("albsnd"), albsni = b.v("albsni");
    auto albgrd = b.v("albgrd"), albgri = b.v("albgri");
    auto albd = b.v("albd"), albi = b.v("albi");
    auto fabd = b.v("fabd"), fabd_sun = b.v("fabd_sun"), fabd_sha = b.v("fabd_sha");
    auto fabi = b.v("fabi"), fabi_sun = b.v("fabi_sun"), fabi_sha = b.v("fabi_sha");
    auto ftdd = b.v("ftdd"), ftid = b.v("ftid"), ftii = b.v("ftii");
    auto flx_absdv = b.v("flx_absdv"), flx_absdn = b.v("flx_absdn");
    auto flx_absiv = b.v("flx_absiv"), flx_absin = b.v("flx_absin");
    auto tlai_z = b.v("tlai_z"), tsai_z = b.v("tsai_z"), fsun_z = b.v("fsun_z");
    auto fabd_sun_z = b.v("fabd_sun_z"), fabd_sha_z = b.v("fabd_sha_z");
    auto fabi_sun_z = b.v("fabi_sun_z"), fabi_sha_z = b.v("fabi_sha_z");
    auto h2osoi_liq = b.v("h2osoi_liq"), h2osoi_ice = b.v("h2osoi_ice");
    auto snw_rds = b.v("snw_rds");
    auto h2osoi_vol = b.v("h2osoi_vol");
    auto albsat = b.v("albsat"), albdry = b.v("albdry");

    // zero-initialized per-step scratch
    std::vector<double> mss_cnc_aer_in_fdb(nlevsno() * sno_nbr_aer(), 0.0);
    std::vector<double> flx_absd_snw((nlevsno() + 1) * numrad(), 0.0);
    std::vector<double> flx_absi_snw((nlevsno() + 1) * numrad(), 0.0);
    std::vector<double> flx_abs_lcl((nlevsno() + 1) * nsnw, 0.0);
    std::vector<double> albout_lcl(nsnw, 0.0);
    std::vector<double> flx_slrd_lcl(nsnw, 0.0), flx_slri_lcl(nsnw, 0.0);
    std::vector<double> h2osoi_ice_lcl(nlevsno(), 0.0), h2osoi_liq_lcl(nlevsno(), 0.0);
    std::vector<int> snw_rds_lcl_v(nlevsno(), 0);
    std::vector<double> g_star(nsnw * nlevsno(), 0.0);
    std::vector<double> omega_star(nsnw * nlevsno(), 0.0);
    std::vector<double> tau_star(nsnw * nlevsno(), 0.0);
    SpanI snw_rds_lcl{snw_rds_lcl_v.data()};

    namespace sa = ELM::surface_albedo;
    namespace sn = ELM::snow_snicar;

    sa::init_timestep(Land.urbpoi, b.s("elai"), span(b.v("mss_cnc_bcphi")),
                      span(b.v("mss_cnc_bcpho")), span(b.v("mss_cnc_dst1")),
                      span(b.v("mss_cnc_dst2")), span(b.v("mss_cnc_dst3")),
                      span(b.v("mss_cnc_dst4")), vcmaxcintsun, vcmaxcintsha,
                      span(albsod), span(albsoi), span(albgrd), span(albgri),
                      span(albd), span(albi), span(fabd), span(fabd_sun),
                      span(fabd_sha), span(fabi), span(fabi_sun),
                      span(fabi_sha), span(ftdd), span(ftid), span(ftii),
                      span(flx_absdv), span(flx_absdn), span(flx_absiv),
                      span(flx_absin), span2(mss_cnc_aer_in_fdb, sno_nbr_aer()));

    sa::soil_albedo(Land, snl, t_grnd, b.s("coszen"), span(h2osoi_vol),
                    span(albsat), span(albdry), span(albsod), span(albsoi));

    for (int flg_slr_in = 1; flg_slr_in <= 2; ++flg_slr_in) {
      auto& flx_abs_out = (flg_slr_in == 1) ? flx_absd_snw : flx_absi_snw;
      auto& albout = (flg_slr_in == 1) ? albsnd : albsni;

      sn::init_timestep(Land.urbpoi, flg_slr_in, b.s("coszen"), b.s("h2osno"),
                        snl, span(h2osoi_liq), span(h2osoi_ice), span(snw_rds),
                        snl_top, snl_btm, span2(flx_abs_lcl, nsnw),
                        span2(flx_abs_out, numrad()), flg_nosnl,
                        span(h2osoi_ice_lcl), span(h2osoi_liq_lcl),
                        snw_rds_lcl, mu_not, span(flx_slrd_lcl),
                        span(flx_slri_lcl));

      sn::snow_aerosol_mie_params(
          Land.urbpoi, flg_slr_in, snl_top, snl_btm, b.s("coszen"),
          b.s("h2osno"), snw_rds_lcl, span(h2osoi_ice_lcl),
          span(h2osoi_liq_lcl), span(opt.v("ss_alb_oc1")),
          span(opt.v("asm_prm_oc1")), span(opt.v("ext_cff_mss_oc1")),
          span(opt.v("ss_alb_oc2")), span(opt.v("asm_prm_oc2")),
          span(opt.v("ext_cff_mss_oc2")), span(opt.v("ss_alb_dst1")),
          span(opt.v("asm_prm_dst1")), span(opt.v("ext_cff_mss_dst1")),
          span(opt.v("ss_alb_dst2")), span(opt.v("asm_prm_dst2")),
          span(opt.v("ext_cff_mss_dst2")), span(opt.v("ss_alb_dst3")),
          span(opt.v("asm_prm_dst3")), span(opt.v("ext_cff_mss_dst3")),
          span(opt.v("ss_alb_dst4")), span(opt.v("asm_prm_dst4")),
          span(opt.v("ext_cff_mss_dst4")),
          span2(opt.v("ss_alb_snw_drc"), nmie),
          span2(opt.v("asm_prm_snw_drc"), nmie),
          span2(opt.v("ext_cff_mss_snw_drc"), nmie),
          span2(opt.v("ss_alb_snw_dfs"), nmie),
          span2(opt.v("asm_prm_snw_dfs"), nmie),
          span2(opt.v("ext_cff_mss_snw_dfs"), nmie),
          span2(opt.v("ss_alb_bc1"), nsnw), span2(opt.v("asm_prm_bc1"), nsnw),
          span2(opt.v("ext_cff_mss_bc1"), nsnw),
          span2(opt.v("ss_alb_bc2"), nsnw), span2(opt.v("asm_prm_bc2"), nsnw),
          span2(opt.v("ext_cff_mss_bc2"), nsnw),
          span3(opt.v("bcenh"), (ELM::snow_snicar::detail::idx_bc_nclrds_max + 1) * nsnw, nsnw),
          span2(mss_cnc_aer_in_fdb, sno_nbr_aer()), span2(g_star, nlevsno()),
          span2(omega_star, nlevsno()), span2(tau_star, nlevsno()));

      sn::snow_radiative_transfer_solver(
          Land.urbpoi, flg_slr_in, flg_nosnl, snl_top, snl_btm, b.s("coszen"),
          b.s("h2osno"), mu_not, span(flx_slrd_lcl), span(flx_slri_lcl),
          span(albsoi), span2(g_star, nlevsno()), span2(omega_star, nlevsno()),
          span2(tau_star, nlevsno()), span(albout_lcl),
          span2(flx_abs_lcl, nsnw));

      sn::snow_albedo_radiation_factor(
          Land.urbpoi, flg_slr_in, snl_top, b.s("coszen"), mu_not,
          b.s("h2osno"), snw_rds_lcl, span(albsoi), span(albout_lcl),
          span2(flx_abs_lcl, nsnw), span(albout),
          span2(flx_abs_out, numrad()));
    }

    sa::ground_albedo(Land.urbpoi, b.s("coszen"), b.s("frac_sno"),
                      span(albsod), span(albsoi), span(albsnd), span(albsni),
                      span(albgrd), span(albgri));

    sa::flux_absorption_factor(Land, b.s("coszen"), b.s("frac_sno"),
                               span(albsod), span(albsoi), span(albsnd),
                               span(albsni), span2(flx_absd_snw, numrad()),
                               span2(flx_absi_snw, numrad()), span(flx_absdv),
                               span(flx_absdn), span(flx_absiv),
                               span(flx_absin));

    sa::canopy_layer_lai(Land.urbpoi, b.s("elai"), b.s("esai"), b.s("tlai"),
                         b.s("tsai"), nrad, span(tlai_z), span(tsai_z),
                         span(fsun_z), span(fabd_sun_z), span(fabd_sha_z),
                         span(fabi_sun_z), span(fabi_sha_z));

    sa::two_stream_solver(Land, nrad, b.s("coszen"), b.s("t_veg"),
                          b.s("fwet"), b.s("elai"), b.s("esai"), span(tlai_z),
                          span(tsai_z), span(albgrd), span(albgri), albveg,
                          vcmaxcintsun, vcmaxcintsha, span(albd), span(ftid),
                          span(ftdd), span(fabd), span(fabd_sun),
                          span(fabd_sha), span(albi), span(ftii), span(fabi),
                          span(fabi_sun), span(fabi_sha), span(fsun_z),
                          span(fabd_sun_z), span(fabd_sha_z),
                          span(fabi_sun_z), span(fabi_sha_z));

    Block o;
    o.nstep = b.nstep;
    o.set("albsod", albsod); o.set("albsoi", albsoi);
    o.set("albsnd", albsnd); o.set("albsni", albsni);
    o.set("albgrd", albgrd); o.set("albgri", albgri);
    o.set("flx_absdv", flx_absdv); o.set("flx_absdn", flx_absdn);
    o.set("flx_absiv", flx_absiv); o.set("flx_absin", flx_absin);
    o.set("flx_absd_snw", flx_absd_snw); o.set("flx_absi_snw", flx_absi_snw);
    o.set("tlai_z", tlai_z); o.set("tsai_z", tsai_z);
    o.set("fsun_z", fsun_z);
    o.set("fabd_sun_z", fabd_sun_z); o.set("fabd_sha_z", fabd_sha_z);
    o.set("fabi_sun_z", fabi_sun_z); o.set("fabi_sha_z", fabi_sha_z);
    o.set("albd", albd); o.set("albi", albi);
    o.set("ftdd", ftdd); o.set("ftid", ftid); o.set("ftii", ftii);
    o.set("fabd", fabd); o.set("fabd_sun", fabd_sun); o.set("fabd_sha", fabd_sha);
    o.set("fabi", fabi); o.set("fabi_sun", fabi_sun); o.set("fabi_sha", fabi_sha);
    o.set("vcmaxcintsun", vcmaxcintsun);
    o.set("vcmaxcintsha", vcmaxcintsha);
    o.set("nrad", (double)nrad);
    out.push_back(o);
  }
  write_blocks(argv[3], out);
  std::printf("wrote %zu blocks to %s\n", out.size(), argv[3]);
  return 0;
}
