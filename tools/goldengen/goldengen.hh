// Golden-fixture generator support: parse the reference's NSTEP-block text
// format, run reference kernels (headers included read-only from
// /root/reference), and dump every variable at full double precision.
//
// These fixtures are the correctness oracle for the TPU framework's physics:
// the shipped ELM *_OUT.txt data has documented errors beyond step 1
// (see /root/reference/test/CanHydro_notes.txt), so we regenerate golden
// outputs from the reference kernels themselves.
#pragma once

#include <cmath>
#include <cstdio>
#include <fstream>
#include <map>
#include <sstream>
#include <stdexcept>
#include <string>
#include <vector>

namespace goldengen {

struct Block {
  int nstep = 0;
  // insertion-ordered variable list
  std::vector<std::string> order;
  std::map<std::string, std::vector<double>> vars;

  bool has(const std::string& n) const { return vars.count(n) > 0; }
  double s(const std::string& n) const { return vars.at(n).at(0); }
  int i(const std::string& n) const { return (int)vars.at(n).at(0); }
  std::vector<double>& v(const std::string& n) { return vars.at(n); }
  const std::vector<double>& v(const std::string& n) const { return vars.at(n); }

  void set(const std::string& n, const std::vector<double>& vals) {
    if (!has(n)) order.push_back(n);
    vars[n] = vals;
  }
  void set(const std::string& n, double val) { set(n, std::vector<double>{val}); }
};

inline std::vector<Block> read_blocks(const std::string& path) {
  std::ifstream f(path);
  if (!f) throw std::runtime_error("cannot open " + path);
  std::vector<Block> blocks;
  std::string line;
  while (std::getline(f, line)) {
    std::istringstream ss(line);
    std::string name;
    if (!(ss >> name)) continue;
    if (name == "NSTEP") {
      Block b;
      ss >> b.nstep;
      blocks.push_back(b);
      continue;
    }
    if (name == "!!!") continue;
    if (blocks.empty()) continue;
    std::vector<double> vals;
    std::string tok;
    while (ss >> tok) {
      if (tok == "nan" || tok == "NaN") vals.push_back(std::nan(""));
      // strtod instead of stod: golden files contain subnormals (1e-323)
      // that make stod throw out_of_range
      else vals.push_back(std::strtod(tok.c_str(), nullptr));
    }
    blocks.back().set(name, vals);
  }
  return blocks;
}

inline void write_blocks(const std::string& path, const std::vector<Block>& blocks) {
  FILE* f = std::fopen(path.c_str(), "w");
  if (!f) throw std::runtime_error("cannot write " + path);
  for (const auto& b : blocks) {
    std::fprintf(f, "NSTEP %d\n", b.nstep);
    for (const auto& name : b.order) {
      std::fprintf(f, "%s", name.c_str());
      for (double v : b.vars.at(name)) std::fprintf(f, " %.17g", v);
      std::fprintf(f, "\n");
    }
  }
  std::fclose(f);
}

// Minimal 1D accessor adapter so reference kernels templated on ArrayD1
// can operate directly on std::vector storage.
struct Span {
  double* p;
  double& operator()(int i) const { return p[i]; }
  double& operator[](int i) const { return p[i]; }
};
inline Span span(std::vector<double>& v) { return Span{v.data()}; }

}  // namespace goldengen
