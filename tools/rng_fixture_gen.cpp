// Golden-fixture generator for RNG bit-compatibility tests.
//
// Dumps the exact float sequences produced by libstdc++'s
//   std::mt19937(42) + std::uniform_real_distribution<float>
// which the reference uses for initial conditions
// (reference: ver0/GSimulation.cpp:44-93 — pos ~ U(0,1), vel ~ U(-1,1)*1e-3,
//  mass = N*U(0,1), each field re-seeding mt19937 with 42).
//
// This file is original tooling for this repo; it contains no simulation code.
// Build: g++ -O2 -std=c++17 rng_fixture_gen.cpp -o rng_fixture_gen
// Usage: ./rng_fixture_gen NDRAWS OUTDIR
#include <cstdio>
#include <cstdlib>
#include <cstdint>
#include <random>
#include <string>
#include <vector>

static void dump(const std::string& path, const std::vector<float>& v) {
  FILE* f = std::fopen(path.c_str(), "wb");
  if (!f) { std::perror(path.c_str()); std::exit(1); }
  std::fwrite(v.data(), sizeof(float), v.size(), f);
  std::fclose(f);
}

int main(int argc, char** argv) {
  const int n = argc > 1 ? std::atoi(argv[1]) : 8192;
  const std::string outdir = argc > 2 ? argv[2] : ".";

  std::vector<float> u01(n), u11(n);
  std::vector<uint32_t> raw(n);

  {
    std::mt19937 gen(42);
    std::uniform_real_distribution<float> d(0.0f, 1.0f);
    for (int i = 0; i < n; ++i) u01[i] = d(gen);
  }
  {
    std::mt19937 gen(42);
    std::uniform_real_distribution<float> d(-1.0f, 1.0f);
    for (int i = 0; i < n; ++i) u11[i] = d(gen);
  }
  {
    std::mt19937 gen(42);
    for (int i = 0; i < n; ++i) raw[i] = gen();
  }

  dump(outdir + "/mt19937_42_u01.f32", u01);
  dump(outdir + "/mt19937_42_u11.f32", u11);
  FILE* f = std::fopen((outdir + "/mt19937_42_raw.u32").c_str(), "wb");
  std::fwrite(raw.data(), sizeof(uint32_t), raw.size(), f);
  std::fclose(f);
  std::printf("wrote %d draws to %s\n", n, outdir.c_str());
  return 0;
}
