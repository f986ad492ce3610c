// Native oracle engine: exact ver0-semantics N-body stepping over SoA state.
//
// This is this framework's host-side reference implementation, used by the
// test suite to generate/check golden kinetic-energy traces quickly.  It
// reproduces, operation for operation, the arithmetic the reference's
// scalar loop performs (documented in nbody_tpu/oracle.py; reference:
// ver0/GSimulation.cpp:127-173):
//   - fp32 deltas and squared-distance partial sums,
//   - the double literal 1e-3 softening added in fp64, truncated to fp32,
//   - distanceInv = fp32(1.0 / sqrt(double)),
//   - per-pair force terms evaluated left-associatively in fp64,
//   - sequential fp32 accumulation over sources, fp32 integration,
//   - sequential fp32 kinetic-energy sum.
//
// MUST be compiled with -ffp-contract=off (no FMA) so every operation is
// individually rounded, matching both the numpy oracle and an SSE2 build
// of the reference.  Layout is SoA (x/y/z planes), unlike the reference's
// ver0 AoS; the arithmetic is layout-independent.
//
// Build: see native/Makefile (produces libnbody_oracle.so).

#include <cmath>
#include <cstdint>
#include <vector>

namespace {

constexpr double kSofteningSquared = 1e-3;  // ver0/GSimulation.cpp:114
constexpr double kGravity = 6.67259e-11;    // ver0/GSimulation.cpp:116

}  // namespace

extern "C" {

// pos, vel: 3*n floats as three contiguous planes [x..., y..., z...].
// mass: n floats.  kenergy_out: nsteps floats (KE after each step).
// Advances the state in place.  Returns 0 on success.
int nbody_oracle_run(float* pos, float* vel, const float* mass,
                     int64_t n, int64_t nsteps, float dt,
                     float* kenergy_out) {
  if (n <= 0 || nsteps < 0) return 1;
  float* px = pos;
  float* py = pos + n;
  float* pz = pos + 2 * n;
  float* vx = vel;
  float* vy = vel + n;
  float* vz = vel + 2 * n;

  std::vector<float> ax(n), ay(n), az(n);

  for (int64_t s = 0; s < nsteps; ++s) {
    for (int64_t i = 0; i < n; ++i) {
      float axi = 0.0f, ayi = 0.0f, azi = 0.0f;
      const float xi = px[i], yi = py[i], zi = pz[i];
      for (int64_t j = 0; j < n; ++j) {
        const float ex = px[j] - xi;
        const float ey = py[j] - yi;
        const float ez = pz[j] - zi;
        // fp32 partial sums, then +1e-3 in fp64, truncated to fp32.
        const float r2 =
            static_cast<float>(static_cast<double>((ex * ex + ey * ey) + ez * ez)
                               + kSofteningSquared);
        const float rinv =
            static_cast<float>(1.0 / std::sqrt(static_cast<double>(r2)));
        // Left-associative fp64 chain, accumulated as fp32(fp64(acc)+term).
        const double base = static_cast<double>(ex) * kGravity;
        double t = ((base * static_cast<double>(mass[j]))
                    * static_cast<double>(rinv));
        t = (t * static_cast<double>(rinv)) * static_cast<double>(rinv);
        axi = static_cast<float>(static_cast<double>(axi) + t);
        double u = ((static_cast<double>(ey) * kGravity)
                    * static_cast<double>(mass[j]))
                   * static_cast<double>(rinv);
        u = (u * static_cast<double>(rinv)) * static_cast<double>(rinv);
        ayi = static_cast<float>(static_cast<double>(ayi) + u);
        double w = ((static_cast<double>(ez) * kGravity)
                    * static_cast<double>(mass[j]))
                   * static_cast<double>(rinv);
        w = (w * static_cast<double>(rinv)) * static_cast<double>(rinv);
        azi = static_cast<float>(static_cast<double>(azi) + w);
      }
      ax[i] = axi;
      ay[i] = ayi;
      az[i] = azi;
    }

    float energy = 0.0f;
    for (int64_t i = 0; i < n; ++i) {
      vx[i] += ax[i] * dt;
      vy[i] += ay[i] * dt;
      vz[i] += az[i] * dt;
      px[i] += vx[i] * dt;
      py[i] += vy[i] * dt;
      pz[i] += vz[i] * dt;
      energy += mass[i] * ((vx[i] * vx[i] + vy[i] * vy[i]) + vz[i] * vz[i]);
    }
    kenergy_out[s] = 0.5f * energy;
  }
  return 0;
}

}  // extern "C"
