// MC probe of the reference constant_medium scatter probability on fixed
// rays (unit and non-unit direction), vs the analytic 1 - exp(-sigma * L).
// Localizes the volume-path discrepancy between the framework and the
// reference.
#define _USE_MATH_DEFINES
#include <cfloat>
#include <cmath>
#include <cstdio>
#include <limits>
#include <memory>
#include <random>
#include <string>
#include <vector>

#include "vec3.h"
#include "onb.h"
#include "ray.h"
#include "pdf.h"
#include "sphere.h"
#include "hittable_list.h"
#include "camera.h"
#include "material.h"
#include "utility.h"

int main() {
  auto white = std::make_shared<lambertian>(
      std::make_shared<constant_texture>(vec3(0.73, 0.73, 0.73)));
  auto iso = std::make_shared<isotropic>(
      std::make_shared<constant_texture>(vec3(1.0, 1.0, 1.0)));
  auto b1 = std::make_shared<translate>(
      std::make_shared<rotate_y>(
          std::make_shared<box>(vec3(0.0, 0.0, 0.0),
                                vec3(165.0, 165.0, 165.0), white),
          -18.0),
      vec3(130.0, 0.0, 65.0));
  auto med = std::make_shared<constant_medium>(b1, 0.01, iso);
  const double inf = std::numeric_limits<double>::max();

  struct Case { vec3 o, d; double t_max; const char* name; };
  std::vector<Case> cases = {
      {vec3(212, 554, 150), vec3(0, -1, 0), 554.0, "ceiling down unit"},
      {vec3(212, 554, 150), vec3(0, -0.37, 0), 554.0 / 0.37,
       "ceiling down len=0.37"},
      {vec3(212, 0.001, 150), vec3(0, 1, 0), 554.0, "floor up unit"},
      {vec3(212, 80, 150), vec3(0, 1, 0), 475.0, "inside up unit"},
      {vec3(278, 278, -800), normalize(vec3(212, 80, 150)
                                       - vec3(278, 278, -800)),
       1e9, "camera ray unit"},
  };
  for (auto& c : cases) {
    // boundary chord for the analytic answer
    hit_record rec1, rec2;
    double chord = 0.0;
    ray r(c.o, c.d, 0.0);
    if (b1->hit(r, -inf, inf, rec1) &&
        b1->hit(r, rec1.t + 0.0001, inf, rec2)) {
      double e = rec1.t < 0.001 ? 0.001 : rec1.t;
      double x = rec2.t > c.t_max ? c.t_max : rec2.t;
      if (x > e) chord = (x - e) * c.d.length();
    }
    int hits = 0;
    const int N = 200000;
    for (int i = 0; i < N; ++i) {
      hit_record rec;
      if (med->hit(r, 0.001, c.t_max, rec)) hits++;
    }
    double frac = double(hits) / N;
    double ana = 1.0 - std::exp(-0.01 * chord);
    std::printf("%-22s chord=%8.3f mc=%.4f analytic=%.4f\n", c.name, chord,
                frac, ana);
  }
  return 0;
}
