// Deterministic probe of the reference's transformed-box boundary
// intervals (translate(rotate_y(box)) as used by constant_medium in the
// smoke scene): for each ray on a fixed grid, prints entry/exit t of both
// boxes via the UNMODIFIED reference hit code (two-pass probing exactly as
// hittable.h:438-449 does). Compared against
// raytracingweekend_tpu.ops.geometry._boundary_entry_exit by
// tests (tools/check_medium_probe.py).
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
  auto b1 = std::make_shared<translate>(
      std::make_shared<rotate_y>(
          std::make_shared<box>(vec3(0.0, 0.0, 0.0),
                                vec3(165.0, 165.0, 165.0), white),
          -18.0),
      vec3(130.0, 0.0, 65.0));
  auto b2 = std::make_shared<translate>(
      std::make_shared<rotate_y>(
          std::make_shared<box>(vec3(0.0, 0.0, 0.0),
                                vec3(165.0, 330.0, 165.0), white),
          15.0),
      vec3(265.0, 0.0, 295.0));
  const double inf = std::numeric_limits<double>::max();
  std::vector<std::shared_ptr<hittable>> boxes = {b1, b2};
  // camera-like ray fan + some interior/odd rays
  std::vector<ray> rays;
  for (int i = 0; i < 8; ++i)
    for (int j = 0; j < 8; ++j) {
      vec3 o(278.0, 278.0, -800.0);
      vec3 target(i * 79.0, j * 79.0, 300.0);
      rays.emplace_back(o, normalize(target - o), 0.0);
    }
  rays.emplace_back(vec3(200.0, 80.0, 150.0), normalize(vec3(1, 0.2, 1)),
                    0.0);  // inside fog box
  rays.emplace_back(vec3(300.0, 150.0, 300.0), normalize(vec3(-1, 0.1, -1)),
                    0.0);  // inside smoke box
  for (size_t k = 0; k < rays.size(); ++k) {
    for (int bi = 0; bi < 2; ++bi) {
      hit_record rec1, rec2;
      double entry = NAN, exit_ = NAN;
      if (boxes[bi]->hit(rays[k], -inf, inf, rec1)) {
        if (boxes[bi]->hit(rays[k], rec1.t + 0.0001, inf, rec2)) {
          entry = rec1.t;
          exit_ = rec2.t;
        }
      }
      std::printf("%zu %d %.9g %.9g\n", k, bi, entry, exit_);
    }
  }
  return 0;
}
