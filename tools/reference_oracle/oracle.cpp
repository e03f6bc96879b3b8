// Reference-oracle driver: renders scenes through the UNMODIFIED reference
// headers (included from the read-only mount via -I, never copied) to
// produce golden radiance buffers for pixel-comparison tests
// (BASELINE.md "pixel allclose vs reference").
//
// The reference's own driver (RayTracingWeekend/RayTracingWeekend.cpp) is
// Windows-only (crtdbg.h, ppl.h); this is an independent, portable, serial
// re-driver of the documented integrator semantics (SURVEY.md §3.1):
//   color() = emitted + specular / one-sample-MIS recursion,
//   hit interval [0.001, +max], gradient-or-black background,
//   jittered subpixel sampling, box-filter average.
// Output: "RTWO <nx> <ny>\n" header + float64 LE canvas, row 0 = image
// bottom (the reference canvas convention, cpp:247).
//
// Usage: oracle <scene> <nx> <ny> <spp> <max_depth> <out.bin>
//   scene in {cornell_box, dielectric, random_balls, light_sample}

#define _USE_MATH_DEFINES
#include <cfloat>  // FLT_MAX, used by sphere.h but included transitively on MSVC
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
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
#include "Scene/scene.h"

// Serial re-implementation of the active color() path
// (RayTracingWeekend.cpp:45-160; the #if 0 history blocks are dead there).
static vec3 color(const ray& r, const scene* s, int depth) {
  if (depth <= 0) return vec3(0.0);

  hit_record rec;
  if (s->GetWorld().hit(r, 0.001f, std::numeric_limits<double>::max(), rec)) {
    switch (s->GetRenderType()) {
      case RenderType::Shaded: {
        vec3 emitted = rec.mat_ptr->emitted(r, rec, rec.u, rec.v, rec.p);
        scatter_record srec;
        if (!rec.mat_ptr->scatter(r, rec, srec)) return emitted;

        std::shared_ptr<pdf> material_pdf = srec.pdf_ptr;
        if (material_pdf == nullptr)  // specular path (cpp:114-115)
          return srec.attenuation *
                 color(srec.scattered_ray_without_pdf, s, depth - 1);

        std::shared_ptr<pdf> p = material_pdf;
        if (s->GetLights() != nullptr && !s->GetLights()->objects.empty())
          p = std::make_shared<mixture_pdf>(
              material_pdf, std::make_shared<hittable_pdf>(s->GetLights(),
                                                           rec.p));
        ray scattered = ray(rec.p, p->generate(), r.time());
        double pdf_val = p->value(scattered.direction());
        if (pdf_val <= 0.0) return emitted;
        return emitted +
               srec.attenuation *
                   rec.mat_ptr->scattering_pdf(r, rec, scattered) *
                   color(scattered, s, depth - 1) / pdf_val;
      }
      case RenderType::Normal:
        return 0.5f * (rec.normal + 1);
      default:
        return vec3(0, 0, 0);
    }
  }
  switch (s->GetBackgroundType()) {
    case BackgroundType::Gradient: {
      vec3 unit_direction = normalize(r.direction());
      double t = 0.5f * (unit_direction.y + 1.0);
      return lerp(vec3(0.5f, 0.7f, 1.0), vec3(1.0, 1.0, 1.0), t);
    }
    case BackgroundType::Black:
    default:
      return vec3(0, 0, 0);
  }
}

int main(int argc, char** argv) {
  if (argc != 7) {
    std::fprintf(stderr,
                 "usage: %s <scene> <nx> <ny> <spp> <max_depth> <out.bin>\n",
                 argv[0]);
    return 2;
  }
  std::string name = argv[1];
  int nx = std::atoi(argv[2]);
  int ny = std::atoi(argv[3]);
  int spp = std::atoi(argv[4]);
  int max_depth = std::atoi(argv[5]);
  const char* out_path = argv[6];
  double aspect = double(nx) / double(ny);

  std::unique_ptr<scene> s;
  if (name == "cornell_box")
    s = std::make_unique<cornell_box_scene>(aspect);
  else if (name == "dielectric")
    s = std::make_unique<dielectric_scene>(aspect);
  else if (name == "random_balls")
    s = std::make_unique<random_balls_scene>(aspect);
  else if (name == "light_sample")
    s = std::make_unique<light_sample>(aspect);
  else {
    std::fprintf(stderr, "unknown scene %s\n", name.c_str());
    return 2;
  }

  auto& cam = s->GetCamera();
  std::uniform_real_distribution<double> uniform;
  std::minstd_rand engine;  // default-seeded, like the reference serial mode

  std::vector<double> canvas(size_t(nx) * ny * 3, 0.0);
  for (int j = 0; j < ny; ++j) {
    for (int i = 0; i < nx; ++i) {
      vec3 sum(0, 0, 0);
      for (int sgl = 0; sgl < spp; ++sgl) {
        double u = double(i + uniform(engine)) / double(nx);
        double v = double(j + uniform(engine)) / double(ny);
        ray r = cam.get_ray(u, v);
        sum += color(r, s.get(), max_depth);
      }
      vec3 avg = sum / double(spp);
      size_t base = (size_t(j) * nx + i) * 3;  // row 0 = image bottom
      canvas[base + 0] = avg.x;
      canvas[base + 1] = avg.y;
      canvas[base + 2] = avg.z;
    }
  }

  FILE* f = std::fopen(out_path, "wb");
  if (!f) { std::perror("fopen"); return 1; }
  std::fprintf(f, "RTWO %d %d\n", nx, ny);
  std::fwrite(canvas.data(), sizeof(double), canvas.size(), f);
  std::fclose(f);
  return 0;
}
