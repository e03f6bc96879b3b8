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
// Usage: oracle <scene> <nx> <ny> <spp> <max_depth> <out.bin> [tex.rtwi]
//   scene in {cornell_box, dielectric, random_balls, light_sample,
//             cornell_smoke, earth, earth_rect}
//   earth/earth_rect need the raw RTWI texture dumped by
//   tools/export_texture_raw.py — the reference's image_texture
//   (texture.h:73-98) is dead code upstream (no decoder in its tree); the
//   raw loader below feeds it the same texel bytes the framework uses so
//   the image path is gated against the UNMODIFIED reference sampler.

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

// Single-pass closest hit over the world list.
//
// The reference's hittable_list::hit (hittable_list.h:11-37) iterates the
// object list TWICE — an indexed for-loop followed by an identical
// range-for over the same objects. For deterministic geometry the second
// pass is a pure no-op (nothing can beat the already-found closest t), but
// for the STOCHASTIC constant_medium (hittable.h:420-479) it draws a
// second scatter candidate against the updated closest — taking the min
// of two exponential samples, i.e. silently DOUBLING the effective medium
// density relative to the book's documented algorithm (and the `density`
// constructor argument). The oracle uses the intended single-pass
// semantics so volume goldens reflect the declared density; surface-only
// scenes are bit-identical either way (verified: the four committed
// surface goldens pass under both).
static bool closest_hit(const hittable_list& world, const ray& r,
                        double t_min, double t_max, hit_record& rec) {
  hit_record temp;
  bool any = false;
  double closest = t_max;
  for (const auto& obj : world.objects) {
    if (obj->hit(r, t_min, closest, temp)) {
      any = true;
      closest = temp.t;
      rec = temp;
    }
  }
  return any;
}

// Serial re-implementation of the active color() path
// (RayTracingWeekend.cpp:45-160; the #if 0 history blocks are dead there).
static vec3 color(const ray& r, const scene* s, int depth) {
  if (depth <= 0) return vec3(0.0);

  hit_record rec;
  if (closest_hit(s->GetWorld(), r, 0.001f,
                  std::numeric_limits<double>::max(), rec)) {
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

// Book-2 ch.9 smoke-boxes Cornell variant built from the UNMODIFIED
// reference primitives (constant_medium hittable.h:420-489, isotropic
// material.h:252-265, box/rotate_y/translate wrappers) with the same
// constants as raytracingweekend_tpu/models/scenes.py:cornell_smoke —
// the oracle for the framework's volume path.
class smoke_scene : public scene {
 public:
  explicit smoke_scene(double aspect) : scene() {
    auto red = std::make_shared<lambertian>(
        std::make_shared<constant_texture>(vec3(0.65, 0.05, 0.05)));
    auto white = std::make_shared<lambertian>(
        std::make_shared<constant_texture>(vec3(0.73, 0.73, 0.73)));
    auto green = std::make_shared<lambertian>(
        std::make_shared<constant_texture>(vec3(0.12, 0.45, 0.15)));
    auto light = std::make_shared<diffuse_light>(
        std::make_shared<constant_texture>(vec3(7.0, 7.0, 7.0)));

    std::vector<std::shared_ptr<hittable>> objects;
    objects.push_back(
        std::make_shared<xz_rect>(113.0, 443.0, 127.0, 432.0, 554.0, light));
    lights->objects.push_back(objects.back());
    objects.push_back(std::make_shared<flip_normals>(
        std::make_shared<yz_rect>(0.0, 555.0, 0.0, 555.0, 555.0, green)));
    objects.push_back(
        std::make_shared<yz_rect>(0.0, 555.0, 0.0, 555.0, 0.0, red));
    objects.push_back(std::make_shared<flip_normals>(
        std::make_shared<xz_rect>(0.0, 555.0, 0.0, 555.0, 555.0, white)));
    objects.push_back(
        std::make_shared<xz_rect>(0.0, 555.0, 0.0, 555.0, 0.0, white));
    objects.push_back(std::make_shared<flip_normals>(
        std::make_shared<xy_rect>(0.0, 555.0, 0.0, 555.0, 555.0, white)));

    auto b1 = std::make_shared<translate>(
        std::make_shared<rotate_y>(
            std::make_shared<box>(vec3(0.0, 0.0, 0.0),
                                  vec3(165.0, 165.0, 165.0), white),
            -18.0),
        vec3(130.0, 0.0, 65.0));
    objects.push_back(std::make_shared<constant_medium>(
        b1, 0.01,
        std::make_shared<isotropic>(
            std::make_shared<constant_texture>(vec3(1.0, 1.0, 1.0)))));
    auto b2 = std::make_shared<translate>(
        std::make_shared<rotate_y>(
            std::make_shared<box>(vec3(0.0, 0.0, 0.0),
                                  vec3(165.0, 330.0, 165.0), white),
            15.0),
        vec3(265.0, 0.0, 295.0));
    objects.push_back(std::make_shared<constant_medium>(
        b2, 0.01,
        std::make_shared<isotropic>(
            std::make_shared<constant_texture>(vec3(0.0, 0.0, 0.0)))));

    this->world = hittable_list(objects);
    this->cam = camera(vec3(278.0, 278.0, -800.0), vec3(278.0, 278.0, 0.0),
                       vec3(0.0, 1.0, 0.0), 40.0, aspect, 0.0, 10.0, 0.0,
                       1.0);
    this->background_type = BackgroundType::Black;
  }
};

// Volume-debug scene: white floor + ceiling light + the short WHITE fog
// box only (used to localize volume-path discrepancies).
class fog_min_scene : public scene {
 public:
  explicit fog_min_scene(double aspect) : scene() {
    auto white = std::make_shared<lambertian>(
        std::make_shared<constant_texture>(vec3(0.73, 0.73, 0.73)));
    auto light = std::make_shared<diffuse_light>(
        std::make_shared<constant_texture>(vec3(7.0, 7.0, 7.0)));
    std::vector<std::shared_ptr<hittable>> objects;
    objects.push_back(
        std::make_shared<xz_rect>(113.0, 443.0, 127.0, 432.0, 554.0, light));
    lights->objects.push_back(objects.back());
    objects.push_back(
        std::make_shared<xz_rect>(0.0, 555.0, 0.0, 555.0, 0.0, white));
    objects.push_back(std::make_shared<flip_normals>(
        std::make_shared<xz_rect>(0.0, 555.0, 0.0, 555.0, 555.0, white)));
    auto b1 = std::make_shared<translate>(
        std::make_shared<rotate_y>(
            std::make_shared<box>(vec3(0.0, 0.0, 0.0),
                                  vec3(165.0, 165.0, 165.0), white),
            -18.0),
        vec3(130.0, 0.0, 65.0));
    objects.push_back(std::make_shared<constant_medium>(
        b1, 0.01,
        std::make_shared<isotropic>(
            std::make_shared<constant_texture>(vec3(1.0, 1.0, 1.0)))));
    this->world = hittable_list(objects);
    this->cam = camera(vec3(278.0, 278.0, -800.0), vec3(278.0, 278.0, 0.0),
                       vec3(0.0, 1.0, 0.0), 40.0, aspect, 0.0, 10.0, 0.0,
                       1.0);
    this->background_type = BackgroundType::Black;
  }
};

// Minimal volume-debug scene: white floor + ceiling light + the tall black
// smoke box only (used to localize volume-path discrepancies).
class smoke_min_scene : public scene {
 public:
  explicit smoke_min_scene(double aspect) : scene() {
    auto white = std::make_shared<lambertian>(
        std::make_shared<constant_texture>(vec3(0.73, 0.73, 0.73)));
    auto light = std::make_shared<diffuse_light>(
        std::make_shared<constant_texture>(vec3(7.0, 7.0, 7.0)));
    std::vector<std::shared_ptr<hittable>> objects;
    objects.push_back(
        std::make_shared<xz_rect>(113.0, 443.0, 127.0, 432.0, 554.0, light));
    lights->objects.push_back(objects.back());
    objects.push_back(
        std::make_shared<xz_rect>(0.0, 555.0, 0.0, 555.0, 0.0, white));
    auto b2 = std::make_shared<translate>(
        std::make_shared<rotate_y>(
            std::make_shared<box>(vec3(0.0, 0.0, 0.0),
                                  vec3(165.0, 330.0, 165.0), white),
            15.0),
        vec3(265.0, 0.0, 295.0));
    objects.push_back(std::make_shared<constant_medium>(
        b2, 0.01,
        std::make_shared<isotropic>(
            std::make_shared<constant_texture>(vec3(0.0, 0.0, 0.0)))));
    this->world = hittable_list(objects);
    this->cam = camera(vec3(278.0, 278.0, -800.0), vec3(278.0, 278.0, 0.0),
                       vec3(0.0, 1.0, 0.0), 40.0, aspect, 0.0, 10.0, 0.0,
                       1.0);
    this->background_type = BackgroundType::Black;
  }
};

// Minimal raw-texture loader for the reference's image_texture
// (texture.h:73-98 wants flat RGB8 bytes, row 0 = image top). Format
// written by tools/export_texture_raw.py: "RTWI <nx> <ny>\n" + payload.
static std::shared_ptr<image_texture::byte_array> load_rtwi(const char* path,
                                                            int* nx,
                                                            int* ny) {
  FILE* f = std::fopen(path, "rb");
  if (!f) { std::perror("fopen rtwi"); return nullptr; }
  char magic[5] = {0};
  if (std::fscanf(f, "%4s %d %d", magic, nx, ny) != 3 ||
      std::strcmp(magic, "RTWI") != 0) {
    std::fclose(f);
    std::fprintf(stderr, "bad RTWI header in %s\n", path);
    return nullptr;
  }
  std::fgetc(f);  // the newline terminating the header
  size_t n = size_t(*nx) * size_t(*ny) * 3;
  auto data = std::make_shared<image_texture::byte_array>(n);
  if (std::fread(data->data(), 1, n, f) != n) {
    std::fclose(f);
    std::fprintf(stderr, "short RTWI payload in %s\n", path);
    return nullptr;
  }
  std::fclose(f);
  return data;
}

// Image-texture globe: same constants as
// raytracingweekend_tpu/models/scenes.py earth_scene (book-2 ch."image
// texture mapping" layout; exercises get_sphere_uv + image_texture).
class earth_scene_oracle : public scene {
 public:
  earth_scene_oracle(double aspect,
                     std::shared_ptr<image_texture::byte_array> px, int tnx,
                     int tny)
      : scene() {
    auto tex = std::make_shared<image_texture>(px, tnx, tny);
    std::vector<std::shared_ptr<hittable>> objects;
    objects.push_back(std::make_shared<sphere>(
        vec3(0.0, 0.0, 0.0), 2.0, std::make_shared<lambertian>(tex)));
    this->world = hittable_list(objects);
    this->cam = camera(vec3(13.0, 2.0, 3.0), vec3(0.0, 0.0, 0.0),
                       vec3(0.0, 1.0, 0.0), 20.0, aspect, 0.0, 10.0, 0.0,
                       1.0);
    this->background_type = BackgroundType::Gradient;
  }
};

// Image texture on an axis RECT (+ textured sphere + diffuse floor): same
// constants as scenes.py earth_rect_scene — exercises xy_rect's planar uv
// (hittable.h:158-159) through image_texture::value, the combination the
// reference's dead image_texture never reaches.
class earth_rect_scene_oracle : public scene {
 public:
  earth_rect_scene_oracle(double aspect,
                          std::shared_ptr<image_texture::byte_array> px,
                          int tnx, int tny)
      : scene() {
    auto tex = std::make_shared<image_texture>(px, tnx, tny);
    std::vector<std::shared_ptr<hittable>> objects;
    objects.push_back(std::make_shared<xy_rect>(
        -3.0, 3.0, -1.5, 1.5, -1.0, std::make_shared<lambertian>(tex)));
    objects.push_back(std::make_shared<sphere>(
        vec3(0.0, 0.0, 2.0), 1.0, std::make_shared<lambertian>(tex)));
    objects.push_back(std::make_shared<sphere>(
        vec3(0.0, -101.8, 0.0), 100.0,
        std::make_shared<lambertian>(
            std::make_shared<constant_texture>(vec3(0.6, 0.6, 0.6)))));
    this->world = hittable_list(objects);
    this->cam = camera(vec3(0.0, 0.5, 9.0), vec3(0.0, 0.0, 0.0),
                       vec3(0.0, 1.0, 0.0), 40.0, aspect, 0.0, 10.0, 0.0,
                       1.0);
    this->background_type = BackgroundType::Gradient;
  }
};

int main(int argc, char** argv) {
  if (argc != 7 && argc != 8) {
    std::fprintf(stderr,
                 "usage: %s <scene> <nx> <ny> <spp> <max_depth> <out.bin>"
                 " [tex.rtwi]\n",
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
  else if (name == "cornell_smoke")
    s = std::make_unique<smoke_scene>(aspect);
  else if (name == "smoke_min")
    s = std::make_unique<smoke_min_scene>(aspect);
  else if (name == "fog_min")
    s = std::make_unique<fog_min_scene>(aspect);
  else if (name == "earth" || name == "earth_rect") {
    if (argc != 8) {
      std::fprintf(stderr, "%s needs a tex.rtwi argument\n", name.c_str());
      return 2;
    }
    int tnx = 0, tny = 0;
    auto px = load_rtwi(argv[7], &tnx, &tny);
    if (!px) return 1;
    if (name == "earth")
      s = std::make_unique<earth_scene_oracle>(aspect, px, tnx, tny);
    else
      s = std::make_unique<earth_rect_scene_oracle>(aspect, px, tnx, tny);
  } else {
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
