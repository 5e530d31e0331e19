// smil_tools — native PCA morph-data loader.
//
// C++ re-implementation of the reference's Unreal Engine plugin
// (data/replicAnt_trials/replicAnt_plugin/Source/replicAnt/Private/SMILTools.cpp):
// loads SMIL PCA morph data (per-bone scale/translation principal components)
// from CSV with the same schema and validation rules, generates Gaussian PCA
// weights, and evaluates weighted per-bone transforms. Exposed as a C API for
// Python ctypes binding and as a standalone CLI (smil_tools_cli.cpp) since the
// build environment has no Unreal Engine.
//
// CSV schema (validated exactly as the plugin does):
//   header: joint_name,PC_1_scale_x,PC_1_scale_y,PC_1_scale_z,
//           PC_1_translation_x,PC_1_translation_y,PC_1_translation_z,PC_2_...
//   rows:   <bone name>,<6 floats per component>...

#include <algorithm>
#include <cctype>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <fstream>
#include <random>
#include <sstream>
#include <string>
#include <vector>

namespace smiltools {

struct PCABoneTransform {
  float scale[3] = {0.f, 0.f, 0.f};
  float translation[3] = {0.f, 0.f, 0.f};
};

struct PCAMorphData {
  std::vector<std::string> bone_names;
  // per bone, per component
  std::vector<std::vector<PCABoneTransform>> components;
  int num_components = 0;
  std::string error;
};

static std::string trim(const std::string& s) {
  size_t a = s.find_first_not_of(" \t\r\n");
  size_t b = s.find_last_not_of(" \t\r\n");
  if (a == std::string::npos) return "";
  return s.substr(a, b - a + 1);
}

static std::vector<std::string> parse_csv_line(const std::string& line) {
  std::vector<std::string> out;
  std::stringstream ss(line);
  std::string token;
  while (std::getline(ss, token, ',')) out.push_back(trim(token));
  if (!line.empty() && line.back() == ',') out.push_back("");
  return out;
}

static bool iequals(const std::string& a, const std::string& b) {
  if (a.size() != b.size()) return false;
  for (size_t i = 0; i < a.size(); ++i)
    if (std::tolower((unsigned char)a[i]) != std::tolower((unsigned char)b[i])) return false;
  return true;
}

// Header validation identical to the plugin's ValidateCSVHeader: first column
// 'joint_name', remaining columns a multiple of 6, named
// PC_<k>_{scale,translation}_{x,y,z} (mismatched names are warnings there; we
// treat the count/first-column rules as hard errors like the plugin).
bool validate_header(const std::vector<std::string>& header, int* num_components,
                     std::string* error) {
  if (header.size() < 7) {
    *error = "header has too few columns (expected at least 7)";
    return false;
  }
  if (!iequals(header[0], "joint_name")) {
    *error = "first column should be 'joint_name', found '" + header[0] + "'";
    return false;
  }
  size_t data_cols = header.size() - 1;
  if (data_cols % 6 != 0) {
    *error = "data columns not divisible by 6";
    return false;
  }
  *num_components = static_cast<int>(data_cols / 6);
  return true;
}

PCAMorphData load_pca_csv(const std::string& path) {
  PCAMorphData out;
  std::ifstream f(path);
  if (!f) {
    out.error = "file does not exist or is unreadable: " + path;
    return out;
  }
  std::vector<std::string> lines;
  std::string line;
  while (std::getline(f, line)) lines.push_back(line);
  if (lines.size() < 2) {
    out.error = "file must contain at least header and one data row";
    return out;
  }
  auto header = parse_csv_line(lines[0]);
  if (!validate_header(header, &out.num_components, &out.error)) return out;

  for (size_t li = 1; li < lines.size(); ++li) {
    std::string cur = trim(lines[li]);
    if (cur.empty()) continue;
    auto toks = parse_csv_line(cur);
    size_t expected = 1 + static_cast<size_t>(out.num_components) * 6;
    if (toks.size() < expected) {
      out.error = "bone '" + (toks.empty() ? std::string("?") : toks[0]) +
                  "' has too few tokens";
      out.bone_names.clear();
      out.components.clear();
      return out;
    }
    std::vector<PCABoneTransform> comps(out.num_components);
    for (int c = 0; c < out.num_components; ++c) {
      size_t base = 1 + static_cast<size_t>(c) * 6;
      for (int i = 0; i < 3; ++i) comps[c].scale[i] = std::strtof(toks[base + i].c_str(), nullptr);
      for (int i = 0; i < 3; ++i)
        comps[c].translation[i] = std::strtof(toks[base + 3 + i].c_str(), nullptr);
    }
    out.bone_names.push_back(toks[0]);
    out.components.push_back(std::move(comps));
  }
  if (out.bone_names.empty()) out.error = "no valid bone rows";
  return out;
}

// Gaussian PCA weight generation (plugin GeneratePCAWeights semantics:
// N(0, sigma), seeded stream).
std::vector<float> generate_pca_weights(int num_components, float stddev, uint32_t seed) {
  std::vector<float> w;
  if (num_components <= 0 || stddev < 0.f) return w;
  std::mt19937 rng(seed);
  std::normal_distribution<float> dist(0.f, stddev);
  w.reserve(num_components);
  for (int i = 0; i < num_components; ++i) w.push_back(dist(rng));
  return w;
}

// Weighted evaluation: per bone, scale = 1 + Σ w_c * scale_c;
// translation = Σ w_c * translation_c (the convention replicAnt's morphs and
// the python loader's sample_pca_transforms_from_dirs use).
void apply_weights(const PCAMorphData& data, const std::vector<float>& weights,
                   std::vector<PCABoneTransform>* out) {
  out->assign(data.bone_names.size(), PCABoneTransform{});
  int C = std::min<int>(data.num_components, static_cast<int>(weights.size()));
  for (size_t b = 0; b < data.bone_names.size(); ++b) {
    PCABoneTransform& t = (*out)[b];
    for (int i = 0; i < 3; ++i) t.scale[i] = 1.f;
    for (int c = 0; c < C; ++c) {
      for (int i = 0; i < 3; ++i) {
        t.scale[i] += weights[c] * data.components[b][c].scale[i];
        t.translation[i] += weights[c] * data.components[b][c].translation[i];
      }
    }
  }
}

}  // namespace smiltools

// --------------------------------------------------------------------------
// C API (ctypes-friendly)
// --------------------------------------------------------------------------

extern "C" {

struct SmilPcaHandle {
  smiltools::PCAMorphData data;
};

SmilPcaHandle* smil_pca_load(const char* path) {
  auto* h = new SmilPcaHandle();
  h->data = smiltools::load_pca_csv(path);
  return h;
}

const char* smil_pca_error(const SmilPcaHandle* h) { return h->data.error.c_str(); }
int smil_pca_num_bones(const SmilPcaHandle* h) { return (int)h->data.bone_names.size(); }
int smil_pca_num_components(const SmilPcaHandle* h) { return h->data.num_components; }

const char* smil_pca_bone_name(const SmilPcaHandle* h, int bone) {
  if (bone < 0 || bone >= (int)h->data.bone_names.size()) return "";
  return h->data.bone_names[bone].c_str();
}

// out: [num_bones * num_components * 6] floats, bone-major then component,
// scale xyz then translation xyz
void smil_pca_raw(const SmilPcaHandle* h, float* out) {
  size_t idx = 0;
  for (const auto& bone : h->data.components)
    for (const auto& c : bone) {
      for (int i = 0; i < 3; ++i) out[idx++] = c.scale[i];
      for (int i = 0; i < 3; ++i) out[idx++] = c.translation[i];
    }
}

// weights: [num_weights]; out: [num_bones * 6] (scale xyz, translation xyz)
void smil_pca_apply(const SmilPcaHandle* h, const float* weights, int num_weights,
                    float* out) {
  std::vector<float> w(weights, weights + num_weights);
  std::vector<smiltools::PCABoneTransform> res;
  smiltools::apply_weights(h->data, w, &res);
  size_t idx = 0;
  for (const auto& t : res) {
    for (int i = 0; i < 3; ++i) out[idx++] = t.scale[i];
    for (int i = 0; i < 3; ++i) out[idx++] = t.translation[i];
  }
}

void smil_pca_generate_weights(int num_components, float stddev, uint32_t seed, float* out) {
  auto w = smiltools::generate_pca_weights(num_components, stddev, seed);
  for (size_t i = 0; i < w.size(); ++i) out[i] = w[i];
}

void smil_pca_free(SmilPcaHandle* h) { delete h; }

}  // extern "C"
