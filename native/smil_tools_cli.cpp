// CLI around the smil_tools PCA loader: validate a CSV, print a summary,
// optionally sample weights and evaluate per-bone transforms.
//
// Usage: smil_tools <pca.csv> [--sample SIGMA SEED] [--weights w1,w2,...]

#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>

extern "C" {
struct SmilPcaHandle;
SmilPcaHandle* smil_pca_load(const char* path);
const char* smil_pca_error(const SmilPcaHandle*);
int smil_pca_num_bones(const SmilPcaHandle*);
int smil_pca_num_components(const SmilPcaHandle*);
const char* smil_pca_bone_name(const SmilPcaHandle*, int);
void smil_pca_apply(const SmilPcaHandle*, const float*, int, float*);
void smil_pca_generate_weights(int, float, unsigned int, float*);
void smil_pca_free(SmilPcaHandle*);
}

int main(int argc, char** argv) {
  if (argc < 2) {
    std::fprintf(stderr, "usage: %s <pca.csv> [--sample SIGMA SEED] [--weights w1,w2,...]\n",
                 argv[0]);
    return 2;
  }
  SmilPcaHandle* h = smil_pca_load(argv[1]);
  const char* err = smil_pca_error(h);
  if (err && err[0]) {
    std::fprintf(stderr, "error: %s\n", err);
    smil_pca_free(h);
    return 1;
  }
  int nb = smil_pca_num_bones(h);
  int nc = smil_pca_num_components(h);
  std::printf("loaded %d bones, %d principal components\n", nb, nc);

  std::vector<float> weights;
  for (int a = 2; a < argc; ++a) {
    if (!std::strcmp(argv[a], "--sample") && a + 2 < argc) {
      float sigma = std::strtof(argv[a + 1], nullptr);
      unsigned seed = (unsigned)std::strtoul(argv[a + 2], nullptr, 10);
      weights.resize(nc);
      smil_pca_generate_weights(nc, sigma, seed, weights.data());
      a += 2;
    } else if (!std::strcmp(argv[a], "--weights") && a + 1 < argc) {
      weights.clear();
      char* tok = std::strtok(argv[a + 1], ",");
      while (tok) {
        weights.push_back(std::strtof(tok, nullptr));
        tok = std::strtok(nullptr, ",");
      }
      ++a;
    }
  }

  if (!weights.empty()) {
    std::printf("weights:");
    for (float w : weights) std::printf(" %.4f", w);
    std::printf("\n");
    std::vector<float> out((size_t)nb * 6);
    smil_pca_apply(h, weights.data(), (int)weights.size(), out.data());
    std::printf("%-24s %-30s %s\n", "bone", "scale", "translation");
    for (int b = 0; b < nb; ++b) {
      const float* t = &out[(size_t)b * 6];
      std::printf("%-24s (%8.4f %8.4f %8.4f)  (%8.4f %8.4f %8.4f)\n",
                  smil_pca_bone_name(h, b), t[0], t[1], t[2], t[3], t[4], t[5]);
    }
  }
  smil_pca_free(h);
  return 0;
}
