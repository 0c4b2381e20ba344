// Native host-side map bookkeeping ops.
//
// The reference's runtime around the solvers is C++ (KeyFrame covisibility
// updates src/KeyFrame.cc:624, LocalMapping observation gathering, ...).
// In the TPU build the device handles all per-feature math, but the host
// orchestration still walks the map arrays every keyframe; these kernels
// keep that walk native.  Exposed with a plain C ABI for ctypes.
//
// Build: make -C plvio_tpu/native   (produces libmapops.so)

#include <cstdint>
#include <cstring>
#include <vector>

extern "C" {

// Covisibility row of keyframe `kf`: counts of shared point and line
// observations with every other keyframe.
//   match_pt:  [K, F]  int32 (point id or -1)
//   match_ln:  [K, L]  int32
//   kf_valid:  [K]     uint8
//   out:       [K]     int32
void covis_row(const int32_t* match_pt, const int32_t* match_ln,
               const uint8_t* kf_valid, int32_t K, int32_t F, int32_t L,
               int32_t max_pts, int32_t max_lines, int32_t kf,
               int32_t* out) {
  std::vector<uint8_t> pt_member(max_pts, 0);
  std::vector<uint8_t> ln_member(max_lines, 0);
  const int32_t* row_pt = match_pt + (int64_t)kf * F;
  const int32_t* row_ln = match_ln + (int64_t)kf * L;
  for (int32_t i = 0; i < F; ++i)
    if (row_pt[i] >= 0 && row_pt[i] < max_pts) pt_member[row_pt[i]] = 1;
  for (int32_t i = 0; i < L; ++i)
    if (row_ln[i] >= 0 && row_ln[i] < max_lines) ln_member[row_ln[i]] = 1;

  for (int32_t k = 0; k < K; ++k) {
    int32_t c = 0;
    if (kf_valid[k] && k != kf) {
      const int32_t* rp = match_pt + (int64_t)k * F;
      for (int32_t i = 0; i < F; ++i)
        if (rp[i] >= 0 && rp[i] < max_pts && pt_member[rp[i]]) ++c;
      const int32_t* rl = match_ln + (int64_t)k * L;
      for (int32_t i = 0; i < L; ++i)
        if (rl[i] >= 0 && rl[i] < max_lines && ln_member[rl[i]]) ++c;
    }
    out[k] = c;
  }
}

// Build the BA observation table for a window of keyframes.
//   window:     [W] keyframe indices
//   pt_slot:    [max_pts] int32 (landmark slot or -1)
//   match_pt:   [K, F]
//   feat_uv:    [K, F, 2] float32
//   feat_oct:   [K, F]    int32
// Outputs (capacity cap): obs_kf (window-slot), obs_pt (landmark slot),
// obs_uv [cap,2], obs_is2 [cap].  Returns count written.
int32_t build_obs_table(const int32_t* window, int32_t W,
                        const int32_t* pt_slot, int32_t max_pts,
                        const int32_t* match_pt, const float* feat_uv,
                        const int32_t* feat_oct, int32_t F,
                        float scale_factor, int32_t cap,
                        int32_t* obs_kf, int32_t* obs_pt, float* obs_uv,
                        float* obs_is2) {
  int32_t n = 0;
  // precompute inv sigma2 per octave (<= 12 levels is plenty)
  float is2[16];
  float s2 = 1.0f;
  for (int i = 0; i < 16; ++i) {
    is2[i] = 1.0f / s2;
    s2 *= scale_factor * scale_factor;
  }
  for (int32_t w = 0; w < W && n < cap; ++w) {
    int32_t k = window[w];
    const int32_t* rp = match_pt + (int64_t)k * F;
    const float* uv = feat_uv + (int64_t)k * F * 2;
    const int32_t* oc = feat_oct + (int64_t)k * F;
    for (int32_t i = 0; i < F && n < cap; ++i) {
      int32_t p = rp[i];
      if (p < 0 || p >= max_pts) continue;
      int32_t slot = pt_slot[p];
      if (slot < 0) continue;
      obs_kf[n] = w;
      obs_pt[n] = slot;
      obs_uv[2 * n] = uv[2 * i];
      obs_uv[2 * n + 1] = uv[2 * i + 1];
      int32_t o = oc[i] < 0 ? 0 : (oc[i] > 15 ? 15 : oc[i]);
      obs_is2[n] = is2[o];
      ++n;
    }
  }
  return n;
}

// Membership compaction: indices of `ids` (length n) that are valid
// (>=0, < cap, and valid_mask set).  Returns count.
int32_t compact_valid(const int32_t* ids, int32_t n, const uint8_t* valid_mask,
                      int32_t cap, int32_t* out) {
  int32_t m = 0;
  for (int32_t i = 0; i < n; ++i) {
    int32_t v = ids[i];
    if (v >= 0 && v < cap && valid_mask[v]) out[m++] = v;
  }
  return m;
}

}  // extern "C"
