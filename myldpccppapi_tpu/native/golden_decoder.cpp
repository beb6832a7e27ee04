// C++ golden decoder: flooding min-sum, one codeword at a time.
//
// A faithful native port of the numerical behaviour of the reference's CPU
// golden path (Coder::decodeCPU, MyLdpc.cpp:684-784): per-edge messages over
// a row-sorted edge list, sign-product x min-magnitude check update with
// self-exclusion, posterior hard decision bit = !(post > 0), syndrome check
// after every iteration with early exit, iteration cap.  Compiled -O3 it
// serves as the single-core CPU baseline the TPU benchmark reports
// `vs_baseline` against (the reference's own GPU numbers were never
// published — BASELINE.md).

#include <cstdint>
#include <vector>

extern "C" {

// Edge list must be sorted by row (row_ptr CSR offsets, cols = variable of
// each edge).  llr: [batch, n].  Outputs: bits [batch, n], conv [batch],
// iters [batch].
void decode_golden_minsum(const int64_t* row_ptr, const int32_t* cols,
                          int64_t m, int64_t n, int64_t n_edges,
                          const float* llr, int64_t batch, int32_t max_iters,
                          float normalization, float offset, uint8_t* bits_out,
                          uint8_t* conv_out, int32_t* iters_out) {
  std::vector<float> q(n_edges), r(n_edges), post(n);
  std::vector<uint8_t> hard(n);
  for (int64_t b = 0; b < batch; ++b) {
    const float* chan = llr + b * n;
    uint8_t* bits = bits_out + b * n;
    for (int64_t e = 0; e < n_edges; ++e) q[e] = chan[cols[e]];
    for (int64_t e = 0; e < n_edges; ++e) r[e] = 0.0f;
    int32_t t = 0;
    bool ok = false;
    while (true) {
      // check-node update: min-sum with first/second-min self-exclusion
      for (int64_t row = 0; row < m; ++row) {
        const int64_t e0 = row_ptr[row], e1 = row_ptr[row + 1];
        float m1 = 1e30f, m2 = 1e30f;
        int64_t arg = -1;
        int sgn = 0;
        for (int64_t e = e0; e < e1; ++e) {
          const float v = q[e];
          const float a = v < 0 ? -v : v;
          if (v < 0) sgn ^= 1;
          if (a < m1) { m2 = m1; m1 = a; arg = e; }
          else if (a < m2) { m2 = a; }
        }
        for (int64_t e = e0; e < e1; ++e) {
          float mag = (e == arg) ? m2 : m1;
          if (offset > 0) { mag -= offset; if (mag < 0) mag = 0; }
          mag *= normalization;
          const int s = sgn ^ (q[e] < 0 ? 1 : 0);
          r[e] = s ? -mag : mag;
        }
      }
      // posterior + hard decision
      for (int64_t v = 0; v < n; ++v) post[v] = chan[v];
      for (int64_t e = 0; e < n_edges; ++e) post[cols[e]] += r[e];
      for (int64_t v = 0; v < n; ++v) hard[v] = !(post[v] > 0.0f);
      // syndrome
      ok = true;
      for (int64_t row = 0; row < m && ok; ++row) {
        int par = 0;
        for (int64_t e = row_ptr[row]; e < row_ptr[row + 1]; ++e)
          par ^= hard[cols[e]];
        if (par) ok = false;
      }
      ++t;
      if (ok || t >= max_iters) break;
      // variable-node update
      for (int64_t e = 0; e < n_edges; ++e) q[e] = post[cols[e]] - r[e];
    }
    for (int64_t v = 0; v < n; ++v) bits[v] = hard[v];
    conv_out[b] = ok ? 1 : 0;
    iters_out[b] = t;
  }
}

}  // extern "C"
