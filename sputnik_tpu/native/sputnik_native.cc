// Native host-side toolkit for sputnik_tpu.
//
// The reference implements its format utilities and dataset plumbing in
// C++ (sputnik/matrix_utils.cu host paths, block/transpose/transpose.cu's
// host-side argsort/histogram pipeline, block/row_indices). The TPU build
// keeps the *device* metadata transforms in jitted JAX (formats.py), but
// host-side preprocessing — DLMC .smtx parsing, CSR->BSR blocking, bulk
// transpose planning on CPU for dataset pipelines — is native here too.
//
// Plain C ABI, loaded via ctypes (no pybind11 in the image). All index
// arrays are int32 (the TPU SMEM-native width), sizes int64.

#include <algorithm>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <vector>

extern "C" {

// Expand CSR offsets into per-nonzero row ids.
// (reference: block/row_indices/row_indices.cu:7-19)
void sputnik_row_indices(const int32_t* offsets, int64_t n_rows,
                         int32_t* row_ids) {
  for (int64_t r = 0; r < n_rows; ++r) {
    for (int32_t j = offsets[r]; j < offsets[r + 1]; ++j) row_ids[j] = (int32_t)r;
  }
}

// Counting-sort transpose metadata: column-major iteration order.
// positions[s] = physical index of the s-th block when sorted by column
// (stable), indices_t[s] = its row id, offsets_t = per-column prefix sums.
// (reference: block/transpose/transpose.cu:68-125, host PoC)
void sputnik_transpose_metadata(const int32_t* offsets, const int32_t* indices,
                                int64_t n_rows, int64_t n_cols, int64_t nnz,
                                int32_t* offsets_t, int32_t* indices_t,
                                int32_t* positions) {
  std::vector<int64_t> count(n_cols + 1, 0);
  for (int64_t j = 0; j < nnz; ++j) count[indices[j] + 1]++;
  for (int64_t c = 0; c < n_cols; ++c) count[c + 1] += count[c];
  for (int64_t c = 0; c <= n_cols; ++c) offsets_t[c] = (int32_t)count[c];
  std::vector<int64_t> cursor(count.begin(), count.end() - 1);
  for (int64_t r = 0; r < n_rows; ++r) {
    for (int32_t j = offsets[r]; j < offsets[r + 1]; ++j) {
      int64_t slot = cursor[indices[j]]++;
      positions[slot] = (int32_t)j;
      indices_t[slot] = (int32_t)r;
    }
  }
}

// --- CSR (element granularity) -> BSR block pattern -------------------------
// Pass 1: count nonzero blocks (also fills per-block-row block counts).
int64_t sputnik_csr_to_bsr_count(const int32_t* offsets, const int32_t* indices,
                                 int64_t n_rows, int64_t n_cols, int32_t block,
                                 int32_t* block_row_counts /* n_rows/block */) {
  int64_t n_block_rows = n_rows / block;
  int64_t n_block_cols = n_cols / block;
  std::vector<uint8_t> seen(n_block_cols);
  int64_t total = 0;
  for (int64_t br = 0; br < n_block_rows; ++br) {
    std::memset(seen.data(), 0, n_block_cols);
    int32_t cnt = 0;
    for (int64_t r = br * block; r < (br + 1) * block; ++r) {
      for (int32_t j = offsets[r]; j < offsets[r + 1]; ++j) {
        int32_t bc = indices[j] / block;
        if (!seen[bc]) { seen[bc] = 1; cnt++; }
      }
    }
    block_row_counts[br] = cnt;
    total += cnt;
  }
  return total;
}

// Pass 2: fill block offsets/indices (columns sorted within each row) and
// scatter element values into the packed (nnz_blocks, block, block) data.
void sputnik_csr_to_bsr_fill(const int32_t* offsets, const int32_t* indices,
                             const float* values, int64_t n_rows,
                             int64_t n_cols, int32_t block,
                             const int32_t* block_row_counts,
                             int32_t* bsr_offsets, int32_t* bsr_indices,
                             float* bsr_data) {
  int64_t n_block_rows = n_rows / block;
  int64_t n_block_cols = n_cols / block;
  bsr_offsets[0] = 0;
  for (int64_t br = 0; br < n_block_rows; ++br)
    bsr_offsets[br + 1] = bsr_offsets[br] + block_row_counts[br];
  // slot_of[bc] = packed block position for this block row, or -1.
  std::vector<int32_t> slot_of(n_block_cols);
  for (int64_t br = 0; br < n_block_rows; ++br) {
    std::fill(slot_of.begin(), slot_of.end(), -1);
    // collect distinct block-cols, sorted
    std::vector<int32_t> bcs;
    bcs.reserve(block_row_counts[br]);
    for (int64_t r = br * block; r < (br + 1) * block; ++r) {
      for (int32_t j = offsets[r]; j < offsets[r + 1]; ++j) {
        int32_t bc = indices[j] / block;
        if (slot_of[bc] < 0) { slot_of[bc] = 0; bcs.push_back(bc); }
      }
    }
    std::sort(bcs.begin(), bcs.end());
    for (size_t s = 0; s < bcs.size(); ++s) {
      slot_of[bcs[s]] = bsr_offsets[br] + (int32_t)s;
      bsr_indices[bsr_offsets[br] + s] = bcs[s];
    }
    // scatter values
    for (int64_t r = br * block; r < (br + 1) * block; ++r) {
      int64_t ir = r - br * block;
      for (int32_t j = offsets[r]; j < offsets[r + 1]; ++j) {
        int32_t c = indices[j];
        int64_t slot = slot_of[c / block];
        int64_t ic = c % block;
        bsr_data[(slot * block + ir) * block + ic] = values ? values[j] : 0.0f;
      }
    }
  }
}

// --- DLMC .smtx reader -------------------------------------------------------
// Format: "rows, cols, nnz\n<offsets...>\n<indices...>\n" (comma or space
// separated header; body whitespace separated).
int sputnik_read_smtx_header(const char* path, int64_t* rows, int64_t* cols,
                             int64_t* nnz) {
  FILE* f = fopen(path, "r");
  if (!f) return -1;
  long long r = 0, c = 0, n = 0;
  int got = fscanf(f, " %lld", &r);
  fscanf(f, " ,");
  got += fscanf(f, " %lld", &c);
  fscanf(f, " ,");
  got += fscanf(f, " %lld", &n);
  fclose(f);
  if (got != 3) return -2;
  *rows = r; *cols = c; *nnz = n;
  return 0;
}

int sputnik_read_smtx(const char* path, int64_t n_rows, int64_t nnz,
                      int32_t* offsets, int32_t* indices) {
  FILE* f = fopen(path, "r");
  if (!f) return -1;
  long long r, c, n;
  fscanf(f, " %lld", &r); fscanf(f, " ,");
  fscanf(f, " %lld", &c); fscanf(f, " ,");
  fscanf(f, " %lld", &n);
  for (int64_t i = 0; i <= n_rows; ++i) {
    long long v;
    if (fscanf(f, " %lld", &v) != 1) { fclose(f); return -2; }
    offsets[i] = (int32_t)v;
  }
  for (int64_t i = 0; i < nnz; ++i) {
    long long v;
    if (fscanf(f, " %lld", &v) != 1) { fclose(f); return -3; }
    indices[i] = (int32_t)v;
  }
  fclose(f);
  return 0;
}

// Sorted-row swizzle: argsort rows by descending nnz (stable).
// (reference: matrix_utils.cu:348-363)
void sputnik_sorted_row_swizzle(const int32_t* offsets, int64_t n_rows,
                                int32_t* order) {
  std::vector<int64_t> idx(n_rows);
  for (int64_t i = 0; i < n_rows; ++i) idx[i] = i;
  std::stable_sort(idx.begin(), idx.end(), [&](int64_t a, int64_t b) {
    return (offsets[a + 1] - offsets[a]) > (offsets[b + 1] - offsets[b]);
  });
  for (int64_t i = 0; i < n_rows; ++i) order[i] = (int32_t)idx[i];
}

// Pack each block-row's nonzeros into ceil(count/pack) fixed-width steps —
// the shared host planner behind the packed-output kernels
// (bsr_sdd.plan_sdd_bres, bsr_small.plan_sdd_smallblock). rows: (n_steps)
// row id per step; cols: (n_steps*pack) column ids with padding slots
// repeating 0; src: (nnz) the packed step-major slot of nonzero i.
// Returns n_steps (the caller sizes outputs from the offsets first).
int64_t sputnik_pack_rows(const int32_t* offsets, const int32_t* indices,
                          int64_t n_rows, int32_t pack,
                          int32_t* rows, int32_t* cols, int32_t* src) {
  int64_t step = 0;
  for (int64_t r = 0; r < n_rows; ++r) {
    int32_t lo = offsets[r], hi = offsets[r + 1];
    for (int32_t base = lo; base < hi; base += pack) {
      rows[step] = (int32_t)r;
      for (int32_t g = 0; g < pack; ++g) {
        int32_t i = base + g;
        if (i < hi) {
          cols[step * pack + g] = indices[i];
          src[i] = (int32_t)(step * pack + g);
        } else {
          cols[step * pack + g] = 0;
        }
      }
      ++step;
    }
  }
  return step;
}

}  // extern "C"
