// Native data-loader kernels for the host-side input pipeline.
//
// The runtime around the TPU compute path is native where it is hot: padding
// millions of variable-length click-history lists into the fixed (N, max_len)
// matrix is a pure-Python row loop in the reference (and in our fallback,
// data/parquet.py::_pad_sequences). This implements it over pyarrow's raw
// ListArray buffers (values + offsets) so a 4M-row split pads in
// milliseconds instead of tens of seconds.
//
// Exposed via a C ABI and bound with ctypes (no pybind11 in this image).

#include <cstdint>
#include <cstring>

extern "C" {

// values: concatenated list elements (int64, arrow's list<int64> child)
// offsets: int64 offsets array of length n_rows+1 (arrow large_list/list
//          offsets widened to int64 by the caller)
// out: preallocated (n_rows * max_len) int32, overwritten entirely.
// Keeps the LAST max_len entries of each list, left-padded with pad_id
// (reference truncation semantics, dataloader.py:113-115).
void pad_sequences_i64(
    const int64_t* values,
    const int64_t* offsets,
    int64_t n_rows,
    int64_t max_len,
    int32_t pad_id,
    int32_t* out) {
  for (int64_t r = 0; r < n_rows; ++r) {
    const int64_t begin = offsets[r];
    const int64_t end = offsets[r + 1];
    int64_t len = end - begin;
    const int64_t* src = values + begin;
    if (len > max_len) {
      src += (len - max_len);  // keep the LAST max_len events
      len = max_len;
    }
    int32_t* row = out + r * max_len;
    const int64_t n_pad = max_len - len;
    for (int64_t i = 0; i < n_pad; ++i) row[i] = pad_id;
    for (int64_t i = 0; i < len; ++i) row[n_pad + i] = static_cast<int32_t>(src[i]);
  }
}

// Gather rows of a 2-D int32 matrix: out[i, :] = src[idx[i], :].
// Used by the batch assembler for the per-batch permutation slice.
void gather_rows_i32(
    const int32_t* src,
    const int64_t* idx,
    int64_t n_out,
    int64_t row_width,
    int32_t* out) {
  for (int64_t i = 0; i < n_out; ++i) {
    std::memcpy(out + i * row_width, src + idx[i] * row_width,
                row_width * sizeof(int32_t));
  }
}

// Gather rows of a 2-D float32 matrix (item-embedding host join fallback).
void gather_rows_f32(
    const float* src,
    const int64_t* idx,
    int64_t n_out,
    int64_t row_width,
    float* out) {
  for (int64_t i = 0; i < n_out; ++i) {
    std::memcpy(out + i * row_width, src + idx[i] * row_width,
                row_width * sizeof(float));
  }
}

}  // extern "C"
