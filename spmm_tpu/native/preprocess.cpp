// Native host preprocessing passes (the sequential/hash-bound pieces).
//
// TPU-framework host components replacing the reference's serial scans with
// equivalent-but-correct implementations (cited per function):
//  - region_split: first-touch distinct-column budget scan
//    (reference: PreProcessing/transmat.h:334-376)
//  - relabel_first_touch: per-region first-touch column relabeling
//    (reference: PreProcessing/serial_newblock_clock.cpp:187-204)
//  - dominant_sections: per-row dominant column section
//    (reference intent: PreProcessing/bitmap.h:108-146; see SURVEY.md §2.3)
//
// All are O(nnz) single passes using version-stamped scratch arrays (no
// per-region clears), which is why they beat the numpy sort-based fallbacks.
//
// Build: part of libspmm_native.so (see build.py).

#include <cstdint>

extern "C" {

// Scan rows in order; close a region once the count of distinct columns since
// the region began reaches `budget` (close AFTER the triggering row).
// `stamp` is caller-provided scratch of size ncol (any contents).
// Writes region row boundaries (excluding leading 0) to `bounds_out`;
// returns the number of boundaries written (== number of regions).
long long region_split(const long long* indptr, const int* cols, long long nrow,
                       long long ncol, long long budget, int* stamp,
                       long long* bounds_out) {
  for (long long c = 0; c < ncol; ++c) stamp[c] = -1;
  int region = 0;
  long long nb = 0;
  long long distinct = 0;
  for (long long r = 0; r < nrow; ++r) {
    for (long long p = indptr[r]; p < indptr[r + 1]; ++p) {
      int c = cols[p];
      if (stamp[c] != region) {
        stamp[c] = region;
        ++distinct;
      }
    }
    if (distinct >= budget) {
      bounds_out[nb++] = r + 1;
      ++region;
      distinct = 0;
    }
  }
  if (nb == 0 || bounds_out[nb - 1] != nrow) bounds_out[nb++] = nrow;
  return nb;
}

// Same scan but visiting rows in permuted order (row_perm[r] = original row),
// so the reordered matrix never needs materializing before the split.
long long region_split_permuted(const long long* indptr, const int* cols,
                                const long long* row_perm, long long nrow,
                                long long ncol, long long budget, int* stamp,
                                long long* bounds_out) {
  for (long long c = 0; c < ncol; ++c) stamp[c] = -1;
  int region = 0;
  long long nb = 0;
  long long distinct = 0;
  for (long long r = 0; r < nrow; ++r) {
    long long orig = row_perm[r];
    for (long long p = indptr[orig]; p < indptr[orig + 1]; ++p) {
      int c = cols[p];
      if (stamp[c] != region) {
        stamp[c] = region;
        ++distinct;
      }
    }
    if (distinct >= budget) {
      bounds_out[nb++] = r + 1;
      ++region;
      distinct = 0;
    }
  }
  if (nb == 0 || bounds_out[nb - 1] != nrow) bounds_out[nb++] = nrow;
  return nb;
}

// Per-region first-touch relabel of the packed column stream.
//  cols:        packed column ids (region-concatenated), length nnz
//  region_nnz:  region boundaries in the packed stream, length nregions+1
//  map/mapstamp: caller scratch of size ncol
// Outputs:
//  codes_out:   region-local relabeled id per nonzero        (len nnz)
//  gather_out:  original column per relabel slot, region-major (len <= nnz)
//  region_counts_out: distinct columns per region            (len nregions)
// Returns total number of distinct (region, col) slots.
long long relabel_first_touch(const int* cols, long long nnz,
                              const long long* region_nnz, long long nregions,
                              long long ncol, int* map, int* mapstamp,
                              int* codes_out, int* gather_out,
                              long long* region_counts_out) {
  for (long long c = 0; c < ncol; ++c) mapstamp[c] = -1;
  long long total = 0;
  for (long long reg = 0; reg < nregions; ++reg) {
    long long lo = region_nnz[reg], hi = region_nnz[reg + 1];
    int next = 0;
    for (long long p = lo; p < hi; ++p) {
      int c = cols[p];
      if (mapstamp[c] != (int)reg) {
        mapstamp[c] = (int)reg;
        map[c] = next;
        gather_out[total + next] = c;
        ++next;
      }
      codes_out[p] = map[c];
    }
    region_counts_out[reg] = next;
    total += next;
  }
  return total;
}

// Fused pack: gather nonzeros into final row order, 8-row interleave v8
// groups, and relabel columns per region in first-touch order — one pass.
// (reference equivalents: row gather serial_newblock_clock.cpp:339-360,
//  v8 interleave :366-399, relabel :187-204; fused here because each is a
//  separate O(nnz) numpy pass otherwise.)
//
//  indptr_orig  (nrow+1) int64   original CSR
//  indices      (nnz)    int32
//  data         (nnz*esz) bytes  values (any element size esz)
//  row_perm     (nrow)   int64   final_pos -> original row
//  indptr_final (nrow+1) int64   CSR indptr in final order
//  row_group    (nrow)   int32   group id per final row, -1 if ungrouped
//  region_bounds(nregions+1) int64  region row boundaries (final order)
//  map/mapstamp (ncol)   int32   scratch
// Outputs: packed data bytes, cols_local, gather_cols, region_counts.
// Returns total distinct (region, col) slots.
long long pack_blocked(const long long* indptr_orig, const int* indices,
                       const char* data, long long esz, long long nrow,
                       long long ncol, const long long* row_perm,
                       const long long* indptr_final, const int* row_group,
                       const long long* region_bounds, long long nregions,
                       int* map, int* mapstamp, char* packed_data,
                       int* cols_local, int* gather_out,
                       long long* region_counts_out) {
  for (long long c = 0; c < ncol; ++c) mapstamp[c] = -1;
  long long total = 0;
  long long r = 0;
  for (long long reg = 0; reg < nregions; ++reg) {
    long long row_end = region_bounds[reg + 1];
    int next = 0;
    while (r < row_end) {
      long long base = indptr_final[r];
      if (row_group[r] >= 0) {
        // 8 consecutive equal-length rows, element-major interleave:
        // slot base + 8*e + rr holds element e of group-row rr.
        // Traversal is in SLOT order (element-major) so the first-touch
        // relabel order matches the packed stream, as the contract requires.
        long long L = indptr_final[r + 1] - indptr_final[r];
        for (long long e = 0; e < L; ++e) {
          for (long long rr = 0; rr < 8; ++rr) {
            long long src = indptr_orig[row_perm[r + rr]] + e;
            long long dst = base + 8 * e + rr;
            int c = indices[src];
            if (mapstamp[c] != (int)reg) {
              mapstamp[c] = (int)reg;
              map[c] = next;
              gather_out[total + next] = c;
              ++next;
            }
            cols_local[dst] = map[c];
            __builtin_memcpy(packed_data + dst * esz, data + src * esz, esz);
          }
        }
        r += 8;
      } else {
        long long src0 = indptr_orig[row_perm[r]];
        long long L = indptr_final[r + 1] - indptr_final[r];
        for (long long e = 0; e < L; ++e) {
          int c = indices[src0 + e];
          if (mapstamp[c] != (int)reg) {
            mapstamp[c] = (int)reg;
            map[c] = next;
            gather_out[total + next] = c;
            ++next;
          }
          cols_local[base + e] = map[c];
          __builtin_memcpy(packed_data + (base + e) * esz, data + (src0 + e) * esz, esz);
        }
        r += 1;
      }
    }
    region_counts_out[reg] = next;
    total += next;
  }
  return total;
}

// Per-row dominant section: the section (col >> shift-free: col / sect) with
// the most nonzeros in the row; ties -> lowest section; empty row -> -1.
// Assumes column indices sorted within each row (CSR canonical form).
void dominant_sections(const long long* indptr, const int* cols, long long nrow,
                       long long sect_size, long long* dom_out) {
  for (long long r = 0; r < nrow; ++r) {
    long long best_cnt = 0, best_sect = -1;
    long long run_cnt = 0, run_sect = -1;
    for (long long p = indptr[r]; p < indptr[r + 1]; ++p) {
      long long s = cols[p] / sect_size;
      if (s == run_sect) {
        ++run_cnt;
      } else {
        if (run_cnt > best_cnt) { best_cnt = run_cnt; best_sect = run_sect; }
        run_sect = s;
        run_cnt = 1;
      }
    }
    if (run_cnt > best_cnt) { best_cnt = run_cnt; best_sect = run_sect; }
    dom_out[r] = best_sect;
  }
}

}  // extern "C"
