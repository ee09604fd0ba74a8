// Native host tier: hash-table construction (and friends) for the
// kcftools-tpu engine.
//
// The reference implementation has no native code at all (pure Java;
// see SURVEY.md §2.4) - this tier exists because the rebuilt engine
// front-loads all host work (KMC ingest -> device table build) so the
// TPU pipeline runs at full speed. The builder is a sequential
// two-choice bucketed cuckoo insert: each key goes to the emptier of
// its two candidate buckets (8 slots each); when both are full a
// bounded random-walk eviction makes room. The hash functions MUST stay
// bit-identical with engine/hashtable.py::bucket_hashes_np and
// ops/lookup.py::bucket_hashes_jnp.
//
// Build: g++ -O3 -shared -fPIC -o libkcfnative.so kcf_native.cpp

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <atomic>
#include <thread>
#include <vector>

namespace {

// Global worker-thread budget. 0 = auto (all hardware threads). Set via
// kcf_set_threads from the CLI's -t/--threads flag (the analog of the
// reference's pool sizing, Plugins/GetVariants.java:129).
int g_threads = 0;

// Worker count for a job of size n: the configured budget (or hardware
// concurrency), but never more than one thread per min_per_thread items.
inline int pick_threads(int64_t n, int64_t min_per_thread) {
  int budget = g_threads;
  if (budget <= 0) {
    unsigned hw = std::thread::hardware_concurrency();
    budget = hw > 0 ? (int)hw : 1;
  }
  int64_t by_size = min_per_thread > 0 ? n / min_per_thread : budget;
  if (by_size < 1) by_size = 1;
  return (int)std::min<int64_t>(budget, by_size);
}

// Bucket slot count is a build-time parameter now (the device layout
// moved from (nb, 8) x 3 arrays to one interleaved (nb, 3*S) array with
// S=4: one 48-byte row gather per probed bucket instead of three 32-byte
// gathers - 4x less HBM traffic per query at a higher load factor).

inline uint32_t fmix32(uint32_t h) {
  h ^= h >> 16;
  h *= 0x85EBCA6Bu;
  h ^= h >> 13;
  h *= 0xC2B2AE35u;
  h ^= h >> 16;
  return h;
}

inline uint32_t hash1(uint32_t hi, uint32_t lo, uint32_t mask) {
  return fmix32(hi * 0x9E3779B1u + lo * 0x85EBCA77u + 0xA5A5A5A5u) & mask;
}

inline uint32_t hash2(uint32_t hi, uint32_t lo, uint32_t mask) {
  return fmix32(hi * 0xC2B2AE3Du + lo * 0x27D4EB2Fu + 0x3C6EF372u) & mask;
}

struct XorShift {
  uint64_t s;
  explicit XorShift(uint64_t seed) : s(seed ? seed : 0x9E3779B97F4A7C15ull) {}
  uint32_t next() {
    s ^= s << 13;
    s ^= s >> 7;
    s ^= s << 17;
    return static_cast<uint32_t>(s);
  }
};

}  // namespace

extern "C" {

// Set the worker-thread budget for every threaded kernel in this
// library (0 = all hardware threads). Wired to -t/--threads.
void kcf_set_threads(int32_t n) { g_threads = n; }

// Returns 0 on success, -1 when an eviction walk exceeds its budget
// (caller should grow the table and retry). slots must be a power of
// 2. ``tbl`` is the INTERLEAVED (nb, 3*slots) layout the lookups
// consume directly - per bucket [hi x S | lo x S | cnt x S] - so one
// insert touches one ~48-byte row instead of three separate arrays,
// and no final interleave copy is needed. The caller supplies tbl
// zeroed (cnt == 0 marks an empty slot; hi/lo of empty slots are
// never read because every lookup masks on cnt != 0).
int kcf_build_table(const uint32_t* hi, const uint32_t* lo,
                    const uint32_t* counts, int64_t n, uint32_t* tbl,
                    int64_t nb, int32_t slots) {
  const uint32_t mask = static_cast<uint32_t>(nb - 1);
  const int64_t row = 3 * (int64_t)slots;
  std::vector<uint8_t> fill(static_cast<size_t>(nb), 0);
  XorShift rng(0xC0FFEEULL);

  // software pipelining: the insert loop is bound by random cache
  // misses (two fill bytes + the chosen bucket's row); issuing the
  // next keys' addresses ahead overlaps them
  constexpr int64_t PF = 24;
  for (int64_t i = 0; i < n; ++i) {
    if (i + PF < n) {
      uint32_t ph = hash1(hi[i + PF], lo[i + PF], mask);
      uint32_t ph2 = hash2(hi[i + PF], lo[i + PF], mask);
      __builtin_prefetch(fill.data() + ph, 1, 1);
      __builtin_prefetch(fill.data() + ph2, 1, 1);
      __builtin_prefetch(tbl + (int64_t)ph * row, 1, 1);
      __builtin_prefetch(tbl + (int64_t)ph2 * row, 1, 1);
    }
    uint32_t khi = hi[i], klo = lo[i], kc = counts[i];
    uint32_t b1 = hash1(khi, klo, mask);
    uint32_t b2 = hash2(khi, klo, mask);
    uint32_t b = (fill[b1] <= fill[b2]) ? b1 : b2;
    if (fill[b] < slots) {
      uint32_t* r = tbl + (int64_t)b * row;
      int s = fill[b];
      r[s] = khi;
      r[slots + s] = klo;
      r[2 * slots + s] = kc;
      ++fill[b];
      continue;
    }
    // both candidate buckets full -> random-walk eviction
    bool placed = false;
    for (int step = 0; step < 4000; ++step) {
      int slot = static_cast<int>(rng.next() & (uint32_t)(slots - 1));
      uint32_t* r = tbl + (int64_t)b * row;
      uint32_t vhi = r[slot], vlo = r[slots + slot], vc = r[2 * slots + slot];
      r[slot] = khi;
      r[slots + slot] = klo;
      r[2 * slots + slot] = kc;
      khi = vhi;
      klo = vlo;
      kc = vc;
      uint32_t v1 = hash1(khi, klo, mask);
      uint32_t v2 = hash2(khi, klo, mask);
      b = (v1 == b) ? v2 : v1;
      if (fill[b] < slots) {
        uint32_t* r2 = tbl + (int64_t)b * row;
        int s = fill[b];
        r2[s] = khi;
        r2[slots + s] = klo;
        r2[2 * slots + s] = kc;
        ++fill[b];
        placed = true;
        break;
      }
    }
    if (!placed) return -1;
  }
  return 0;
}

// Batched host-side lookup (CPU fallback path / verification).
void kcf_lookup(const uint32_t* qhi, const uint32_t* qlo, int64_t n,
                const uint32_t* t_hi, const uint32_t* t_lo,
                const uint32_t* t_cnt, int64_t nb, uint32_t* out,
                int32_t slots) {
  const uint32_t mask = static_cast<uint32_t>(nb - 1);
  for (int64_t i = 0; i < n; ++i) {
    uint32_t hi = qhi[i], lo = qlo[i];
    uint32_t b1 = hash1(hi, lo, mask);
    uint32_t b2 = hash2(hi, lo, mask);
    uint32_t r = 0;
    for (int s = 0; s < slots; ++s) {
      int64_t at = static_cast<int64_t>(b1) * slots + s;
      if (t_hi[at] == hi && t_lo[at] == lo && t_cnt[at] != 0) r = t_cnt[at];
    }
    if (b2 != b1) {
      for (int s = 0; s < slots; ++s) {
        int64_t at = static_cast<int64_t>(b2) * slots + s;
        if (t_hi[at] == hi && t_lo[at] == lo && t_cnt[at] != 0) r = t_cnt[at];
      }
    }
    out[i] = r;
  }
}

// Sorted-merge join: for each element of the sorted unique reference
// k-mer array R, find its count in the sorted (kmer, count) database.
// Linear scan over both arrays at memory speed - the host-side analog
// of a sparse join that random-access hash probes cannot match.
static void merge_range(const uint64_t* ref, int64_t lo, int64_t hi,
                        const uint64_t* db, const uint32_t* db_counts,
                        int64_t n_db, uint32_t* out_counts) {
  if (lo >= hi) return;
  int64_t j = std::lower_bound(db, db + n_db, ref[lo]) - db;
  for (int64_t i = lo; i < hi; ++i) {
    uint64_t key = ref[i];
    while (j < n_db && db[j] < key) ++j;
    out_counts[i] = (j < n_db && db[j] == key) ? db_counts[j] : 0;
  }
}

void kcf_merge_counts(const uint64_t* ref, int64_t n_ref, const uint64_t* db,
                      const uint32_t* db_counts, int64_t n_db,
                      uint32_t* out_counts) {
  int n_threads = pick_threads(n_ref, 1 << 18);
  if (n_threads <= 1) {
    merge_range(ref, 0, n_ref, db, db_counts, n_db, out_counts);
    return;
  }
  std::vector<std::thread> workers;
  int64_t step = (n_ref + n_threads - 1) / n_threads;
  for (int t = 0; t < n_threads; ++t) {
    int64_t lo = t * step;
    int64_t hi = std::min(n_ref, lo + step);
    workers.emplace_back(merge_range, ref, lo, hi, db, db_counts, n_db,
                         out_counts);
  }
  for (auto& w : workers) w.join();
}

// Branchless merge join emitting uint8-saturated counts plus an
// exception list for counts >= 255 (the device prefix engine uploads
// the u8 array - 4x less tunnel traffic than uint32 - and scatters the
// exact exception values back on device). Covers ref[lo:hi); exception
// indices are absolute. Returns the exception count, or -1 when the
// caller-provided exception capacity is exceeded (caller retries with
// the uint32 path).
static int64_t merge_range_u8(const uint64_t* ref, int64_t lo, int64_t hi,
                              const uint64_t* db, const uint32_t* db_counts,
                              int64_t n_db, uint8_t* out_u8,
                              int32_t* exc_idx, uint32_t* exc_val,
                              int64_t cap_exc) {
  if (lo >= hi) return 0;
  int64_t j = std::lower_bound(db, db + n_db, ref[lo]) - db;
  int64_t i = lo;
  int64_t n_exc = 0;
  // zipper: each iteration advances i and/or j; out_u8[i] is finalized
  // by the iteration where d >= r (a nonzero count implies d == r, so
  // exceptions only fire on finalizing iterations)
  while (i < hi && j < n_db) {
    uint64_t r = ref[i], d = db[j];
    uint32_t c = (d == r) ? db_counts[j] : 0;
    out_u8[i - lo] = (uint8_t)(c < 255u ? c : 255u);
    if (__builtin_expect(c >= 255u, 0)) {
      if (n_exc >= cap_exc) return -1;
      exc_idx[n_exc] = (int32_t)i;
      exc_val[n_exc] = c;
      ++n_exc;
    }
    i += (d >= r);
    j += (d <= r);
  }
  for (; i < hi; ++i) out_u8[i - lo] = 0;
  return n_exc;
}

// 4-lane software-pipelined variant: the zipper's serial i/j updates
// cap a single lane at ~1 advance per 4-5 cycles; running four
// independent segments interleaved in one loop quadruples the ILP
// (memory streams are sequential, so the extra streams stay in the
// hardware prefetchers' budget). Exceptions are rare and collected
// per lane into caller scratch.
static int64_t merge_range_u8_lanes(const uint64_t* ref, int64_t lo,
                                    int64_t hi, const uint64_t* db,
                                    const uint32_t* db_counts, int64_t n_db,
                                    uint8_t* out_u8 /* offset by lo */,
                                    int32_t* exc_idx, uint32_t* exc_val,
                                    int64_t cap_exc) {
  constexpr int L = 4;
  int64_t n = hi - lo;
  if (n < (1 << 16))
    return merge_range_u8(ref, lo, hi, db, db_counts, n_db, out_u8, exc_idx,
                          exc_val, cap_exc);
  int64_t seg = (n + L - 1) / L;
  int64_t i[L], end[L], j[L];
  for (int l = 0; l < L; ++l) {
    i[l] = lo + l * seg;
    end[l] = std::min(hi, i[l] + seg);
    if (i[l] >= end[l]) {
      i[l] = end[l] = hi;
      j[l] = n_db;
    } else {
      j[l] = std::lower_bound(db, db + n_db, ref[i[l]]) - db;
    }
  }
  int64_t n_exc = 0;
  // exceptions must come out ordered by index: collect per lane
  std::vector<int32_t> li[L];
  std::vector<uint32_t> lv[L];
  bool overflow = false;
  while (true) {
    bool active = false;
    for (int l = 0; l < L; ++l) {
      if (i[l] < end[l] && j[l] < n_db) {
        active = true;
        uint64_t r = ref[i[l]], d = db[j[l]];
        uint32_t c = (d == r) ? db_counts[j[l]] : 0;
        out_u8[i[l] - lo] = (uint8_t)(c < 255u ? c : 255u);
        if (__builtin_expect(c >= 255u, 0)) {
          li[l].push_back((int32_t)i[l]);
          lv[l].push_back(c);
        }
        i[l] += (d >= r);
        j[l] += (d <= r);
      }
    }
    if (!active) break;
  }
  for (int l = 0; l < L; ++l)
    for (int64_t p = i[l]; p < end[l]; ++p) out_u8[p - lo] = 0;
  for (int l = 0; l < L; ++l) {
    int64_t m = (int64_t)li[l].size();
    if (n_exc + m > cap_exc) {
      overflow = true;
      break;
    }
    std::memcpy(exc_idx + n_exc, li[l].data(), sizeof(int32_t) * m);
    std::memcpy(exc_val + n_exc, lv[l].data(), sizeof(uint32_t) * m);
    n_exc += m;
  }
  return overflow ? -1 : n_exc;
}

}  // extern "C" (reopened after the template helpers below)

// 128-bit key view shared by the narrow (k <= 32) and wide (33..64)
// merge kernels; declared here so the SIMD section below can be written
// once against a key policy.
typedef unsigned __int128 u128;

static inline u128 mk128(uint64_t hi, uint64_t lo) {
  return ((u128)hi << 64) | lo;
}

static int64_t wide_lower_bound(const uint64_t* dhi, const uint64_t* dlo,
                                int64_t n_db, u128 key) {
  int64_t a = 0, b = n_db;
  while (a < b) {
    int64_t mid = (a + b) >> 1;
    if (mk128(dhi[mid], dlo[mid]) < key)
      a = mid + 1;
    else
      b = mid;
  }
  return a;
}

#if defined(__x86_64__)
#include <immintrin.h>

#define KCF_AVX512 \
  __attribute__((target("avx512f,avx512bw,avx512vbmi,avx512vl")))

// Key policies for the AVX-512 sorted-set intersection: one 64-bit limb
// (k <= 32) or two limbs (33 <= k <= 64). A rotation's equality test is
// one VPCMPEQ (narrow) or the AND of two (wide); everything else -
// selector tables, OR-tree, count packing, block advance - is shared in
// merge_block_u8_simd. The scalar helpers (at/lower_bound/tail) carry no
// intrinsics so the exception-translation loops can use them too.
struct NarrowKeys {
  const uint64_t* a;
  struct V { __m512i v; };
  KCF_AVX512 V load(int64_t i) const { return V{_mm512_loadu_si512(a + i)}; }
  template <int R>
  KCF_AVX512 static __mmask8 eq(const V& r, const V& d) {
    __m512i dr = R ? _mm512_alignr_epi64(d.v, d.v, R & 7) : d.v;
    return _mm512_cmpeq_epu64_mask(r.v, dr);
  }
  u128 at(int64_t i) const { return a[i]; }
  NarrowKeys tail(int64_t off) const { return NarrowKeys{a + off}; }
  int64_t lower_bound(int64_t n, u128 key) const {
    return std::lower_bound(a, a + n, (uint64_t)key) - a;
  }
};

struct WideKeys {
  const uint64_t* h;
  const uint64_t* l;
  struct V { __m512i h, l; };
  KCF_AVX512 V load(int64_t i) const {
    return V{_mm512_loadu_si512(h + i), _mm512_loadu_si512(l + i)};
  }
  template <int R>
  KCF_AVX512 static __mmask8 eq(const V& r, const V& d) {
    __m512i dh = R ? _mm512_alignr_epi64(d.h, d.h, R & 7) : d.h;
    __m512i dl = R ? _mm512_alignr_epi64(d.l, d.l, R & 7) : d.l;
    return (__mmask8)(_mm512_cmpeq_epu64_mask(r.h, dh) &
                      _mm512_cmpeq_epu64_mask(r.l, dl));
  }
  u128 at(int64_t i) const { return mk128(h[i], l[i]); }
  WideKeys tail(int64_t off) const { return WideKeys{h + off, l + off}; }
  int64_t lower_bound(int64_t n, u128 key) const {
    return wide_lower_bound(h, l, n, key);
  }
};

template <class P, int R>
KCF_AVX512 static inline void eq_rot(const typename P::V& rv,
                                     const typename P::V& dv, __mmask8* m,
                                     const __m512i* off, __m512i* sel) {
  m[R] = P::template eq<R>(rv, dv);
  sel[R] = _mm512_maskz_mov_epi64(m[R], off[R]);
}

// AVX-512 sorted-set intersection: 8 ref keys x 8 db keys all-pairs per
// iteration (8 VALIGNQ rotations + VPCMPEQ per limb), matched count byte
// selected with one VPERMB through an OR-tree of disjoint per-lane byte
// indices (both sides are unique so at most one rotation matches a
// lane). The loop is branchless: stores are unconditional (a later
// iteration's write wins until the ref block retires) and block
// advances are arithmetic, so the ~50/50 advance pattern costs no
// mispredicts. ~4x faster than the scalar zipper on 2 cores. Counts are
// u8-saturated by the caller; exception (>=255) fixup happens outside.
// One zipper's state. The block-advance arithmetic makes every
// iteration's loads depend on the previous iteration's compare - a
// ~60-cycle serial chain that leaves the core mostly idle. Running
// several INDEPENDENT zippers interleaved in one loop (each owning a
// sub-range of the ref slice) overlaps those chains: measured 3.3x on
// the 2-core bench host (32.2 -> 9.7 ms single-thread, 5M x 5M keys).
template <class P>
struct MergeChain {
  int64_t i, j, hi;
  __m512i cnt_acc;
};

template <class P>
KCF_AVX512 static inline void merge_step(const P& ref, const P& db,
                                         const uint8_t* db_cnt8,
                                         uint8_t* out_u8, int64_t lo,
                                         const __m512i* off,
                                         __m512i pack_sel,
                                         MergeChain<P>& c) {
  typename P::V rv = ref.load(c.i);
  typename P::V dv = db.load(c.j);
  uint64_t cbytes;
  std::memcpy(&cbytes, db_cnt8 + c.j, 8);
  __m512i C = _mm512_set1_epi64((long long)cbytes);
  __mmask8 m[8];
  __m512i sel[8];
  eq_rot<P, 0>(rv, dv, m, off, sel);
  eq_rot<P, 1>(rv, dv, m, off, sel);
  eq_rot<P, 2>(rv, dv, m, off, sel);
  eq_rot<P, 3>(rv, dv, m, off, sel);
  eq_rot<P, 4>(rv, dv, m, off, sel);
  eq_rot<P, 5>(rv, dv, m, off, sel);
  eq_rot<P, 6>(rv, dv, m, off, sel);
  eq_rot<P, 7>(rv, dv, m, off, sel);
  __m512i s01 = _mm512_or_si512(sel[0], sel[1]);
  __m512i s23 = _mm512_or_si512(sel[2], sel[3]);
  __m512i s45 = _mm512_or_si512(sel[4], sel[5]);
  __m512i s67 = _mm512_or_si512(sel[6], sel[7]);
  __m512i idx = _mm512_or_si512(_mm512_or_si512(s01, s23),
                                _mm512_or_si512(s45, s67));
  __mmask8 found = (__mmask8)(m[0] | m[1] | m[2] | m[3] | m[4] | m[5] |
                              m[6] | m[7]);
  c.cnt_acc = _mm512_mask_mov_epi64(
      c.cnt_acc, found, _mm512_permutexvar_epi8(idx, C));
  u128 rmax = ref.at(c.i + 7);
  u128 dmax = db.at(c.j + 7);
  __m512i packed = _mm512_permutexvar_epi8(pack_sel, c.cnt_acc);
  uint64_t bytes =
      (uint64_t)_mm_cvtsi128_si64(_mm512_castsi512_si128(packed));
  std::memcpy(out_u8 + (c.i - lo), &bytes, 8);
  int adv_r = rmax <= dmax;
  int adv_d = dmax <= rmax;
  c.cnt_acc = _mm512_maskz_mov_epi64((__mmask8)(adv_r ? 0 : 0xFF),
                                     c.cnt_acc);
  c.i += (int64_t)adv_r * 8;
  c.j += (int64_t)adv_d * 8;
}

// AVX-512 sorted-set intersection: 8 ref keys x 8 db keys all-pairs per
// step (8 VALIGNQ rotations + VPCMPEQ per limb), matched count byte
// selected with one VPERMB through an OR-tree of disjoint per-lane byte
// indices (both sides are unique so at most one rotation matches a
// lane). Steps are branchless (stores unconditional - a later step's
// write wins until the ref block retires; advances arithmetic) and
// N_CHAINS independent zippers interleave to hide the loop-carried
// advance latency. Counts are u8-saturated by the caller; exception
// (>=255) fixup happens outside.
template <class P>
KCF_AVX512 static void merge_block_u8_simd(const P ref, int64_t lo,
                                           int64_t hi, const P db,
                                           const uint8_t* db_cnt8,
                                           int64_t n_db, uint8_t* out_u8) {
  // lane l, rotation r selects count byte l*8 + ((l+r)&7) of the
  // broadcast 8-byte count block
  __m512i off[8];
  for (int r = 0; r < 8; ++r) {
    alignas(64) int8_t o[64] = {0};
    for (int l = 0; l < 8; ++l) o[l * 8] = (int8_t)(l * 8 + ((l + r) & 7));
    off[r] = _mm512_load_si512(o);
  }
  const __m512i pack_sel = _mm512_set_epi64(0, 0, 0, 0, 0, 0, 0,
                                            0x3830282018100800LL);
  constexpr int NC = 4;
  MergeChain<P> ch[NC];
  int64_t n = hi - lo;
  for (int c = 0; c < NC; ++c) {
    int64_t a = lo + ((n * c / NC) & ~7LL);
    int64_t b = (c == NC - 1) ? hi : lo + ((n * (c + 1) / NC) & ~7LL);
    ch[c].i = a;
    ch[c].hi = b;
    ch[c].j = (a < b) ? (db.lower_bound(n_db, ref.at(a)) & ~7LL) : 0;
    ch[c].cnt_acc = _mm512_setzero_si512();
  }
  bool all = true;
  for (int c = 0; c < NC; ++c)
    all = all && ch[c].i + 8 <= ch[c].hi && ch[c].j + 8 <= n_db;
  while (all) {
    for (int c = 0; c < NC; ++c)
      merge_step(ref, db, db_cnt8, out_u8, lo, off, pack_sel, ch[c]);
    for (int c = 0; c < NC; ++c)
      all = all && ch[c].i + 8 <= ch[c].hi && ch[c].j + 8 <= n_db;
  }
  for (int c = 0; c < NC; ++c) {
    // drain the chain solo, then a scalar tail that also re-does any
    // partially processed ref block
    while (ch[c].i + 8 <= ch[c].hi && ch[c].j + 8 <= n_db)
      merge_step(ref, db, db_cnt8, out_u8, lo, off, pack_sel, ch[c]);
    int64_t i = ch[c].i;
    int64_t chi = ch[c].hi;
    if (i < chi) {
      int64_t jj = db.lower_bound(n_db, ref.at(i));
      while (i < chi && jj < n_db) {
        u128 rr = ref.at(i), dd = db.at(jj);
        out_u8[i - lo] = (dd == rr) ? db_cnt8[jj] : 0;
        i += (dd >= rr);
        jj += (dd <= rr);
      }
      for (; i < chi; ++i) out_u8[i - lo] = 0;
    }
  }
}

// saturating u32 -> u8 count conversion (VPMOVUSDB), collecting indices
// of counts >= 255 into a growable vector. The db-side exception count
// is a property of the whole database (not of any ref slice), so it is
// never capped - capping it against the caller's per-slice exception
// budget made every call on a high-count-rich DB fail over to the
// scalar path (see ADVICE.md r1, medium).
__attribute__((target("avx512f,avx512bw,avx512vl")))
static void saturate_counts_range(const uint32_t* in, int64_t lo, int64_t hi,
                                  uint8_t* out, std::vector<int64_t>& exc) {
  int64_t i = lo;
  const __m512i lim = _mm512_set1_epi32(255);
  for (; i + 16 <= hi; i += 16) {
    __m512i v = _mm512_loadu_si512(in + i);
    _mm_storeu_si128((__m128i*)(out + i), _mm512_cvtusepi32_epi8(v));
    __mmask16 big = _mm512_cmpge_epu32_mask(v, lim);
    while (big) {
      int l = __builtin_ctz(big);
      big &= big - 1;
      exc.push_back(i + l);
    }
  }
  for (; i < hi; ++i) {
    uint32_t c = in[i];
    out[i] = (uint8_t)(c < 255u ? c : 255u);
    if (c >= 255u) exc.push_back(i);
  }
}

static int64_t saturate_counts(const uint32_t* in, int64_t n, uint8_t* out,
                               std::vector<int64_t>& exc) {
  exc.clear();
  int n_threads = pick_threads(n, 1 << 20);
  if (n_threads <= 1) {
    saturate_counts_range(in, 0, n, out, exc);
    return (int64_t)exc.size();
  }
  int64_t step = ((n + n_threads - 1) / n_threads + 15) & ~15LL;
  std::vector<std::vector<int64_t>> t_exc((size_t)n_threads);
  std::vector<std::thread> workers;
  for (int t = 0; t < n_threads; ++t) {
    int64_t lo = t * step;
    int64_t hi = std::min(n, lo + step);
    if (lo >= hi) break;
    workers.emplace_back(saturate_counts_range, in, lo, hi, out,
                         std::ref(t_exc[t]));
  }
  for (auto& w : workers) w.join();
  // contiguous ordered ranges -> concatenation stays sorted
  for (auto& v : t_exc) exc.insert(exc.end(), v.begin(), v.end());
  return (int64_t)exc.size();
}

static bool cpu_simd_merge() {
  static int ok = -1;
  if (ok < 0)
    ok = (__builtin_cpu_supports("avx512f") &&
          __builtin_cpu_supports("avx512bw") &&
          __builtin_cpu_supports("avx512vl") &&
          __builtin_cpu_supports("avx512vbmi"))
             ? 1
             : 0;
  return ok == 1;
}

// db-side >=255 exceptions -> ref-indexed exceptions (sorted: db order
// == key order). Only these matched, ref-translated exceptions consume
// the caller's cap; -1 = cap exceeded (caller retries with a larger
// buffer).
template <class P>
static int64_t translate_db_exceptions(const P ref, int64_t lo, int64_t hi,
                                       const std::vector<int64_t>& db_exc,
                                       const P db, const uint32_t* db_counts,
                                       int32_t* exc_idx, uint32_t* exc_val,
                                       int64_t cap_exc) {
  int64_t n_exc = 0;
  for (int64_t de : db_exc) {
    u128 key = db.at(de);
    int64_t at = lo + ref.tail(lo).lower_bound(hi - lo, key);
    if (at < hi && ref.at(at) == key) {
      if (n_exc >= cap_exc) return -1;
      exc_idx[n_exc] = (int32_t)at;
      exc_val[n_exc] = db_counts[de];
      ++n_exc;
    }
  }
  return n_exc;
}

// SIMD driver shared by the narrow and wide entry points: saturate db
// counts once (db-side exception list is unbounded), run the vector
// intersection across threads, then translate the (rare) matched
// exceptions under the caller's cap.
template <class P>
static int64_t merge_counts_u8_simd(const P ref, int64_t lo, int64_t hi,
                                    const P db, const uint32_t* db_counts,
                                    int64_t n_db, uint8_t* out_u8,
                                    int32_t* exc_idx, uint32_t* exc_val,
                                    int64_t cap_exc) {
  static thread_local std::vector<uint8_t> cnt8;
  static thread_local std::vector<int64_t> db_exc;
  if ((int64_t)cnt8.size() < n_db) cnt8.resize(n_db);
  saturate_counts(db_counts, n_db, cnt8.data(), db_exc);

  int64_t n = hi - lo;
  int n_threads = pick_threads(n, 1 << 17);
  const uint8_t* cnt8_p = cnt8.data();  // thread_local: bind by value
  if (n_threads <= 1) {
    merge_block_u8_simd(ref, lo, hi, db, cnt8_p, n_db, out_u8);
  } else {
    int64_t step = (n + n_threads - 1) / n_threads;
    std::vector<std::thread> workers;
    for (int t = 0; t < n_threads; ++t) {
      int64_t a = lo + t * step;
      int64_t b = std::min(hi, a + step);
      if (a >= b) break;
      workers.emplace_back([=]() {
        merge_block_u8_simd(ref, a, b, db, cnt8_p, n_db, out_u8 + (a - lo));
      });
    }
    for (auto& w : workers) w.join();
  }
  return translate_db_exceptions(ref, lo, hi, db_exc, db, db_counts, exc_idx,
                                 exc_val, cap_exc);
}
#endif  // __x86_64__

extern "C" {

int64_t kcf_merge_counts_u8(const uint64_t* ref, int64_t lo, int64_t hi,
                            const uint64_t* db, const uint32_t* db_counts,
                            int64_t n_db, uint8_t* out_u8, int32_t* exc_idx,
                            uint32_t* exc_val, int64_t cap_exc) {
  int64_t n = hi - lo;
#if defined(__x86_64__)
  if (cpu_simd_merge() && n >= (1 << 12) && n_db >= 8)
    return merge_counts_u8_simd(NarrowKeys{ref}, lo, hi, NarrowKeys{db},
                                db_counts, n_db, out_u8, exc_idx, exc_val,
                                cap_exc);
#endif
  int n_threads = pick_threads(n, 1 << 17);
  if (n_threads <= 1)
    return merge_range_u8_lanes(ref, lo, hi, db, db_counts, n_db, out_u8,
                                exc_idx, exc_val, cap_exc);
  int64_t step = (n + n_threads - 1) / n_threads;
  std::vector<int64_t> rc(n_threads, 0);
  std::vector<std::vector<int32_t>> t_idx(n_threads);
  std::vector<std::vector<uint32_t>> t_val(n_threads);
  std::vector<std::thread> workers;
  for (int t = 0; t < n_threads; ++t) {
    int64_t a = lo + t * step;
    int64_t b = std::min(hi, a + step);
    workers.emplace_back([&, t, a, b]() {
      if (a >= b) return;
      t_idx[t].resize((size_t)cap_exc);
      t_val[t].resize((size_t)cap_exc);
      rc[t] = merge_range_u8_lanes(ref, a, b, db, db_counts, n_db,
                                   out_u8 + (a - lo), t_idx[t].data(),
                                   t_val[t].data(), cap_exc);
    });
  }
  for (auto& w : workers) w.join();
  int64_t n_exc = 0;
  for (int t = 0; t < n_threads; ++t) {
    if (rc[t] < 0 || n_exc + rc[t] > cap_exc) return -1;
    std::memcpy(exc_idx + n_exc, t_idx[t].data(), sizeof(int32_t) * rc[t]);
    std::memcpy(exc_val + n_exc, t_val[t].data(), sizeof(uint32_t) * rc[t]);
    n_exc += rc[t];
  }
  return n_exc;
}

// Fully fused per-sample window scan: replay the reference's per-window
// gap-run state machine (Plugins/GetVariants.java:219-251, distance
// correction :267-273) directly over the per-position unique-k-mer
// index, gathering counts from the u8 merge output (exception list
// carries exact values >= 255). Unlike the prefix-decomposition path,
// nothing per-position is materialized: per-sample memory traffic is
// one sequential read of r_idx plus one random u8 read per k-mer, so a
// sweep runs at memory speed even on small hosts. Windows' k-mer-start
// ranges [w_start, w_hi] may overlap (sliding mode); each window is
// scanned independently, split across threads.
//
// Output is field-major int64 (6, n_win): observed, variations, inner,
// left, right, count_sum. total/eff_length are sample-independent and
// owned by the caller.
namespace {

inline uint32_t exc_value(const int32_t* exc_idx, const uint32_t* exc_val,
                          int64_t n_exc, int32_t ri) {
  int64_t lo = 0, hi = n_exc;
  while (lo < hi) {
    int64_t mid = (lo + hi) >> 1;
    if (exc_idx[mid] < ri)
      lo = mid + 1;
    else
      hi = mid;
  }
  return (lo < n_exc && exc_idx[lo] == ri) ? exc_val[lo] : 255u;
}

void window_scan_range(const uint8_t* counts, const int32_t* exc_idx,
                       const uint32_t* exc_val, int64_t n_exc,
                       const int32_t* r_idx, int64_t n_pos,
                       uint32_t min_count, int32_t k, const int32_t* w_start,
                       const int32_t* w_hi, int64_t w_lo, int64_t w_end,
                       int64_t n_win, int64_t* out) {
  int64_t* o_obs = out;
  int64_t* o_var = out + n_win;
  int64_t* o_inn = out + 2 * n_win;
  int64_t* o_lft = out + 3 * n_win;
  int64_t* o_rgt = out + 4 * n_win;
  int64_t* o_cnt = out + 5 * n_win;
  constexpr int64_t PF = 24;  // count-gather prefetch distance
  for (int64_t w = w_lo; w < w_end; ++w) {
    int64_t s = w_start[w];
    int64_t hi = w_hi[w];
    if (hi >= n_pos) hi = n_pos - 1;
    int64_t obs = 0, var_ = 0, inner = 0, left = 0, right = 0;
    int64_t cnt_sum = 0;
    int64_t gap = 0;
    bool seen = false;
    bool any = false;
    for (int64_t p = s; p <= hi; ++p) {
      int32_t ri = r_idx[p];
      if (p + PF <= hi) {
        int32_t rpf = r_idx[p + PF];
        if (rpf >= 0) __builtin_prefetch(counts + rpf, 0, 1);
      }
      if (ri < 0) continue;  // k-mer spans non-ACGT: not counted at all
      any = true;
      uint32_t c = counts[ri];
      if (__builtin_expect(c == 255u, 0)) c = exc_value(exc_idx, exc_val, n_exc, ri);
      if (c >= min_count) {
        cnt_sum += c;
        ++obs;
        if (gap > 0) {
          ++var_;
          if (!seen) {
            left = gap;
          } else {
            int64_t d = gap - (k - 1);
            inner += (d > 0) ? d : std::llabs(d + 1);
          }
        }
        seen = true;
        gap = 0;
      } else {
        ++gap;
      }
    }
    if (any && gap > 0) {
      ++var_;
      right = gap;
    }
    o_obs[w] = obs;
    o_var[w] = var_;
    o_inn[w] = inner;
    o_lft[w] = left;
    o_rgt[w] = right;
    o_cnt[w] = cnt_sum;
  }
}

#if defined(__x86_64__)
// SIMD window scan: pass A gathers per-position count bytes into a
// thread-local position-ordered buffer (VPGATHERDD hides the random
// access latency behind 16-wide memory-level parallelism) plus an
// invalid-position bitmap and >=255 exception position list; pass B
// walks each window 64 positions at a time - present mask via
// VPCMPGEUB, count sums via VPSADBW, and the gap-run state machine
// replayed with tzcnt run extraction over the mask words. Windows that
// contain non-ACGT (invalid) positions take a scalar walk over the
// same L1-resident buffers.
__attribute__((target("avx512f,avx512bw,avx512vl")))
void window_scan_range_simd(const uint8_t* counts, int64_t n_counts,
                            const int32_t* exc_idx, const uint32_t* exc_val,
                            int64_t n_exc, const int32_t* r_idx,
                            int64_t n_pos, uint32_t min_count, int32_t k,
                            const int32_t* w_start, const int32_t* w_hi,
                            int64_t w_lo, int64_t w_end, int64_t n_win,
                            int64_t* out) {
  int64_t* o_obs = out;
  int64_t* o_var = out + n_win;
  int64_t* o_inn = out + 2 * n_win;
  int64_t* o_lft = out + 3 * n_win;
  int64_t* o_rgt = out + 4 * n_win;
  int64_t* o_cnt = out + 5 * n_win;

  int64_t base = w_start[w_lo];
  int64_t endp = -1;
  for (int64_t w = w_lo; w < w_end; ++w) {
    if (w_start[w] < base) base = w_start[w];
    if (w_hi[w] > endp) endp = w_hi[w];
  }
  if (endp >= n_pos) endp = n_pos - 1;
  int64_t span = endp - base + 1;
  if (span <= 0) {
    for (int64_t w = w_lo; w < w_end; ++w) {
      o_obs[w] = o_var[w] = o_inn[w] = o_lft[w] = o_rgt[w] = o_cnt[w] = 0;
    }
    return;
  }
  static thread_local std::vector<uint8_t> cbuf_v;
  static thread_local std::vector<uint64_t> ibits_v;
  static thread_local std::vector<int64_t> excpos_v;
  if ((int64_t)cbuf_v.size() < span + 64) cbuf_v.resize(span + 64);
  int64_t n_words = (span + 63) / 64 + 1;
  if ((int64_t)ibits_v.size() < n_words) ibits_v.resize(n_words);
  std::memset(ibits_v.data(), 0, n_words * sizeof(uint64_t));
  excpos_v.clear();
  uint8_t* cbuf = cbuf_v.data();
  uint64_t* ibits = ibits_v.data();

  // ---- pass A: gather counts to position order
  const __m512i zero = _mm512_setzero_si512();
  const __m512i ffm = _mm512_set1_epi32(0xFF);
  const __m512i cap = _mm512_set1_epi32((int)(n_counts - 4));
  const __m128i v255 = _mm_set1_epi8((char)0xFF);
  constexpr int64_t PFA = 48;  // gather-target prefetch distance
  int64_t p = base;
  for (; p + 16 <= endp + 1; p += 16) {
    if (p + PFA + 16 <= endp + 1) {
      // hide the L3 latency of the next-but-two gather's random reads
      for (int l = 0; l < 16; l += 4) {
        int32_t r = r_idx[p + PFA + l];
        if (r >= 0) __builtin_prefetch(counts + r, 0, 1);
      }
    }
    __m512i ri = _mm512_loadu_si512(r_idx + p);
    __mmask16 valid = _mm512_cmpge_epi32_mask(ri, zero);
    __mmask16 ok = valid & _mm512_cmple_epi32_mask(ri, cap);
    __m128i bytes;
    if (__builtin_expect(ok == valid, 1)) {
      __m512i g = _mm512_mask_i32gather_epi32(zero, valid, ri, counts, 1);
      bytes = _mm512_cvtepi32_epi8(_mm512_and_si512(g, ffm));
    } else {
      alignas(16) uint8_t tmp[16];
      for (int l = 0; l < 16; ++l) {
        int32_t r = r_idx[p + l];
        tmp[l] = (r >= 0) ? counts[r] : 0;
      }
      bytes = _mm_load_si128((const __m128i*)tmp);
    }
    int64_t rel = p - base;
    _mm_storeu_si128((__m128i*)(cbuf + rel), bytes);
    uint16_t inv = (uint16_t)(~(uint32_t)valid & 0xFFFFu);
    if (__builtin_expect(inv != 0, 0)) {
      // set invalid bits (rel .. rel+15 straddles at most 2 words)
      uint64_t w0 = (uint64_t)inv << (rel & 63);
      ibits[rel >> 6] |= w0;
      if ((rel & 63) > 48)
        ibits[(rel >> 6) + 1] |= (uint64_t)inv >> (64 - (rel & 63));
    }
    uint16_t is255 =
        (uint16_t)(_mm_cmpeq_epi8_mask(bytes, v255) & (uint32_t)valid);
    while (__builtin_expect(is255 != 0, 0)) {
      int l = __builtin_ctz(is255);
      is255 &= (uint16_t)(is255 - 1);
      excpos_v.push_back(p + l);
    }
  }
  for (; p <= endp; ++p) {
    int32_t r = r_idx[p];
    uint8_t c = (r >= 0) ? counts[r] : 0;
    cbuf[p - base] = c;
    if (r < 0)
      ibits[(p - base) >> 6] |= 1ull << ((p - base) & 63);
    else if (c == 255u)
      excpos_v.push_back(p);
  }

  // ---- pass B: per-window mask walk
  const __m512i mc = _mm512_set1_epi8((char)(uint8_t)min_count);
  for (int64_t w = w_lo; w < w_end; ++w) {
    int64_t s = w_start[w];
    int64_t hi = w_hi[w];
    if (hi >= n_pos) hi = n_pos - 1;
    int64_t L = hi - s + 1;
    if (L <= 0) {
      o_obs[w] = o_var[w] = o_inn[w] = o_lft[w] = o_rgt[w] = o_cnt[w] = 0;
      continue;
    }
    int64_t rs = s - base;
    // any invalid position in the window? -> scalar walk over cbuf/ibits
    bool has_invalid = false;
    for (int64_t q = rs >> 6; q <= (rs + L - 1) >> 6; ++q) {
      uint64_t word = ibits[q];
      if (!word) continue;
      // mask to window bounds for the edge words
      int64_t wlo_bit = q << 6, whi_bit = wlo_bit + 63;
      if (wlo_bit < rs) word &= ~0ull << (rs - wlo_bit);
      if (whi_bit > rs + L - 1)
        word &= ~0ull >> (whi_bit - (rs + L - 1));
      if (word) { has_invalid = true; break; }
    }
    int64_t obs = 0, var_ = 0, inner = 0, left = 0, right = 0, cnt_sum = 0;
    if (__builtin_expect(has_invalid, 0)) {
      int64_t gap = 0;
      bool seen = false, any = false;
      for (int64_t q = rs; q < rs + L; ++q) {
        if (ibits[q >> 6] & (1ull << (q & 63))) continue;
        any = true;
        uint32_t c = cbuf[q];
        if (__builtin_expect(c == 255u, 0))
          c = exc_value(exc_idx, exc_val, n_exc, r_idx[base + q]);
        if (c >= min_count) {
          cnt_sum += c;
          ++obs;
          if (gap > 0) {
            ++var_;
            if (!seen) left = gap;
            else {
              int64_t d = gap - (k - 1);
              inner += (d > 0) ? d : std::llabs(d + 1);
            }
          }
          seen = true;
          gap = 0;
        } else
          ++gap;
      }
      if (any && gap > 0) { ++var_; right = gap; }
    } else {
      // fast path: all positions valid
      __m512i sumv = _mm512_setzero_si512();
      int64_t run = 0;
      bool seen = false;
      for (int64_t off = 0; off < L; off += 64) {
        int64_t nbits = std::min<int64_t>(64, L - off);
        __m512i v = _mm512_loadu_si512(cbuf + rs + off);
        uint64_t m = _mm512_cmpge_epu8_mask(v, mc);
        if (nbits < 64) m &= (1ull << nbits) - 1;
        obs += (int64_t)__builtin_popcountll(m);
        sumv = _mm512_add_epi64(
            sumv, _mm512_sad_epu8(_mm512_maskz_mov_epi8(m, v), zero));
        // gap-run walk over this word
        uint64_t x = m;
        int64_t cur = 0;
        while (x) {
          int t = __builtin_ctzll(x);
          run += t - cur;
          if (run > 0) {
            ++var_;
            if (!seen) left = run;
            else {
              int64_t d = run - (k - 1);
              inner += (d > 0) ? d : std::llabs(d + 1);
            }
          }
          seen = true;
          run = 0;
          uint64_t y = x >> t;
          uint64_t ny = ~y;
          int adv = ny ? __builtin_ctzll(ny) : (int)(64 - t);
          cur = t + adv;
          if (cur >= 64) { x = 0; cur = 64; }
          else x &= ~0ull << cur;
        }
        if (cur < nbits) run += nbits - cur;
        else if (cur > nbits) run = 0;  // unreachable; safety
      }
      if (run > 0) { ++var_; right = run; }
      alignas(64) uint64_t sums[8];
      _mm512_store_si512(sums, sumv);
      for (int l = 0; l < 8; ++l) cnt_sum += (int64_t)sums[l];
      // exception fixup: replace the saturated 255 with the exact value
      if (__builtin_expect(!excpos_v.empty(), 0) && min_count <= 255u) {
        auto it = std::lower_bound(excpos_v.begin(), excpos_v.end(), s);
        for (; it != excpos_v.end() && *it <= hi; ++it) {
          uint32_t exact =
              exc_value(exc_idx, exc_val, n_exc, r_idx[*it]);
          cnt_sum += (int64_t)exact - 255;
        }
      }
    }
    o_obs[w] = obs;
    o_var[w] = var_;
    o_inn[w] = inner;
    o_lft[w] = left;
    o_rgt[w] = right;
    o_cnt[w] = cnt_sum;
  }
}

static bool cpu_simd_scan() {
  static int ok = -1;
  if (ok < 0)
    ok = (__builtin_cpu_supports("avx512f") &&
          __builtin_cpu_supports("avx512bw") &&
          __builtin_cpu_supports("avx512vl"))
             ? 1
             : 0;
  return ok == 1;
}
#endif  // __x86_64__

}  // namespace

void kcf_window_scan_u8(const uint8_t* counts, int64_t n_counts,
                        const int32_t* exc_idx, const uint32_t* exc_val,
                        int64_t n_exc, const int32_t* r_idx, int64_t n_pos,
                        uint32_t min_count, int32_t k,
                        const int32_t* w_start, const int32_t* w_hi,
                        int64_t n_win, int32_t flags, int64_t* out) {
  int n_threads = pick_threads(n_win, 8);
#if defined(__x86_64__)
  bool simd = cpu_simd_scan() && !(flags & 1) && min_count <= 255u &&
              n_counts >= 8;
#else
  bool simd = false;
  (void)flags;
  (void)n_counts;
#endif
  if (n_threads <= 1 || n_win < 8) {
#if defined(__x86_64__)
    if (simd) {
      if (n_win > 0)
        window_scan_range_simd(counts, n_counts, exc_idx, exc_val, n_exc,
                               r_idx, n_pos, min_count, k, w_start, w_hi, 0,
                               n_win, n_win, out);
      return;
    }
#endif
    window_scan_range(counts, exc_idx, exc_val, n_exc, r_idx, n_pos,
                      min_count, k, w_start, w_hi, 0, n_win, n_win, out);
    return;
  }
  std::vector<std::thread> workers;
  int64_t step = (n_win + n_threads - 1) / n_threads;
  for (int t = 0; t < n_threads; ++t) {
    int64_t lo = t * step;
    int64_t hi = std::min(n_win, lo + step);
    if (lo >= hi) break;
#if defined(__x86_64__)
    if (simd) {
      workers.emplace_back(window_scan_range_simd, counts, n_counts, exc_idx,
                           exc_val, n_exc, r_idx, n_pos, min_count, k,
                           w_start, w_hi, lo, hi, n_win, out);
      continue;
    }
#endif
    workers.emplace_back(window_scan_range, counts, exc_idx, exc_val, n_exc,
                         r_idx, n_pos, min_count, k, w_start, w_hi, lo, hi,
                         n_win, out);
  }
  for (auto& w : workers) w.join();
}

// out[i] = table[idx[i]] for idx >= 0 else 0 (per-position count gather).
void kcf_gather_counts(const uint32_t* table, const int32_t* idx, int64_t n,
                       uint32_t* out) {
  for (int64_t i = 0; i < n; ++i) {
    int32_t at = idx[i];
    out[i] = (at >= 0) ? table[at] : 0;
  }
}

// Fused chromosome pass for the prefix-decomposition engine: one linear
// scan over k-mer start positions producing every prefix array the
// per-window O(1) statistics need, plus the base-validity run table.
// Returns the number of present k-mers via *n_present and the number of
// runs via *n_runs (pp/p_* and run_*/f_run are caller-allocated at
// worst-case size).
// indirect == 0: counts[i] is the count of the k-mer at position i.
// indirect == 1: counts[r_idx[i]] is (counts = per-unique-kmer table),
//                fusing the former gather pass into this scan.
void kcf_chrom_stats2(const uint32_t* counts, int32_t indirect,
                      const int32_t* r_idx, int64_t n_pos,
                      const uint8_t* base_valid, int64_t L,
                      uint32_t min_count, int32_t k,
                      int32_t* cs_tot,   // (n_pos+1)
                      int32_t* cs_obs,   // (n_pos+1)
                      int64_t* cs_cnt,   // (n_pos+1)
                      int32_t* pp,       // (<= n_pos)
                      int32_t* p_var,    // (<= n_pos+1)
                      int32_t* p_dist,   // (<= n_pos+1)
                      int64_t* n_present,
                      int32_t* run_start,  // (<= L/2+1)
                      int32_t* run_end,
                      int64_t* f_run,      // (<= L/2+2)
                      int64_t* n_runs) {
  int32_t tot = 0, obs = 0;
  int64_t cnt = 0;
  cs_tot[0] = 0;
  cs_obs[0] = 0;
  cs_cnt[0] = 0;
  int64_t np_ = 0;
  int32_t last_present_ord = -1;
  p_var[0] = 0;
  p_dist[0] = 0;
  for (int64_t i = 0; i < n_pos; ++i) {
    int32_t ri = r_idx[i];
    bool kv = ri >= 0;
    if (kv) {
      ++tot;
      uint32_t c = indirect ? counts[ri] : counts[i];
      if (c >= min_count) {
        ++obs;
        cnt += c;
        // gap before this present k-mer, in valid-k-mer ordinals
        int64_t gap = (np_ == 0) ? 0 : (int64_t)(tot - 1) - last_present_ord - 1;
        int32_t dd = 0, hv = 0;
        if (gap > 0) {
          int64_t dist = gap - (k - 1);
          if (dist <= 0) dist = (dist + 1 < 0) ? -(dist + 1) : dist + 1;
          dd = (int32_t)dist;
          hv = 1;
        }
        pp[np_] = (int32_t)i;
        p_var[np_ + 1] = p_var[np_] + hv;
        p_dist[np_ + 1] = p_dist[np_] + dd;
        ++np_;
        last_present_ord = tot - 1;
      }
    }
    cs_tot[i + 1] = tot;
    cs_obs[i + 1] = obs;
    cs_cnt[i + 1] = cnt;
  }
  *n_present = np_;

  int64_t nr = 0;
  bool in_run = false;
  f_run[0] = 0;
  for (int64_t i = 0; i <= L; ++i) {
    bool v = (i < L) && base_valid[i];
    if (v && !in_run) {
      run_start[nr] = (int32_t)i;
      in_run = true;
    } else if (!v && in_run) {
      run_end[nr] = (int32_t)i;
      int64_t len = run_end[nr] - run_start[nr];
      f_run[nr + 1] = f_run[nr] + (len >= k ? len : 0);
      ++nr;
      in_run = false;
    }
  }
  *n_runs = nr;
}

// Backwards-compatible wrapper (per-position counts).
void kcf_chrom_stats(const uint32_t* counts_pos, const int32_t* r_idx,
                     int64_t n_pos, const uint8_t* base_valid, int64_t L,
                     uint32_t min_count, int32_t k, int32_t* cs_tot,
                     int32_t* cs_obs, int64_t* cs_cnt, int32_t* pp,
                     int32_t* p_var, int32_t* p_dist, int64_t* n_present,
                     int32_t* run_start, int32_t* run_end, int64_t* f_run,
                     int64_t* n_runs) {
  kcf_chrom_stats2(counts_pos, 0, r_idx, n_pos, base_valid, L, min_count, k,
                   cs_tot, cs_obs, cs_cnt, pp, p_var, p_dist, n_present,
                   run_start, run_end, f_run, n_runs);
}

// KMC suffix-record decode: records are (suffix bytes, little-endian
// counter); one pass producing packed suffix values and counts.
void kcf_decode_suffix_records(const uint8_t* raw, int64_t n,
                               int32_t suf_bytes, int32_t counter_size,
                               uint64_t* suffixes, uint32_t* counts) {
  int64_t rec = suf_bytes + counter_size;
  for (int64_t i = 0; i < n; ++i) {
    const uint8_t* p = raw + i * rec;
    uint64_t s = 0;
    for (int32_t j = 0; j < suf_bytes; ++j) s = (s << 8) | p[j];
    uint32_t c = 0;
    for (int32_t j = 0; j < counter_size; ++j)
      c |= (uint32_t)p[suf_bytes + j] << (8 * j);
    suffixes[i] = s;
    counts[i] = c;
  }
}

// Fused KMC record decode + full-kmer reconstruction: walks the prefix
// LUT bin boundaries while decoding records, emitting
// kmer = (prefix << 2*suffix_len) | suffix directly
// (prefix = bin index mod 4^lut, as in the reference's dumpKmerTable,
// KMC.java:427-450). bounds has n_bins+1 entries (record-index ranges).
// Decode a range of KMC records into full k-mer keys + counts.
// bounds are ABSOLUTE record indices (prefix LUT concatenation, +1
// sentinel at n_total); raw is slab-relative, rec_offset maps slab
// record i to absolute index. lut_size is a power of 4, so the
// prefix extraction is a mask, not a division.
static void decode_records_range(const uint8_t* raw, int64_t lo, int64_t hi,
                                 int64_t n, int32_t suf_bytes,
                                 int32_t counter_size,
                                 const uint64_t* bounds, int64_t n_bins,
                                 uint64_t lut_mask, int32_t suffix_len,
                                 int64_t rec_offset, uint64_t* kmers,
                                 uint32_t* counts) {
  int64_t rec = suf_bytes + counter_size;
  int64_t bin =
      (std::upper_bound(bounds, bounds + n_bins + 1,
                        (uint64_t)(rec_offset + lo)) -
       bounds) -
      1;
  if (bin < 0) bin = 0;
  int32_t s_shift = 64 - 8 * suf_bytes;
  uint32_t c_mask = (counter_size >= 4)
                        ? 0xFFFFFFFFu
                        : ((1u << (8 * counter_size)) - 1u);
  // fast path reads 8 bytes of suffix + 4 of counter; the last record
  // of the slab is decoded byte-wise to avoid reading past the buffer
  int64_t fast_hi = std::min(hi, n - 1);
  for (int64_t i = lo; i < fast_hi; ++i) {
    while (bin < n_bins && (uint64_t)(rec_offset + i) >= bounds[bin + 1])
      ++bin;
    uint64_t prefix = (uint64_t)bin & lut_mask;
    const uint8_t* p = raw + i * rec;
    uint64_t s8;
    std::memcpy(&s8, p, 8);
    uint64_t s = __builtin_bswap64(s8) >> s_shift;
    uint32_t c4;
    std::memcpy(&c4, p + suf_bytes, 4);
    kmers[i] = (prefix << (2 * suffix_len)) | s;
    counts[i] = c4 & c_mask;
  }
  for (int64_t i = fast_hi; i < hi; ++i) {
    while (bin < n_bins && (uint64_t)(rec_offset + i) >= bounds[bin + 1])
      ++bin;
    uint64_t prefix = (uint64_t)bin & lut_mask;
    const uint8_t* p = raw + i * rec;
    uint64_t s = 0;
    for (int32_t j = 0; j < suf_bytes; ++j) s = (s << 8) | p[j];
    uint32_t c = 0;
    for (int32_t j = 0; j < counter_size; ++j)
      c |= (uint32_t)p[suf_bytes + j] << (8 * j);
    kmers[i] = (prefix << (2 * suffix_len)) | s;
    counts[i] = c;
  }
}

void kcf_decode_kmc_records(const uint8_t* raw, int64_t n, int32_t suf_bytes,
                            int32_t counter_size, const uint64_t* bounds,
                            int64_t n_bins, int64_t lut_size,
                            int32_t suffix_len, int64_t rec_offset,
                            uint64_t* kmers, uint32_t* counts) {
  uint64_t lut_mask = (uint64_t)lut_size - 1;
  int n_threads = pick_threads(n, 1 << 18);
  if (n_threads <= 1) {
    decode_records_range(raw, 0, n, n, suf_bytes, counter_size, bounds,
                         n_bins, lut_mask, suffix_len, rec_offset, kmers,
                         counts);
    return;
  }
  std::vector<std::thread> workers;
  int64_t step = (n + n_threads - 1) / n_threads;
  for (int t = 0; t < n_threads; ++t) {
    int64_t a = t * step;
    int64_t b = std::min(n, a + step);
    if (a >= b) break;
    workers.emplace_back(decode_records_range, raw, a, b, n, suf_bytes,
                         counter_size, bounds, n_bins, lut_mask, suffix_len,
                         rec_offset, kmers, counts);
  }
  for (auto& w : workers) w.join();
}

// Threaded LSD radix sort of (uint64 key, uint32 value) pairs with
// 16-bit digits. Replaces numpy argsort+take for the per-sample KMC
// table ordering (~4x faster on 2 cores); passes over all-zero high
// digits are skipped, so small k sorts in 2-3 passes.
namespace {

struct RadixScratch {
  std::vector<uint64_t> k;
  std::vector<uint32_t> v;
};

// File-scope so kcf_release_sort_scratch can free it: after a
// multi-Gbp sort the ping-pong buffers hold n x 12 bytes (36 GB for a
// 3G-key wheat-scale sample) until the thread exits otherwise.
thread_local RadixScratch g_radix_scratch;

void radix_hist_range(const uint64_t* keys, int64_t lo, int64_t hi,
                      int shift, uint32_t* hist /* 65536 */) {
  std::memset(hist, 0, 65536 * sizeof(uint32_t));
  for (int64_t i = lo; i < hi; ++i)
    ++hist[(keys[i] >> shift) & 0xFFFF];
}

void radix_scatter_range(const uint64_t* keys, const uint32_t* vals,
                         int64_t lo, int64_t hi, int shift, uint32_t* offs,
                         uint64_t* out_k, uint32_t* out_v) {
  if (vals == nullptr) {  // keys-only mode: no value traffic at all
    for (int64_t i = lo; i < hi; ++i) {
      uint32_t at = offs[(keys[i] >> shift) & 0xFFFF]++;
      out_k[at] = keys[i];
    }
    return;
  }
  for (int64_t i = lo; i < hi; ++i) {
    uint32_t at = offs[(keys[i] >> shift) & 0xFFFF]++;
    out_k[at] = keys[i];
    out_v[at] = vals[i];
  }
}

// Stable full-key sort of one equal-hi32 span: insertion for the tiny
// spans uniform k-mer keys produce, std::stable_sort for pathological
// skews (keeps the whole sort O(n log n) worst case).
void sort_span_pairs(uint64_t* k, uint32_t* v, int64_t lo, int64_t hi) {
  int64_t len = hi - lo;
  if (v == nullptr) {  // keys-only span fix
    std::sort(k + lo, k + hi);
    return;
  }
  if (len <= 32) {
    for (int64_t i = lo + 1; i < hi; ++i) {
      uint64_t kk = k[i];
      uint32_t vv = v[i];
      int64_t j = i;
      while (j > lo && k[j - 1] > kk) {
        k[j] = k[j - 1];
        v[j] = v[j - 1];
        --j;
      }
      k[j] = kk;
      v[j] = vv;
    }
    return;
  }
  std::vector<std::pair<uint64_t, uint32_t>> tmp((size_t)len);
  for (int64_t i = 0; i < len; ++i) tmp[i] = {k[lo + i], v[lo + i]};
  std::stable_sort(tmp.begin(), tmp.end(),
                   [](const auto& a, const auto& b) {
                     return a.first < b.first;
                   });
  for (int64_t i = 0; i < len; ++i) {
    k[lo + i] = tmp[i].first;
    v[lo + i] = tmp[i].second;
  }
}

}  // namespace

// Free the calling thread's radix ping-pong buffers (n x 12 bytes,
// retained across calls for reuse). Call after one-off giant sorts so
// the scratch does not shadow the working set for the rest of the run.
void kcf_release_sort_scratch(void) {
  g_radix_scratch.k.clear();
  g_radix_scratch.k.shrink_to_fit();
  g_radix_scratch.v.clear();
  g_radix_scratch.v.shrink_to_fit();
}

void kcf_sort_pairs_u64_u32(const uint64_t* keys, const uint32_t* vals,
                            int64_t n, uint64_t* out_k, uint32_t* out_v) {
  if (n <= 0) return;
  // vals/out_v may be null (keys-only sort): halves the memory
  // traffic and skips the 4n-byte value scratch - at wheat scale
  // (3G keys) that is 12 GB of host RAM the caller keeps
  bool keys_only = (vals == nullptr || out_v == nullptr);
  RadixScratch& scratch = g_radix_scratch;
  if ((int64_t)scratch.k.size() < n) {
    scratch.k.resize(n);
  }
  if (!keys_only && (int64_t)scratch.v.size() < n) {
    scratch.v.resize(n);
  }
  uint64_t mx = 0;
  for (int64_t i = 0; i < n; ++i) mx |= keys[i];
  int passes = 1;
  while (passes < 4 && (mx >> (16 * passes)) != 0) ++passes;
  // Wide keys (> 32 bits): radix only the TOP 32 bits below the MSB -
  // canonical k-mer keys are near-uniform there, so equal-top spans
  // are tiny - then finish each span with a stable full-key
  // comparison sort. Halves the scatter passes (the cache-hostile
  // part) vs classic LSD on 62-bit keys.
  int top = 64 - __builtin_clzll(mx | 1);
  bool top_mode = top > 32;
  int shifts[4] = {0, 16, 32, 48};
  int hi_shift = 0;
  if (top_mode) {
    passes = 2;
    hi_shift = top - 32;  // spans keyed on a full 32 bits of entropy
    shifts[0] = hi_shift;
    shifts[1] = hi_shift + 16;
  }

  int T = pick_threads(n, 1 << 17);
  int64_t step = (n + T - 1) / T;
  std::vector<std::vector<uint32_t>> hist(T, std::vector<uint32_t>(65536));

  const uint64_t* src_k = keys;
  const uint32_t* src_v = vals;
  // ping-pong: pass 0 into out or scratch such that the LAST pass lands
  // in out
  bool into_out = (passes % 2) == 1;
  for (int p = 0; p < passes; ++p) {
    int shift = shifts[p];
    uint64_t* dst_k = into_out ? out_k : scratch.k.data();
    uint32_t* dst_v =
        keys_only ? nullptr : (into_out ? out_v : scratch.v.data());
    if (T == 1) {
      radix_hist_range(src_k, 0, n, shift, hist[0].data());
    } else {
      std::vector<std::thread> ws;
      for (int t = 0; t < T; ++t) {
        int64_t a = t * step, b = std::min(n, a + step);
        ws.emplace_back(radix_hist_range, src_k, a, b, shift,
                        hist[t].data());
      }
      for (auto& w : ws) w.join();
    }
    // exclusive prefix over (digit-major, thread-minor)
    uint32_t run = 0;
    for (int d = 0; d < 65536; ++d) {
      for (int t = 0; t < T; ++t) {
        uint32_t c = hist[t][d];
        hist[t][d] = run;
        run += c;
      }
    }
    if (T == 1) {
      radix_scatter_range(src_k, src_v, 0, n, shift, hist[0].data(), dst_k,
                          dst_v);
    } else {
      std::vector<std::thread> ws;
      for (int t = 0; t < T; ++t) {
        int64_t a = t * step, b = std::min(n, a + step);
        ws.emplace_back(radix_scatter_range, src_k, src_v, a, b, shift,
                        hist[t].data(), dst_k, dst_v);
      }
      for (auto& w : ws) w.join();
    }
    src_k = dst_k;
    src_v = dst_v;
    into_out = !into_out;
  }
  if (top_mode) {
    // fix pass: walk equal-top-bits spans (expected length ~1 for
    // k-mer keys) and order each by full key
    int64_t i = 0;
    while (i < n) {
      uint64_t hi = out_k[i] >> hi_shift;
      int64_t j = i + 1;
      while (j < n && (out_k[j] >> hi_shift) == hi) ++j;
      if (j - i > 1) sort_span_pairs(out_k, out_v, i, j);
      i = j;
    }
  }
}

// Linear zipper lookup of SORTED needles in a sorted haystack: each
// thread binary-searches its range's start once, then advances two
// pointers - O(n_hay + n_needles) total instead of n_needles binary
// searches (replaces numpy searchsorted in the reference-index build,
// where every needle is known to be present; absent needles get -1).
static void sorted_lookup_range(const uint64_t* hay, int64_t n_hay,
                                const uint64_t* needles, int64_t a,
                                int64_t b, int32_t* out) {
  if (a >= b) return;
  // binary search the first needle's position
  int64_t lo = 0, hi = n_hay;
  uint64_t q0 = needles[a];
  while (lo < hi) {
    int64_t mid = (lo + hi) >> 1;
    if (hay[mid] < q0)
      lo = mid + 1;
    else
      hi = mid;
  }
  int64_t j = lo;
  for (int64_t i = a; i < b; ++i) {
    uint64_t q = needles[i];
    while (j < n_hay && hay[j] < q) ++j;
    out[i] = (j < n_hay && hay[j] == q) ? (int32_t)j : -1;
  }
}

// ---------------------------------------------------------------------------
// Reference-lookup simulator ("refsim"): the Java tool's EXACT per-window
// mechanics, transcribed for a measured baseline on this host (no JVM in
// the image). Per window (GetVariants.java:202-261): per k-mer-start
// char-by-char repacking (Fasta.java:90-127 rebuilds every k-mer, O(k)
// each), canonicalization via an explicit reverse complement
// (Kmer.java:72-79), KMC signature = min norm over all m-mers
// (Kmer.java:105-118), then signatureMap -> prefix-LUT range and a byte-
// compare binary search over the suffix records (KMC.java:292-326,
// HelperFunctions.java:232-243). One task per window on a thread pool
// (GetVariants.java:129-159). C++ is at least as fast as the JVM, so the
// measured rate is a CONSERVATIVE (upper-bound) stand-in for the Java
// baseline on identical hardware.
extern "C" void kcf_refsim_scan(
    const uint8_t* codes, int64_t n_codes, int k,
    const int32_t* w_start, const int32_t* w_end, int64_t n_win,
    const uint32_t* sig_map, int sig_len,
    const uint64_t* prefix_array, int64_t n_prefix, int lut_len,
    const uint8_t* suffix, int64_t n_rec, int suf_bytes,
    int counter_size, const uint32_t* norm, int min_count, int threads,
    int64_t* out_observed) {
  int suffix_len = k - lut_len;
  uint64_t suf_mask = (suffix_len >= 32)
                          ? ~0ull
                          : ((1ull << (2 * suffix_len)) - 1);
  uint64_t sig_mask = (1ull << (2 * sig_len)) - 1;
  int rec = suf_bytes + counter_size;
  std::atomic<int64_t> next(0);
  auto worker = [&]() {
    uint8_t qb[16];
    for (;;) {
      int64_t w = next.fetch_add(1);
      if (w >= n_win) return;
      int64_t obs = 0;
      int64_t lo_pos = w_start[w];
      int64_t hi_pos = (int64_t)w_end[w] - k;
      for (int64_t s = lo_pos; s <= hi_pos; ++s) {
        // char-by-char forward pack, reset on non-ACGT (the reference
        // re-derives every k-mer from scratch)
        uint64_t fwd = 0;
        bool ok = true;
        for (int j = 0; j < k; ++j) {
          uint8_t c = codes[s + j];
          if (c > 3) {
            ok = false;
            break;
          }
          fwd = (fwd << 2) | c;
        }
        if (!ok) continue;
        // explicit reverse complement (per-base loop, as Kmer does)
        uint64_t rc = 0, t = fwd;
        for (int j = 0; j < k; ++j) {
          rc = (rc << 2) | (3ull - (t & 3ull));
          t >>= 2;
        }
        uint64_t canon = fwd < rc ? fwd : rc;
        // signature: min norm over all m-mers
        uint32_t best = 0xFFFFFFFFu;
        for (int p = 0; p <= k - sig_len; ++p) {
          uint64_t mm = (canon >> (2 * (k - sig_len - p))) & sig_mask;
          uint32_t v = norm[mm];
          if (v < best) best = v;
        }
        // prefix-LUT range
        uint64_t pref = canon >> (2 * suffix_len);
        uint64_t idx =
            (uint64_t)sig_map[best] * (1ull << (2 * lut_len)) + pref;
        int64_t lo = (int64_t)prefix_array[idx];
        int64_t hi =
            (idx + 1 < (uint64_t)n_prefix) ? (int64_t)prefix_array[idx + 1]
                                           : n_rec;
        // query suffix bytes (big-endian, whole bytes)
        uint64_t sv = canon & suf_mask;
        for (int j = 0; j < suf_bytes; ++j)
          qb[j] = (uint8_t)(sv >> (8 * (suf_bytes - 1 - j)));
        // binary search with byte comparison
        int64_t found = -1;
        while (lo < hi) {
          int64_t mid = (lo + hi) >> 1;
          const uint8_t* rp = suffix + mid * rec;
          int cmpres = 0;
          for (int j = 0; j < suf_bytes; ++j) {
            if (rp[j] != qb[j]) {
              cmpres = rp[j] < qb[j] ? -1 : 1;
              break;
            }
          }
          if (cmpres == 0) {
            found = mid;
            break;
          }
          if (cmpres < 0)
            lo = mid + 1;
          else
            hi = mid;
        }
        if (found >= 0) {
          const uint8_t* rp = suffix + found * rec + suf_bytes;
          uint32_t cnt = 0;
          for (int j = 0; j < counter_size; ++j)
            cnt |= (uint32_t)rp[j] << (8 * j);
          if (cnt >= (uint32_t)min_count) ++obs;
        }
      }
      out_observed[w] = obs;
    }
  };
  int T = threads > 0 ? threads : 1;
  if (T == 1) {
    worker();
  } else {
    std::vector<std::thread> ws;
    for (int t = 0; t < T; ++t) ws.emplace_back(worker);
    for (auto& w : ws) w.join();
  }
}

// Quantile-tile packing for the device-join engine: one threaded pass
// computes each sorted key's analytic partition (the integer quantile
// function of ops/pjoin.quantile_partition_ids - must stay
// bit-identical with it), splits (hi, lo) per engine/encode.split_hi_lo,
// and writes the flat [hi | lo | counts] upload buffer sequentially
// (partition ids are monotone over sorted keys, so writes stream).
// kcf_pjoin_hist fills the per-partition histogram so the caller can
// size the tile first; counts byte-pack 4-per-word when packed_u8.
static inline int64_t pjoin_part(uint64_t key, int k, int b) {
  uint64_t x = (key << (64 - 2 * k)) >> 32;
  uint64_t F = (x << 32) - ((x * x) >> 1);
  return (int64_t)(F >> (63 - b));
}

extern "C" void kcf_pjoin_hist(const uint64_t* keys, int64_t n, int k,
                               int b, int64_t* per /* 2^b, zeroed */) {
  for (int64_t i = 0; i < n; ++i) ++per[pjoin_part(keys[i], k, b)];
}

extern "C" void kcf_pjoin_pack(const uint64_t* keys,
                               const uint32_t* counts, int64_t n, int k,
                               int b, int64_t tile, int packed_u8,
                               const int64_t* per, uint32_t* buf) {
  int64_t P = (int64_t)1 << b;
  int64_t nt = P * tile;
  int n_lo = k - (k < 16 ? k : 16);
  uint64_t lo_mask = (((uint64_t)1) << (2 * n_lo)) - 1;
  int T = pick_threads(n, 1 << 20);
  // per-thread: a contiguous partition range with its key range found
  // by scanning the prefix histogram (keys are partition-sorted)
  std::vector<int64_t> pstart(P + 1);
  pstart[0] = 0;
  for (int64_t p = 0; p < P; ++p) pstart[p + 1] = pstart[p] + per[p];
  auto work = [&](int t) {
    int64_t p_lo = P * t / T, p_hi = P * (t + 1) / T;
    for (int64_t p = p_lo; p < p_hi; ++p) {
      int64_t base = p * tile;
      int64_t a = pstart[p], e = pstart[p + 1];
      for (int64_t i = a; i < e; ++i) {
        int64_t slot = base + (i - a);
        uint64_t key = keys[i];
        buf[slot] = (uint32_t)(key >> (2 * n_lo));
        buf[nt + slot] = (uint32_t)(key & lo_mask);
        if (packed_u8) {
          // planar byte packing (see ops/pjoin._unpack_planar): byte
          // (local / W) of word (p, local % W), W = tile/4 - words
          // never span partitions, so the thread split stays race-free
          int64_t W = tile >> 2;
          int64_t local = i - a;
          uint32_t* w = &buf[2 * nt + p * W + (local % W)];
          *w |= (counts[i] & 0xFFu) << ((local / W) * 8);
        } else {
          buf[2 * nt + slot] = counts[i];
        }
      }
    }
  };
  if (T == 1) {
    work(0);
  } else {
    std::vector<std::thread> ws;
    for (int t = 0; t < T; ++t) ws.emplace_back(work, t);
    for (auto& w : ws) w.join();
  }
}

extern "C" void kcf_sorted_lookup(const uint64_t* hay, int64_t n_hay,
                                  const uint64_t* needles, int64_t n,
                                  int32_t* out) {
  int T = pick_threads(n, 1 << 19);
  if (T <= 1) {
    sorted_lookup_range(hay, n_hay, needles, 0, n, out);
    return;
  }
  std::vector<std::thread> ws;
  int64_t step = (n + T - 1) / T;
  for (int t = 0; t < T; ++t) {
    int64_t a = t * step, b = std::min(n, a + step);
    if (a >= b) break;
    ws.emplace_back(sorted_lookup_range, hay, n_hay, needles, a, b, out);
  }
  for (auto& w : ws) w.join();
}

// KCF data-row parser: one pass over the raw text of data rows.
// Fields: CHROM START END ID TOTAL_KMERS INFO FORMAT sample...
// with sample = IB:VA:OB:ID:LD:RD:KD:SC. Emits numeric columns directly
// (k-mer totals reconstituted as floor(KD*OB + 0.5), Java Math.round)
// plus byte offsets of the CHROM and ID tokens so the caller only
// materializes 2n Python strings.
// Returns number of rows parsed, or -1 on malformed input.
int64_t kcf_parse_rows(const char* text, int64_t len, int64_t n_samples,
                       int64_t max_rows,
                       int64_t* starts, int64_t* ends, int64_t* totals,
                       int64_t* efflen,
                       int64_t* name_off, int64_t* name_len,
                       int64_t* id_off, int64_t* id_len,
                       // per-sample arrays, laid out (n_samples, max_rows)
                       int64_t* ibs, int64_t* va, int64_t* ob, int64_t* inner,
                       int64_t* ld, int64_t* rd, int64_t* kmer_count,
                       double* score_kd) {
  int64_t row = 0;
  int64_t i = 0;
  while (i < len && row < max_rows) {
    // skip blank lines
    if (text[i] == '\n') {
      ++i;
      continue;
    }
    // CHROM
    int64_t tok = i;
    while (i < len && text[i] != '\t') ++i;
    if (i >= len) return -1;
    name_off[row] = tok;
    name_len[row] = i - tok;
    ++i;
    auto parse_int = [&](char stop1, char stop2) -> int64_t {
      bool neg = false;
      if (i < len && text[i] == '-') {
        neg = true;
        ++i;
      }
      int64_t v = 0;
      while (i < len && text[i] != stop1 && text[i] != stop2 &&
             text[i] != '\n') {
        v = v * 10 + (text[i] - '0');
        ++i;
      }
      if (i < len && (text[i] == stop1 || text[i] == stop2)) ++i;
      return neg ? -v : v;
    };
    auto parse_double = [&](char stop1, char stop2) -> double {
      int64_t tok0 = i;
      while (i < len && text[i] != stop1 && text[i] != stop2 &&
             text[i] != '\n') ++i;
      // bounded copy for strtod (fields are short)
      char buf[64];
      int64_t m = i - tok0;
      if (m > 63) m = 63;
      std::memcpy(buf, text + tok0, m);
      buf[m] = 0;
      if (i < len && (text[i] == stop1 || text[i] == stop2)) ++i;
      return strtod(buf, nullptr);
    };
    starts[row] = parse_int('\t', '\t');
    ends[row] = parse_int('\t', '\t');
    tok = i;
    while (i < len && text[i] != '\t') ++i;
    if (i >= len) return -1;
    id_off[row] = tok;
    id_len[row] = i - tok;
    ++i;
    totals[row] = parse_int('\t', '\t');
    // INFO: find "EFFLEN=" then the integer, then skip to tab
    int64_t ev = -1;
    while (i < len && text[i] != '\t') {
      if (text[i] == 'E' && i + 7 < len &&
          std::memcmp(text + i, "EFFLEN=", 7) == 0) {
        i += 7;
        ev = 0;
        while (i < len && text[i] >= '0' && text[i] <= '9') {
          ev = ev * 10 + (text[i] - '0');
          ++i;
        }
      } else {
        ++i;
      }
    }
    if (ev < 0 || i >= len) return -1;
    efflen[row] = ev;
    ++i;
    // FORMAT column: skip
    while (i < len && text[i] != '\t') ++i;
    if (i >= len) return -1;
    ++i;
    for (int64_t sidx = 0; sidx < n_samples; ++sidx) {
      int64_t at = sidx * max_rows + row;
      if (text[i] == 'N' && (text[i + 1] == ':')) {
        ibs[at] = -1;
        i += 2;
      } else {
        ibs[at] = parse_int(':', ':');
      }
      va[at] = parse_int(':', ':');
      ob[at] = parse_int(':', ':');
      inner[at] = parse_int(':', ':');
      ld[at] = parse_int(':', ':');
      rd[at] = parse_int(':', ':');
      double kd = parse_double(':', ':');
      score_kd[at] = kd;
      // Java Math.round(kd * ob): floor(x + 0.5)
      double prod = kd * (double)ob[at];
      kmer_count[at] = (int64_t)std::floor(prod + 0.5);
      // SC field: skip (always recomputed)
      while (i < len && text[i] != '\t' && text[i] != '\n') ++i;
      if (i < len && text[i] == '\t') ++i;
    }
    if (i < len && text[i] == '\n') ++i;
    ++row;
  }
  return row;
}

namespace {

// %.2f formatting with Java HALF_UP semantics for the common case.
// Exact decimal ties (x*100 ends in .5 exactly) differ between C's
// round-half-even and Java's HALF_UP; values near a tie are flagged so
// the caller can reformat those rows with exact decimal arithmetic.
inline bool near_tie2(double x) {
  double scaled = std::fabs(x) * 100.0;
  double frac = scaled - std::floor(scaled);
  double tol = 1e-9 * (scaled > 1.0 ? scaled : 1.0);
  return std::fabs(frac - 0.5) <= tol;
}

inline char* fmt_f2(char* p, double x) {
  int n = snprintf(p, 32, "%.2f", x);
  return p + n;
}

inline char* fmt_i64(char* p, int64_t v) {
  int n = snprintf(p, 24, "%lld", (long long)v);
  return p + n;
}

inline char* put_str(char* p, const char* s, int64_t n) {
  std::memcpy(p, s, n);
  return p + n;
}

}  // namespace

// Format KCF data rows into `out`. Returns the number of bytes written,
// or -(row+1) if row overflowed the per-row budget. Rows whose KD/SC/
// stat values sit near a rounding tie are recorded in tie_rows
// (n_tie_rows entries) and must be re-rendered exactly by the caller.
// Layout of per-sample arrays: (n_samples, n_rows).
int64_t kcf_format_rows(
    const char* names, const int64_t* name_off, const int64_t* name_len,
    const char* ids, const int64_t* id_off, const int64_t* id_len,
    const int64_t* starts, const int64_t* ends, const int64_t* totals,
    const int64_t* efflen,
    // INFO stats (per row)
    const double* min_sc, const double* max_sc, const double* mean_sc,
    const int64_t* min_ob, const int64_t* max_ob, const float* mean_ob,
    const int64_t* min_va, const int64_t* max_va, const char* mv_strs,
    const int64_t* mv_off, const int64_t* mv_len,
    // per-sample
    const int64_t* ibs, const int64_t* va, const int64_t* ob,
    const int64_t* inner, const int64_t* ld, const int64_t* rd,
    const double* kd, const double* sc,
    int64_t n_rows, int64_t n_samples,
    char* out, int64_t out_cap,
    int64_t* tie_rows, int64_t* n_tie_rows) {
  static const char kFormat[] = "GT:VA:OB:ID:LD:RD:KD:SC";
  char* p = out;
  int64_t nt = 0;
  for (int64_t r = 0; r < n_rows; ++r) {
    if ((p - out) + 4096 + 64 * n_samples > out_cap) return -(r + 1);
    bool tie = near_tie2(min_sc[r]) || near_tie2(max_sc[r]) ||
               near_tie2(mean_sc[r]) || near_tie2((double)mean_ob[r]);
    p = put_str(p, names + name_off[r], name_len[r]);
    *p++ = '\t';
    p = fmt_i64(p, starts[r]);
    *p++ = '\t';
    p = fmt_i64(p, ends[r]);
    *p++ = '\t';
    p = put_str(p, ids + id_off[r], id_len[r]);
    *p++ = '\t';
    p = fmt_i64(p, totals[r]);
    *p++ = '\t';
    p = put_str(p, "EFFLEN=", 7);
    p = fmt_i64(p, efflen[r]);
    p = put_str(p, ";IS=", 4);
    p = fmt_f2(p, min_sc[r]);
    p = put_str(p, ";XS=", 4);
    p = fmt_f2(p, max_sc[r]);
    p = put_str(p, ";MS=", 4);
    p = fmt_f2(p, mean_sc[r]);
    p = put_str(p, ";IO=", 4);
    p = fmt_i64(p, min_ob[r]);
    p = put_str(p, ";XO=", 4);
    p = fmt_i64(p, max_ob[r]);
    p = put_str(p, ";MO=", 4);
    p = fmt_f2(p, (double)mean_ob[r]);
    p = put_str(p, ";IV=", 4);
    p = fmt_i64(p, min_va[r]);
    p = put_str(p, ";XV=", 4);
    p = fmt_i64(p, max_va[r]);
    p = put_str(p, ";MV=", 4);
    p = put_str(p, mv_strs + mv_off[r], mv_len[r]);
    *p++ = '\t';
    p = put_str(p, kFormat, sizeof(kFormat) - 1);
    for (int64_t sidx = 0; sidx < n_samples; ++sidx) {
      int64_t at = sidx * n_rows + r;
      *p++ = '\t';
      if (ibs[at] == -1) {
        *p++ = 'N';
      } else {
        p = fmt_i64(p, ibs[at]);
      }
      *p++ = ':';
      p = fmt_i64(p, va[at]);
      *p++ = ':';
      p = fmt_i64(p, ob[at]);
      *p++ = ':';
      p = fmt_i64(p, inner[at]);
      *p++ = ':';
      p = fmt_i64(p, ld[at]);
      *p++ = ':';
      p = fmt_i64(p, rd[at]);
      *p++ = ':';
      p = fmt_f2(p, kd[at]);
      *p++ = ':';
      p = fmt_f2(p, sc[at]);
      tie = tie || near_tie2(kd[at]) || near_tie2(sc[at]);
    }
    *p++ = '\n';
    if (tie) tie_rows[nt++] = r;
  }
  *n_tie_rows = nt;
  return p - out;
}

// ---- wide k-mer (33..64 bases) support: 128-bit kmers as (hi, lo) ----
// (u128 / mk128 / wide_lower_bound are declared above the SIMD section)

// Wide KMC record decode: kmer = (prefix << 2*suffix_len) | suffix with
// suffix up to 16 bytes. Limbs out as (hi, lo).
static void decode_records_wide_range(const uint8_t* raw, int64_t lo,
                                      int64_t hi, int32_t suf_bytes,
                                      int32_t counter_size,
                                      const uint64_t* bounds, int64_t n_bins,
                                      uint64_t lut_mask, int32_t suffix_len,
                                      int64_t rec_offset, uint64_t* khi,
                                      uint64_t* klo, uint32_t* counts) {
  int64_t rec = suf_bytes + counter_size;
  int64_t bin =
      (std::upper_bound(bounds, bounds + n_bins + 1,
                        (uint64_t)(rec_offset + lo)) -
       bounds) -
      1;
  if (bin < 0) bin = 0;
  for (int64_t i = lo; i < hi; ++i) {
    while (bin < n_bins && (uint64_t)(rec_offset + i) >= bounds[bin + 1])
      ++bin;
    u128 prefix = (u128)((uint64_t)bin & lut_mask);
    const uint8_t* p = raw + i * rec;
    u128 s = 0;
    for (int32_t j = 0; j < suf_bytes; ++j) s = (s << 8) | p[j];
    uint32_t c = 0;
    for (int32_t j = 0; j < counter_size; ++j)
      c |= (uint32_t)p[suf_bytes + j] << (8 * j);
    u128 v = (prefix << (2 * suffix_len)) | s;
    khi[i] = (uint64_t)(v >> 64);
    klo[i] = (uint64_t)v;
    counts[i] = c;
  }
}

void kcf_decode_kmc_records_wide(const uint8_t* raw, int64_t n,
                                 int32_t suf_bytes, int32_t counter_size,
                                 const uint64_t* bounds, int64_t n_bins,
                                 int64_t lut_size, int32_t suffix_len,
                                 int64_t rec_offset, uint64_t* khi,
                                 uint64_t* klo, uint32_t* counts) {
  uint64_t lut_mask = (uint64_t)lut_size - 1;
  int n_threads = pick_threads(n, 1 << 18);
  if (n_threads <= 1) {
    decode_records_wide_range(raw, 0, n, suf_bytes, counter_size, bounds,
                              n_bins, lut_mask, suffix_len, rec_offset, khi,
                              klo, counts);
    return;
  }
  std::vector<std::thread> workers;
  int64_t step = (n + n_threads - 1) / n_threads;
  for (int t = 0; t < n_threads; ++t) {
    int64_t a = t * step;
    int64_t b = std::min(n, a + step);
    if (a >= b) break;
    workers.emplace_back(decode_records_wide_range, raw, a, b, suf_bytes,
                         counter_size, bounds, n_bins, lut_mask, suffix_len,
                         rec_offset, khi, klo, counts);
  }
  for (auto& w : workers) w.join();
}

// Sort (hi, lo) pairs ascending and sum counts of duplicates.
// Returns the number of unique pairs (counts may be null -> dedupe only,
// emitting count 1 per unique when out_counts is non-null).
int64_t kcf_sort_unique_pairs(const uint64_t* hi, const uint64_t* lo,
                              const uint32_t* counts, int64_t n,
                              uint64_t* out_hi, uint64_t* out_lo,
                              uint64_t* out_counts) {
  std::vector<std::pair<u128, uint32_t>> v(n);
  for (int64_t i = 0; i < n; ++i)
    v[i] = {mk128(hi[i], lo[i]), counts ? counts[i] : 1u};
  std::sort(v.begin(), v.end(),
            [](const auto& a, const auto& b) { return a.first < b.first; });
  int64_t m = 0;
  for (int64_t i = 0; i < n;) {
    u128 key = v[i].first;
    uint64_t c = 0;
    while (i < n && v[i].first == key) {
      c += v[i].second;
      ++i;
    }
    out_hi[m] = (uint64_t)(key >> 64);
    out_lo[m] = (uint64_t)key;
    if (out_counts) out_counts[m] = c;
    ++m;
  }
  return m;
}

// Merge join over sorted 128-bit pair arrays.
void kcf_merge_counts_wide(const uint64_t* rhi, const uint64_t* rlo,
                           int64_t n_ref, const uint64_t* dhi,
                           const uint64_t* dlo, const uint32_t* db_counts,
                           int64_t n_db, uint32_t* out_counts) {
  int64_t j = 0;
  for (int64_t i = 0; i < n_ref; ++i) {
    u128 key = mk128(rhi[i], rlo[i]);
    while (j < n_db && mk128(dhi[j], dlo[j]) < key) ++j;
    out_counts[i] =
        (j < n_db && mk128(dhi[j], dlo[j]) == key) ? db_counts[j] : 0;
  }
}

// Scalar zipper over a ref range with u8-saturated counts (wide keys).
static void merge_range_u8_wide(const uint64_t* rhi, const uint64_t* rlo,
                                int64_t lo, int64_t hi, const uint64_t* dhi,
                                const uint64_t* dlo, const uint8_t* db_cnt8,
                                int64_t n_db, uint8_t* out_u8) {
  if (lo >= hi) return;
  int64_t j = wide_lower_bound(dhi, dlo, n_db, mk128(rhi[lo], rlo[lo]));
  int64_t i = lo;
  while (i < hi && j < n_db) {
    u128 r = mk128(rhi[i], rlo[i]);
    u128 d = mk128(dhi[j], dlo[j]);
    out_u8[i - lo] = (d == r) ? db_cnt8[j] : 0;
    i += (d >= r);
    j += (d <= r);
  }
  for (; i < hi; ++i) out_u8[i - lo] = 0;
}

// Wide-key variant of kcf_merge_counts_u8 (covers ref[lo:hi)): the SIMD
// driver above when available (same size gates as the narrow path),
// otherwise a threaded scalar zipper. The db-side >=255 exception list
// is unbounded; cap_exc only limits the matched, ref-translated
// exceptions (-1 = caller should retry with a larger buffer).
int64_t kcf_merge_counts_u8_wide(const uint64_t* rhi, const uint64_t* rlo,
                                 int64_t lo, int64_t hi, const uint64_t* dhi,
                                 const uint64_t* dlo,
                                 const uint32_t* db_counts, int64_t n_db,
                                 uint8_t* out_u8, int32_t* exc_idx,
                                 uint32_t* exc_val, int64_t cap_exc) {
  if (lo >= hi) return 0;
  int64_t n = hi - lo;
#if defined(__x86_64__)
  if (cpu_simd_merge() && n >= (1 << 12) && n_db >= 8)
    return merge_counts_u8_simd(WideKeys{rhi, rlo}, lo, hi,
                                WideKeys{dhi, dlo}, db_counts, n_db, out_u8,
                                exc_idx, exc_val, cap_exc);
#endif
  static thread_local std::vector<uint8_t> cnt8;
  static thread_local std::vector<int64_t> db_exc;
  if ((int64_t)cnt8.size() < n_db) cnt8.resize(n_db);
  db_exc.clear();
  for (int64_t e = 0; e < n_db; ++e) {
    uint32_t c = db_counts[e];
    cnt8[e] = (uint8_t)(c < 255u ? c : 255u);
    if (c >= 255u) db_exc.push_back(e);
  }

  int n_threads = pick_threads(n, 1 << 17);
  // bind the count pointer by value: cnt8 is thread_local, so naming it
  // inside a worker thread would resolve to that thread's own (empty)
  // instance
  const uint8_t* cnt8_p = cnt8.data();
  if (n_threads <= 1) {
    merge_range_u8_wide(rhi, rlo, lo, hi, dhi, dlo, cnt8_p, n_db, out_u8);
  } else {
    int64_t step = (n + n_threads - 1) / n_threads;
    std::vector<std::thread> workers;
    for (int t = 0; t < n_threads; ++t) {
      int64_t a = lo + t * step;
      int64_t b = std::min(hi, a + step);
      if (a >= b) break;
      workers.emplace_back([=]() {
        merge_range_u8_wide(rhi, rlo, a, b, dhi, dlo, cnt8_p, n_db,
                            out_u8 + (a - lo));
      });
    }
    for (auto& w : workers) w.join();
  }

  int64_t n_exc = 0;
  for (int64_t de : db_exc) {
    u128 key = mk128(dhi[de], dlo[de]);
    int64_t at = lo + wide_lower_bound(rhi + lo, rlo + lo, n, key);
    if (at < hi && mk128(rhi[at], rlo[at]) == key) {
      if (n_exc >= cap_exc) return -1;
      exc_idx[n_exc] = (int32_t)at;
      exc_val[n_exc] = db_counts[de];
      ++n_exc;
    }
  }
  return n_exc;
}

// Exact-match binary search of queries in a sorted pair array; -1 when
// absent or the query is flagged invalid.
void kcf_searchsorted_pairs(const uint64_t* rhi, const uint64_t* rlo,
                            int64_t n_ref, const uint64_t* qhi,
                            const uint64_t* qlo, const uint8_t* q_valid,
                            int64_t n_q, int32_t* out_idx) {
  for (int64_t i = 0; i < n_q; ++i) {
    if (q_valid && !q_valid[i]) {
      out_idx[i] = -1;
      continue;
    }
    u128 key = mk128(qhi[i], qlo[i]);
    int64_t lo_ = 0, hi_ = n_ref;
    while (lo_ < hi_) {
      int64_t mid = (lo_ + hi_) >> 1;
      if (mk128(rhi[mid], rlo[mid]) < key)
        lo_ = mid + 1;
      else
        hi_ = mid;
    }
    out_idx[i] =
        (lo_ < n_ref && mk128(rhi[lo_], rlo[lo_]) == key) ? (int32_t)lo_ : -1;
  }
}

// KMC signature (min m-mer norm) for wide k-mers.
void kcf_signatures_wide(const uint64_t* khi, const uint64_t* klo, int64_t n,
                         int32_t k, int32_t m, const uint32_t* norm,
                         uint32_t* out) {
  const u128 mask = ((u128)1 << (2 * m)) - 1;
  for (int64_t i = 0; i < n; ++i) {
    u128 v = mk128(khi[i], klo[i]);
    uint32_t best = 0xFFFFFFFFu;
    for (int32_t t = 0; t <= k - m; ++t) {
      uint32_t mm = (uint32_t)((v >> (2 * (k - m - t))) & mask);
      uint32_t s = norm[mm];
      if (s < best) best = s;
    }
    out[i] = best;
  }
}

// Extract the byte at big-endian byte position j of the low 2*suffix_len
// bits of each wide k-mer (for KMC suffix record emission).
void kcf_wide_suffix_bytes(const uint64_t* khi, const uint64_t* klo,
                           int64_t n, int32_t suf_bytes, uint8_t* out) {
  // out laid out (n, suf_bytes)
  for (int64_t i = 0; i < n; ++i) {
    u128 v = mk128(khi[i], klo[i]);
    for (int32_t j = 0; j < suf_bytes; ++j) {
      out[i * suf_bytes + j] =
          (uint8_t)((v >> (8 * (suf_bytes - 1 - j))) & 0xFF);
    }
  }
}

// Per-group mean with Java's accumulation semantics: a float (f32)
// accumulator += double score (adds in double, narrows to f32 every
// step), then f32 division by the group size
// (reference FindIBS.writeSummaryEntry :248-255).
void kcf_f32_seq_group_mean(const double* scores, const int64_t* group_off,
                            int64_t n_groups, float* out) {
  for (int64_t g = 0; g < n_groups; ++g) {
    float acc = 0.0f;
    for (int64_t i = group_off[g]; i < group_off[g + 1]; ++i)
      acc = (float)((double)acc + scores[i]);
    int64_t cnt = group_off[g + 1] - group_off[g];
    out[g] = cnt ? acc / (float)cnt : 0.0f;
  }
}

// Resumable variant for the streaming findIBS sweep: fold ``n`` scores
// into an existing f32 accumulator with the same Java semantics, so a
// summary block spanning many batches keeps bit-exact means.
float kcf_f32_seq_sum(const double* scores, int64_t n, float init) {
  float acc = init;
  for (int64_t i = 0; i < n; ++i) acc = (float)((double)acc + scores[i]);
  return acc;
}

// 2-bit pack + validity for a byte sequence (ACGT/acgt -> 0..3).
void kcf_encode_bases(const uint8_t* seq, int64_t n, uint8_t* codes,
                      uint8_t* valid) {
  static uint8_t code_lut[256];
  static uint8_t valid_lut[256];
  static bool init = false;
  if (!init) {
    std::memset(code_lut, 0, sizeof(code_lut));
    std::memset(valid_lut, 0, sizeof(valid_lut));
    const char* b = "ACGT";
    for (int i = 0; i < 4; ++i) {
      code_lut[static_cast<uint8_t>(b[i])] = static_cast<uint8_t>(i);
      code_lut[static_cast<uint8_t>(b[i] + 32)] = static_cast<uint8_t>(i);
      valid_lut[static_cast<uint8_t>(b[i])] = 1;
      valid_lut[static_cast<uint8_t>(b[i] + 32)] = 1;
    }
    init = true;
  }
  for (int64_t i = 0; i < n; ++i) {
    codes[i] = code_lut[seq[i]];
    valid[i] = valid_lut[seq[i]];
  }
}

}  // extern "C"

// ---------------------------------------------------------------------------
// Positional presence-bit pack for the device engine.
//
// The TPU is terrible at random gathers but excellent at long scans, so
// the device-resident scorer uploads PER-POSITION presence bits (one
// bit per k-mer start) instead of per-unique counts, and the positional
// gather happens here at host memory speed: one pass over r_idx turns
// the u8 merge-join output (per unique reference k-mer, exceptions
// carry exact values >= 255) into
//   - out_bits: LSB-first presence bitmap over positions
//               (present = valid k-mer && exact count >= min_count),
//   - cbuf:     per-position u8 count, zeroed where absent (scratch,
//               caller-owned so it is reused across samples),
// and a second pass over windows reduces cbuf into per-window exact
// int64 count sums (the one quantity that genuinely needs 64-bit
// accumulation, so it stays on the host). Semantics match the fused
// scan / Plugins/GetVariants.java:219-261 count handling.
namespace {

void posbits_block_scalar(const uint8_t* counts, const int32_t* exc_idx,
                          const uint32_t* exc_val, int64_t n_exc,
                          const int32_t* r_idx, uint32_t min_count,
                          int64_t p0, int64_t p1, uint8_t* bits,
                          uint8_t* cbuf, std::vector<int64_t>& excpos) {
  for (int64_t p = p0; p < p1; ++p) {
    int32_t r = r_idx[p];
    uint8_t c = (r >= 0) ? counts[r] : 0;
    bool present;
    if (__builtin_expect(c == 255u, 0)) {
      uint32_t exact = exc_value(exc_idx, exc_val, n_exc, r);
      present = exact >= min_count;
      if (present) excpos.push_back(p);
    } else {
      present = (r >= 0) && ((uint32_t)c >= min_count);
    }
    cbuf[p] = present ? c : 0;
    if (present) bits[p >> 3] |= (uint8_t)(1u << (p & 7));
  }
}

#if defined(__x86_64__)
// 16-wide gather + presence compare; blocks are 64-position (8-byte)
// aligned so threads never share an output byte. min_count <= 255 only
// (saturated-255 implies exact >= 255 >= min_count, so the u8 compare
// is exact for presence; count fixup rides excpos).
__attribute__((target("avx512f,avx512bw,avx512vl")))
void posbits_block_simd(const uint8_t* counts, int64_t n_counts,
                        const int32_t* r_idx, uint32_t min_count,
                        int64_t p0, int64_t p1, uint8_t* bits,
                        uint8_t* cbuf, std::vector<int64_t>& excpos) {
  const __m512i zero = _mm512_setzero_si512();
  const __m512i ffm = _mm512_set1_epi32(0xFF);
  const __m512i cap = _mm512_set1_epi32((int)(n_counts - 4));
  const __m128i v255 = _mm_set1_epi8((char)0xFF);
  const __m128i mc = _mm_set1_epi8((char)(uint8_t)min_count);
  constexpr int64_t PF = 48;  // gather-target prefetch distance
  int64_t p = p0;
  for (; p + 16 <= p1; p += 16) {
    if (p + PF + 16 <= p1) {
      // hide the L3 latency of the next-but-two gather's random reads
      for (int l = 0; l < 16; l += 2) {
        int32_t r = r_idx[p + PF + l];
        if (r >= 0) __builtin_prefetch(counts + r, 0, 1);
      }
    }
    __m512i ri = _mm512_loadu_si512(r_idx + p);
    __mmask16 valid = _mm512_cmpge_epi32_mask(ri, zero);
    __mmask16 ok = valid & _mm512_cmple_epi32_mask(ri, cap);
    __m128i bytes;
    if (__builtin_expect(ok == valid, 1)) {
      __m512i g = _mm512_mask_i32gather_epi32(zero, valid, ri, counts, 1);
      bytes = _mm512_cvtepi32_epi8(_mm512_and_si512(g, ffm));
    } else {
      alignas(16) uint8_t tmp[16];
      for (int l = 0; l < 16; ++l) {
        int32_t r = r_idx[p + l];
        tmp[l] = (r >= 0) ? counts[r] : 0;
      }
      bytes = _mm_load_si128((const __m128i*)tmp);
    }
    __mmask16 present =
        valid & _mm_cmpge_epu8_mask(bytes, mc);
    _mm_storeu_si128((__m128i*)(cbuf + p),
                     _mm_maskz_mov_epi8(present, bytes));
    uint16_t pb = (uint16_t)present;
    std::memcpy(bits + (p >> 3), &pb, 2);
    uint16_t is255 = (uint16_t)(_mm_cmpeq_epi8_mask(bytes, v255) & present);
    while (__builtin_expect(is255 != 0, 0)) {
      int l = __builtin_ctz(is255);
      is255 &= (uint16_t)(is255 - 1);
      excpos.push_back(p + l);
    }
  }
  for (; p < p1; ++p) {
    int32_t r = r_idx[p];
    uint8_t c = (r >= 0) ? counts[r] : 0;
    bool present = (r >= 0) && ((uint32_t)c >= min_count);
    cbuf[p] = present ? c : 0;
    if (present) {
      bits[p >> 3] |= (uint8_t)(1u << (p & 7));
      if (c == 255u) excpos.push_back(p);
    }
  }
}

__attribute__((target("avx512f,avx512bw,avx512vl")))
int64_t sum_bytes_simd(const uint8_t* buf, int64_t s, int64_t hi) {
  __m512i acc = _mm512_setzero_si512();
  const __m512i zero = _mm512_setzero_si512();
  int64_t p = s;
  for (; p + 64 <= hi + 1; p += 64) {
    __m512i v = _mm512_loadu_si512(buf + p);
    acc = _mm512_add_epi64(acc, _mm512_sad_epu8(v, zero));
  }
  if (p <= hi) {
    __mmask64 m = (~0ull) >> (63 - (hi - p));
    __m512i v = _mm512_maskz_loadu_epi8(m, buf + p);
    acc = _mm512_add_epi64(acc, _mm512_sad_epu8(v, zero));
  }
  alignas(64) uint64_t lanes[8];
  _mm512_store_si512(lanes, acc);
  int64_t total = 0;
  for (int l = 0; l < 8; ++l) total += (int64_t)lanes[l];
  return total;
}
#endif  // __x86_64__

void posbits_windows_range(const uint8_t* cbuf, int64_t n_pos,
                           const int32_t* exc_idx, const uint32_t* exc_val,
                           int64_t n_exc, const int32_t* r_idx,
                           const std::vector<int64_t>& excpos, bool simd,
                           const int32_t* w_start, const int32_t* w_hi,
                           int64_t w_lo, int64_t w_end, int64_t* out_cnt) {
  for (int64_t w = w_lo; w < w_end; ++w) {
    int64_t s = w_start[w];
    int64_t hi = w_hi[w];
    if (hi >= n_pos) hi = n_pos - 1;
    if (hi < s) {
      out_cnt[w] = 0;
      continue;
    }
    int64_t cnt;
#if defined(__x86_64__)
    if (simd) {
      cnt = sum_bytes_simd(cbuf, s, hi);
    } else
#endif
    {
      cnt = 0;
      for (int64_t p = s; p <= hi; ++p) cnt += cbuf[p];
    }
    if (__builtin_expect(!excpos.empty(), 0)) {
      auto it = std::lower_bound(excpos.begin(), excpos.end(), s);
      for (; it != excpos.end() && *it <= hi; ++it) {
        uint32_t exact = exc_value(exc_idx, exc_val, n_exc, r_idx[*it]);
        cnt += (int64_t)exact - 255;
      }
    }
    out_cnt[w] = cnt;
  }
}

}  // namespace

extern "C" {

void kcf_pack_posbits(const uint8_t* counts, int64_t n_counts,
                      const int32_t* exc_idx, const uint32_t* exc_val,
                      int64_t n_exc, const int32_t* r_idx, int64_t n_pos,
                      uint32_t min_count, const int32_t* w_start,
                      const int32_t* w_hi, int64_t n_win, uint8_t* out_bits,
                      int64_t n_bits_bytes, uint8_t* cbuf,
                      int64_t* out_cnt) {
  std::memset(out_bits, 0, (size_t)n_bits_bytes);
#if defined(__x86_64__)
  bool simd = cpu_simd_merge() && min_count <= 255u && n_counts >= 8;
#else
  bool simd = false;
#endif
  // pass 1: positional gather -> presence bits + zero-masked counts,
  // split over 64-position-aligned blocks (threads never share a byte)
  int n_threads = pick_threads(n_pos, 1 << 18);
  int64_t blocks = (n_pos + 63) / 64;
  std::vector<std::vector<int64_t>> t_exc((size_t)std::max(n_threads, 1));
  auto run1 = [&](int t, int64_t b0, int64_t b1) {
    int64_t p0 = b0 * 64;
    int64_t p1 = std::min(n_pos, b1 * 64);
    if (p0 >= p1) return;
#if defined(__x86_64__)
    if (simd) {
      posbits_block_simd(counts, n_counts, r_idx, min_count, p0, p1,
                         out_bits, cbuf, t_exc[t]);
      // saturated-255 presence needs no exact compare, but counts do:
      // replace is handled via excpos in pass 2
      return;
    }
#endif
    posbits_block_scalar(counts, exc_idx, exc_val, n_exc, r_idx, min_count,
                         p0, p1, out_bits, cbuf, t_exc[t]);
  };
  if (n_threads <= 1) {
    run1(0, 0, blocks);
  } else {
    int64_t step = (blocks + n_threads - 1) / n_threads;
    std::vector<std::thread> workers;
    for (int t = 0; t < n_threads; ++t) {
      int64_t b0 = t * step;
      int64_t b1 = std::min(blocks, b0 + step);
      if (b0 >= b1) break;
      workers.emplace_back(run1, t, b0, b1);
    }
    for (auto& w : workers) w.join();
  }
  // thread ranges are contiguous and ordered -> concatenation is sorted
  std::vector<int64_t> excpos;
  for (auto& v : t_exc) excpos.insert(excpos.end(), v.begin(), v.end());

  // pass 2: per-window exact count sums over the zero-masked buffer
  int n_threads2 = pick_threads(n_win, 8);
  if (n_threads2 <= 1 || n_win < 8) {
    posbits_windows_range(cbuf, n_pos, exc_idx, exc_val, n_exc, r_idx,
                          excpos, simd, w_start, w_hi, 0, n_win, out_cnt);
    return;
  }
  std::vector<std::thread> workers;
  int64_t step = (n_win + n_threads2 - 1) / n_threads2;
  for (int t = 0; t < n_threads2; ++t) {
    int64_t lo = t * step;
    int64_t hi = std::min(n_win, lo + step);
    if (lo >= hi) break;
    workers.emplace_back(posbits_windows_range, cbuf, n_pos, exc_idx,
                         exc_val, n_exc, r_idx, std::cref(excpos), simd,
                         w_start, w_hi, lo, hi, out_cnt);
  }
  for (auto& w : workers) w.join();
}

// ---------------------------------------------------------------------------
// Compact absent-run uplink for the device engine.
//
// The tunnel-attached device pays ~tens of ms of latency per execution
// AND ~tens of MB/s of wire bandwidth, so the cheapest payload wins:
// instead of a 1-bit-per-position presence bitmap (n/8 bytes), ship the
// RUNS of absent positions as a (delta, length) u8 stream - typically
// ~25x smaller at percent-level variation rates. The device
// reconstructs per-position presence with one scatter + one prefix
// scan (engine/device_prefix.py::_score_runs) and feeds the same scan
// pipeline, so per-sample results stay bit-identical to the host
// engine (Plugins/GetVariants.java:202-261 semantics).
//
// Emission rule: a run is a maximal stretch of consecutive positions
// with no PRESENT position inside, trimmed to its first/last
// valid-but-absent position; stretches containing no valid-absent
// position (pure N-region / slab padding) emit nothing. Trimmed-away
// and skipped positions are invalid, and the device masks presence
// with the static valid bitmap, so any absent-value there is
// irrelevant. Encoding: delta = gap from the previous run's end (u8,
// 255-saturated with (255,0) fillers), length u8 (255-saturated with
// (0,255) continuations). Returns the entry count, or -1 when ``cap``
// would overflow (caller falls back to the bitmap payload).
// Delta-encode one run [s, e) into the (delta u8, length u8) stream
// with (255, 0) gap fillers and (0, 255) length continuations; shared
// by kcf_bits_to_runs and kcf_pack_runs_fused. false = cap overflow.
static bool runenc_emit(uint8_t* out_d, uint8_t* out_l, int64_t cap,
                        int64_t* k, int64_t* prev_end, int64_t s,
                        int64_t e) {
  int64_t d = s - *prev_end;
  while (d > 255) {
    if (*k >= cap) return false;
    out_d[*k] = 255;
    out_l[*k] = 0;
    ++*k;
    d -= 255;
  }
  int64_t len = e - s;
  int64_t take = len < 255 ? len : 255;
  if (*k >= cap) return false;
  out_d[*k] = (uint8_t)d;
  out_l[*k] = (uint8_t)take;
  ++*k;
  len -= take;
  while (len > 0) {
    take = len < 255 ? len : 255;
    if (*k >= cap) return false;
    out_d[*k] = 0;
    out_l[*k] = (uint8_t)take;
    ++*k;
    len -= take;
  }
  *prev_end = e;
  return true;
}

int64_t kcf_bits_to_runs(const uint8_t* present_bits,
                         const uint8_t* valid_bits, int64_t n_pos,
                         uint8_t* out_d, uint8_t* out_l, int64_t cap) {
  int64_t n_words = (n_pos + 63) / 64;
  int64_t k = 0;
  int64_t prev_end = 0;   // end (exclusive) of the last emitted run
  int64_t first_av = -1;  // first valid-absent since the last present
  int64_t last_av = -1;   // last valid-absent since the last present
  auto emit = [&](int64_t s, int64_t e) {
    return runenc_emit(out_d, out_l, cap, &k, &prev_end, s, e);
  };
  // Transition-driven scan: per word, the not-present stretches'
  // edges are ~(runs/word) bits, so the inner ctz loop touches only
  // stretch boundaries + valid-absent endpoints - O(runs), not
  // O(positions) (the all-present fast path skips most words whole).
  for (int64_t w = 0; w < n_words; ++w) {
    uint64_t pr = 0, vv = 0;
    int64_t nb = (w == n_words - 1) ? (n_pos + 7) / 8 - w * 8 : 8;
    std::memcpy(&pr, present_bits + w * 8, (size_t)nb);
    std::memcpy(&vv, valid_bits + w * 8, (size_t)nb);
    uint64_t av = vv & ~pr;
    if (w == n_words - 1 && (n_pos & 63)) {
      uint64_t mask = (~0ull) >> (64 - (n_pos & 63));
      pr &= mask;
      av &= mask;
    }
    int64_t base = w * 64;
    if (av == 0) {
      // no valid-absent here; the first present bit closes an open
      // trimmed group
      if (first_av >= 0 && pr) {
        if (!emit(first_av, last_av + 1)) return -1;
        first_av = last_av = -1;
      }
      continue;
    }
    if (pr == 0) {
      // no present bit: the whole word extends the open group; only
      // its first/last valid-absent matter
      if (first_av < 0) first_av = base + __builtin_ctzll(av);
      last_av = base + 63 - __builtin_clzll(av);
      continue;
    }
    // mixed word: walk present↔not-present boundaries only
    int b = 0;
    while (b < 64) {
      uint64_t tail = ~pr >> b;  // not-present from b upward
      if (pr & (1ull << b)) {
        // skip the present stretch; it closes any open group
        if (first_av >= 0) {
          if (!emit(first_av, last_av + 1)) return -1;
          first_av = last_av = -1;
        }
        if (tail == 0) break;  // present to end of word
        b += __builtin_ctzll(tail);
        continue;
      }
      // not-present stretch [b, b+len)
      uint64_t prt = pr >> b;
      int len = prt ? __builtin_ctzll(prt) : 64 - b;
      uint64_t seg = av >> b;
      if (len < 64) seg &= (1ull << len) - 1;
      if (seg) {
        int64_t f = base + b + __builtin_ctzll(seg);
        if (first_av < 0) first_av = f;
        last_av = base + b + 63 - __builtin_clzll(seg);
      }
      b += len;
    }
  }
  if (first_av >= 0 && !emit(first_av, last_av + 1)) return -1;
  return k;
}

// ---------------------------------------------------------------------------
// Fused single-pass uplink pack: one walk over positions gathers each
// k-mer's exact count from the u8 merge output (exceptions inline),
// emits the trimmed absent-run stream AND accumulates exact per-window
// int64 count sums - replacing the pack_posbits two-pass + bits_to_runs
// pipeline with one pass at the cost of the single irreducible random
// gather. Requires windows sorted and non-overlapping in k-mer-start
// space (tiling mode and most feature layouts); returns -2 otherwise
// so the caller can fall back, -1 when ``cap`` overflows.
struct FusedRunsOut {
  std::vector<std::pair<int64_t, int64_t>> groups;  // [start, end)
  int64_t first_present = INT64_MAX;
  bool tail_open = false;
};

struct FusedState {
  int64_t w;
  int64_t first_av = -1, last_av = -1;
};

static void fused_runs_scalar(const uint8_t* counts,
                              const int32_t* exc_idx,
                              const uint32_t* exc_val, int64_t n_exc,
                              const int32_t* r_idx, int64_t a, int64_t b,
                              int64_t p_end, uint32_t min_count,
                              const int32_t* w_start, const int32_t* w_hi,
                              int64_t w1, int64_t* out_cnt,
                              FusedRunsOut* out, FusedState& s) {
  constexpr int64_t PF = 48;  // gather-target prefetch distance
  for (int64_t p = a; p < b; ++p) {
    if (p + PF < p_end) {
      int32_t rp = r_idx[p + PF];
      if (rp >= 0) __builtin_prefetch(counts + rp, 0, 1);
    }
    int32_t r = r_idx[p];
    if (r < 0) continue;  // invalid: trimmed/masked either way
    uint32_t c = counts[r];
    if (__builtin_expect(c == 255u, 0))
      c = exc_value(exc_idx, exc_val, n_exc, r);
    if (c >= min_count) {  // present
      if (out->first_present == INT64_MAX) out->first_present = p;
      if (s.first_av >= 0) {
        out->groups.emplace_back(s.first_av, s.last_av + 1);
        s.first_av = -1;
      }
      while (s.w < w1 && p > (int64_t)w_hi[s.w]) ++s.w;
      if (s.w < w1 && p >= (int64_t)w_start[s.w])
        out_cnt[s.w] += (int64_t)c;
    } else {  // valid-absent
      if (s.first_av < 0) s.first_av = p;
      s.last_av = p;
    }
  }
}

#if defined(__x86_64__)
// 16-wide block driver: one gather per 16 positions (prefetched), run
// transitions walked on 16-bit masks, window sums via one masked SAD
// per fully-in-window block (sparse scalar fixups for >=255 counts
// and window-straddling blocks). min_count <= 255 only - the u8
// compare is exact for presence then (saturated 255 implies
// exact >= 255 >= min_count).
__attribute__((target("avx512f,avx512bw,avx512vl")))
static void fused_runs_simd(const uint8_t* counts, int64_t n_counts,
                            const int32_t* exc_idx,
                            const uint32_t* exc_val, int64_t n_exc,
                            const int32_t* r_idx, int64_t p0, int64_t p1,
                            uint32_t min_count, const int32_t* w_start,
                            const int32_t* w_hi, int64_t w1,
                            int64_t* out_cnt, FusedRunsOut* out,
                            FusedState& s) {
  const __m512i zero = _mm512_setzero_si512();
  const __m512i cap32 = _mm512_set1_epi32((int)(n_counts - 4));
  const __m128i v255 = _mm_set1_epi8((char)0xFF);
  const __m128i mc = _mm_set1_epi8((char)(uint8_t)min_count);
  constexpr int64_t PF = 48;
  int64_t p = p0;
  for (; p + 16 <= p1; p += 16) {
    if (p + PF + 16 <= p1) {
      for (int l = 0; l < 16; l += 2) {
        int32_t rp = r_idx[p + PF + l];
        if (rp >= 0) __builtin_prefetch(counts + rp, 0, 1);
      }
    }
    __m512i ri = _mm512_loadu_si512(r_idx + p);
    __mmask16 valid = _mm512_cmpge_epi32_mask(ri, zero);
    __mmask16 ok = valid & _mm512_cmple_epi32_mask(ri, cap32);
    __m128i bytes;
    if (__builtin_expect(ok == valid, 1)) {
      __m512i g = _mm512_mask_i32gather_epi32(zero, valid, ri, counts, 1);
      bytes = _mm512_cvtepi32_epi8(
          _mm512_and_si512(g, _mm512_set1_epi32(0xFF)));
    } else {
      alignas(16) uint8_t tmp[16];
      for (int l = 0; l < 16; ++l) {
        int32_t r = r_idx[p + l];
        tmp[l] = (r >= 0) ? counts[r] : 0;
      }
      bytes = _mm_load_si128((const __m128i*)tmp);
    }
    uint32_t pr = (uint32_t)(valid & _mm_cmpge_epu8_mask(bytes, mc));
    uint32_t av = (uint32_t)valid & ~pr & 0xFFFFu;
    // run transitions on the 16-bit masks
    if (av == 0) {
      if (s.first_av >= 0 && pr) {
        out->groups.emplace_back(s.first_av, s.last_av + 1);
        s.first_av = -1;
      }
    } else if (pr == 0) {
      if (s.first_av < 0) s.first_av = p + __builtin_ctz(av);
      s.last_av = p + 31 - __builtin_clz(av);
    } else {
      int b = 0;
      while (b < 16) {
        uint32_t tail = (~pr >> b) & (0xFFFFu >> b);
        if (pr & (1u << b)) {
          if (s.first_av >= 0) {
            out->groups.emplace_back(s.first_av, s.last_av + 1);
            s.first_av = -1;
          }
          if (tail == 0) break;
          b += __builtin_ctz(tail);
          continue;
        }
        uint32_t prt = pr >> b;
        int len = prt ? __builtin_ctz(prt) : 16 - b;
        uint32_t seg = (av >> b) & ((1u << len) - 1u);
        if (seg) {
          if (s.first_av < 0) s.first_av = p + b + __builtin_ctz(seg);
          s.last_av = p + b + 31 - __builtin_clz(seg);
        }
        b += len;
      }
    }
    if (pr) {
      if (out->first_present == INT64_MAX)
        out->first_present = p + __builtin_ctz(pr);
      uint32_t is255 =
          (uint32_t)(_mm_cmpeq_epi8_mask(bytes, v255)) & pr;
      while (s.w < w1 && p > (int64_t)w_hi[s.w]) ++s.w;
      if (s.w < w1 && p >= (int64_t)w_start[s.w] &&
          p + 15 <= (int64_t)w_hi[s.w]) {
        // block fully inside the current window: one masked SAD
        __m128i masked = _mm_maskz_mov_epi8((__mmask16)pr, bytes);
        __m128i sad = _mm_sad_epu8(masked, _mm_setzero_si128());
        out_cnt[s.w] += (int64_t)_mm_extract_epi64(sad, 0) +
                        (int64_t)_mm_extract_epi64(sad, 1);
        while (__builtin_expect(is255 != 0, 0)) {
          int l = __builtin_ctz(is255);
          is255 &= is255 - 1;
          uint32_t exact =
              exc_value(exc_idx, exc_val, n_exc, r_idx[p + l]);
          out_cnt[s.w] += (int64_t)exact - 255;
        }
      } else {
        // window boundary inside the block: per-lane scalar
        uint32_t rest = pr;
        while (rest) {
          int l = __builtin_ctz(rest);
          rest &= rest - 1;
          int64_t pp = p + l;
          while (s.w < w1 && pp > (int64_t)w_hi[s.w]) ++s.w;
          if (s.w < w1 && pp >= (int64_t)w_start[s.w]) {
            alignas(16) uint8_t tmp[16];
            _mm_store_si128((__m128i*)tmp, bytes);
            uint32_t c = tmp[l];
            if (__builtin_expect(c == 255u, 0))
              c = exc_value(exc_idx, exc_val, n_exc, r_idx[pp]);
            out_cnt[s.w] += (int64_t)c;
          }
        }
      }
    }
  }
  if (p < p1)
    fused_runs_scalar(counts, exc_idx, exc_val, n_exc, r_idx, p, p1, p1,
                      min_count, w_start, w_hi, w1, out_cnt, out, s);
}
#endif  // __x86_64__

static void fused_runs_range(const uint8_t* counts, int64_t n_counts,
                             const int32_t* exc_idx,
                             const uint32_t* exc_val, int64_t n_exc,
                             const int32_t* r_idx, int64_t p0, int64_t p1,
                             uint32_t min_count, const int32_t* w_start,
                             const int32_t* w_hi, int64_t w0, int64_t w1,
                             int64_t* out_cnt, FusedRunsOut* out) {
  FusedState s;
  s.w = w0;
#if defined(__x86_64__)
  if (cpu_simd_merge() && min_count >= 1 && min_count <= 255u &&
      n_counts >= 8) {
    fused_runs_simd(counts, n_counts, exc_idx, exc_val, n_exc, r_idx, p0,
                    p1, min_count, w_start, w_hi, w1, out_cnt, out, s);
  } else
#endif
  {
    fused_runs_scalar(counts, exc_idx, exc_val, n_exc, r_idx, p0, p1, p1,
                      min_count, w_start, w_hi, w1, out_cnt, out, s);
  }
  if (s.first_av >= 0) {
    out->groups.emplace_back(s.first_av, s.last_av + 1);
    out->tail_open = true;
  }
}

int64_t kcf_pack_runs_fused(const uint8_t* counts, int64_t n_counts,
                            const int32_t* exc_idx,
                            const uint32_t* exc_val, int64_t n_exc,
                            const int32_t* r_idx, int64_t n_pos,
                            uint32_t min_count, const int32_t* w_start,
                            const int32_t* w_hi, int64_t n_win,
                            uint8_t* out_d, uint8_t* out_l, int64_t cap,
                            int64_t* out_cnt) {
  for (int64_t i = 0; i < n_win; ++i) {
    out_cnt[i] = 0;
    if (i + 1 < n_win &&
        ((int64_t)w_start[i + 1] <= (int64_t)w_hi[i] ||
         w_start[i + 1] < w_start[i]))
      return -2;  // overlapping/unsorted windows: caller falls back
  }
  int T = pick_threads(n_pos, 1 << 18);
  if (T > 1 && n_win < 2 * T) T = 1;  // window-aligned splits need slack
  std::vector<FusedRunsOut> outs((size_t)T);
  if (T == 1) {
    fused_runs_range(counts, n_counts, exc_idx, exc_val, n_exc, r_idx, 0,
                     n_pos, min_count, w_start, w_hi, 0, n_win, out_cnt,
                     &outs[0]);
  } else {
    // split position ranges AT WINDOW STARTS so threads own disjoint
    // window index ranges (no shared count_sum cells)
    std::vector<std::thread> ws;
    int64_t w_step = (n_win + T - 1) / T;
    for (int t = 0; t < T; ++t) {
      int64_t wa = t * w_step;
      // ceil-division can leave trailing chunks empty (e.g. n_win=33,
      // T=16 -> w_step=3 -> t=11 starts at 33); reading w_start[wa]
      // there is out of bounds and would rescan from position 0,
      // duplicating every group. Unspawned outs stay empty and the
      // stitch loop skips them.
      if (wa >= n_win) break;
      int64_t wb = std::min<int64_t>(n_win, wa + w_step);
      int64_t pa = (t == 0) ? 0 : (int64_t)w_start[wa];
      int64_t pb = (t == T - 1 || wb >= n_win) ? n_pos
                                               : (int64_t)w_start[wb];
      ws.emplace_back(fused_runs_range, counts, n_counts, exc_idx,
                      exc_val, n_exc, r_idx, pa, pb, min_count, w_start,
                      w_hi, wa, wb, out_cnt, &outs[t]);
    }
    for (auto& th : ws) th.join();
  }
  // stitch thread outputs (a group straddling a split boundary merges
  // when no present position separates the pieces) + delta-encode
  int64_t k = 0, prev_end = 0;
  int64_t cs = -1, ce = -1;  // carry group
  for (int t = 0; t < T; ++t) {
    FusedRunsOut& o = outs[t];
    if (o.groups.empty()) {
      if (o.first_present != INT64_MAX && cs >= 0) {
        if (!runenc_emit(out_d, out_l, cap, &k, &prev_end, cs, ce))
          return -1;
        cs = -1;
      }
      continue;
    }
    bool head_open = o.groups[0].first < o.first_present;
    if (cs >= 0) {
      if (head_open) {
        o.groups[0].first = cs;  // merge across the boundary
      } else if (!runenc_emit(out_d, out_l, cap, &k, &prev_end, cs, ce)) {
        return -1;
      }
      cs = -1;
    }
    size_t ng = o.groups.size();
    for (size_t g = 0; g + 1 < ng; ++g) {
      if (!runenc_emit(out_d, out_l, cap, &k, &prev_end,
                       o.groups[g].first, o.groups[g].second))
        return -1;
    }
    if (o.tail_open) {
      cs = o.groups[ng - 1].first;
      ce = o.groups[ng - 1].second;
    } else if (!runenc_emit(out_d, out_l, cap, &k, &prev_end,
                            o.groups[ng - 1].first,
                            o.groups[ng - 1].second)) {
      return -1;
    }
  }
  if (cs >= 0 && !runenc_emit(out_d, out_l, cap, &k, &prev_end, cs, ce))
    return -1;
  return k;
}

// ---------------------------------------------------------------------------
// Ordinal-space presence pack: build one sample's positional presence
// bitmap and per-window count-sum CORRECTIONS with NO random gather
// into the merge output. The per-sample random positional gather
// (u8[r_idx[p]], the dominant cost of kcf_pack_runs_fused and of
// window_scan pass A) is replaced by sequential streams over static
// per-slab occurrence arrays sorted by reference ordinal:
//
//   occ_ord[o]  ordinal of the o-th occurrence (non-decreasing)
//   occ_pos[o]  its slab position
//
// Reading counts[occ_ord[o]] is then a non-decreasing (cache-resident)
// access, absent occurrences scatter single bits into an L2-resident
// bitmap, and exact count sums decompose as
//     count_sum[w] = observed[w] + sum_{present p in w} (count_p - 1)
// so the correction accumulates only for counts != 1 (rare for
// assembly-derived KMC DBs) - observed comes later from the presence
// stats (host bit walk or the device program). Semantics replaced:
// Plugins/GetVariants.java:202-261's per-k-mer count lookup.
//
// Window mapping (for corrections) requires sorted, non-overlapping
// windows: uniform tiling when uni_stride > 0 (w_start[i] must equal
// uni_base + i*uni_stride), else binary search. out_present receives
// valid & ~absent (LSB-first, zeroed + rebuilt here); out_corr is
// (n_win) int64, zeroed here.
static void ordpack_range(const uint8_t* counts, const int32_t* exc_idx,
                          const uint32_t* exc_val, int64_t n_exc,
                          const int32_t* occ_ord, const int32_t* occ_pos,
                          int64_t o0, int64_t o1, uint32_t min_count,
                          const int32_t* w_start, const int32_t* w_hi,
                          int64_t n_win, int64_t uni_base,
                          int64_t uni_stride, uint8_t* absent,
                          int64_t* corr) {
  // exceptions pointer: ordinals are non-decreasing in [o0, o1)
  int64_t e = 0;
  if (o0 < o1) {
    int32_t first = occ_ord[o0];
    int64_t lo = 0, hi = n_exc;
    while (lo < hi) {
      int64_t mid = (lo + hi) >> 1;
      if (exc_idx[mid] < first)
        lo = mid + 1;
      else
        hi = mid;
    }
    e = lo;
  }
  for (int64_t o = o0; o < o1; ++o) {
    int32_t r = occ_ord[o];
    uint32_t c = counts[r];
    if (__builtin_expect(c == 255u, 0)) {
      while (e < n_exc && exc_idx[e] < r) ++e;
      if (e < n_exc && exc_idx[e] == r) c = exc_val[e];
    }
    int64_t p = occ_pos[o];
    if (c < min_count) {
      absent[p >> 3] |= (uint8_t)(1u << (p & 7));
      continue;
    }
    if (__builtin_expect(c != 1u, 0)) {
      int64_t w;
      if (uni_stride > 0) {
        w = (p - uni_base) / uni_stride;
        if (w < 0 || w >= n_win || p > (int64_t)w_hi[w] ||
            p < (int64_t)w_start[w])
          continue;
      } else {
        int64_t lo = 0, hi = n_win;
        while (lo < hi) {
          int64_t mid = (lo + hi) >> 1;
          if ((int64_t)w_start[mid] <= p)
            lo = mid + 1;
          else
            hi = mid;
        }
        w = lo - 1;
        if (w < 0 || p > (int64_t)w_hi[w]) continue;
      }
      corr[w] += (int64_t)c - 1;
    }
  }
}

#if defined(__x86_64__)
// 16-lane ordpack: gather counts at the (non-decreasing, cache-hot)
// ordinals, compare once, and fall to scalar work ONLY for absent
// lanes (bit scatter), count!=1 lanes (window correction) and
// saturated-255 lanes (exception resolve) - the all-present-count-1
// common case costs a handful of instructions per 16 occurrences.
__attribute__((target("avx512f,avx512bw,avx512vl")))
static void ordpack_range_simd(const uint8_t* counts, int64_t n_ref,
                               const int32_t* exc_idx,
                               const uint32_t* exc_val, int64_t n_exc,
                               const int32_t* occ_ord,
                               const int32_t* occ_pos, int64_t o0,
                               int64_t o1, uint32_t min_count,
                               const int32_t* w_start, const int32_t* w_hi,
                               int64_t n_win, int64_t uni_base,
                               int64_t uni_stride, uint8_t* absent,
                               int64_t* corr) {
  int64_t e = 0;  // exceptions pointer (ordinals non-decreasing)
  if (o0 < o1) {
    int32_t first = occ_ord[o0];
    int64_t lo = 0, hi = n_exc;
    while (lo < hi) {
      int64_t mid = (lo + hi) >> 1;
      if (exc_idx[mid] < first)
        lo = mid + 1;
      else
        hi = mid;
    }
    e = lo;
  }
  auto window_of = [&](int64_t p) -> int64_t {
    if (uni_stride > 0) {
      int64_t w = (p - uni_base) / uni_stride;
      if (w < 0 || w >= n_win || p > (int64_t)w_hi[w] ||
          p < (int64_t)w_start[w])
        return -1;
      return w;
    }
    int64_t lo = 0, hi = n_win;
    while (lo < hi) {
      int64_t mid = (lo + hi) >> 1;
      if ((int64_t)w_start[mid] <= p)
        lo = mid + 1;
      else
        hi = mid;
    }
    int64_t w = lo - 1;
    return (w >= 0 && p <= (int64_t)w_hi[w]) ? w : -1;
  };
  const __m512i ffm = _mm512_set1_epi32(0xFF);
  const __m512i onev = _mm512_set1_epi32(1);
  const __m512i capv = _mm512_set1_epi32((int)(n_ref - 4));
  const __m512i v255 = _mm512_set1_epi32(255);
  uint32_t mc = min_count > 255u ? 256u : min_count;  // lane filter
  const __m512i minv = _mm512_set1_epi32((int)mc);
  int64_t o = o0;
  for (; o + 16 <= o1; o += 16) {
    __m512i ov = _mm512_loadu_si512(occ_ord + o);
    __mmask16 inb = _mm512_cmple_epi32_mask(ov, capv);
    __m512i c32;
    if (__builtin_expect(inb == 0xFFFF, 1)) {
      c32 = _mm512_and_si512(_mm512_i32gather_epi32(ov, counts, 1), ffm);
    } else {
      alignas(64) int32_t tmp[16];
      for (int l = 0; l < 16; ++l) tmp[l] = counts[occ_ord[o + l]];
      c32 = _mm512_load_si512(tmp);
    }
    __mmask16 m255 = _mm512_cmpeq_epi32_mask(c32, v255);
    __mmask16 handled = 0;
    if (__builtin_expect(m255 != 0 && (n_exc > 0 || min_count > 255u),
                         0)) {
      handled = m255;
      // resolve saturated lanes exactly (sorted walk), then redo the
      // comparisons scalar for those lanes
      alignas(64) int32_t cs[16];
      _mm512_store_si512(cs, c32);
      uint32_t mm = m255;
      while (mm) {
        int l = __builtin_ctz(mm);
        mm &= mm - 1;
        int32_t r = occ_ord[o + l];
        while (e < n_exc && exc_idx[e] < r) ++e;
        uint32_t c = (e < n_exc && exc_idx[e] == r) ? exc_val[e] : 255u;
        int64_t p = occ_pos[o + l];
        if (c < min_count) {
          absent[p >> 3] |= (uint8_t)(1u << (p & 7));
        } else if (c != 1u) {
          int64_t w = window_of(p);
          if (w >= 0) corr[w] += (int64_t)c - 1;
        }
      }
      // non-255 lanes continue below with the resolved lanes masked
    }
    __mmask16 live = (__mmask16)~handled;
    __mmask16 absent_m =
        _mm512_mask_cmplt_epi32_mask(live, c32, minv);
    if (min_count > 255u) absent_m = live;  // nothing <=254 passes
    __mmask16 corr_m = _mm512_mask_cmpneq_epi32_mask(
        (__mmask16)(live & ~absent_m), c32, onev);
    if (__builtin_expect(absent_m != 0, 1)) {
      uint32_t mm = absent_m;
      while (mm) {
        int l = __builtin_ctz(mm);
        mm &= mm - 1;
        int64_t p = occ_pos[o + l];
        absent[p >> 3] |= (uint8_t)(1u << (p & 7));
      }
    }
    if (__builtin_expect(corr_m != 0, 0)) {
      alignas(64) int32_t cs[16];
      _mm512_store_si512(cs, c32);
      uint32_t mm = corr_m;
      while (mm) {
        int l = __builtin_ctz(mm);
        mm &= mm - 1;
        int64_t p = occ_pos[o + l];
        int64_t w = window_of(p);
        if (w >= 0) corr[w] += (int64_t)cs[l] - 1;
      }
    }
  }
  if (o < o1)
    ordpack_range(counts, exc_idx, exc_val, n_exc, occ_ord, occ_pos, o,
                  o1, min_count, w_start, w_hi, n_win, uni_base,
                  uni_stride, absent, corr);
}
#endif  // __x86_64__

#if defined(__x86_64__)
// Segment fast path: within a segment ordinals are CONSECUTIVE
// (ord = ord0 + (o - o0)), so counts load contiguously 64 bytes at a
// time - no gather, no occ_ord stream. Segments come from the static
// map's identity runs (duplicate/missing ordinals break them); the
// caller uses this path only when segments are long on average.
__attribute__((target("avx512f,avx512bw,avx512vl")))
static void ordpack_segs_simd(const uint8_t* counts, int64_t n_ref,
                              const int32_t* exc_idx,
                              const uint32_t* exc_val, int64_t n_exc,
                              const int64_t* seg_off,
                              const int32_t* seg_ord, int64_t n_seg,
                              int64_t o_lo, int64_t o_hi,
                              const int32_t* occ_pos, uint32_t min_count,
                              const int32_t* w_start, const int32_t* w_hi,
                              int64_t n_win, int64_t uni_base,
                              int64_t uni_stride, uint8_t* absent,
                              int64_t* corr) {
  (void)n_ref;
  auto window_of = [&](int64_t p) -> int64_t {
    if (uni_stride > 0) {
      int64_t w = (p - uni_base) / uni_stride;
      if (w < 0 || w >= n_win || p > (int64_t)w_hi[w] ||
          p < (int64_t)w_start[w])
        return -1;
      return w;
    }
    int64_t lo = 0, hi = n_win;
    while (lo < hi) {
      int64_t mid = (lo + hi) >> 1;
      if ((int64_t)w_start[mid] <= p)
        lo = mid + 1;
      else
        hi = mid;
    }
    int64_t w = lo - 1;
    return (w >= 0 && p <= (int64_t)w_hi[w]) ? w : -1;
  };
  int64_t e = 0;
  bool e_init = false;
  uint32_t mc = min_count > 255u ? 255u : min_count;
  const __m512i minv = _mm512_set1_epi8((char)(uint8_t)mc);
  const __m512i onev = _mm512_set1_epi8((char)1);
  const __m512i v255 = _mm512_set1_epi8((char)0xFF);
  // first segment whose occurrence range intersects [o_lo, o_hi)
  int64_t s = 0;
  {
    int64_t lo = 0, hi = n_seg;
    while (lo < hi) {
      int64_t mid = (lo + hi) >> 1;
      if (seg_off[mid] <= o_lo)
        lo = mid + 1;
      else
        hi = mid;
    }
    s = lo > 0 ? lo - 1 : 0;
  }
  for (; s < n_seg && seg_off[s] < o_hi; ++s) {
    int64_t o0 = std::max(seg_off[s], o_lo);
    int64_t o1 = std::min(seg_off[s + 1], o_hi);
    if (o0 >= o1) continue;
    int64_t ord0 = (int64_t)seg_ord[s] + (o0 - seg_off[s]);
    if (!e_init) {
      int64_t lo = 0, hi = n_exc;
      while (lo < hi) {
        int64_t mid = (lo + hi) >> 1;
        if ((int64_t)exc_idx[mid] < ord0)
          lo = mid + 1;
        else
          hi = mid;
      }
      e = lo;
      e_init = true;
    }
    for (int64_t o = o0; o < o1; o += 64) {
      int64_t nb = std::min<int64_t>(64, o1 - o);
      __mmask64 lanes =
          nb == 64 ? ~0ull : ((1ull << nb) - 1u);
      __m512i cv = _mm512_maskz_loadu_epi8(
          lanes, counts + ord0 + (o - o0));
      __mmask64 m255 =
          _mm512_mask_cmpeq_epu8_mask(lanes, cv, v255);
      __mmask64 handled = 0;
      if (__builtin_expect(
              m255 != 0 && (n_exc > 0 || min_count > 255u), 0)) {
        handled = m255;
        uint64_t mm = m255;
        while (mm) {
          int l = __builtin_ctzll(mm);
          mm &= mm - 1;
          int64_t r = ord0 + (o - o0) + l;
          while (e < n_exc && (int64_t)exc_idx[e] < r) ++e;
          uint32_t c =
              (e < n_exc && (int64_t)exc_idx[e] == r) ? exc_val[e] : 255u;
          int64_t p = occ_pos[o + l];
          if (c < min_count) {
            absent[p >> 3] |= (uint8_t)(1u << (p & 7));
          } else if (c != 1u) {
            int64_t w = window_of(p);
            if (w >= 0) corr[w] += (int64_t)c - 1;
          }
        }
      }
      __mmask64 live = lanes & ~handled;
      __mmask64 absent_m =
          min_count > 255u
              ? live
              : _mm512_mask_cmplt_epu8_mask(live, cv, minv);
      uint64_t mm = absent_m;
      while (mm) {
        int l = __builtin_ctzll(mm);
        mm &= mm - 1;
        int64_t p = occ_pos[o + l];
        absent[p >> 3] |= (uint8_t)(1u << (p & 7));
      }
      __mmask64 corr_m = _mm512_mask_cmpneq_epu8_mask(
          live & ~absent_m, cv, onev);
      if (__builtin_expect(corr_m != 0, 0)) {
        alignas(64) uint8_t cs[64];
        _mm512_storeu_si512(cs, cv);
        mm = corr_m;
        while (mm) {
          int l = __builtin_ctzll(mm);
          mm &= mm - 1;
          int64_t p = occ_pos[o + l];
          int64_t w = window_of(p);
          if (w >= 0) corr[w] += (int64_t)cs[l] - 1;
        }
      }
    }
  }
}
#endif  // __x86_64__

static void ordpack_dispatch(const uint8_t* counts, int64_t n_ref,
                             const int32_t* exc_idx,
                             const uint32_t* exc_val, int64_t n_exc,
                             const int32_t* occ_ord,
                             const int32_t* occ_pos,
                             const int64_t* seg_off,
                             const int32_t* seg_ord, int64_t n_seg,
                             int64_t o0, int64_t o1, uint32_t min_count,
                             const int32_t* w_start, const int32_t* w_hi,
                             int64_t n_win, int64_t uni_base,
                             int64_t uni_stride, uint8_t* absent,
                             int64_t* corr) {
#if defined(__x86_64__)
  if (cpu_simd_merge() && n_ref >= 8 && o1 - o0 >= 64) {
    if (n_seg > 0) {
      ordpack_segs_simd(counts, n_ref, exc_idx, exc_val, n_exc, seg_off,
                        seg_ord, n_seg, o0, o1, occ_pos, min_count,
                        w_start, w_hi, n_win, uni_base, uni_stride,
                        absent, corr);
      return;
    }
    ordpack_range_simd(counts, n_ref, exc_idx, exc_val, n_exc, occ_ord,
                       occ_pos, o0, o1, min_count, w_start, w_hi, n_win,
                       uni_base, uni_stride, absent, corr);
    return;
  }
#endif
  (void)seg_off;
  (void)seg_ord;
  (void)n_seg;
  ordpack_range(counts, exc_idx, exc_val, n_exc, occ_ord, occ_pos, o0, o1,
                min_count, w_start, w_hi, n_win, uni_base, uni_stride,
                absent, corr);
}

// seg_off (n_seg + 1 occurrence offsets) / seg_ord (n_seg start
// ordinals) describe the occurrence map's identity runs
// (ord = seg_ord[s] + o - seg_off[s]); when supplied AND long on
// average they replace the gather with contiguous count loads
// (occ_ord is then only needed by the scalar fallback and may be the
// same array). Pass n_seg = 0 to force the gather path.
void kcf_ordpack(const uint8_t* counts, int64_t n_ref,
                 const int32_t* exc_idx, const uint32_t* exc_val,
                 int64_t n_exc, const int32_t* occ_ord,
                 const int32_t* occ_pos, int64_t n_occ, uint32_t min_count,
                 const int32_t* w_start, const int32_t* w_hi, int64_t n_win,
                 int64_t uni_base, int64_t uni_stride,
                 const uint8_t* valid_bits, uint8_t* out_present,
                 int64_t n_bits_bytes, int64_t* out_corr,
                 const int64_t* seg_off, const int32_t* seg_ord,
                 int64_t n_seg) {
  std::memset(out_corr, 0, (size_t)n_win * sizeof(int64_t));
#if defined(__x86_64__)
  if (!(cpu_simd_merge() && n_seg > 0 && seg_off != nullptr &&
        n_occ >= 48 * n_seg))
    n_seg = 0;
#else
  n_seg = 0;
#endif
  int T = pick_threads(n_occ, 1 << 19);
  if (T <= 1) {
    std::memset(out_present, 0, (size_t)n_bits_bytes);
    ordpack_dispatch(counts, n_ref, exc_idx, exc_val, n_exc, occ_ord,
                     occ_pos, seg_off, seg_ord, n_seg, 0, n_occ,
                     min_count, w_start, w_hi, n_win, uni_base,
                     uni_stride, out_present, out_corr);
  } else {
    // private absent bitmaps + correction accumulators; OR/sum-merge
    std::vector<std::vector<uint8_t>> t_abs((size_t)T);
    std::vector<std::vector<int64_t>> t_corr((size_t)T);
    std::vector<std::thread> ws;
    int64_t step = (n_occ + T - 1) / T;
    for (int t = 0; t < T; ++t) {
      int64_t a = t * step, b = std::min(n_occ, a + step);
      if (a >= b) break;
      ws.emplace_back([&, t, a, b]() {
        t_abs[t].assign((size_t)n_bits_bytes, 0);
        t_corr[t].assign((size_t)n_win, 0);
        ordpack_dispatch(counts, n_ref, exc_idx, exc_val, n_exc, occ_ord,
                         occ_pos, seg_off, seg_ord, n_seg, a, b,
                         min_count, w_start, w_hi, n_win, uni_base,
                         uni_stride, t_abs[t].data(), t_corr[t].data());
      });
    }
    for (auto& th : ws) th.join();
    std::memset(out_present, 0, (size_t)n_bits_bytes);
    for (auto& v : t_abs) {
      if (v.empty()) continue;
      uint64_t* dst = (uint64_t*)out_present;
      const uint64_t* src = (const uint64_t*)v.data();
      int64_t nw = n_bits_bytes / 8;
      for (int64_t i = 0; i < nw; ++i) dst[i] |= src[i];
      for (int64_t i = nw * 8; i < n_bits_bytes; ++i)
        out_present[i] |= v[(size_t)i];
    }
    for (auto& v : t_corr) {
      if (v.empty()) continue;
      for (int64_t i = 0; i < n_win; ++i) out_corr[i] += v[(size_t)i];
    }
  }
  // absent -> present: valid & ~absent
  {
    uint64_t* dst = (uint64_t*)out_present;
    const uint64_t* vv = (const uint64_t*)valid_bits;
    int64_t nw = n_bits_bytes / 8;
    for (int64_t i = 0; i < nw; ++i) dst[i] = vv[i] & ~dst[i];
    for (int64_t i = nw * 8; i < n_bits_bytes; ++i)
      out_present[i] = valid_bits[i] & (uint8_t)~out_present[i];
  }
}

// ---------------------------------------------------------------------------
// Streaming-loader shard router: one pass over a decoded KMC slab
// computes each key's owning table shard (top bits of its first bucket
// hash - the shard-local placement of parallel/sharded.py) and
// compacts the keys routed to shards [s_lo, s_hi) into (hi, lo, cnt)
// staging arrays, preserving file order (two-pass per-thread
// count/scatter). Replaces the per-shard numpy selection loop that
// dominated streamed ingest. out_shard (optional) receives each kept
// key's shard id for multi-shard staging passes. Returns the kept
// count. Hash and hi/lo split are bit-identical with
// engine/hashtable.py::bucket_hashes_np and engine/encode.split_hi_lo.
static inline void route_key(uint64_t km, int shift, uint32_t lo_mask,
                             uint32_t nb_mask, uint32_t nb_local,
                             uint32_t* hi, uint32_t* lo, uint32_t* sh) {
  uint32_t h = (uint32_t)(km >> shift);
  uint32_t l = (uint32_t)km & lo_mask;
  *hi = h;
  *lo = l;
  *sh = hash1(h, l, nb_mask) / nb_local;
}

// Occurrence-map build for the ordinal-space pack: counting sort of
// the valid positions of r_idx by ordinal value (two sequential
// passes + one scatter), replacing the generic radix-sort path.
// occ_ord/occ_pos must hold count(r_idx >= 0) entries; n_ref >
// max(r_idx). Returns the occurrence count.
int64_t kcf_build_ordmap(const int32_t* r_idx, int64_t n_pos,
                         int64_t n_ref, int32_t* occ_ord,
                         int32_t* occ_pos) {
  std::vector<int64_t> off((size_t)n_ref + 1, 0);
  for (int64_t p = 0; p < n_pos; ++p) {
    int32_t r = r_idx[p];
    if (r >= 0) ++off[(size_t)r + 1];
  }
  for (int64_t r = 0; r < n_ref; ++r) off[r + 1] += off[r];
  for (int64_t p = 0; p < n_pos; ++p) {
    int32_t r = r_idx[p];
    if (r >= 0) {
      int64_t w = off[r]++;
      occ_ord[w] = r;
      occ_pos[w] = (int32_t)p;
    }
  }
  return off[n_ref];  // untouched by the scatter: the total
}

int64_t kcf_route_shard(const uint64_t* kmers, const uint32_t* counts,
                        int64_t n, int32_t k, uint32_t nb_mask,
                        uint32_t nb_local, int32_t s_lo, int32_t s_hi,
                        uint32_t* out_hi, uint32_t* out_lo,
                        uint32_t* out_cnt, int32_t* out_shard) {
  int n_lo = k > 16 ? k - 16 : 0;
  int shift = 2 * n_lo;
  uint32_t lo_mask =
      n_lo ? (uint32_t)((1ull << (2 * n_lo)) - 1ull) : 0u;
  int T = pick_threads(n, 1 << 19);
  if (T <= 1) {
    int64_t w = 0;
    for (int64_t i = 0; i < n; ++i) {
      uint32_t h, l, sh;
      route_key(kmers[i], shift, lo_mask, nb_mask, nb_local, &h, &l, &sh);
      if ((int32_t)sh >= s_lo && (int32_t)sh < s_hi) {
        out_hi[w] = h;
        out_lo[w] = l;
        out_cnt[w] = counts[i];
        if (out_shard) out_shard[w] = (int32_t)sh;
        ++w;
      }
    }
    return w;
  }
  int64_t step = (n + T - 1) / T;
  std::vector<int64_t> kept((size_t)T, 0);
  {
    std::vector<std::thread> ws;
    for (int t = 0; t < T; ++t) {
      int64_t a = t * step, b = std::min(n, a + step);
      if (a >= b) break;
      ws.emplace_back([&, t, a, b]() {
        int64_t c = 0;
        for (int64_t i = a; i < b; ++i) {
          uint32_t h, l, sh;
          route_key(kmers[i], shift, lo_mask, nb_mask, nb_local, &h, &l,
                    &sh);
          c += ((int32_t)sh >= s_lo && (int32_t)sh < s_hi);
        }
        kept[t] = c;
      });
    }
    for (auto& th : ws) th.join();
  }
  std::vector<int64_t> off((size_t)T + 1, 0);
  for (int t = 0; t < T; ++t) off[t + 1] = off[t] + kept[t];
  {
    std::vector<std::thread> ws;
    for (int t = 0; t < T; ++t) {
      int64_t a = t * step, b = std::min(n, a + step);
      if (a >= b) break;
      ws.emplace_back([&, t, a, b]() {
        int64_t w = off[t];
        for (int64_t i = a; i < b; ++i) {
          uint32_t h, l, sh;
          route_key(kmers[i], shift, lo_mask, nb_mask, nb_local, &h, &l,
                    &sh);
          if ((int32_t)sh >= s_lo && (int32_t)sh < s_hi) {
            out_hi[w] = h;
            out_lo[w] = l;
            out_cnt[w] = counts[i];
            if (out_shard) out_shard[w] = (int32_t)sh;
            ++w;
          }
        }
      });
    }
    for (auto& th : ws) th.join();
  }
  return off[T];
}

// ---------------------------------------------------------------------------
// Window statistics from presence + validity bitmaps: the per-window
// gap-run state machine (Plugins/GetVariants.java:219-251, distance
// correction :267-273) replayed over bit words. Gap lengths count
// VALID absent positions only (invalid k-mers are skipped entirely,
// Fasta.java:97-124 semantics), handled uniformly via popcounts of
// av = valid & ~present between present bits - no scalar fallback for
// N-containing windows. Output field-major int64 (5, n_win):
// observed, variations, inner, left, right (count sums come from
// kcf_ordpack's corrections + observed). Windows may overlap
// (each is walked independently).
static void stats_bits_range(const uint8_t* present_bits,
                             const uint8_t* valid_bits, int64_t n_pos,
                             int32_t k, const int32_t* w_start,
                             const int32_t* w_hi, int64_t w_lo,
                             int64_t w_end, int64_t n_win, int64_t* out) {
  int64_t* o_obs = out;
  int64_t* o_var = out + n_win;
  int64_t* o_inn = out + 2 * n_win;
  int64_t* o_lft = out + 3 * n_win;
  int64_t* o_rgt = out + 4 * n_win;
  for (int64_t w = w_lo; w < w_end; ++w) {
    int64_t s = w_start[w];
    int64_t hi = w_hi[w];
    if (hi >= n_pos) hi = n_pos - 1;
    int64_t obs = 0, var_ = 0, inner = 0, left = 0, right = 0;
    if (hi < s) {
      o_obs[w] = o_var[w] = o_inn[w] = o_lft[w] = o_rgt[w] = 0;
      continue;
    }
    int64_t run = 0;
    bool seen = false, any = false;
    for (int64_t ww = s >> 6; ww <= hi >> 6; ++ww) {
      uint64_t pr = 0, vv = 0;
      int64_t nb = std::min<int64_t>(8, (n_pos + 7) / 8 - ww * 8);
      std::memcpy(&pr, present_bits + ww * 8, (size_t)nb);
      std::memcpy(&vv, valid_bits + ww * 8, (size_t)nb);
      int64_t base = ww << 6;
      // mask to the window's bit range within this word
      if (base < s) {
        uint64_t m = ~0ull << (s - base);
        pr &= m;
        vv &= m;
      }
      if (base + 63 > hi) {
        uint64_t m = ~0ull >> (base + 63 - hi);
        pr &= m;
        vv &= m;
      }
      if (!vv) continue;
      any = true;
      uint64_t av = vv & ~pr;
      if (!pr) {
        run += (int64_t)__builtin_popcountll(av);
        continue;
      }
      obs += (int64_t)__builtin_popcountll(pr);
      int b = 0;
      while (b < 64) {
        uint64_t prt = pr >> b;
        if (!prt) {
          run += (int64_t)__builtin_popcountll(av >> b);
          break;
        }
        int t = __builtin_ctzll(prt);
        if (t) {
          uint64_t seg = (av >> b) & ((1ull << t) - 1u);
          run += (int64_t)__builtin_popcountll(seg);
        }
        if (run > 0) {
          ++var_;
          if (!seen) {
            left = run;
          } else {
            int64_t d = run - (k - 1);
            inner += (d > 0) ? d : std::llabs(d + 1);
          }
        }
        seen = true;
        run = 0;
        // skip the present stretch
        uint64_t np = ~(prt >> t);
        int adv = np ? __builtin_ctzll(np) : 64 - (b + t);
        b += t + adv;
      }
    }
    if (any && run > 0) {
      ++var_;
      right = run;
    }
    o_obs[w] = obs;
    o_var[w] = var_;
    o_inn[w] = inner;
    o_lft[w] = left;
    o_rgt[w] = right;
  }
}

void kcf_window_stats_bits(const uint8_t* present_bits,
                           const uint8_t* valid_bits, int64_t n_pos,
                           int32_t k, const int32_t* w_start,
                           const int32_t* w_hi, int64_t n_win,
                           int64_t* out) {
  int T = pick_threads(n_win, 8);
  if (T <= 1 || n_win < 8) {
    stats_bits_range(present_bits, valid_bits, n_pos, k, w_start, w_hi, 0,
                     n_win, n_win, out);
    return;
  }
  std::vector<std::thread> ws;
  int64_t step = (n_win + T - 1) / T;
  for (int t = 0; t < T; ++t) {
    int64_t lo = t * step, hi = std::min(n_win, lo + step);
    if (lo >= hi) break;
    ws.emplace_back(stats_bits_range, present_bits, valid_bits, n_pos, k,
                    w_start, w_hi, lo, hi, n_win, out);
  }
  for (auto& th : ws) th.join();
}

}  // extern "C"

