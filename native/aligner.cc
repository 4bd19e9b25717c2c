// swipe-tpu native runtime: gapped local-alignment traceback.
//
// C++ port of the vector-row formulation specified by the NumPy
// implementation in swipe_tpu/align.py (which is the semantic contract;
// behavioral parity target: the reference engine's Huang/Hardison/Miller
// region search + Myers/Miller linear-space traceback).  Every DP pass is
// expressed as whole-row updates over reusable buffers:
//
//   E'        = max(E, H - q) - r                       (db-gap chain)
//   hnof      = max(diag + score, E'[, 0])              (f-free H)
//   A         = prefix-max(hnof[k] + k*r)               (weighted scan)
//   f[j]      = max(A[j-1] - q, base) - j*r             (query-gap chain)
//   H'        = max(hnof, f)
//
// The prefix-max resolution of the in-row gap chain is exact because
// opening a gap from a gap-derived cell can never beat extending (q >= 0)
// — the same argument swipe_tpu/ops/sw_ref.py relies on.
//
// Performance form (round 5): the row passes are templated on the score
// type and phase-separated so the compiler auto-vectorizes them (AVX-512
// on the bench host; the scalar layout is identical).  int32 rows double
// the vector width and halve the traffic of the original 64-bit rows;
// an alignment whose worst-case |score| bound approaches INT32_MAX
// (chromosome-scale subjects at large gap penalties) dispatches to the
// identical int64 instantiation instead.  The per-row 32-entry matrix
// lookup reads a pre-widened int32 copy of the db window so the gather
// vectorizes.  The weighted prefix-max scan stays scalar (loop-carried);
// it is ~1 op/cell of the ~12 the scalar form needed.
//
// Tie rules carried over from align.py (and golden-verified against the
// reference binary):
//   - forward pass: first strict maximum in (i asc, j asc) scan order
//   - reverse pass: -1 sentinels; first cell in (i desc, j desc) order
//     whose reverse score reaches max(score, 1)
//   - join: first max of fwd[j] + rev[N-j]; then the gap-crossing
//     E-join with >= (last max wins)
//
// Exported C ABI (unchanged; ctypes binding in swipe_tpu/native.py):
//   long swtpu_align(const int8_t* a, long M, const int8_t* b, long N,
//                    const long* matrix32x32, long q, long r, long hint,
//                    long* coords /* score, ab, bb, ae, be */,
//                    char* ops, long ops_cap);
// Returns 0 on success, -1 on internal error, -2 if ops buffer too small.

#include <algorithm>
#include <cstdint>
#include <cstdio>
#include <vector>

#if defined(__AVX512F__)
#include <immintrin.h>
#endif

namespace {

constexpr long kSentinel = -1;  // align.py _SENTINEL (reference uses -1)

// Run-length op-string builder: M=match/mismatch, D=query-vs-gap,
// I=gap-vs-db (align.py _Ops).
struct OpString {
  char* out;
  long cap;
  long len = 0;
  char cur = 0;
  long run = 0;
  bool overflow = false;

  void flush() {
    if (run <= 0) return;
    int n = snprintf(out + len, cap - len, "%c%ld", cur, run);
    if (n < 0 || n >= cap - len) overflow = true;
    else len += n;
  }
  void add(char op, long count) {
    if (count <= 0) return;
    if (cur == op) {
      run += count;
    } else {
      flush();
      cur = op;
      run = count;
    }
  }
};

// Scratch shared by all passes of one alignment (sized to the widest row
// once, so the recursion never reallocates).  b32 holds the widened db
// window of the current pass so the matrix-row lookup auto-vectorizes.
template <typename T>
struct Rows {
  std::vector<T> enew, hnof, acc, srow, fwdH, fwdE, revH, revE;
  std::vector<int32_t> b32, b32rev;
  void reserve(size_t n) {
    enew.resize(n);
    hnof.resize(n);
    acc.resize(n);
    srow.resize(n);
    b32.resize(n);
    b32rev.resize(n);
  }
};

template <typename T>
void widen(const int8_t* b, long N, int32_t* out) {
  for (long j = 0; j < N; j++) out[j] = (int32_t)b[j];
}

// srow[j] = qrow[b32[j]] — the only gather; the int32 overload keeps the
// whole 32-entry matrix row in two vector registers and resolves 16
// lookups per two-source permute (codes are 5-bit by construction)
template <typename T>
inline void fill_srow(const T* qrow, const int32_t* b32, long N, T* srow) {
  for (long j = 0; j < N; j++) srow[j] = qrow[b32[j]];
}

#if defined(__AVX512F__)
inline void fill_srow(const int32_t* qrow, const int32_t* b32, long N,
                      int32_t* srow) {
  const __m512i lo = _mm512_loadu_si512((const void*)qrow);
  const __m512i hi = _mm512_loadu_si512((const void*)(qrow + 16));
  long j = 0;
  for (; j + 16 <= N; j += 16) {
    __m512i idx = _mm512_loadu_si512((const void*)(b32 + j));
    _mm512_storeu_si512((void*)(srow + j),
                        _mm512_permutex2var_epi32(lo, idx, hi));
  }
  for (; j < N; j++) srow[j] = qrow[b32[j]];
}
#endif

// acc[j] = max_{k<=j} (hnof[k] + k*r): the loop-carried weighted
// prefix-max.  The int32 overload runs the classic in-register
// log-step max-scan (shift by 1/2/4/8 lanes with MIN fill) plus a
// broadcast carry — ~12 instructions per 16 columns.
template <typename T>
inline void weighted_scan(const T* hnof, T r, long N, T* acc) {
  T run = hnof[0];
  acc[0] = run;
  for (long j = 1; j < N; j++) {
    run = std::max(run, (T)(hnof[j] + j * r));
    acc[j] = run;
  }
}

#if defined(__AVX512F__)
inline void weighted_scan(const int32_t* hnof, int32_t r, long N,
                          int32_t* acc) {
  const __m512i MIN = _mm512_set1_epi32(INT32_MIN);
  __m512i jr = _mm512_mullo_epi32(
      _mm512_setr_epi32(0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14,
                        15),
      _mm512_set1_epi32(r));
  const __m512i r16 = _mm512_set1_epi32((int32_t)(16 * r));
  __m512i carry = MIN;
  long j = 0;
  for (; j + 16 <= N; j += 16) {
    __m512i v = _mm512_add_epi32(
        _mm512_loadu_si512((const void*)(hnof + j)), jr);
    jr = _mm512_add_epi32(jr, r16);
    v = _mm512_max_epi32(v, _mm512_alignr_epi32(v, MIN, 15));
    v = _mm512_max_epi32(v, _mm512_alignr_epi32(v, MIN, 14));
    v = _mm512_max_epi32(v, _mm512_alignr_epi32(v, MIN, 12));
    v = _mm512_max_epi32(v, _mm512_alignr_epi32(v, MIN, 8));
    v = _mm512_max_epi32(v, carry);
    _mm512_storeu_si512((void*)(acc + j), v);
    carry = _mm512_permutexvar_epi32(_mm512_set1_epi32(15), v);
  }
  if (j == 0) {
    weighted_scan<int32_t>(hnof, r, N, acc);
    return;
  }
  int32_t run = acc[j - 1];
  for (; j < N; j++) {
    run = std::max(run, (int32_t)(hnof[j] + (int32_t)j * r));
    acc[j] = run;
  }
}
#endif

// ---- local rows (region search) -------------------------------------------

// One forward local-DP row (align.py _row_forward, floor_zero=true,
// h0 = 0, f_init = -q).  H and E are updated in place (length N).
template <typename T>
void row_forward(T* H, T* E, const T* qrow, const int32_t* b32, long N,
                 T q, T r, Rows<T>& w) {
  T* enew = w.enew.data();
  T* hnof = w.hnof.data();
  T* acc = w.acc.data();
  T* srow = w.srow.data();
  if (N == 0) return;  // empty subject: row is a no-op
  fill_srow(qrow, b32, N, srow);
  for (long j = 0; j < N; j++)
    enew[j] = std::max(E[j], (T)(H[j] - q)) - r;
  // diag enters with h0 = 0; H is only read here, written in phase 3
  hnof[0] = std::max(std::max((T)(0 + srow[0]), (T)0), enew[0]);
  for (long j = 1; j < N; j++) {
    T v = std::max((T)(H[j - 1] + srow[j]), (T)0);
    hnof[j] = std::max(v, enew[j]);
  }
  weighted_scan(hnof, r, N, acc);
  const T base = (T)(-q - r);  // f at column 0 (max(-q, 0-q) - r)
  H[0] = std::max(hnof[0], base);
  for (long j = 1; j < N; j++) {
    T f = std::max((T)(acc[j - 1] - q), base) - (T)(j * r);
    H[j] = std::max(hnof[j], f);
  }
  std::copy(enew, enew + N, E);
}

// One reverse local-DP row over the reversed db prefix (align.py
// _row_reverse: no zero floor, -1 sentinels; h0 is 0 only on the a_end
// row).  H and E are length N = be + 1.
template <typename T>
void row_reverse(T* H, T* E, const T* qrow, const int32_t* b32rev, long N,
                 T q, T r, T h0, Rows<T>& w) {
  T* enew = w.enew.data();
  T* hnof = w.hnof.data();
  T* acc = w.acc.data();
  T* srow = w.srow.data();
  if (N == 0) return;  // empty subject prefix: row is a no-op
  fill_srow(qrow, b32rev, N, srow);
  for (long j = 0; j < N; j++)
    enew[j] = std::max(E[j], (T)(H[j] - q)) - r;
  hnof[0] = std::max((T)(h0 + srow[0]), enew[0]);
  for (long j = 1; j < N; j++)
    hnof[j] = std::max((T)(H[j - 1] + srow[j]), enew[j]);
  weighted_scan(hnof, r, N, acc);
  // max(kSentinel, kSentinel - q) - r with q >= 0
  const T base = (T)(kSentinel - r);
  H[0] = std::max(hnof[0], base);
  for (long j = 1; j < N; j++) {
    T f = std::max((T)(acc[j - 1] - q), base) - (T)(j * r);
    H[j] = std::max(hnof[j], f);
  }
  std::copy(enew, enew + N, E);
}

// Forward endpoint search (align.py region): first strict improvement in
// (i asc, j asc) order.  Row-level: the first row max that beats the
// running score wins at its first column of occurrence — identical to
// the scalar in-order scan.
template <typename T>
void region_forward(const int8_t* a, const int8_t* b, long M, long N,
                    long q, long r, long* score_out,
                    long* ae, long* be, Rows<T>& w,
                    std::vector<T>& qrows) {
  std::vector<T> H(N, 0), E(N, (T)-q);
  widen<T>(b, N, w.b32.data());
  T score = 0;
  *ae = 0;
  *be = 0;
  for (long i = 0; i < M; i++) {
    row_forward(H.data(), E.data(), qrows.data() + ((long)a[i] << 5),
                w.b32.data(), N, (T)q, (T)r, w);
    T rowmax = score;
    for (long j = 0; j < N; j++) rowmax = std::max(rowmax, H[j]);
    if (rowmax > score) {
      score = rowmax;
      *ae = i;
      for (long j = 0; j < N; j++) {
        if (H[j] == rowmax) {
          *be = j;
          break;
        }
      }
    }
  }
  *score_out = (long)score;
}

// Reverse start-point search (align.py region_reverse): walk the reversed
// db prefix, stop at the first row whose H reaches max(score, 1); the
// first reversed column hit = the largest original j.
template <typename T>
int region_reverse(const int8_t* a, const int8_t* b, long q,
                   long r, long score, long ae, long be, long* ab, long* bb,
                   Rows<T>& w, std::vector<T>& qrows) {
  const long n = be + 1;
  std::vector<T> H(n, (T)kSentinel), E(n, (T)kSentinel);
  for (long j = 0; j < n; j++) w.b32rev[j] = (int32_t)b[be - j];
  const T target = (T)std::max(score, (long)1);
  for (long i = ae; i >= 0; i--) {
    row_reverse(H.data(), E.data(), qrows.data() + ((long)a[i] << 5),
                w.b32rev.data(), n, (T)q, (T)r,
                i == ae ? (T)0 : (T)kSentinel, w);
    T rowmax = H[0];
    for (long jr = 1; jr < n; jr++) rowmax = std::max(rowmax, H[jr]);
    if (rowmax >= target) {
      for (long jr = 0; jr < n; jr++) {
        if (H[jr] >= target) {
          *ab = i;
          *bb = be - jr;
          return 0;
        }
      }
    }
  }
  return -1;
}

// ---- global rows (Myers-Miller) -------------------------------------------

// One global (no-floor) DP row of length N+1 (align.py _global_row);
// t is this row's column-0 boundary value.
template <typename T>
void global_row(T* H, T* E, const T* qrow, const int32_t* b32, long N,
                T q, T r, T t, Rows<T>& w) {
  T* enew = w.enew.data();
  T* hnof = w.hnof.data();
  T* acc = w.acc.data();
  T* srow = w.srow.data();
  fill_srow(qrow, b32, N, srow);
  for (long j = 0; j < N; j++)
    enew[j] = std::max(E[j + 1], (T)(H[j + 1] - q)) - r;
  for (long j = 0; j < N; j++)
    hnof[j] = std::max((T)(H[j] + srow[j]), enew[j]);
  weighted_scan(hnof, r, N, acc);
  const T base = (T)(t - q - r);  // boundary gap chain entering column 1
  H[0] = t;
  H[1] = std::max(hnof[0], base);
  for (long j = 1; j < N; j++) {
    T f = std::max((T)(acc[j - 1] - q), base) - (T)(j * r);
    H[j + 1] = std::max(hnof[j], f);
  }
  std::copy(enew, enew + N, E + 1);
}

// Initialize a global pass boundary row: H = [0, -q-r, -q-2r, ...],
// E = H - q (align.py _diff's HH/EE and XX/YY initialization).
template <typename T>
void global_init(std::vector<T>& H, std::vector<T>& E, long N, T q, T r) {
  H[0] = 0;
  for (long j = 1; j <= N; j++) {
    H[j] = (T)(-q - r * j);
    E[j] = (T)(H[j] - q);
  }
  E[0] = 0;  // set to H[0] by the caller after the pass
}

// Myers-Miller divide and conquer over a[a0 .. a0+M) x b[b0 .. b0+N)
// (align.py _diff).  tb/te are the gap-open penalties applying at the
// left/right boundaries (0 when a gap is already open across the split).
template <typename T>
void mm_split(OpString& ops, const int8_t* a, const int8_t* b, long M, long N,
              long a0, long b0, const long* mat, long q, long r, long tb,
              long te, Rows<T>& w, std::vector<T>& qrows) {
  if (N == 0) {
    if (M > 0) ops.add('D', M);
    return;
  }
  if (M == 0) {
    ops.add('I', N);
    return;
  }
  if (M == 1) {
    // single query char vs N db chars: either it pairs with some b[J]
    // (I J, M 1, I N-1-J) or it sits in a gap (J = -1 / N sentinels)
    long best, J;
    if (tb <= te) {
      best = -tb - (1 + N) * r - q;
      J = -1;
    } else {
      best = -q - (1 + N) * r - te;
      J = N;
    }
    const long* qrow = mat + ((long)a[a0] << 5);
    const long rbase = r * (N - 1);
    for (long j = 0; j < N; j++) {
      long sc = qrow[b[b0 + j]] - rbase;
      if (j > 0) sc -= q;
      if (j < N - 1) sc -= q;
      if (sc > best) {
        best = sc;
        J = j;
      }
    }
    if (J == -1) {
      ops.add('D', 1);
      ops.add('I', N);
    } else if (J == N) {
      ops.add('I', N);
      ops.add('D', 1);
    } else {
      ops.add('I', J);
      ops.add('M', 1);
      ops.add('I', N - 1 - J);
    }
    return;
  }

  const long I = M / 2;

  // forward global pass over rows a0 .. a0+I-1 with left boundary tb
  std::vector<T>& fwdH = w.fwdH;
  std::vector<T>& fwdE = w.fwdE;
  std::vector<T>& revH = w.revH;
  std::vector<T>& revE = w.revE;
  fwdH.resize(N + 1);
  fwdE.resize(N + 1);
  global_init(fwdH, fwdE, N, (T)q, (T)r);
  widen<T>(b + b0, N, w.b32.data());
  for (long i = 1; i <= I; i++) {
    global_row(fwdH.data(), fwdE.data(),
               qrows.data() + ((long)a[a0 + i - 1] << 5), w.b32.data(), N,
               (T)q, (T)r, (T)(-tb - r * i), w);
  }
  fwdE[0] = fwdH[0];

  // reverse global pass over rows a0+M-1 .. a0+I with right boundary te
  revH.resize(N + 1);
  revE.resize(N + 1);
  for (long j = 0; j < N; j++) w.b32rev[j] = (int32_t)b[b0 + N - 1 - j];
  global_init(revH, revE, N, (T)q, (T)r);
  for (long i = 1; i <= M - I; i++) {
    global_row(revH.data(), revE.data(),
               qrows.data() + ((long)a[a0 + M - i] << 5), w.b32rev.data(), N,
               (T)q, (T)r, (T)(-te - r * i), w);
  }
  revE[0] = revH[0];

  // join: first max of fwdH[j] + revH[N-j] wins; then the gap-crossing
  // E-join with >= — the LAST max takes the split (align.py _diff)
  long best = (long)fwdH[0] + (long)revH[N];
  long J = 0;
  bool gap_join = false;
  for (long j = 1; j <= N; j++) {
    long sc = (long)fwdH[j] + (long)revH[N - j];
    if (sc > best) {
      best = sc;
      J = j;
    }
  }
  for (long j = 0; j <= N; j++) {
    long sc = (long)fwdE[j] + (long)revE[N - j] + q;
    if (sc >= best) {
      best = sc;
      gap_join = true;
      J = j;
    }
  }

  if (!gap_join) {
    mm_split(ops, a, b, I, J, a0, b0, mat, q, r, tb, q, w, qrows);
    mm_split(ops, a, b, M - I, N - J, a0 + I, b0 + J, mat, q, r, q, te, w,
             qrows);
  } else {
    // the optimum crosses the middle rows inside one query gap: emit the
    // two gapped rows directly and recurse with open boundaries
    mm_split(ops, a, b, I - 1, J, a0, b0, mat, q, r, tb, 0, w, qrows);
    ops.add('D', 2);
    mm_split(ops, a, b, M - I - 1, N - J, a0 + I + 1, b0 + J, mat, q, r, 0,
             te, w, qrows);
  }
}

template <typename T>
long align_impl(const int8_t* a, long M, const int8_t* b, long N,
                const long* matrix, long q, long r, long hint, long* coords,
                char* ops_out, long ops_cap) {
  long score, ab = 0, bb = 0, ae, be;
  Rows<T> w;
  w.reserve((size_t)N + 1);
  // narrowed working copy of the 32x32 matrix (row pointers by query char)
  std::vector<T> qrows(32 * 32);
  for (long i = 0; i < 32 * 32; i++) qrows[i] = (T)matrix[i];
  if (hint) {
    score = coords[0];
    ae = coords[3];
    be = coords[4];
  } else {
    region_forward(a, b, M, N, q, r, &score, &ae, &be, w, qrows);
  }
  if (region_reverse(a, b, q, r, score, ae, be, &ab, &bb, w,
                     qrows) != 0)
    return -1;

  OpString ops{ops_out, ops_cap};
  mm_split(ops, a, b, ae - ab + 1, be - bb + 1, ab, bb, matrix, q, r, q, q,
           w, qrows);
  ops.flush();
  if (ops.overflow) return -2;
  if (ops.len < ops_cap) ops_out[ops.len] = 0;

  coords[0] = score;
  coords[1] = ab;
  coords[2] = bb;
  coords[3] = ae;
  coords[4] = be;
  return 0;
}

}  // namespace

extern "C" long swtpu_align(const int8_t* a, long M, const int8_t* b, long N,
                            const long* matrix, long q, long r, long hint,
                            long* coords, char* ops_out, long ops_cap) {
  // empty query or subject scores 0, and score-0 pairs trip the
  // "Internal error" fatal (the reference segfaults on this input —
  // fetching/aligning an empty db sequence under -c 0 — so the fatal
  // is the consistent non-UB behavior); bail before region_reverse
  // would read b[0] out of bounds
  if (M == 0 || N == 0) return -1;
  // int32 rows unless the worst-case |value| bound (gap chains across
  // the whole span + the match contribution) could approach INT32_MAX
  long matmax = 0;
  for (int i = 0; i < 32 * 32; i++)
    matmax = std::max(matmax, std::abs(matrix[i]));
  const double bound = 2.0 * (double)q + (double)(M + N + 2) * (double)r +
                       (double)(M + 1) * (double)matmax + 16.0;
  if (bound < 1.0e9)
    return align_impl<int32_t>(a, M, b, N, matrix, q, r, hint, coords,
                               ops_out, ops_cap);
  return align_impl<int64_t>(a, M, b, N, matrix, q, r, hint, coords,
                             ops_out, ops_cap);
}
