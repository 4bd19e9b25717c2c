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
//   f[j]      = max(A[j-1] - q - j*r, base - j*r)       (query-gap chain)
//   H'        = max(hnof, f)
//
// The prefix-max resolution of the in-row gap chain is exact because
// opening a gap from a gap-derived cell can never beat extending (q >= 0)
// — the same argument swipe_tpu/ops/sw_ref.py relies on.
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

// Scratch rows shared by all passes of one alignment (sized to the widest
// row once, so the recursion never reallocates).
struct Rows {
  std::vector<long> enew, hnof, acc;
  void reserve(size_t n) {
    enew.resize(n);
    hnof.resize(n);
    acc.resize(n);
  }
};

// ---- local rows (region search) -------------------------------------------

// One forward local-DP row (align.py _row_forward, floor_zero=true,
// h0 = 0, f_init = -q).  H and E are updated in place (length N).
void row_forward(std::vector<long>& H, std::vector<long>& E, const long* qrow,
                 const int8_t* b, long N, long q, long r, Rows& w) {
  long* enew = w.enew.data();
  long* hnof = w.hnof.data();
  long* acc = w.acc.data();
  if (N == 0) return;  // empty subject: row is a no-op
  long diag = 0;  // entering h0
  for (long j = 0; j < N; j++) {
    enew[j] = std::max(E[j], H[j] - q) - r;
    long v = std::max(diag + qrow[b[j]], (long)0);
    diag = H[j];
    hnof[j] = std::max(v, enew[j]);
  }
  long run = hnof[0];  // prefix max of hnof[k] + k*r
  acc[0] = run;
  for (long j = 1; j < N; j++) {
    run = std::max(run, hnof[j] + j * r);
    acc[j] = run;
  }
  const long base = std::max(-q, 0 - q) - r;  // f at column 0
  H[0] = std::max(hnof[0], base);
  for (long j = 1; j < N; j++) {
    long f = std::max(acc[j - 1] - q - j * r, base - j * r);
    H[j] = std::max(hnof[j], f);
  }
  std::copy(enew, enew + N, E.begin());
}

// One reverse local-DP row over the reversed db prefix (align.py
// _row_reverse: no zero floor, -1 sentinels; h0 is 0 only on the a_end
// row).  H and E are length N = be + 1.
void row_reverse(std::vector<long>& H, std::vector<long>& E, const long* qrow,
                 const int8_t* brev, long N, long q, long r, long h0,
                 Rows& w) {
  long* enew = w.enew.data();
  long* hnof = w.hnof.data();
  long* acc = w.acc.data();
  if (N == 0) return;  // empty subject prefix: row is a no-op
  long diag = h0;
  for (long j = 0; j < N; j++) {
    enew[j] = std::max(E[j], H[j] - q) - r;
    long v = diag + qrow[brev[j]];
    diag = H[j];
    hnof[j] = std::max(v, enew[j]);
  }
  long run = hnof[0];
  acc[0] = run;
  for (long j = 1; j < N; j++) {
    run = std::max(run, hnof[j] + j * r);
    acc[j] = run;
  }
  const long base = std::max(kSentinel, kSentinel - q) - r;
  H[0] = std::max(hnof[0], base);
  for (long j = 1; j < N; j++) {
    long f = std::max(acc[j - 1] - q - j * r, base - j * r);
    H[j] = std::max(hnof[j], f);
  }
  std::copy(enew, enew + N, E.begin());
}

// Forward endpoint search (align.py region): first strict improvement in
// (i asc, j asc) order.
void region_forward(const int8_t* a, const int8_t* b, long M, long N,
                    const long* mat, long q, long r, long* score_out,
                    long* ae, long* be, Rows& w) {
  std::vector<long> H(N, 0), E(N, -q);
  long score = 0;
  *ae = 0;
  *be = 0;
  for (long i = 0; i < M; i++) {
    row_forward(H, E, mat + ((long)a[i] << 5), b, N, q, r, w);
    for (long j = 0; j < N; j++) {
      if (H[j] > score) {  // strict: first (i, j) max wins
        score = H[j];
        *ae = i;
        *be = j;
      }
    }
  }
  *score_out = score;
}

// Reverse start-point search (align.py region_reverse): walk the reversed
// db prefix, stop at the first row whose H reaches max(score, 1); the
// first reversed column hit = the largest original j.
int region_reverse(const int8_t* a, const int8_t* b, const long* mat, long q,
                   long r, long score, long ae, long be, long* ab, long* bb,
                   Rows& w) {
  const long n = be + 1;
  std::vector<long> H(n, kSentinel), E(n, kSentinel);
  std::vector<int8_t> brev(n);
  for (long j = 0; j < n; j++) brev[j] = b[be - j];
  const long target = std::max(score, (long)1);
  for (long i = ae; i >= 0; i--) {
    row_reverse(H, E, mat + ((long)a[i] << 5), brev.data(), n, q, r,
                i == ae ? 0 : kSentinel, w);
    for (long jr = 0; jr < n; jr++) {
      if (H[jr] >= target) {
        *ab = i;
        *bb = be - jr;
        return 0;
      }
    }
  }
  return -1;
}

// ---- global rows (Myers-Miller) -------------------------------------------

// One global (no-floor) DP row of length N+1 (align.py _global_row);
// t is this row's column-0 boundary value.
void global_row(std::vector<long>& H, std::vector<long>& E, const long* qrow,
                const int8_t* b, long N, long q, long r, long t, Rows& w) {
  long* enew = w.enew.data();
  long* hnof = w.hnof.data();
  long* acc = w.acc.data();
  for (long j = 0; j < N; j++) {
    enew[j] = std::max(E[j + 1], H[j + 1] - q) - r;
    hnof[j] = std::max(H[j] + qrow[b[j]], enew[j]);
  }
  long run = hnof[0];
  acc[0] = run;
  for (long j = 1; j < N; j++) {
    run = std::max(run, hnof[j] + j * r);
    acc[j] = run;
  }
  const long base = t - q;  // boundary gap chain entering column 1
  H[0] = t;
  H[1] = std::max(hnof[0], base - r);
  for (long j = 1; j < N; j++) {
    long f = std::max(acc[j - 1] - q - j * r, base - r - j * r);
    H[j + 1] = std::max(hnof[j], f);
  }
  std::copy(enew, enew + N, E.begin() + 1);
}

// Initialize a global pass boundary row: H = [0, -q-r, -q-2r, ...],
// E = H - q (align.py _diff's HH/EE and XX/YY initialization).
void global_init(std::vector<long>& H, std::vector<long>& E, long N, long q,
                 long r) {
  H[0] = 0;
  for (long j = 1; j <= N; j++) {
    H[j] = -q - r * j;
    E[j] = H[j] - q;
  }
  E[0] = 0;  // set to H[0] by the caller after the pass
}

// Myers-Miller divide and conquer over a[a0 .. a0+M) x b[b0 .. b0+N)
// (align.py _diff).  tb/te are the gap-open penalties applying at the
// left/right boundaries (0 when a gap is already open across the split).
void mm_split(OpString& ops, const int8_t* a, const int8_t* b, long M, long N,
              long a0, long b0, const long* mat, long q, long r, long tb,
              long te, Rows& w) {
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
  std::vector<long> fwdH(N + 1), fwdE(N + 1);
  global_init(fwdH, fwdE, N, q, r);
  for (long i = 1; i <= I; i++) {
    global_row(fwdH, fwdE, mat + ((long)a[a0 + i - 1] << 5), b + b0, N, q, r,
               -tb - r * i, w);
  }
  fwdE[0] = fwdH[0];

  // reverse global pass over rows a0+M-1 .. a0+I with right boundary te
  std::vector<long> revH(N + 1), revE(N + 1);
  std::vector<int8_t> brev(N);
  for (long j = 0; j < N; j++) brev[j] = b[b0 + N - 1 - j];
  global_init(revH, revE, N, q, r);
  for (long i = 1; i <= M - I; i++) {
    global_row(revH, revE, mat + ((long)a[a0 + M - i] << 5), brev.data(), N,
               q, r, -te - r * i, w);
  }
  revE[0] = revH[0];

  // join: first max of fwdH[j] + revH[N-j] wins; then the gap-crossing
  // E-join with >= — the LAST max takes the split (align.py _diff)
  long best = fwdH[0] + revH[N];
  long J = 0;
  bool gap_join = false;
  for (long j = 1; j <= N; j++) {
    long sc = fwdH[j] + revH[N - j];
    if (sc > best) {
      best = sc;
      J = j;
    }
  }
  for (long j = 0; j <= N; j++) {
    long sc = fwdE[j] + revE[N - j] + q;
    if (sc >= best) {
      best = sc;
      gap_join = true;
      J = j;
    }
  }

  // release pass rows before recursing (linear-space guarantee)
  std::vector<long>().swap(fwdH);
  std::vector<long>().swap(fwdE);
  std::vector<long>().swap(revH);
  std::vector<long>().swap(revE);
  std::vector<int8_t>().swap(brev);

  if (!gap_join) {
    mm_split(ops, a, b, I, J, a0, b0, mat, q, r, tb, q, w);
    mm_split(ops, a, b, M - I, N - J, a0 + I, b0 + J, mat, q, r, q, te, w);
  } else {
    // the optimum crosses the middle rows inside one query gap: emit the
    // two gapped rows directly and recurse with open boundaries
    mm_split(ops, a, b, I - 1, J, a0, b0, mat, q, r, tb, 0, w);
    ops.add('D', 2);
    mm_split(ops, a, b, M - I - 1, N - J, a0 + I + 1, b0 + J, mat, q, r, 0,
             te, w);
  }
}

}  // namespace

extern "C" long swtpu_align(const int8_t* a, long M, const int8_t* b, long N,
                            const long* matrix, long q, long r, long hint,
                            long* coords, char* ops_out, long ops_cap) {
  long score, ab = 0, bb = 0, ae, be;
  // empty query or subject scores 0, and score-0 pairs trip the
  // "Internal error" fatal (the reference segfaults on this input —
  // fetching/aligning an empty db sequence under -c 0 — so the fatal
  // is the consistent non-UB behavior); bail before region_reverse
  // would read b[0] out of bounds
  if (M == 0 || N == 0) return -1;
  Rows w;
  w.reserve((size_t)N + 1);
  if (hint) {
    score = coords[0];
    ae = coords[3];
    be = coords[4];
  } else {
    region_forward(a, b, M, N, matrix, q, r, &score, &ae, &be, w);
  }
  if (region_reverse(a, b, matrix, q, r, score, ae, be, &ab, &bb, w) != 0)
    return -1;

  OpString ops{ops_out, ops_cap};
  mm_split(ops, a, b, ae - ab + 1, be - bb + 1, ab, bb, matrix, q, r, q, q,
           w);
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
