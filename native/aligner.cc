// swipe-tpu native runtime: gapped local-alignment traceback.
//
// C implementation of the host-side align phase used by swipe_tpu.align
// (ctypes binding in swipe_tpu/native.py).  Semantics are specified by the
// NumPy reference implementation in swipe_tpu/align.py and match the
// reference engine's aligner (Huang/Hardison/Miller region search +
// Myers/Miller linear-space traceback, see /root/reference/align.cc):
//   - forward pass: first strict maximum in (i asc, j asc) scan order
//   - reverse pass: -1 sentinels; stops at the first cell in (i desc,
//     j desc) order whose reverse score reaches the target
//   - join: HH+XX first strict max, then EE+YY+q last max with >=
//
// Exported C ABI:
//   long swtpu_align(const int8_t* a, long M, const int8_t* b, long N,
//                    const long* matrix32x32, long q, long r, long hint,
//                    long* coords /* score, ab, bb, ae, be */,
//                    char* ops, long ops_cap);
// Returns 0 on success, -1 on internal error, -2 if ops buffer too small.

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <vector>

namespace {

constexpr long kSentinel = -1;

struct OpsBuf {
  char* buf;
  long cap;
  long len = 0;
  char op = 0;
  long count = 0;
  bool overflow = false;

  void push() {
    if (count <= 0) return;
    int n = snprintf(buf + len, cap - len, "%c%ld", op, count);
    if (n < 0 || n >= cap - len) {
      overflow = true;
    } else {
      len += n;
    }
  }
  void add(char o, long c) {
    if (c <= 0) return;
    if (op == o) {
      count += c;
    } else {
      push();
      op = o;
      count = c;
    }
  }
};

inline long smax(long a, long b) { return a > b ? a : b; }

inline long score_at(const long* mat, int8_t qa, int8_t db) {
  return mat[((int)qa << 5) + (int)db];
}

// Forward endpoint search: first strict max in (i asc, j asc) order.
void region_forward(const int8_t* a, const int8_t* b, long M, long N,
                    const long* mat, long q, long r, long* score_out,
                    long* ae, long* be) {
  std::vector<long> HH(N, 0), EE(N, -q);
  long score = 0;
  *ae = 0;
  *be = 0;
  for (long i = 0; i < M; i++) {
    long h = 0, p = 0, f = -q;
    const int8_t ai = a[i];
    for (long j = 0; j < N; j++) {
      f = smax(f, h - q) - r;
      EE[j] = smax(EE[j], HH[j] - q) - r;
      h = p + score_at(mat, ai, b[j]);
      if (h < 0) h = 0;
      if (f > h) h = f;
      if (EE[j] > h) h = EE[j];
      p = HH[j];
      HH[j] = h;
      if (h > score) {
        score = h;
        *ae = i;
        *be = j;
      }
    }
  }
  *score_out = score;
}

// Reverse start-point search from (ae, be); first cell reaching score in
// (i desc, j desc) order.  Returns 0 on success, -1 if unreachable.
int region_reverse(const int8_t* a, const int8_t* b, const long* mat, long q,
                   long r, long score, long ae, long be, long* ab, long* bb) {
  long n = be + 1;
  std::vector<long> HH(n, kSentinel), EE(n, kSentinel);
  long cost = 0;
  for (long i = ae; i >= 0; i--) {
    long h = kSentinel, f = kSentinel;
    long p = (i == ae) ? 0 : kSentinel;
    const int8_t ai = a[i];
    for (long j = be; j >= 0; j--) {
      f = smax(f, h - q) - r;
      EE[j] = smax(EE[j], HH[j] - q) - r;
      h = p + score_at(mat, ai, b[j]);
      if (f > h) h = f;
      if (EE[j] > h) h = EE[j];
      p = HH[j];
      HH[j] = h;
      if (h > cost) {
        cost = h;
        *ab = i;
        *bb = j;
        if (cost >= score) return 0;
      }
    }
  }
  return -1;
}

// Myers-Miller divide and conquer over a[a0..a0+M) x b[b0..b0+N).
void mm_diff(OpsBuf& ops, const int8_t* a, const int8_t* b, long M, long N,
             long a0, long b0, const long* mat, long q, long r, long tb,
             long te) {
  if (N == 0) {
    if (M > 0) ops.add('D', M);
    return;
  }
  if (M == 0) {
    ops.add('I', N);
    return;
  }
  if (M == 1) {
    long best, J;
    if (tb <= te) {
      best = -tb - (1 + N) * r - q;
      J = -1;
    } else {
      best = -q - (1 + N) * r - te;
      J = N;
    }
    for (long j = 0; j < N; j++) {
      long sc = score_at(mat, a[a0], b[b0 + j]) - r * (N - 1);
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
  std::vector<long> HH(N + 1), EE(N + 1), XX(N + 1), YY(N + 1);

  // forward global pass (rows a0..a0+I-1, left boundary open penalty tb)
  HH[0] = 0;
  {
    long t = -q;
    for (long j = 1; j <= N; j++) {
      t -= r;
      HH[j] = t;
      EE[j] = t - q;
    }
    t = -tb;
    for (long i = 1; i <= I; i++) {
      long p = HH[0];
      t -= r;
      long h = t;
      HH[0] = t;
      long f = t - q;
      const int8_t ai = a[a0 + i - 1];
      for (long j = 1; j <= N; j++) {
        f = smax(f, h - q) - r;
        EE[j] = smax(EE[j], HH[j] - q) - r;
        h = p + score_at(mat, ai, b[b0 + j - 1]);
        if (f > h) h = f;
        if (EE[j] > h) h = EE[j];
        p = HH[j];
        HH[j] = h;
      }
    }
    EE[0] = HH[0];
  }

  // reverse global pass (rows a0+M-1..a0+I, right boundary open penalty te)
  XX[0] = 0;
  {
    long t = -q;
    for (long j = 1; j <= N; j++) {
      t -= r;
      XX[j] = t;
      YY[j] = t - q;
    }
    t = -te;
    for (long i = 1; i <= M - I; i++) {
      long p = XX[0];
      t -= r;
      long h = t;
      XX[0] = t;
      long f = t - q;
      const int8_t ai = a[a0 + M - i];
      for (long j = 1; j <= N; j++) {
        f = smax(f, h - q) - r;
        YY[j] = smax(YY[j], XX[j] - q) - r;
        h = p + score_at(mat, ai, b[b0 + N - j]);
        if (f > h) h = f;
        if (YY[j] > h) h = YY[j];
        p = XX[j];
        XX[j] = h;
      }
    }
    YY[0] = XX[0];
  }

  // join
  long best = HH[0] + XX[N];
  long P = 0, J = 0;
  for (long j = 0; j <= N; j++) {
    long sc = HH[j] + XX[N - j];
    if (sc > best) {
      best = sc;
      J = j;
    }
  }
  for (long j = 0; j <= N; j++) {
    long sc = EE[j] + YY[N - j] + q;
    if (sc >= best) {
      best = sc;
      P = 1;
      J = j;
    }
  }

  HH.clear(); EE.clear(); XX.clear(); YY.clear();
  HH.shrink_to_fit(); EE.shrink_to_fit(); XX.shrink_to_fit(); YY.shrink_to_fit();

  if (P == 0) {
    mm_diff(ops, a, b, I, J, a0, b0, mat, q, r, tb, q);
    mm_diff(ops, a, b, M - I, N - J, a0 + I, b0 + J, mat, q, r, q, te);
  } else {
    mm_diff(ops, a, b, I - 1, J, a0, b0, mat, q, r, tb, 0);
    ops.add('D', 2);
    mm_diff(ops, a, b, M - I - 1, N - J, a0 + I + 1, b0 + J, mat, q, r, 0, te);
  }
}

}  // namespace

extern "C" long swtpu_align(const int8_t* a, long M, const int8_t* b, long N,
                            const long* matrix, long q, long r, long hint,
                            long* coords, char* ops_out, long ops_cap) {
  long score, ab = 0, bb = 0, ae, be;
  if (hint) {
    score = coords[0];
    ae = coords[3];
    be = coords[4];
  } else {
    region_forward(a, b, M, N, matrix, q, r, &score, &ae, &be);
  }
  if (region_reverse(a, b, matrix, q, r, score, ae, be, &ab, &bb) != 0)
    return -1;

  OpsBuf ops{ops_out, ops_cap};
  mm_diff(ops, a, b, ae - ab + 1, be - bb + 1, ab, bb, matrix, q, r, q, q);
  ops.push();
  if (ops.overflow) return -2;
  if (ops.len < ops_cap) ops_out[ops.len] = 0;

  coords[0] = score;
  coords[1] = ab;
  coords[2] = bb;
  coords[3] = ae;
  coords[4] = be;
  return 0;
}
