// zukelang_tpu native host backend: BLS12-381 Fr/Fq arithmetic, G1 curve
// ops, Pippenger MSM, and a radix-2 NTT over Fr.
//
// Plays the role blst's C library plays for the reference
// (/root/reference/dune-project:23, curve.ml:74-221): the fast *host-side*
// crypto substrate.  The TPU (JAX/Pallas) path owns the large-scale prove
// workloads; this library serves host-resident work: witness-side field
// batches, CRS (de)serialization, cross-checking the device kernels, and
// small/latency-sensitive MSMs where a device round-trip is not worth it.
//
// ABI: extern "C", all field elements little-endian byte arrays in
// standard (non-Montgomery) form: Fr = 32 bytes, Fq = 48 bytes.  Points
// are affine (x, y, infinity_flag) unless stated.
//
// Build: g++ -O3 -march=native -shared -fPIC -o libzukelang_native.so \
//        zukelang_native.cpp   (driven by zukelang_tpu/native/__init__.py)

#include <cstdint>
#include <cstring>
#include <vector>

typedef unsigned __int128 u128;
typedef uint64_t u64;

// ---------------------------------------------------------------------------
// Generic N-limb Montgomery field
// ---------------------------------------------------------------------------

template <int N> struct FpParams {
  u64 mod[N];   // modulus, little-endian limbs
  u64 r2[N];    // R^2 mod p
  u64 ninv;     // -p^{-1} mod 2^64
  u64 one[N];   // R mod p (Montgomery 1)
};

// BLS12-381 Fq (6 limbs)
static const FpParams<6> FQ = {
    {0xb9feffffffffaaabULL, 0x1eabfffeb153ffffULL, 0x6730d2a0f6b0f624ULL,
     0x64774b84f38512bfULL, 0x4b1ba7b6434bacd7ULL, 0x1a0111ea397fe69aULL},
    {0xf4df1f341c341746ULL, 0x0a76e6a609d104f1ULL, 0x8de5476c4c95b6d5ULL,
     0x67eb88a9939d83c0ULL, 0x9a793e85b519952dULL, 0x11988fe592cae3aaULL},
    0x89f3fffcfffcfffdULL,
    {0x760900000002fffdULL, 0xebf4000bc40c0002ULL, 0x5f48985753c758baULL,
     0x77ce585370525745ULL, 0x5c071a97a256ec6dULL, 0x15f65ec3fa80e493ULL}};

// BLS12-381 Fr (4 limbs)
static const FpParams<4> FR = {
    {0xffffffff00000001ULL, 0x53bda402fffe5bfeULL, 0x3339d80809a1d805ULL,
     0x73eda753299d7d48ULL},
    {0xc999e990f3f29c6dULL, 0x2b6cedcb87925c23ULL, 0x05d314967254398fULL,
     0x0748d9d99f59ff11ULL},
    0xfffffffeffffffffULL,
    {0x00000001fffffffeULL, 0x5884b7fa00034802ULL, 0x998c4fefecbc4ff5ULL,
     0x1824b159acc5056fULL}};

template <int N> struct Fp {
  u64 v[N];

  static Fp zero() {
    Fp r;
    memset(r.v, 0, sizeof(r.v));
    return r;
  }
};

template <int N>
static inline bool fp_is_zero(const Fp<N> &a) {
  u64 acc = 0;
  for (int i = 0; i < N; i++) acc |= a.v[i];
  return acc == 0;
}

template <int N>
static inline bool fp_eq(const Fp<N> &a, const Fp<N> &b) {
  u64 acc = 0;
  for (int i = 0; i < N; i++) acc |= a.v[i] ^ b.v[i];
  return acc == 0;
}

template <int N>
static inline bool fp_geq(const u64 *a, const u64 *m) {
  for (int i = N - 1; i >= 0; i--) {
    if (a[i] > m[i]) return true;
    if (a[i] < m[i]) return false;
  }
  return true;  // equal
}

template <int N>
static inline void fp_sub_mod(u64 *a, const u64 *m) {
  u64 borrow = 0;
  for (int i = 0; i < N; i++) {
    u128 d = (u128)a[i] - m[i] - borrow;
    a[i] = (u64)d;
    borrow = (d >> 64) ? 1 : 0;
  }
}

template <int N>
static inline Fp<N> fp_add(const Fp<N> &a, const Fp<N> &b,
                           const FpParams<N> &P) {
  Fp<N> r;
  u64 carry = 0;
  for (int i = 0; i < N; i++) {
    u128 s = (u128)a.v[i] + b.v[i] + carry;
    r.v[i] = (u64)s;
    carry = (u64)(s >> 64);
  }
  if (carry || fp_geq<N>(r.v, P.mod)) fp_sub_mod<N>(r.v, P.mod);
  return r;
}

template <int N>
static inline Fp<N> fp_sub(const Fp<N> &a, const Fp<N> &b,
                           const FpParams<N> &P) {
  Fp<N> r;
  u64 borrow = 0;
  for (int i = 0; i < N; i++) {
    u128 d = (u128)a.v[i] - b.v[i] - borrow;
    r.v[i] = (u64)d;
    borrow = (d >> 64) ? 1 : 0;
  }
  if (borrow) {
    u64 carry = 0;
    for (int i = 0; i < N; i++) {
      u128 s = (u128)r.v[i] + P.mod[i] + carry;
      r.v[i] = (u64)s;
      carry = (u64)(s >> 64);
    }
  }
  return r;
}

// CIOS Montgomery multiply
template <int N>
static inline Fp<N> fp_mul(const Fp<N> &a, const Fp<N> &b,
                           const FpParams<N> &P) {
  u64 t[N + 2];
  memset(t, 0, sizeof(t));
  for (int i = 0; i < N; i++) {
    u64 carry = 0;
    for (int j = 0; j < N; j++) {
      u128 s = (u128)t[j] + (u128)a.v[i] * b.v[j] + carry;
      t[j] = (u64)s;
      carry = (u64)(s >> 64);
    }
    u128 s = (u128)t[N] + carry;
    t[N] = (u64)s;
    t[N + 1] = (u64)(s >> 64);

    u64 m = t[0] * P.ninv;
    u128 s2 = (u128)t[0] + (u128)m * P.mod[0];
    carry = (u64)(s2 >> 64);
    for (int j = 1; j < N; j++) {
      u128 ss = (u128)t[j] + (u128)m * P.mod[j] + carry;
      t[j - 1] = (u64)ss;
      carry = (u64)(ss >> 64);
    }
    s2 = (u128)t[N] + carry;
    t[N - 1] = (u64)s2;
    t[N] = t[N + 1] + (u64)(s2 >> 64);
    t[N + 1] = 0;
  }
  Fp<N> r;
  memcpy(r.v, t, sizeof(r.v));
  if (t[N] || fp_geq<N>(r.v, P.mod)) fp_sub_mod<N>(r.v, P.mod);
  return r;
}

template <int N>
static inline Fp<N> fp_sqr(const Fp<N> &a, const FpParams<N> &P) {
  return fp_mul<N>(a, a, P);
}

template <int N>
static Fp<N> fp_pow(const Fp<N> &a, const u64 *e, int elimbs,
                    const FpParams<N> &P) {
  Fp<N> result;
  memcpy(result.v, P.one, sizeof(result.v));
  bool started = false;
  for (int i = elimbs - 1; i >= 0; i--) {
    for (int b = 63; b >= 0; b--) {
      if (started) result = fp_sqr<N>(result, P);
      if ((e[i] >> b) & 1) {
        if (!started) {
          result = a;
          started = true;
        } else {
          result = fp_mul<N>(result, a, P);
        }
      }
    }
  }
  return result;
}

template <int N>
static Fp<N> fp_inv(const Fp<N> &a, const FpParams<N> &P) {
  // Fermat: a^(p-2)
  u64 e[N];
  memcpy(e, P.mod, sizeof(e));
  // subtract 2
  u64 borrow = 2;
  for (int i = 0; i < N && borrow; i++) {
    u64 before = e[i];
    e[i] -= borrow;
    borrow = (before < borrow) ? 1 : 0;
  }
  return fp_pow<N>(a, e, N, P);
}

// to/from Montgomery
template <int N>
static inline Fp<N> fp_to_mont(const Fp<N> &a, const FpParams<N> &P) {
  Fp<N> r2;
  memcpy(r2.v, P.r2, sizeof(r2.v));
  return fp_mul<N>(a, r2, P);
}

template <int N>
static inline Fp<N> fp_from_mont(const Fp<N> &a, const FpParams<N> &P) {
  Fp<N> one = Fp<N>::zero();
  one.v[0] = 1;
  return fp_mul<N>(a, one, P);
}

typedef Fp<6> Fq;
typedef Fp<4> Fr;

// ---------------------------------------------------------------------------
// G1 (Jacobian over Fq, Montgomery form coordinates)
// ---------------------------------------------------------------------------

struct G1 {
  Fq x, y, z;  // z == 0 -> infinity
};

static inline bool g1_is_inf(const G1 &p) { return fp_is_zero<6>(p.z); }

static G1 g1_double(const G1 &p) {
  if (g1_is_inf(p) || fp_is_zero<6>(p.y)) {
    G1 r;
    r.x = p.x;
    r.y = p.y;
    r.z = Fq::zero();
    return r;
  }
  Fq A = fp_sqr<6>(p.x, FQ);
  Fq B = fp_sqr<6>(p.y, FQ);
  Fq C = fp_sqr<6>(B, FQ);
  Fq t = fp_add<6>(p.x, B, FQ);
  Fq D = fp_sub<6>(fp_sub<6>(fp_sqr<6>(t, FQ), A, FQ), C, FQ);
  D = fp_add<6>(D, D, FQ);
  Fq E = fp_add<6>(fp_add<6>(A, A, FQ), A, FQ);
  Fq F = fp_sqr<6>(E, FQ);
  G1 r;
  r.x = fp_sub<6>(F, fp_add<6>(D, D, FQ), FQ);
  Fq c8 = fp_add<6>(C, C, FQ);
  c8 = fp_add<6>(c8, c8, FQ);
  c8 = fp_add<6>(c8, c8, FQ);
  r.y = fp_sub<6>(fp_mul<6>(E, fp_sub<6>(D, r.x, FQ), FQ), c8, FQ);
  Fq yz = fp_mul<6>(p.y, p.z, FQ);
  r.z = fp_add<6>(yz, yz, FQ);
  return r;
}

static G1 g1_add(const G1 &p, const G1 &q) {
  if (g1_is_inf(p)) return q;
  if (g1_is_inf(q)) return p;
  Fq z1z1 = fp_sqr<6>(p.z, FQ);
  Fq z2z2 = fp_sqr<6>(q.z, FQ);
  Fq u1 = fp_mul<6>(p.x, z2z2, FQ);
  Fq u2 = fp_mul<6>(q.x, z1z1, FQ);
  Fq s1 = fp_mul<6>(fp_mul<6>(p.y, q.z, FQ), z2z2, FQ);
  Fq s2 = fp_mul<6>(fp_mul<6>(q.y, p.z, FQ), z1z1, FQ);
  Fq h = fp_sub<6>(u2, u1, FQ);
  Fq rr = fp_sub<6>(s2, s1, FQ);
  if (fp_is_zero<6>(h)) {
    if (fp_is_zero<6>(rr)) return g1_double(p);
    G1 inf;
    inf.x = p.x;
    inf.y = p.y;
    inf.z = Fq::zero();
    return inf;
  }
  Fq h2 = fp_add<6>(h, h, FQ);
  Fq i = fp_sqr<6>(h2, FQ);
  Fq j = fp_mul<6>(h, i, FQ);
  Fq r2 = fp_add<6>(rr, rr, FQ);
  Fq v = fp_mul<6>(u1, i, FQ);
  G1 r;
  r.x = fp_sub<6>(fp_sub<6>(fp_sqr<6>(r2, FQ), j, FQ),
                  fp_add<6>(v, v, FQ), FQ);
  Fq s1j = fp_mul<6>(s1, j, FQ);
  r.y = fp_sub<6>(fp_mul<6>(r2, fp_sub<6>(v, r.x, FQ), FQ),
                  fp_add<6>(s1j, s1j, FQ), FQ);
  Fq zs = fp_sqr<6>(fp_add<6>(p.z, q.z, FQ), FQ);
  r.z = fp_mul<6>(fp_sub<6>(fp_sub<6>(zs, z1z1, FQ), z2z2, FQ), h, FQ);
  return r;
}

// ---------------------------------------------------------------------------
// C ABI helpers
// ---------------------------------------------------------------------------

static void read_fr(const uint8_t *in, Fr *out) {
  memcpy(out->v, in, 32);
}

static void write_fr(const Fr &a, uint8_t *out) { memcpy(out, a.v, 32); }

static void read_fq(const uint8_t *in, Fq *out) { memcpy(out->v, in, 48); }

static void write_fq(const Fq &a, uint8_t *out) { memcpy(out, a.v, 48); }

extern "C" {

// ---- Fr batch ops (standard-form in/out) ----------------------------------

void fr_mul_batch(const uint8_t *a, const uint8_t *b, uint8_t *out,
                  int64_t n) {
  for (int64_t i = 0; i < n; i++) {
    Fr x, y;
    read_fr(a + 32 * i, &x);
    read_fr(b + 32 * i, &y);
    Fr xm = fp_to_mont<4>(x, FR);
    Fr ym = fp_to_mont<4>(y, FR);
    Fr r = fp_from_mont<4>(fp_mul<4>(xm, ym, FR), FR);
    write_fr(r, out + 32 * i);
  }
}

void fr_add_batch(const uint8_t *a, const uint8_t *b, uint8_t *out,
                  int64_t n) {
  for (int64_t i = 0; i < n; i++) {
    Fr x, y;
    read_fr(a + 32 * i, &x);
    read_fr(b + 32 * i, &y);
    Fr r = fp_add<4>(x, y, FR);
    write_fr(r, out + 32 * i);
  }
}

void fr_inv_batch(const uint8_t *a, uint8_t *out, int64_t n) {
  for (int64_t i = 0; i < n; i++) {
    Fr x;
    read_fr(a + 32 * i, &x);
    if (fp_is_zero<4>(x)) {
      write_fr(Fr::zero(), out + 32 * i);
      continue;
    }
    Fr xm = fp_to_mont<4>(x, FR);
    Fr r = fp_from_mont<4>(fp_inv<4>(xm, FR), FR);
    write_fr(r, out + 32 * i);
  }
}

// ---- NTT over Fr ----------------------------------------------------------
// data: n*32 bytes standard form, in-place; w_bytes: primitive n-th root.

void fr_ntt(uint8_t *data, int64_t logn, const uint8_t *w_bytes,
            int inverse, const uint8_t *n_inv_bytes) {
  int64_t n = 1LL << logn;
  std::vector<Fr> a(n);
  for (int64_t i = 0; i < n; i++) {
    Fr t;
    read_fr(data + 32 * i, &t);
    a[i] = fp_to_mont<4>(t, FR);
  }
  // bit reverse
  for (int64_t i = 0, j = 0; i < n; i++) {
    if (i < j) std::swap(a[i], a[j]);
    int64_t m = n >> 1;
    while (m >= 1 && (j & m)) {
      j ^= m;
      m >>= 1;
    }
    j |= m;
  }
  Fr w_root;
  read_fr(w_bytes, &w_root);
  w_root = fp_to_mont<4>(w_root, FR);
  // stage twiddles: w_n^(n/len)
  for (int64_t len = 2; len <= n; len <<= 1) {
    // wlen = w_root^(n/len)
    Fr wlen = w_root;
    for (int64_t k = len; k < n; k <<= 1) wlen = fp_sqr<4>(wlen, FR);
    for (int64_t i = 0; i < n; i += len) {
      Fr w;
      memcpy(w.v, FR.one, sizeof(w.v));
      for (int64_t j = 0; j < len / 2; j++) {
        Fr u = a[i + j];
        Fr v = fp_mul<4>(a[i + j + len / 2], w, FR);
        a[i + j] = fp_add<4>(u, v, FR);
        a[i + j + len / 2] = fp_sub<4>(u, v, FR);
        w = fp_mul<4>(w, wlen, FR);
      }
    }
  }
  Fr scale;
  bool do_scale = false;
  if (inverse) {
    Fr ninv;
    read_fr(n_inv_bytes, &ninv);
    scale = fp_to_mont<4>(ninv, FR);
    do_scale = true;
  }
  for (int64_t i = 0; i < n; i++) {
    Fr t = a[i];
    if (do_scale) t = fp_mul<4>(t, scale, FR);
    write_fr(fp_from_mont<4>(t, FR), data + 32 * i);
  }
}

// ---- G1 ops ---------------------------------------------------------------
// affine point encoding: 48B x, 48B y, 1B infinity (standard form coords)

static G1 read_g1_affine(const uint8_t *in) {
  G1 p;
  Fq x, y;
  read_fq(in, &x);
  read_fq(in + 48, &y);
  uint8_t inf = in[96];
  if (inf) {
    p.x = fp_to_mont<6>(x, FQ);
    p.y = fp_to_mont<6>(y, FQ);
    p.z = Fq::zero();
  } else {
    p.x = fp_to_mont<6>(x, FQ);
    p.y = fp_to_mont<6>(y, FQ);
    Fq one = Fq::zero();
    one.v[0] = 1;
    p.z = fp_to_mont<6>(one, FQ);
  }
  return p;
}

static void write_g1_affine(const G1 &p, uint8_t *out) {
  if (g1_is_inf(p)) {
    memset(out, 0, 97);
    out[96] = 1;
    return;
  }
  Fq zi = fp_inv<6>(p.z, FQ);
  Fq zi2 = fp_sqr<6>(zi, FQ);
  Fq x = fp_mul<6>(p.x, zi2, FQ);
  Fq y = fp_mul<6>(fp_mul<6>(p.y, zi2, FQ), zi, FQ);
  write_fq(fp_from_mont<6>(x, FQ), out);
  write_fq(fp_from_mont<6>(y, FQ), out + 48);
  out[96] = 0;
}

void g1_scalar_mul(const uint8_t *point, const uint8_t *scalar,
                   uint8_t *out) {
  G1 p = read_g1_affine(point);
  Fr s;
  read_fr(scalar, &s);
  G1 acc;
  acc.x = Fq::zero();
  acc.y = Fq::zero();
  acc.z = Fq::zero();
  bool started = false;
  for (int i = 3; i >= 0; i--) {
    for (int b = 63; b >= 0; b--) {
      if (started) acc = g1_double(acc);
      if ((s.v[i] >> b) & 1) {
        if (!started) {
          acc = p;
          started = true;
        } else {
          acc = g1_add(acc, p);
        }
      }
    }
  }
  write_g1_affine(acc, out);
}

// Pippenger MSM: points n*97B affine, scalars n*32B -> one affine point.
void g1_msm(const uint8_t *points, const uint8_t *scalars, int64_t n,
            uint8_t *out) {
  const int c = 8;
  const int windows = (255 + c - 1) / c;
  std::vector<G1> pts(n);
  std::vector<Fr> scs(n);
  for (int64_t i = 0; i < n; i++) {
    pts[i] = read_g1_affine(points + 97 * i);
    read_fr(scalars + 32 * i, &scs[i]);
  }
  G1 total;
  total.z = Fq::zero();
  bool total_set = false;
  for (int w = windows - 1; w >= 0; w--) {
    if (total_set)
      for (int d = 0; d < c; d++) total = g1_double(total);
    std::vector<G1> buckets(1 << c);
    std::vector<bool> used(1 << c, false);
    for (int64_t i = 0; i < n; i++) {
      int bit = w * c;
      int limb = bit / 64;
      int off = bit % 64;
      u64 digit = scs[i].v[limb] >> off;
      if (off + c > 64 && limb + 1 < 4)
        digit |= scs[i].v[limb + 1] << (64 - off);
      digit &= (1u << c) - 1;
      if (!digit) continue;
      if (used[digit])
        buckets[digit] = g1_add(buckets[digit], pts[i]);
      else {
        buckets[digit] = pts[i];
        used[digit] = true;
      }
    }
    G1 run, acc;
    run.z = Fq::zero();
    acc.z = Fq::zero();
    bool run_set = false, acc_set = false;
    for (int b = (1 << c) - 1; b >= 1; b--) {
      if (used[b]) {
        if (run_set)
          run = g1_add(run, buckets[b]);
        else {
          run = buckets[b];
          run_set = true;
        }
      }
      if (run_set) {
        if (acc_set)
          acc = g1_add(acc, run);
        else {
          acc = run;
          acc_set = true;
        }
      }
    }
    if (acc_set) {
      if (total_set)
        total = g1_add(total, acc);
      else {
        total = acc;
        total_set = true;
      }
    }
  }
  if (!total_set) total.z = Fq::zero();
  write_g1_affine(total, out);
}

int native_abi_version() { return 1; }

}  // extern "C"
