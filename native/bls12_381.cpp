// Native BLS12-381 pairing + curve ops for the verify path.
//
// The framework's third math tier (host-Python oracle / JAX device /
// native C++): the ate pairing and subgroup checks are latency-bound
// single-point operations — wrong shape for the TPU's vector lanes, two
// orders of magnitude too slow in Python ints. This file mirrors the
// host oracle's formulas ONE-TO-ONE (host/field.py tower, host/pairing.py
// Fp12-embedded affine Miller loop + integer-exponent hard part,
// host/curve.py Jacobian law), so every function is differential-testable
// against the Python ground truth.
//
// Replaces the reference's use of lambdaworks `BLS12381AtePairing`
// (reference src/utils.rs:224-236) and the per-point subgroup scalar mul
// (reference src/compression.rs:22-27).

#include <cstdint>
#include <cstring>
#include <vector>

typedef unsigned __int128 u128;
typedef uint64_t u64;

// ---------------------------------------------------------------------------
// Fp: 6x64-bit Montgomery
// ---------------------------------------------------------------------------

static const u64 N[6] = {
    0xb9feffffffffaaabULL, 0x1eabfffeb153ffffULL, 0x6730d2a0f6b0f624ULL,
    0x64774b84f38512bfULL, 0x4b1ba7b6434bacd7ULL, 0x1a0111ea397fe69aULL};

struct Fp {
    u64 l[6];
};

static Fp FP_ZERO, FP_ONE /* = R mod N */, FP_R2;
static u64 N0INV;

static inline bool fp_is_zero(const Fp &a) {
    u64 r = 0;
    for (int i = 0; i < 6; i++) r |= a.l[i];
    return r == 0;
}

static inline bool fp_eq(const Fp &a, const Fp &b) {
    u64 r = 0;
    for (int i = 0; i < 6; i++) r |= a.l[i] ^ b.l[i];
    return r == 0;
}

static inline int fp_cmp_n(const Fp &a) {  // a >= N ?
    for (int i = 5; i >= 0; i--) {
        if (a.l[i] > N[i]) return 1;
        if (a.l[i] < N[i]) return -1;
    }
    return 0;
}

static inline void fp_sub_n(Fp &a) {  // a -= N (no borrow out)
    u128 borrow = 0;
    for (int i = 0; i < 6; i++) {
        u128 d = (u128)a.l[i] - N[i] - borrow;
        a.l[i] = (u64)d;
        borrow = (d >> 64) & 1;
    }
}

static inline void fp_add(Fp &out, const Fp &a, const Fp &b) {
    u128 carry = 0;
    for (int i = 0; i < 6; i++) {
        u128 s = (u128)a.l[i] + b.l[i] + carry;
        out.l[i] = (u64)s;
        carry = s >> 64;
    }
    if (carry || fp_cmp_n(out) >= 0) fp_sub_n(out);
}

static inline void fp_sub(Fp &out, const Fp &a, const Fp &b) {
    u128 borrow = 0;
    for (int i = 0; i < 6; i++) {
        u128 d = (u128)a.l[i] - b.l[i] - borrow;
        out.l[i] = (u64)d;
        borrow = (d >> 64) & 1;
    }
    if (borrow) {  // += N
        u128 carry = 0;
        for (int i = 0; i < 6; i++) {
            u128 s = (u128)out.l[i] + N[i] + carry;
            out.l[i] = (u64)s;
            carry = s >> 64;
        }
    }
}

static inline void fp_neg(Fp &out, const Fp &a) {
    if (fp_is_zero(a)) { out = a; return; }
    fp_sub(out, FP_ZERO, a);
    // FP_ZERO - a wraps to N - a via the borrow branch
}

// CIOS Montgomery multiplication
static void fp_mul(Fp &out, const Fp &a, const Fp &b) {
    u64 t[8] = {0};
    for (int i = 0; i < 6; i++) {
        u128 carry = 0;
        u64 ai = a.l[i];
        for (int j = 0; j < 6; j++) {
            u128 s = (u128)ai * b.l[j] + t[j] + carry;
            t[j] = (u64)s;
            carry = s >> 64;
        }
        u128 s = (u128)t[6] + carry;
        t[6] = (u64)s;
        t[7] = (u64)(s >> 64);

        u64 m = t[0] * N0INV;
        carry = 0;
        u128 s0 = (u128)m * N[0] + t[0];
        carry = s0 >> 64;
        for (int j = 1; j < 6; j++) {
            u128 sj = (u128)m * N[j] + t[j] + carry;
            t[j - 1] = (u64)sj;
            carry = sj >> 64;
        }
        u128 s6 = (u128)t[6] + carry;
        t[5] = (u64)s6;
        t[6] = t[7] + (u64)(s6 >> 64);
        t[7] = 0;
    }
    Fp r;
    memcpy(r.l, t, sizeof(r.l));
    if (t[6] || fp_cmp_n(r) >= 0) fp_sub_n(r);
    out = r;
}

static inline void fp_sqr(Fp &out, const Fp &a) { fp_mul(out, a, a); }

static void fp_pow(Fp &out, const Fp &a, const u64 *e, int nwords) {
    Fp result = FP_ONE, base = a;
    for (int w = 0; w < nwords; w++) {
        u64 bits = e[w];
        for (int i = 0; i < 64; i++) {
            if (w * 64 + i >= nwords * 64) break;
            if (bits & 1) fp_mul(result, result, base);
            fp_sqr(base, base);
            bits >>= 1;
        }
    }
    out = result;
}

static const u64 N_MINUS_2[6] = {
    0xb9feffffffffaaa9ULL, 0x1eabfffeb153ffffULL, 0x6730d2a0f6b0f624ULL,
    0x64774b84f38512bfULL, 0x4b1ba7b6434bacd7ULL, 0x1a0111ea397fe69aULL};

static void fp_inv(Fp &out, const Fp &a) { fp_pow(out, a, N_MINUS_2, 6); }

static void fp_from_be(Fp &out, const uint8_t *be48) {
    Fp plain;
    for (int i = 0; i < 6; i++) {
        u64 v = 0;
        for (int j = 0; j < 8; j++) v = (v << 8) | be48[(5 - i) * 8 + j];
        plain.l[i] = v;
    }
    fp_mul(out, plain, FP_R2);  // to Montgomery
}

static void fp_to_be(uint8_t *be48, const Fp &a) {
    Fp one_plain;  // from Montgomery: multiply by 1
    Fp one = {{1, 0, 0, 0, 0, 0}};
    fp_mul(one_plain, a, one);
    for (int i = 0; i < 6; i++) {
        u64 v = one_plain.l[5 - i];
        for (int j = 0; j < 8; j++) be48[i * 8 + j] = (uint8_t)(v >> (56 - 8 * j));
    }
}

// ---------------------------------------------------------------------------
// Fp2 = Fp[u]/(u^2+1)   (formulas: host/field.py)
// ---------------------------------------------------------------------------

struct Fp2 { Fp c0, c1; };

static Fp2 FP2_ZERO_, FP2_ONE_;

static inline void fp2_add(Fp2 &o, const Fp2 &a, const Fp2 &b) {
    fp_add(o.c0, a.c0, b.c0);
    fp_add(o.c1, a.c1, b.c1);
}
static inline void fp2_sub(Fp2 &o, const Fp2 &a, const Fp2 &b) {
    fp_sub(o.c0, a.c0, b.c0);
    fp_sub(o.c1, a.c1, b.c1);
}
static inline void fp2_neg(Fp2 &o, const Fp2 &a) {
    fp_neg(o.c0, a.c0);
    fp_neg(o.c1, a.c1);
}
static void fp2_mul(Fp2 &o, const Fp2 &a, const Fp2 &b) {
    Fp t0, t1, sa, sb, m;
    fp_mul(t0, a.c0, b.c0);
    fp_mul(t1, a.c1, b.c1);
    fp_add(sa, a.c0, a.c1);
    fp_add(sb, b.c0, b.c1);
    fp_mul(m, sa, sb);
    Fp c0, c1;
    fp_sub(c0, t0, t1);
    fp_sub(m, m, t0);
    fp_sub(c1, m, t1);
    o.c0 = c0;
    o.c1 = c1;
}
static void fp2_sqr(Fp2 &o, const Fp2 &a) {
    Fp s, d, m;
    fp_add(s, a.c0, a.c1);
    fp_sub(d, a.c0, a.c1);
    fp_mul(m, a.c0, a.c1);
    Fp c0;
    fp_mul(c0, s, d);
    o.c0 = c0;
    fp_add(o.c1, m, m);
}
static void fp2_inv(Fp2 &o, const Fp2 &a) {
    Fp n0, n1, norm, ninv;
    fp_sqr(n0, a.c0);
    fp_sqr(n1, a.c1);
    fp_add(norm, n0, n1);
    fp_inv(ninv, norm);
    fp_mul(o.c0, a.c0, ninv);
    Fp negc1;
    fp_neg(negc1, a.c1);
    fp_mul(o.c1, negc1, ninv);
}
static inline void fp2_conj(Fp2 &o, const Fp2 &a) {
    o.c0 = a.c0;
    fp_neg(o.c1, a.c1);
}
static inline void fp2_mul_by_xi(Fp2 &o, const Fp2 &a) {  // xi = 1 + u
    Fp c0, c1;
    fp_sub(c0, a.c0, a.c1);
    fp_add(c1, a.c0, a.c1);
    o.c0 = c0;
    o.c1 = c1;
}
static inline bool fp2_is_zero(const Fp2 &a) {
    return fp_is_zero(a.c0) && fp_is_zero(a.c1);
}
static inline bool fp2_eq(const Fp2 &a, const Fp2 &b) {
    return fp_eq(a.c0, b.c0) && fp_eq(a.c1, b.c1);
}

// ---------------------------------------------------------------------------
// Fp6 = Fp2[v]/(v^3 - xi), Fp12 = Fp6[w]/(w^2 - v)   (host/field.py)
// ---------------------------------------------------------------------------

struct Fp6 { Fp2 c0, c1, c2; };
struct Fp12 { Fp6 c0, c1; };

static Fp6 FP6_ZERO_, FP6_ONE_;
static Fp12 FP12_ONE_;

static inline void fp6_add(Fp6 &o, const Fp6 &a, const Fp6 &b) {
    fp2_add(o.c0, a.c0, b.c0);
    fp2_add(o.c1, a.c1, b.c1);
    fp2_add(o.c2, a.c2, b.c2);
}
static inline void fp6_sub(Fp6 &o, const Fp6 &a, const Fp6 &b) {
    fp2_sub(o.c0, a.c0, b.c0);
    fp2_sub(o.c1, a.c1, b.c1);
    fp2_sub(o.c2, a.c2, b.c2);
}
static inline void fp6_neg(Fp6 &o, const Fp6 &a) {
    fp2_neg(o.c0, a.c0);
    fp2_neg(o.c1, a.c1);
    fp2_neg(o.c2, a.c2);
}
static void fp6_mul(Fp6 &o, const Fp6 &a, const Fp6 &b) {
    Fp2 t0, t1, t2, s, u, m;
    fp2_mul(t0, a.c0, b.c0);
    fp2_mul(t1, a.c1, b.c1);
    fp2_mul(t2, a.c2, b.c2);
    Fp2 c0, c1, c2;
    // c0 = t0 + xi*((a1+a2)(b1+b2) - t1 - t2)
    fp2_add(s, a.c1, a.c2);
    fp2_add(u, b.c1, b.c2);
    fp2_mul(m, s, u);
    fp2_sub(m, m, t1);
    fp2_sub(m, m, t2);
    fp2_mul_by_xi(m, m);
    fp2_add(c0, t0, m);
    // c1 = (a0+a1)(b0+b1) - t0 - t1 + xi*t2
    fp2_add(s, a.c0, a.c1);
    fp2_add(u, b.c0, b.c1);
    fp2_mul(m, s, u);
    fp2_sub(m, m, t0);
    fp2_sub(m, m, t1);
    Fp2 xt2;
    fp2_mul_by_xi(xt2, t2);
    fp2_add(c1, m, xt2);
    // c2 = (a0+a2)(b0+b2) - t0 - t2 + t1
    fp2_add(s, a.c0, a.c2);
    fp2_add(u, b.c0, b.c2);
    fp2_mul(m, s, u);
    fp2_sub(m, m, t0);
    fp2_sub(m, m, t2);
    fp2_add(c2, m, t1);
    o.c0 = c0;
    o.c1 = c1;
    o.c2 = c2;
}
static inline void fp6_mul_by_v(Fp6 &o, const Fp6 &a) {
    Fp2 x;
    fp2_mul_by_xi(x, a.c2);
    Fp2 a0 = a.c0, a1 = a.c1;
    o.c0 = x;
    o.c1 = a0;
    o.c2 = a1;
}
static void fp6_inv(Fp6 &o, const Fp6 &a) {
    Fp2 c0, c1, c2, t, m, s;
    fp2_sqr(c0, a.c0);
    fp2_mul(m, a.c1, a.c2);
    fp2_mul_by_xi(m, m);
    fp2_sub(c0, c0, m);
    fp2_sqr(c1, a.c2);
    fp2_mul_by_xi(c1, c1);
    fp2_mul(m, a.c0, a.c1);
    fp2_sub(c1, c1, m);
    fp2_sqr(c2, a.c1);
    fp2_mul(m, a.c0, a.c2);
    fp2_sub(c2, c2, m);
    fp2_mul(t, a.c0, c0);
    fp2_mul(m, a.c2, c1);
    fp2_mul(s, a.c1, c2);
    fp2_add(m, m, s);
    fp2_mul_by_xi(m, m);
    fp2_add(t, t, m);
    Fp2 tinv;
    fp2_inv(tinv, t);
    fp2_mul(o.c0, c0, tinv);
    fp2_mul(o.c1, c1, tinv);
    fp2_mul(o.c2, c2, tinv);
}

static inline void fp12_add(Fp12 &o, const Fp12 &a, const Fp12 &b) {
    fp6_add(o.c0, a.c0, b.c0);
    fp6_add(o.c1, a.c1, b.c1);
}
static inline void fp12_sub(Fp12 &o, const Fp12 &a, const Fp12 &b) {
    fp6_sub(o.c0, a.c0, b.c0);
    fp6_sub(o.c1, a.c1, b.c1);
}
static void fp12_mul(Fp12 &o, const Fp12 &a, const Fp12 &b) {
    Fp6 t0, t1, s, u, m, v1;
    fp6_mul(t0, a.c0, b.c0);
    fp6_mul(t1, a.c1, b.c1);
    fp6_mul_by_v(v1, t1);
    Fp6 c0, c1;
    fp6_add(c0, t0, v1);
    fp6_add(s, a.c0, a.c1);
    fp6_add(u, b.c0, b.c1);
    fp6_mul(m, s, u);
    fp6_sub(m, m, t0);
    fp6_sub(c1, m, t1);
    o.c0 = c0;
    o.c1 = c1;
}
static void fp12_sqr(Fp12 &o, const Fp12 &a) {
    Fp6 t, s, u, m, vt;
    fp6_mul(t, a.c0, a.c1);
    fp6_add(s, a.c0, a.c1);
    fp6_mul_by_v(u, a.c1);
    fp6_add(u, a.c0, u);
    fp6_mul(m, s, u);
    fp6_sub(m, m, t);
    fp6_mul_by_v(vt, t);
    fp6_sub(o.c0, m, vt);
    fp6_add(o.c1, t, t);
}
static void fp12_inv(Fp12 &o, const Fp12 &a) {
    Fp6 s0, s1, d, t;
    fp6_mul(s0, a.c0, a.c0);
    fp6_mul(s1, a.c1, a.c1);
    fp6_mul_by_v(s1, s1);
    fp6_sub(d, s0, s1);
    fp6_inv(t, d);
    fp6_mul(o.c0, a.c0, t);
    Fp6 m;
    fp6_mul(m, a.c1, t);
    fp6_neg(o.c1, m);
}
static inline void fp12_conj(Fp12 &o, const Fp12 &a) {
    o.c0 = a.c0;
    fp6_neg(o.c1, a.c1);
}
static bool fp12_is_one(const Fp12 &a) {
    if (!fp2_eq(a.c0.c0, FP2_ONE_)) return false;
    return fp2_is_zero(a.c0.c1) && fp2_is_zero(a.c0.c2) &&
           fp2_is_zero(a.c1.c0) && fp2_is_zero(a.c1.c1) &&
           fp2_is_zero(a.c1.c2);
}

// Frobenius: gamma_i = xi^(i(p-1)/6); a^p = sum conj(c_i) gamma^i w^i
static Fp2 FROB_GAMMA[6];

static void fp2_pow_words(Fp2 &o, const Fp2 &a, const u64 *e, int nwords) {
    Fp2 result = FP2_ONE_, base = a;
    for (int w = 0; w < nwords; w++) {
        u64 bits = e[w];
        for (int i = 0; i < 64; i++) {
            if (bits & 1) fp2_mul(result, result, base);
            fp2_sqr(base, base);
            bits >>= 1;
        }
    }
    o = result;
}

static void fp12_frobenius(Fp12 &o, const Fp12 &a) {
    const Fp2 *cs[6] = {&a.c0.c0, &a.c1.c0, &a.c0.c1,
                        &a.c1.c1, &a.c0.c2, &a.c1.c2};
    Fp2 out[6];
    for (int i = 0; i < 6; i++) {
        Fp2 cj;
        fp2_conj(cj, *cs[i]);
        fp2_mul(out[i], cj, FROB_GAMMA[i]);
    }
    o.c0.c0 = out[0];
    o.c0.c1 = out[2];
    o.c0.c2 = out[4];
    o.c1.c0 = out[1];
    o.c1.c1 = out[3];
    o.c1.c2 = out[5];
}

// ---------------------------------------------------------------------------
// Miller loop: homogeneous projective twist coordinates + sparse lines.
// Same TPU-first design as ops/pairing_ops.py (the device tier): the
// doubling/addition steps are inversion-free (the previous affine
// Fp12-embedded loop paid one Fermat Fp inversion per step, ~450 Fp
// muls), and each line value is the sparse Fp12 element
//     l0 + l2 v + l3 v w      (slots w^0, w^2, w^3)
// with denominators cleared — any Fp2 scale factor is killed by the
// easy final exponentiation (c^((p^6-1)(p^2+1)) = 1 for c in Fp2*), so
// even the EXACT GT value after final exp is unchanged.  ~5x fewer Fp
// multiplications per Miller iteration than the affine loop.
// Replaces the reference's lambdaworks BLS12381AtePairing::compute_batch
// (src/utils.rs:224-236).
// ---------------------------------------------------------------------------

struct G2P { Fp2 X, Y, Z; };            // homogeneous projective on E'(Fp2)
struct PairAff { Fp xp, yp; Fp2 xq, yq; };  // G1 affine, G2 (twist) affine

static inline void fp2_dbl(Fp2 &o, const Fp2 &a) { fp2_add(o, a, a); }
static inline void fp2_smul3(Fp2 &o, const Fp2 &a) {
    Fp2 t;
    fp2_dbl(t, a);
    fp2_add(o, t, a);
}
static inline void fp2_smul8(Fp2 &o, const Fp2 &a) {
    fp2_dbl(o, a);
    fp2_dbl(o, o);
    fp2_dbl(o, o);
}
static inline void fp2_smul9(Fp2 &o, const Fp2 &a) {
    Fp2 t;
    fp2_smul8(t, a);
    fp2_add(o, t, a);
}
static inline void fp2_smul27(Fp2 &o, const Fp2 &a) {
    Fp2 t9;
    fp2_smul9(t9, a);
    fp2_dbl(o, t9);
    fp2_add(o, o, t9);
}
static inline void fp2_smul36(Fp2 &o, const Fp2 &a) {
    fp2_smul9(o, a);
    fp2_dbl(o, o);
    fp2_dbl(o, o);
}
static inline void fp2_scale_fp(Fp2 &o, const Fp2 &a, const Fp &s) {
    fp_mul(o.c0, a.c0, s);
    fp_mul(o.c1, a.c1, s);
}

// 2T and the tangent line at T evaluated at P (ops/pairing_ops._dbl_step):
//   X3 = 2YZ (9X^4 - 8XY^2Z)
//   Y3 = 36 X^3 Y^2 Z - 27 X^6 - 8 Y^4 Z^2
//   Z3 = 8 Y^3 Z^3
//   line * (2YZ^2 w^3): l0 = 3X^3 - 2Y^2Z, l2 = -3 X^2 Z xp, l3 = 2 Y Z^2 yp
static void pair_dbl_step(G2P &T, const Fp &xp, const Fp &yp,
                          Fp2 &l0, Fp2 &l2, Fp2 &l3) {
    Fp2 X2, X3p, Y2, YZ, Y2Z, YZ2;
    fp2_sqr(X2, T.X);
    fp2_mul(X3p, X2, T.X);
    fp2_sqr(Y2, T.Y);
    fp2_mul(YZ, T.Y, T.Z);
    fp2_mul(Y2Z, Y2, T.Z);
    fp2_mul(YZ2, YZ, T.Z);

    Fp2 X4, XY2Z, t9, t8, diff, twoYZ, Xn, Yn, Zn;
    fp2_mul(X4, X3p, T.X);
    fp2_mul(XY2Z, T.X, Y2Z);
    fp2_smul9(t9, X4);
    fp2_smul8(t8, XY2Z);
    fp2_sub(diff, t9, t8);
    fp2_dbl(twoYZ, YZ);
    fp2_mul(Xn, twoYZ, diff);

    Fp2 X3Y2Z, t36, X6, t27, Y2Z2, t8b;
    fp2_mul(X3Y2Z, X3p, Y2);
    fp2_mul(X3Y2Z, X3Y2Z, T.Z);
    fp2_smul36(t36, X3Y2Z);
    fp2_sqr(X6, X3p);
    fp2_smul27(t27, X6);
    fp2_sqr(Y2Z2, Y2Z);
    fp2_smul8(t8b, Y2Z2);
    fp2_sub(Yn, t36, t27);
    fp2_sub(Yn, Yn, t8b);

    Fp2 prod;
    fp2_mul(prod, Y2Z, YZ2);
    fp2_smul8(Zn, prod);

    Fp2 threeX3, twoY2Z, X2Z, threeX2Z, twoYZ2;
    fp2_smul3(threeX3, X3p);
    fp2_dbl(twoY2Z, Y2Z);
    fp2_sub(l0, threeX3, twoY2Z);
    fp2_mul(X2Z, X2, T.Z);
    fp2_smul3(threeX2Z, X2Z);
    fp2_scale_fp(l2, threeX2Z, xp);
    fp2_neg(l2, l2);
    fp2_dbl(twoYZ2, YZ2);
    fp2_scale_fp(l3, twoYZ2, yp);

    T.X = Xn;
    T.Y = Yn;
    T.Z = Zn;
}

// T + Q and the chord line through T, Q at P (ops/pairing_ops._add_step).
// With N = Y - yq Z, D = X - xq Z:
//   X3 = D (N^2 Z - D^2 (X + xq Z));  Z3 = D^3 Z
//   Y3 = N (2 xq D^2 Z + D^2 X - N^2 Z) - yq D^3 Z
//   line * (D w^3): l0 = N xq - yq D, l2 = -N xp, l3 = D yp
static void pair_add_step(G2P &T, const Fp2 &xq, const Fp2 &yq,
                          const Fp &xp, const Fp &yp,
                          Fp2 &l0, Fp2 &l2, Fp2 &l3) {
    Fp2 Nn, D, N2, D2, D3, D2Z, xqD2Z, N2Z, D2X;
    Fp2 t, Xn, Yn, Zn;
    fp2_mul(t, yq, T.Z);
    fp2_sub(Nn, T.Y, t);
    fp2_mul(t, xq, T.Z);
    fp2_sub(D, T.X, t);
    fp2_sqr(N2, Nn);
    fp2_sqr(D2, D);
    fp2_mul(D3, D2, D);
    fp2_mul(D2Z, D2, T.Z);
    fp2_mul(xqD2Z, D2Z, xq);
    fp2_mul(N2Z, N2, T.Z);
    fp2_mul(D2X, D2, T.X);

    fp2_add(t, D2X, xqD2Z);
    fp2_sub(t, N2Z, t);
    fp2_mul(Xn, t, D);

    Fp2 u;
    fp2_dbl(u, xqD2Z);
    fp2_add(u, u, D2X);
    fp2_sub(u, u, N2Z);
    fp2_mul(Yn, Nn, u);
    fp2_mul(t, yq, D3);
    fp2_mul(t, t, T.Z);
    fp2_sub(Yn, Yn, t);

    fp2_mul(Zn, D3, T.Z);

    fp2_mul(l0, Nn, xq);
    fp2_mul(t, yq, D);
    fp2_sub(l0, l0, t);
    fp2_scale_fp(l2, Nn, xp);
    fp2_neg(l2, l2);
    fp2_scale_fp(l3, D, yp);

    T.X = Xn;
    T.Y = Yn;
    T.Z = Zn;
}

// a * (c0 + c2 v) over Fp6 (two nonzero v-slots): 6 Fp2 muls
static void fp6_mul_s01(Fp6 &o, const Fp6 &a, const Fp2 &c0, const Fp2 &c2) {
    Fp2 a0c0, a1c0, a2c0, a0c2, a1c2, a2c2, xi2;
    fp2_mul(a0c0, a.c0, c0);
    fp2_mul(a1c0, a.c1, c0);
    fp2_mul(a2c0, a.c2, c0);
    fp2_mul(a0c2, a.c0, c2);
    fp2_mul(a1c2, a.c1, c2);
    fp2_mul(a2c2, a.c2, c2);
    fp2_mul_by_xi(xi2, a2c2);
    fp2_add(o.c0, a0c0, xi2);
    fp2_add(o.c1, a0c2, a1c0);
    fp2_add(o.c2, a1c2, a2c0);
}

// a * (c3 v) over Fp6: 3 Fp2 muls
static void fp6_mul_s1(Fp6 &o, const Fp6 &a, const Fp2 &c3) {
    Fp2 a0c3, a1c3, a2c3;
    fp2_mul(a0c3, a.c0, c3);
    fp2_mul(a1c3, a.c1, c3);
    fp2_mul(a2c3, a.c2, c3);
    fp2_mul_by_xi(o.c0, a2c3);
    o.c1 = a0c3;
    o.c2 = a1c3;
}

// f *= (l0 + l2 v) + (l3 v) w   — 15 Fp2 muls vs full fp12_mul's 18,
// and no wasted work on the sparse operand's zero slots
static void fp12_mul_sparse(Fp12 &f, const Fp2 &l0, const Fp2 &l2,
                            const Fp2 &l3) {
    Fp6 ag0, bg1, ag1, bg0, vbg1, o0, o1;
    fp6_mul_s01(ag0, f.c0, l0, l2);
    fp6_mul_s1(bg1, f.c1, l3);
    fp6_mul_s1(ag1, f.c0, l3);
    fp6_mul_s01(bg0, f.c1, l0, l2);
    fp6_mul_by_v(vbg1, bg1);
    fp6_add(o0, ag0, vbg1);
    fp6_add(o1, ag1, bg0);
    f.c0 = o0;
    f.c1 = o1;
}

// |BLS_X| = 0xd201000000010000
static const u64 LOOP = 0xd201000000010000ULL;

static void miller_loop_batch(Fp12 &f, const PairAff *pairs, int n) {
    f = FP12_ONE_;
    G2P ts[4];
    for (int i = 0; i < n; i++) {
        ts[i].X = pairs[i].xq;
        ts[i].Y = pairs[i].yq;
        ts[i].Z = FP2_ONE_;
    }
    int msb = 63;
    while (!((LOOP >> msb) & 1)) msb--;
    for (int bit = msb - 1; bit >= 0; bit--) {
        fp12_sqr(f, f);
        for (int i = 0; i < n; i++) {
            Fp2 l0, l2, l3;
            pair_dbl_step(ts[i], pairs[i].xp, pairs[i].yp, l0, l2, l3);
            fp12_mul_sparse(f, l0, l2, l3);
            if ((LOOP >> bit) & 1) {
                pair_add_step(ts[i], pairs[i].xq, pairs[i].yq, pairs[i].xp,
                              pairs[i].yp, l0, l2, l3);
                fp12_mul_sparse(f, l0, l2, l3);
            }
        }
    }
    Fp12 c;
    fp12_conj(c, f);  // BLS x < 0
    f = c;
}

// hard exponent (p^4 - p^2 + 1) / r: 2539 bits, 40 x u64 words
static u64 HARD_EXP[40];
static int HARD_WORDS = 0;

static void fp12_pow_words(Fp12 &o, const Fp12 &a, const u64 *e, int nwords) {
    Fp12 result = FP12_ONE_, base = a;
    for (int w = 0; w < nwords; w++) {
        u64 bits = e[w];
        for (int i = 0; i < 64; i++) {
            if (bits & 1) fp12_mul(result, result, base);
            fp12_sqr(base, base);
            bits >>= 1;
        }
    }
    o = result;
}

// (a + b s)^2 in Fp4 = Fp2[s]/(s^2 - xi): (a^2 + xi b^2, (a+b)^2 - a^2 - b^2)
static inline void fp4_sq(Fp2 &o0, Fp2 &o1, const Fp2 &a, const Fp2 &b) {
    Fp2 t0, t1, s, x;
    fp2_sqr(t0, a);
    fp2_sqr(t1, b);
    fp2_mul_by_xi(x, t1);
    fp2_add(o0, t0, x);
    fp2_add(s, a, b);
    fp2_sqr(s, s);
    fp2_sub(s, s, t0);
    fp2_sub(o1, s, t1);
}

// Granger-Scott squaring, valid in the cyclotomic subgroup only (post
// easy part — where the final-exp hard part lives): 3 Fp4 squarings
// (9 Fp2 squarings) vs fp12_sqr's ~18 Fp2 muls. Differentially
// validated against fp12_sqr on cyclotomic elements.
static void fp12_cyc_sqr(Fp12 &o, const Fp12 &g) {
    Fp2 z0 = g.c0.c0, z4 = g.c0.c1, z3 = g.c0.c2;
    Fp2 z2 = g.c1.c0, z1 = g.c1.c1, z5 = g.c1.c2;
    Fp2 t0, t1, t2, t3, r, x3;
    fp4_sq(t0, t1, z0, z1);
    fp2_sub(r, t0, z0);  // z0 = 3 t0 - 2 z0
    fp2_add(r, r, r);
    fp2_add(z0, r, t0);
    fp2_add(r, t1, z1);  // z1 = 3 t1 + 2 z1
    fp2_add(r, r, r);
    fp2_add(z1, r, t1);
    fp4_sq(t0, t1, z2, z3);
    fp4_sq(t2, t3, z4, z5);
    fp2_sub(r, t0, z4);  // z4 = 3 t0 - 2 z4
    fp2_add(r, r, r);
    fp2_add(z4, r, t0);
    fp2_add(r, t1, z5);  // z5 = 3 t1 + 2 z5
    fp2_add(r, r, r);
    fp2_add(z5, r, t1);
    fp2_mul_by_xi(x3, t3);
    fp2_add(r, x3, z2);  // z2 = 3 xi t3 + 2 z2
    fp2_add(r, r, r);
    fp2_add(z2, r, x3);
    fp2_sub(r, t2, z3);  // z3 = 3 t2 - 2 z3
    fp2_add(r, r, r);
    fp2_add(z3, r, t2);
    o.c0.c0 = z0;
    o.c0.c1 = z4;
    o.c0.c2 = z3;
    o.c1.c0 = z2;
    o.c1.c1 = z1;
    o.c1.c2 = z5;
}

// a^x for the (negative) BLS parameter x = -|x|, valid in the cyclotomic
// subgroup where inversion is conjugation (post-easy-part only).
static void exp_by_x(Fp12 &o, const Fp12 &a) {
    Fp12 res = FP12_ONE_, base = a;
    u64 bits = LOOP;
    while (bits) {
        if (bits & 1) fp12_mul(res, res, base);
        fp12_cyc_sqr(base, base);
        bits >>= 1;
    }
    fp12_conj(o, res);
}

static void final_exponentiation(Fp12 &o, const Fp12 &f) {
    // easy part: m = f^((p^6-1)(p^2+1))
    Fp12 c, inv, m, fr;
    fp12_conj(c, f);
    fp12_inv(inv, f);
    fp12_mul(m, c, inv);  // f^(p^6 - 1)
    fp12_frobenius(fr, m);
    fp12_frobenius(fr, fr);  // ^(p^2)
    fp12_mul(m, fr, m);      // ^(p^2 + 1)

    // hard part via the exponent 3d (Hayashida-Hayasaka-Teruya):
    //   3 (p^4 - p^2 + 1)/r = (x-1)^2 (x+p) (x^2 + p^2 - 1) + 3.
    // m^(3d) == 1  <=>  m^d == 1 (gcd(3, r) = 1, r prime), and the C API
    // only exposes the ==1 check. ~5 x-powers instead of a 2539-bit
    // exponentiation.
    Fp12 t, a, b, s, tmp1, tmp2;
    fp12_conj(tmp1, m);                       // m^-1 (cyclotomic)
    exp_by_x(t, m);
    fp12_mul(t, t, tmp1);                     // m^(x-1)
    fp12_conj(tmp1, t);
    exp_by_x(a, t);
    fp12_mul(a, a, tmp1);                     // m^((x-1)^2)
    exp_by_x(tmp1, a);
    fp12_frobenius(tmp2, a);
    fp12_mul(b, tmp1, tmp2);                  // ^(x+p)
    exp_by_x(tmp1, b);
    exp_by_x(tmp1, tmp1);                     // b^(x^2)
    fp12_frobenius(tmp2, b);
    fp12_frobenius(tmp2, tmp2);               // b^(p^2)
    fp12_mul(s, tmp1, tmp2);
    fp12_conj(tmp2, b);
    fp12_mul(s, s, tmp2);                     // ^(x^2 + p^2 - 1)
    fp12_cyc_sqr(tmp1, m);
    fp12_mul(tmp1, tmp1, m);                  // m^3
    fp12_mul(o, s, tmp1);
}

// exact-exponent variant (m^d), kept for oracle-value parity/debugging
static void final_exponentiation_exact(Fp12 &o, const Fp12 &f) {
    Fp12 c, inv, t, fr;
    fp12_conj(c, f);
    fp12_inv(inv, f);
    fp12_mul(t, c, inv);
    fp12_frobenius(fr, t);
    fp12_frobenius(fr, fr);
    fp12_mul(t, fr, t);
    fp12_pow_words(o, t, HARD_EXP, HARD_WORDS);
}

// ---------------------------------------------------------------------------
// G1 (Fp) / G2 (Fp2) Jacobian scalar mul for subgroup checks
// ---------------------------------------------------------------------------

template <typename F>
struct FieldVt {
    void (*add)(F &, const F &, const F &);
    void (*sub)(F &, const F &, const F &);
    void (*mul)(F &, const F &, const F &);
    void (*sqr)(F &, const F &);
    bool (*is_zero)(const F &);
};

template <typename F>
struct Jac { F x, y, z; bool inf; };

template <typename F>
static void jac_double(const FieldVt<F> &f, Jac<F> &o, const Jac<F> &p) {
    if (p.inf) { o = p; return; }
    F xx, yy, yyyy, zz, s, m, t, y8, tmp, a;
    f.sqr(xx, p.x);
    f.sqr(yy, p.y);
    f.sqr(yyyy, yy);
    f.sqr(zz, p.z);
    f.add(a, p.x, yy);
    f.sqr(s, a);
    f.sub(s, s, xx);
    f.sub(s, s, yyyy);
    f.add(s, s, s);
    f.add(m, xx, xx);
    f.add(m, m, xx);
    f.sqr(t, m);
    f.add(tmp, s, s);
    f.sub(t, t, tmp);
    f.add(y8, yyyy, yyyy);
    f.add(y8, y8, y8);
    f.add(y8, y8, y8);
    F y3, z3;
    f.sub(tmp, s, t);
    f.mul(y3, m, tmp);
    f.sub(y3, y3, y8);
    f.add(a, p.y, p.z);
    f.sqr(z3, a);
    f.sub(z3, z3, yy);
    f.sub(z3, z3, zz);
    o.x = t;
    o.y = y3;
    o.z = z3;
    o.inf = f.is_zero(z3);
}

template <typename F>
static void jac_add(const FieldVt<F> &f, Jac<F> &o, const Jac<F> &p,
                    const Jac<F> &q) {
    if (p.inf) { o = q; return; }
    if (q.inf) { o = p; return; }
    F z1z1, z2z2, u1, u2, s1, s2, h, r, tmp;
    f.sqr(z1z1, p.z);
    f.sqr(z2z2, q.z);
    f.mul(u1, p.x, z2z2);
    f.mul(u2, q.x, z1z1);
    f.mul(tmp, p.y, q.z);
    f.mul(s1, tmp, z2z2);
    f.mul(tmp, q.y, p.z);
    f.mul(s2, tmp, z1z1);
    f.sub(h, u2, u1);
    f.sub(r, s2, s1);
    if (f.is_zero(h)) {
        if (f.is_zero(r)) { jac_double(f, o, p); return; }
        o.inf = true;
        memset(&o.x, 0, sizeof(o.x));
        memset(&o.y, 0, sizeof(o.y));
        memset(&o.z, 0, sizeof(o.z));
        return;
    }
    F hh, i, j, r2, v, x3, y3, z3;
    f.sqr(hh, h);
    f.add(i, hh, hh);
    f.add(i, i, i);
    f.mul(j, h, i);
    f.add(r2, r, r);
    f.mul(v, u1, i);
    f.sqr(x3, r2);
    f.sub(x3, x3, j);
    f.add(tmp, v, v);
    f.sub(x3, x3, tmp);
    f.sub(tmp, v, x3);
    f.mul(y3, r2, tmp);
    f.mul(tmp, s1, j);
    f.add(tmp, tmp, tmp);
    f.sub(y3, y3, tmp);
    f.add(tmp, p.z, q.z);
    f.sqr(z3, tmp);
    f.sub(z3, z3, z1z1);
    f.sub(z3, z3, z2z2);
    f.mul(z3, z3, h);
    o.x = x3;
    o.y = y3;
    o.z = z3;
    o.inf = f.is_zero(z3);
}

// r (subgroup order), big-endian bit scan
static const u64 R_ORDER[4] = {
    0xffffffff00000001ULL, 0x53bda402fffe5bfeULL,
    0x3339d80809a1d805ULL, 0x73eda753299d7d48ULL};

template <typename F>
static void jac_scalar_mul(const FieldVt<F> &f, Jac<F> &o, const Jac<F> &p,
                           const u64 *k, int nwords) {
    Jac<F> acc;
    acc.inf = true;
    memset(&acc.x, 0, sizeof(acc.x));
    memset(&acc.y, 0, sizeof(acc.y));
    memset(&acc.z, 0, sizeof(acc.z));
    Jac<F> base = p;
    for (int w = 0; w < nwords; w++) {
        u64 bits = k[w];
        for (int i = 0; i < 64; i++) {
            if (bits & 1) jac_add(f, acc, acc, base);
            jac_double(f, base, base);
            bits >>= 1;
        }
    }
    o = acc;
}

static bool fp_is_zero_w(const Fp &a) { return fp_is_zero(a); }
static bool fp2_is_zero_w(const Fp2 &a) { return fp2_is_zero(a); }

static FieldVt<Fp> FP_VT = {fp_add, fp_sub, fp_mul, fp_sqr, fp_is_zero_w};
static FieldVt<Fp2> FP2_VT = {fp2_add, fp2_sub, fp2_mul, fp2_sqr,
                              fp2_is_zero_w};

// ---------------------------------------------------------------------------
// init + public C API
// ---------------------------------------------------------------------------

static bool INITIALIZED = false;
static void fr_init(void);  // defined with the Fr section below

static void set_hard_exp() {
    // (p^4 - p^2 + 1) / r, provided as a little-endian u64 table computed
    // by scripts/gen_native_constants.py from the public parameters.
    static const u64 words[] = {
        #include "hard_exp.inc"
    };
    HARD_WORDS = (int)(sizeof(words) / sizeof(words[0]));
    for (int i = 0; i < HARD_WORDS; i++) HARD_EXP[i] = words[i];
}

extern "C" int lw_init(void) {
    if (INITIALIZED) return 0;
    memset(&FP_ZERO, 0, sizeof(FP_ZERO));
    // N0INV = -N^{-1} mod 2^64 (Newton)
    u64 x = 1;
    for (int i = 0; i < 6; i++) x *= 2 - N[0] * x;
    N0INV = (u64)(0 - x);
    // FP_ONE = 2^384 mod N, FP_R2 = 2^768 mod N via doubling
    Fp r = {{1, 0, 0, 0, 0, 0}};
    for (int i = 0; i < 384; i++) fp_add(r, r, r);
    FP_ONE = r;
    for (int i = 0; i < 384; i++) fp_add(r, r, r);
    FP_R2 = r;

    memset(&FP2_ZERO_, 0, sizeof(FP2_ZERO_));
    FP2_ONE_.c0 = FP_ONE;
    memset(&FP2_ONE_.c1, 0, sizeof(Fp));
    memset(&FP6_ZERO_, 0, sizeof(FP6_ZERO_));
    memset(&FP6_ONE_, 0, sizeof(FP6_ONE_));
    FP6_ONE_.c0 = FP2_ONE_;
    memset(&FP12_ONE_, 0, sizeof(FP12_ONE_));
    FP12_ONE_.c0 = FP6_ONE_;

    // Frobenius gammas: xi^((p-1)/6) powers; (p-1)/6 fits 6 u64 words
    static const u64 pm1_over6[6] = {
        0x9eaaaaaaaaaac71cULL, 0x5a71ffffc8e33555ULL, 0x913378C5291E7D0BULL,
        0x9618E1F34A62631FULL, 0x61D9F13E5B87C779ULL, 0x0455830516994519ULL};
    // recompute exactly instead: (P-1)/6 derived at init from N
    u64 pm1[6];
    {
        u128 borrow = 0;
        for (int i = 0; i < 6; i++) {
            u128 d = (u128)N[i] - (i == 0 ? 1 : 0) - borrow;
            pm1[i] = (u64)d;
            borrow = (d >> 64) & 1;
        }
        // divide by 6
        u128 rem = 0;
        u64 q[6];
        for (int i = 5; i >= 0; i--) {
            u128 cur = (rem << 64) | pm1[i];
            q[i] = (u64)(cur / 6);
            rem = cur % 6;
        }
        for (int i = 0; i < 6; i++) pm1[i] = q[i];
    }
    (void)pm1_over6;
    Fp2 xi;
    xi.c0 = FP_ONE;
    xi.c1 = FP_ONE;
    Fp2 base;
    fp2_pow_words(base, xi, pm1, 6);
    Fp2 acc = FP2_ONE_;
    for (int i = 0; i < 6; i++) {
        FROB_GAMMA[i] = acc;
        fp2_mul(acc, acc, base);
    }

    fr_init();
    set_hard_exp();
    INITIALIZED = true;
    return 0;
}

// ---------------------------------------------------------------------------
// Fr: 4x64-bit Montgomery (the scalar field), for host-side polynomial ops
// ---------------------------------------------------------------------------

struct Fr { u64 l[4]; };

static Fr FR_ONE_, FR_R2_;
static u64 R0INV;

static inline int fr_cmp_r(const Fr &a) {
    for (int i = 3; i >= 0; i--) {
        if (a.l[i] > R_ORDER[i]) return 1;
        if (a.l[i] < R_ORDER[i]) return -1;
    }
    return 0;
}

static inline void fr_sub_r(Fr &a) {
    u128 borrow = 0;
    for (int i = 0; i < 4; i++) {
        u128 d = (u128)a.l[i] - R_ORDER[i] - borrow;
        a.l[i] = (u64)d;
        borrow = (d >> 64) & 1;
    }
}

static inline void fr_add(Fr &o, const Fr &a, const Fr &b) {
    u128 carry = 0;
    for (int i = 0; i < 4; i++) {
        u128 s = (u128)a.l[i] + b.l[i] + carry;
        o.l[i] = (u64)s;
        carry = s >> 64;
    }
    if (carry || fr_cmp_r(o) >= 0) fr_sub_r(o);
}

static inline void fr_sub(Fr &o, const Fr &a, const Fr &b) {
    u128 borrow = 0;
    for (int i = 0; i < 4; i++) {
        u128 d = (u128)a.l[i] - b.l[i] - borrow;
        o.l[i] = (u64)d;
        borrow = (d >> 64) & 1;
    }
    if (borrow) {
        u128 carry = 0;
        for (int i = 0; i < 4; i++) {
            u128 s = (u128)o.l[i] + R_ORDER[i] + carry;
            o.l[i] = (u64)s;
            carry = s >> 64;
        }
    }
}

static void fr_mul(Fr &out, const Fr &a, const Fr &b) {
    u64 t[6] = {0};
    for (int i = 0; i < 4; i++) {
        u128 carry = 0;
        u64 ai = a.l[i];
        for (int j = 0; j < 4; j++) {
            u128 s = (u128)ai * b.l[j] + t[j] + carry;
            t[j] = (u64)s;
            carry = s >> 64;
        }
        u128 s = (u128)t[4] + carry;
        t[4] = (u64)s;
        t[5] = (u64)(s >> 64);

        u64 m = t[0] * R0INV;
        carry = 0;
        u128 s0 = (u128)m * R_ORDER[0] + t[0];
        carry = s0 >> 64;
        for (int j = 1; j < 4; j++) {
            u128 sj = (u128)m * R_ORDER[j] + t[j] + carry;
            t[j - 1] = (u64)sj;
            carry = sj >> 64;
        }
        u128 s4 = (u128)t[4] + carry;
        t[3] = (u64)s4;
        t[4] = t[5] + (u64)(s4 >> 64);
        t[5] = 0;
    }
    Fr r;
    memcpy(r.l, t, sizeof(r.l));
    if (t[4] || fr_cmp_r(r) >= 0) fr_sub_r(r);
    out = r;
}

static const u64 R_MINUS_2[4] = {
    0xfffffffeffffffffULL, 0x53bda402fffe5bfeULL,
    0x3339d80809a1d805ULL, 0x73eda753299d7d48ULL};

static void fr_inv(Fr &o, const Fr &a) {
    Fr result = FR_ONE_, base = a;
    for (int w = 0; w < 4; w++) {
        u64 bits = R_MINUS_2[w];
        for (int i = 0; i < 64; i++) {
            if (bits & 1) fr_mul(result, result, base);
            fr_mul(base, base, base);
            bits >>= 1;
        }
    }
    o = result;
}

static bool fr_from_le(Fr &out, const uint8_t *le32) {
    Fr plain;
    for (int i = 0; i < 4; i++) {
        u64 v = 0;
        for (int j = 7; j >= 0; j--) v = (v << 8) | le32[i * 8 + j];
        plain.l[i] = v;
    }
    bool canonical = fr_cmp_r(plain) < 0;
    fr_mul(out, plain, FR_R2_);
    return canonical;
}

static void fr_to_le(uint8_t *le32, const Fr &a) {
    Fr one = {{1, 0, 0, 0}}, plain;
    fr_mul(plain, a, one);
    for (int i = 0; i < 4; i++) {
        u64 v = plain.l[i];
        for (int j = 0; j < 8; j++) le32[i * 8 + j] = (uint8_t)(v >> (8 * j));
    }
}

static void fr_init(void) {
    u64 x = 1;
    for (int i = 0; i < 6; i++) x *= 2 - R_ORDER[0] * x;
    R0INV = (u64)(0 - x);
    Fr r = {{1, 0, 0, 0}};
    // 2^256 mod r via doubling
    for (int i = 0; i < 256; i++) fr_add(r, r, r);
    FR_ONE_ = r;
    for (int i = 0; i < 256; i++) fr_add(r, r, r);
    FR_R2_ = r;
}

/*
 * Barycentric blob evaluation on the host (the protocol's p(z):
 * consensus-spec semantics, same formula as host/fft.barycentric_evaluate
 * and ops/fr_poly). blob/roots are n x 32-byte little-endian; roots are
 * the bit-reversal-permuted domain. Returns 0 ok (y written), 2 if any
 * blob element is non-canonical, 3 on bad n.
 */
extern "C" int lw_blob_eval(const uint8_t *blob, const uint8_t *roots,
                            size_t n, const uint8_t *z32le,
                            uint8_t *y32le_out) {
    if (!INITIALIZED) lw_init();
    if (n == 0 || (n & (n - 1)) != 0 || n > (1u << 26)) return 3;
    Fr z;
    if (!fr_from_le(z, z32le)) return 2;

    Fr *e = new Fr[n], *w = new Fr[n], *d = new Fr[n], *pre = new Fr[n];
    int ret = 0;
    size_t in_domain = n;
    for (size_t i = 0; i < n; i++) {
        if (!fr_from_le(e[i], blob + 32 * i)) { ret = 2; break; }
        fr_from_le(w[i], roots + 32 * i);
        Fr diff;
        fr_sub(diff, z, w[i]);
        bool zero = true;
        for (int k = 0; k < 4; k++) zero &= diff.l[k] == 0;
        if (zero) in_domain = i;
        d[i] = diff;
    }
    if (ret == 0 && in_domain < n) {
        fr_to_le(y32le_out, e[in_domain]);
    } else if (ret == 0) {
        // batched inversion (Montgomery's trick)
        pre[0] = d[0];
        for (size_t i = 1; i < n; i++) fr_mul(pre[i], pre[i - 1], d[i]);
        Fr inv_all;
        fr_inv(inv_all, pre[n - 1]);
        Fr acc = {{0, 0, 0, 0}};
        for (size_t i = n; i-- > 0;) {
            Fr inv_i;
            if (i == 0) inv_i = inv_all;
            else fr_mul(inv_i, inv_all, pre[i - 1]);
            Fr term;
            fr_mul(term, e[i], w[i]);
            fr_mul(term, term, inv_i);
            fr_add(acc, acc, term);
            fr_mul(inv_all, inv_all, d[i]);
        }
        // y = acc * (z^n - 1) / n
        Fr zn = z;
        size_t logn = 0;
        while (((size_t)1 << logn) < n) logn++;
        for (size_t s = 0; s < logn; s++) fr_mul(zn, zn, zn);
        Fr zn1;
        fr_sub(zn1, zn, FR_ONE_);
        Fr n_fr = {{0, 0, 0, 0}};
        // n in Montgomery form: n * R mod r built by doubling FR_ONE_
        Fr cur = FR_ONE_;
        for (size_t s = 0; s < logn; s++) fr_add(cur, cur, cur);
        n_fr = cur;
        Fr n_inv;
        fr_inv(n_inv, n_fr);
        fr_mul(acc, acc, zn1);
        fr_mul(acc, acc, n_inv);
        fr_to_le(y32le_out, acc);
    }
    delete[] e;
    delete[] w;
    delete[] d;
    delete[] pre;
    return ret;
}

// parse affine G1 (96B BE x||y) / G2 (192B BE x0||x1||y0||y1)
static void pair_from_bytes(PairAff &o, const uint8_t *p96,
                            const uint8_t *q192) {
    fp_from_be(o.xp, p96);
    fp_from_be(o.yp, p96 + 48);
    fp_from_be(o.xq.c0, q192);
    fp_from_be(o.xq.c1, q192 + 48);
    fp_from_be(o.yq.c0, q192 + 96);
    fp_from_be(o.yq.c1, q192 + 144);
}

extern "C" int lw_pairings_verify(const uint8_t *a1, int a1_inf,
                                  const uint8_t *a2, int a2_inf,
                                  const uint8_t *b1, int b1_inf,
                                  const uint8_t *b2, int b2_inf) {
    if (!INITIALIZED) lw_init();
    PairAff pairs[2];
    int n = 0;
    if (!a1_inf && !a2_inf) {
        pair_from_bytes(pairs[n], a1, a2);
        Fp ny;  // negate a1: e(-a1, a2) * e(b1, b2) == 1
        fp_neg(ny, pairs[n].yp);
        pairs[n].yp = ny;
        n++;
    }
    if (!b1_inf && !b2_inf) {
        pair_from_bytes(pairs[n], b1, b2);
        n++;
    }
    if (n == 0) return 1;
    Fp12 f, out;
    miller_loop_batch(f, pairs, n);
    final_exponentiation(out, f);
    return fp12_is_one(out) ? 1 : 0;
}

extern "C" int lw_pairings_verify_exact(const uint8_t *a1, int a1_inf,
                                        const uint8_t *a2, int a2_inf,
                                        const uint8_t *b1, int b1_inf,
                                        const uint8_t *b2, int b2_inf) {
    // exact-exponent variant: the GT value equals the Python oracle's
    // (the sparse loop's dropped Fp2 factors die in the easy part)
    if (!INITIALIZED) lw_init();
    PairAff pairs[2];
    int n = 0;
    if (!a1_inf && !a2_inf) {
        pair_from_bytes(pairs[n], a1, a2);
        Fp ny;
        fp_neg(ny, pairs[n].yp);
        pairs[n].yp = ny;
        n++;
    }
    if (!b1_inf && !b2_inf) {
        pair_from_bytes(pairs[n], b1, b2);
        n++;
    }
    if (n == 0) return 1;
    Fp12 f, out;
    miller_loop_batch(f, pairs, n);
    final_exponentiation_exact(out, f);
    return fp12_is_one(out) ? 1 : 0;
}

// ---------------------------------------------------------------------------
// Fast subgroup checks (Scott's endomorphism method; the checks blst ships)
//
// G1: P in G1  <=>  sigma(P) == -[x^2]P, sigma(x,y) = (BETA*x, y)
// G2: Q in G2  <=>  psi(Q)  == -[|x|]Q,  psi(x,y) = (PSI_X*conj(x),
//                                                    PSI_Y*conj(y))
// where x = -0xd201000000010000 is the BLS parameter. Two (resp. one)
// 64-bit scalar muls instead of the definitional 255-bit [r]P the
// reference runs per point (src/compression.rs:22-27). Constants and the
// eigenvalue-pairing derivation: lambdaworks_kzg_tpu/constants.py;
// differential-tested vs the definitional oracle in tests/test_native.py.
// ---------------------------------------------------------------------------

static const u64 BLS_X_ABS[1] = {0xd201000000010000ULL};

static const uint8_t G1_BETA_BE[48] = {
    0x00, 0x00, 0x00, 0x00, 0x00, 0x00, 0x00, 0x00, 0x5f, 0x19, 0x67, 0x2f,
    0xdf, 0x76, 0xce, 0x51, 0xba, 0x69, 0xc6, 0x07, 0x6a, 0x0f, 0x77, 0xea,
    0xdd, 0xb3, 0xa9, 0x3b, 0xe6, 0xf8, 0x96, 0x88, 0xde, 0x17, 0xd8, 0x13,
    0x62, 0x0a, 0x00, 0x02, 0x2e, 0x01, 0xff, 0xff, 0xff, 0xfe, 0xff, 0xfe};
static const uint8_t PSI_X_C1_BE[48] = {
    0x1a, 0x01, 0x11, 0xea, 0x39, 0x7f, 0xe6, 0x99, 0xec, 0x02, 0x40, 0x86,
    0x63, 0xd4, 0xde, 0x85, 0xaa, 0x0d, 0x85, 0x7d, 0x89, 0x75, 0x9a, 0xd4,
    0x89, 0x7d, 0x29, 0x65, 0x0f, 0xb8, 0x5f, 0x9b, 0x40, 0x94, 0x27, 0xeb,
    0x4f, 0x49, 0xff, 0xfd, 0x8b, 0xfd, 0x00, 0x00, 0x00, 0x00, 0xaa, 0xad};
static const uint8_t PSI_Y_C0_BE[48] = {
    0x13, 0x52, 0x03, 0xe6, 0x01, 0x80, 0xa6, 0x8e, 0xe2, 0xe9, 0xc4, 0x48,
    0xd7, 0x7a, 0x2c, 0xd9, 0x1c, 0x3d, 0xed, 0xd9, 0x30, 0xb1, 0xcf, 0x60,
    0xef, 0x39, 0x64, 0x89, 0xf6, 0x1e, 0xb4, 0x5e, 0x30, 0x44, 0x66, 0xcf,
    0x3e, 0x67, 0xfa, 0x0a, 0xf1, 0xee, 0x7b, 0x04, 0x12, 0x1b, 0xde, 0xa2};
static const uint8_t PSI_Y_C1_BE[48] = {
    0x06, 0xaf, 0x0e, 0x04, 0x37, 0xff, 0x40, 0x0b, 0x68, 0x31, 0xe3, 0x6d,
    0x6b, 0xd1, 0x7f, 0xfe, 0x48, 0x39, 0x5d, 0xab, 0xc2, 0xd3, 0x43, 0x5e,
    0x77, 0xf7, 0x6e, 0x17, 0x00, 0x92, 0x41, 0xc5, 0xee, 0x67, 0x99, 0x2f,
    0x72, 0xec, 0x05, 0xf4, 0xc8, 0x10, 0x84, 0xfb, 0xed, 0xe3, 0xcc, 0x09};

template <typename F>
static bool jac_eq_pts(const FieldVt<F> &f, const Jac<F> &p, const Jac<F> &q) {
    bool pi = p.inf || f.is_zero(p.z);
    bool qi = q.inf || f.is_zero(q.z);
    if (pi || qi) return pi == qi;
    F z11, z22, u1, u2, s1, s2, t, z13, z23;
    f.sqr(z11, p.z);
    f.sqr(z22, q.z);
    f.mul(u1, p.x, z22);
    f.mul(u2, q.x, z11);
    f.sub(t, u1, u2);
    if (!f.is_zero(t)) return false;
    f.mul(z13, z11, p.z);
    f.mul(z23, z22, q.z);
    f.mul(s1, p.y, z23);
    f.mul(s2, q.y, z13);
    f.sub(t, s1, s2);
    return f.is_zero(t);
}

extern "C" int lw_g1_in_subgroup(const uint8_t *p96) {
    if (!INITIALIZED) lw_init();
    Jac<Fp> p, xp, xxp;
    fp_from_be(p.x, p96);
    fp_from_be(p.y, p96 + 48);
    p.z = FP_ONE;
    p.inf = false;
    jac_scalar_mul(FP_VT, xp, p, BLS_X_ABS, 1);
    jac_scalar_mul(FP_VT, xxp, xp, BLS_X_ABS, 1);
    Fp beta, ny;
    fp_from_be(beta, G1_BETA_BE);
    Jac<Fp> sigma = p;
    fp_mul(sigma.x, p.x, beta);
    fp_neg(ny, xxp.y);
    xxp.y = ny;  // -[x^2]P
    return jac_eq_pts(FP_VT, sigma, xxp) ? 1 : 0;
}

// definitional [r]P == O (oracle for differential tests)
extern "C" int lw_g1_in_subgroup_naive(const uint8_t *p96) {
    if (!INITIALIZED) lw_init();
    Jac<Fp> p, out;
    fp_from_be(p.x, p96);
    fp_from_be(p.y, p96 + 48);
    p.z = FP_ONE;
    p.inf = false;
    jac_scalar_mul(FP_VT, out, p, R_ORDER, 4);
    return out.inf ? 1 : 0;
}

extern "C" int lw_g2_in_subgroup(const uint8_t *q192) {
    if (!INITIALIZED) lw_init();
    Jac<Fp2> q, xq;
    fp_from_be(q.x.c0, q192);
    fp_from_be(q.x.c1, q192 + 48);
    fp_from_be(q.y.c0, q192 + 96);
    fp_from_be(q.y.c1, q192 + 144);
    q.z = FP2_ONE_;
    q.inf = false;
    jac_scalar_mul(FP2_VT, xq, q, BLS_X_ABS, 1);
    Fp2 psix, psiy, cx, cy;
    memset(&psix, 0, sizeof(psix));
    fp_from_be(psix.c1, PSI_X_C1_BE);
    fp_from_be(psiy.c0, PSI_Y_C0_BE);
    fp_from_be(psiy.c1, PSI_Y_C1_BE);
    fp2_conj(cx, q.x);
    fp2_conj(cy, q.y);
    Jac<Fp2> psi;
    fp2_mul(psi.x, psix, cx);
    fp2_mul(psi.y, psiy, cy);
    psi.z = FP2_ONE_;
    psi.inf = false;
    Fp2 nyy;
    fp2_neg(nyy, xq.y);
    xq.y = nyy;  // psi acts as x = -|x|: compare psi(Q) == -[|x|]Q
    return jac_eq_pts(FP2_VT, psi, xq) ? 1 : 0;
}

extern "C" int lw_g2_in_subgroup_naive(const uint8_t *q192) {
    if (!INITIALIZED) lw_init();
    Jac<Fp2> q, out;
    fp_from_be(q.x.c0, q192);
    fp_from_be(q.x.c1, q192 + 48);
    fp_from_be(q.y.c0, q192 + 96);
    fp_from_be(q.y.c1, q192 + 144);
    q.z = FP2_ONE_;
    q.inf = false;
    jac_scalar_mul(FP2_VT, out, q, R_ORDER, 4);
    return out.inf ? 1 : 0;
}

static void fp2_inv_full(Fp2 &o, const Fp2 &a) { fp2_inv(o, a); }

extern "C" int lw_g2_scalar_mul(const uint8_t *q192, const uint8_t *k32_be,
                                uint8_t *out192) {
    if (!INITIALIZED) lw_init();
    Jac<Fp2> q, out;
    fp_from_be(q.x.c0, q192);
    fp_from_be(q.x.c1, q192 + 48);
    fp_from_be(q.y.c0, q192 + 96);
    fp_from_be(q.y.c1, q192 + 144);
    q.z = FP2_ONE_;
    q.inf = false;
    u64 k[4];
    for (int i = 0; i < 4; i++) {
        u64 v = 0;
        for (int j = 0; j < 8; j++) v = (v << 8) | k32_be[(3 - i) * 8 + j];
        k[i] = v;
    }
    jac_scalar_mul(FP2_VT, out, q, k, 4);
    if (out.inf) return 1;
    Fp2 zinv, z2, z3, ax, ay;
    fp2_inv_full(zinv, out.z);
    fp2_sqr(z2, zinv);
    fp2_mul(z3, z2, zinv);
    fp2_mul(ax, out.x, z2);
    fp2_mul(ay, out.y, z3);
    fp_to_be(out192, ax.c0);
    fp_to_be(out192 + 48, ax.c1);
    fp_to_be(out192 + 96, ay.c0);
    fp_to_be(out192 + 144, ay.c1);
    return 0;
}

extern "C" int lw_g1_scalar_mul(const uint8_t *p96, const uint8_t *k32_be,
                                uint8_t *out96) {
    if (!INITIALIZED) lw_init();
    Jac<Fp> p, out;
    fp_from_be(p.x, p96);
    fp_from_be(p.y, p96 + 48);
    p.z = FP_ONE;
    p.inf = false;
    u64 k[4];
    for (int i = 0; i < 4; i++) {
        u64 v = 0;
        for (int j = 0; j < 8; j++) v = (v << 8) | k32_be[(3 - i) * 8 + j];
        k[i] = v;
    }
    jac_scalar_mul(FP_VT, out, p, k, 4);
    if (out.inf) return 1;
    // to affine: x/z^2, y/z^3
    Fp zinv, z2, z3, ax, ay;
    fp_inv(zinv, out.z);
    fp_sqr(z2, zinv);
    fp_mul(z3, z2, zinv);
    fp_mul(ax, out.x, z2);
    fp_mul(ay, out.y, z3);
    fp_to_be(out96, ax);
    fp_to_be(out96 + 48, ay);
    return 0;
}

// ---------------------------------------------------------------------------
// G1 decompression + small-MSM entry points (the serving-latency tier).
//
// Batch verify (reference src/lib.rs:525-614) decompresses 2n points and
// runs three n-point lincombs; for serving batch sizes (n <= a few
// hundred) both are latency-bound single-digit-microsecond-per-point
// host work, the wrong shape for a device dispatch. Python-int sqrt
// costs ~5 ms/point; this tier does ~0.3 ms/point (the subgroup
// check's two [|x|]P scalar muls dominate).
// ---------------------------------------------------------------------------

// (p + 1) / 4, little-endian u64 words: p ≡ 3 (mod 4), so
// sqrt(a) = a^((p+1)/4) when a is a quadratic residue.
static const u64 P_PLUS_1_DIV_4[6] = {
    0xee7fbfffffffeaabULL, 0x07aaffffac54ffffULL, 0xd9cc34a83dac3d89ULL,
    0xd91dd2e13ce144afULL, 0x92c6e9ed90d2eb35ULL, 0x0680447a8e5ff9a6ULL};

// p as big-endian bytes, for the canonical-range check on the wire value
// (fp_from_be silently reduces mod p; x >= p must REJECT —
// host/curve.py decompress_g1 "x >= p").
static const uint8_t P_BE[48] = {
    0x1a, 0x01, 0x11, 0xea, 0x39, 0x7f, 0xe6, 0x9a, 0x4b, 0x1b, 0xa7, 0xb6,
    0x43, 0x4b, 0xac, 0xd7, 0x64, 0x77, 0x4b, 0x84, 0xf3, 0x85, 0x12, 0xbf,
    0x67, 0x30, 0xd2, 0xa0, 0xf6, 0xb0, 0xf6, 0x24, 0x1e, 0xab, 0xff, 0xfe,
    0xb1, 0x53, 0xff, 0xff, 0xb9, 0xfe, 0xff, 0xff, 0xff, 0xff, 0xaa, 0xab};

// sqrt in Fp (p ≡ 3 mod 4): out = a^((p+1)/4); false if a is a non-residue.
static bool fp_sqrt(Fp &out, const Fp &a) {
    Fp cand, sq;
    fp_pow(cand, a, P_PLUS_1_DIV_4, 6);
    fp_sqr(sq, cand);
    if (!fp_eq(sq, a)) return false;
    out = cand;
    return true;
}

// y lexicographically larger than -y? (compressed sign bit rule,
// host/curve.py _fp_lexicographically_largest / reference
// compression.rs:51-54). Compared on canonical big-endian bytes.
static bool fp_lex_largest(const Fp &y) {
    Fp ny;
    fp_neg(ny, y);
    uint8_t yb[48], nyb[48];
    fp_to_be(yb, y);
    fp_to_be(nyb, ny);
    return memcmp(yb, nyb, 48) > 0;
}

// 48-byte compressed G1 -> 96-byte big-endian affine (x || y).
// Returns 0 = ok, 1 = point at infinity (out96 zeroed),
//   -1 bad flags/encoding, -2 x >= p, -3 not on curve,
//   -4 not in subgroup. Exact parity: host/curve.py decompress_g1.
extern "C" int lw_g1_decompress(const uint8_t *in48, uint8_t *out96,
                                int subgroup_check) {
    if (!INITIALIZED) lw_init();
    uint8_t flags = in48[0];
    if (!(flags & 0x80)) return -1;  // uncompressed bit
    if (flags & 0x40) {              // infinity
        if (flags != 0xC0) return -1;
        for (int i = 1; i < 48; i++)
            if (in48[i]) return -1;
        memset(out96, 0, 96);
        return 1;
    }
    uint8_t xbe[48];
    memcpy(xbe, in48, 48);
    xbe[0] = flags & 0x1F;
    if (memcmp(xbe, P_BE, 48) >= 0) return -2;
    Fp x, y2, y, four, t;
    fp_from_be(x, xbe);
    // y^2 = x^3 + 4
    fp_sqr(t, x);
    fp_mul(y2, t, x);
    fp_add(four, FP_ONE, FP_ONE);
    fp_add(four, four, four);
    fp_add(y2, y2, four);
    if (!fp_sqrt(y, y2)) return -3;
    bool want_large = (flags & 0x20) != 0;
    if (fp_lex_largest(y) != want_large) {
        Fp ny;
        fp_neg(ny, y);
        y = ny;
    }
    fp_to_be(out96, x);
    fp_to_be(out96 + 48, y);
    if (subgroup_check && lw_g1_in_subgroup(out96) != 1) return -4;
    return 0;
}

// Pippenger MSM over <= a few thousand affine points (the batch-verify
// lincombs, reference src/lib.rs:679-685). scalars: n * 32 bytes BE;
// points: n * 96 bytes BE affine; infs[i] != 0 marks an infinity input
// (skipped). Returns 1 if the sum is infinity, 0 otherwise (out96 = BE
// affine), -1 on bad n.
extern "C" int lw_g1_msm(int n, const uint8_t *scalars,
                         const uint8_t *points, const uint8_t *infs,
                         uint8_t *out96) {
    if (!INITIALIZED) lw_init();
    if (n < 0) return -1;
    const int c = n < 64 ? 4 : 8;
    const int nbuckets = (1 << c) - 1;  // bucket 0 unused
    const int nwin = (256 + c - 1) / c;
    std::vector<Jac<Fp>> pts(n);
    std::vector<bool> skip(n);
    for (int i = 0; i < n; i++) {
        skip[i] = infs && infs[i];
        if (skip[i]) continue;
        fp_from_be(pts[i].x, points + 96 * i);
        fp_from_be(pts[i].y, points + 96 * i + 48);
        pts[i].z = FP_ONE;
        pts[i].inf = false;
    }
    Jac<Fp> acc;
    acc.inf = true;
    memset(&acc.x, 0, sizeof(acc.x));
    memset(&acc.y, 0, sizeof(acc.y));
    memset(&acc.z, 0, sizeof(acc.z));
    std::vector<Jac<Fp>> buckets(nbuckets);
    for (int w = nwin - 1; w >= 0; w--) {
        for (int k = 0; k < c; k++) jac_double(FP_VT, acc, acc);
        for (int b = 0; b < nbuckets; b++) buckets[b] = acc, buckets[b].inf = true;
        for (int i = 0; i < n; i++) {
            if (skip[i]) continue;
            int bit = c * w;
            int byte = 31 - bit / 8;
            unsigned v = scalars[32 * i + byte];
            if (byte >= 1) v |= (unsigned)scalars[32 * i + byte - 1] << 8;
            unsigned digit = (v >> (bit % 8)) & ((1u << c) - 1);
            if (digit) jac_add(FP_VT, buckets[digit - 1], buckets[digit - 1], pts[i]);
        }
        // suffix-sum: sum_b b * B_b
        Jac<Fp> run = buckets[nbuckets - 1], tot = run;
        for (int b = nbuckets - 2; b >= 0; b--) {
            jac_add(FP_VT, run, run, buckets[b]);
            jac_add(FP_VT, tot, tot, run);
        }
        jac_add(FP_VT, acc, acc, tot);
    }
    if (acc.inf) return 1;
    Fp zinv, z2, z3, ax, ay;
    fp_inv(zinv, acc.z);
    fp_sqr(z2, zinv);
    fp_mul(z3, z2, zinv);
    fp_mul(ax, acc.x, z2);
    fp_mul(ay, acc.y, z3);
    fp_to_be(out96, ax);
    fp_to_be(out96 + 48, ay);
    return 0;
}
