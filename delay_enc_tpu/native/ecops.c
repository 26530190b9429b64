/* Native host-side BN254 G1 elliptic-curve kernels.
 *
 * Two hot host paths use these (both are pure-Python fallbacks otherwise):
 *
 *  1. The prover's MSM plane fold: the device returns per-commitment base-B
 *     digit-plane sums (projective Montgomery points in the (3,16) u16-limb
 *     layout of ops/limbs.py); the Horner combine sum_p B^p S_p is a
 *     sequential ~380-step double/add chain per commitment — microseconds
 *     in C vs ~10 ms in Python bignum per commitment (~30 commitments per
 *     proof, reference pipeline benches/delay_enc.rs:123).
 *  2. The verifier's multi-scalar multiplication over ~75 commitment points
 *     (the GWC combination, halo2_proofs verifier equivalent).
 *
 * Field arithmetic: 4x64-bit Montgomery (CIOS with __uint128_t), same
 * conventions as limbops.c.  Field parameters are passed per call so the
 * binary stays field-agnostic.  Point formulas:
 *   - complete projective add: Renes-Costello-Batina 2016 Alg 7 (a=0,
 *     b3=9), branchless w.r.t. identity/doubling edge cases;
 *   - Jacobian double (dbl-2009-l) + mixed add (madd-2007-bl) for the MSM.
 *
 * Compiled at import time by delay_enc_tpu/native/__init__.py; loaded via
 * ctypes with silent pure-Python fallback.
 */

#include <stdint.h>
#include <stddef.h>
#include <string.h>

typedef unsigned __int128 u128;
typedef struct { uint64_t w[4]; } u256;

typedef struct {
    u256 p;
    u256 r2;      /* R^2 mod p */
    u256 one;     /* R mod p (Montgomery 1) */
    uint64_t n0inv;
} fctx;

static inline int fe_is_zero(const u256 *a) {
    return (a->w[0] | a->w[1] | a->w[2] | a->w[3]) == 0;
}

static inline int fe_geq(const u256 *a, const u256 *b) {
    for (int i = 3; i >= 0; i--) {
        if (a->w[i] != b->w[i]) return a->w[i] > b->w[i];
    }
    return 1;
}

static inline void fe_sub_raw(u256 *a, const u256 *b) {
    u128 borrow = 0;
    for (int i = 0; i < 4; i++) {
        u128 d = (u128)a->w[i] - b->w[i] - borrow;
        a->w[i] = (uint64_t)d;
        borrow = (d >> 64) & 1;
    }
}

static inline void fe_add(const fctx *c, const u256 *a, const u256 *b, u256 *out) {
    u128 carry = 0;
    u256 r;
    for (int i = 0; i < 4; i++) {
        u128 s = (u128)a->w[i] + b->w[i] + carry;
        r.w[i] = (uint64_t)s;
        carry = s >> 64;
    }
    if (carry || fe_geq(&r, &c->p)) fe_sub_raw(&r, &c->p);
    *out = r;
}

static inline void fe_sub(const fctx *c, const u256 *a, const u256 *b, u256 *out) {
    u256 r = *a;
    u128 borrow = 0;
    for (int i = 0; i < 4; i++) {
        u128 d = (u128)r.w[i] - b->w[i] - borrow;
        r.w[i] = (uint64_t)d;
        borrow = (d >> 64) & 1;
    }
    if (borrow) {
        u128 carry = 0;
        for (int i = 0; i < 4; i++) {
            u128 s = (u128)r.w[i] + c->p.w[i] + carry;
            r.w[i] = (uint64_t)s;
            carry = s >> 64;
        }
    }
    *out = r;
}

static void fe_mul(const fctx *c, const u256 *a, const u256 *b, u256 *out) {
    uint64_t t[6] = {0, 0, 0, 0, 0, 0};
    for (int i = 0; i < 4; i++) {
        u128 carry = 0;
        for (int j = 0; j < 4; j++) {
            u128 cur = (u128)t[j] + (u128)a->w[i] * b->w[j] + carry;
            t[j] = (uint64_t)cur;
            carry = cur >> 64;
        }
        u128 cur = (u128)t[4] + carry;
        t[4] = (uint64_t)cur;
        t[5] = (uint64_t)(cur >> 64);
        uint64_t m = t[0] * c->n0inv;
        carry = 0;
        for (int j = 0; j < 4; j++) {
            u128 c2 = (u128)t[j] + (u128)m * c->p.w[j] + carry;
            if (j > 0) t[j - 1] = (uint64_t)c2;
            carry = c2 >> 64;
        }
        cur = (u128)t[4] + carry;
        t[3] = (uint64_t)cur;
        cur = (u128)t[5] + (cur >> 64);
        t[4] = (uint64_t)cur;
        t[5] = 0;
    }
    u256 r = {{t[0], t[1], t[2], t[3]}};
    if (t[4] || fe_geq(&r, &c->p)) fe_sub_raw(&r, &c->p);
    *out = r;
}

/* a^(p-2) (Fermat inverse), Montgomery domain. */
static void fe_inv(const fctx *c, const u256 *a, u256 *out) {
    u256 e = c->p;
    u256 two = {{2, 0, 0, 0}};
    fe_sub_raw(&e, &two);
    u256 r = c->one, base = *a;
    for (int i = 0; i < 256; i++) {
        if ((e.w[i >> 6] >> (i & 63)) & 1) fe_mul(c, &r, &base, &r);
        fe_mul(c, &base, &base, &base);
    }
    *out = r;
}

static void fctx_init(fctx *c, const uint64_t *p_words, const uint64_t *r2_words,
                      uint64_t n0inv) {
    memcpy(c->p.w, p_words, 32);
    memcpy(c->r2.w, r2_words, 32);
    c->n0inv = n0inv;
    /* Montgomery 1 = R mod p = mont_mul(1, R^2) */
    u256 lit_one = {{1, 0, 0, 0}};
    fe_mul(c, &lit_one, &c->r2, &c->one);
}

/* ------------------------------------------------------------------ */
/* projective points (X:Y:Z), Montgomery-domain coordinates            */

typedef struct { u256 x, y, z; } pproj;

static void pp_identity(const fctx *c, pproj *o) {
    memset(o, 0, sizeof(*o));
    o->y = c->one;
}

/* complete addition, y^2 = x^3 + 3 (b3 = 9): RCB16 Algorithm 7 */
static void pp_add(const fctx *c, const pproj *A, const pproj *B, pproj *O) {
    u256 t0, t1, t2, t3, t4, y3p, s1, s2;
    fe_mul(c, &A->x, &B->x, &t0);
    fe_mul(c, &A->y, &B->y, &t1);
    fe_mul(c, &A->z, &B->z, &t2);
    fe_add(c, &A->x, &A->y, &s1); fe_add(c, &B->x, &B->y, &s2);
    fe_mul(c, &s1, &s2, &t3);
    fe_sub(c, &t3, &t0, &t3); fe_sub(c, &t3, &t1, &t3);
    fe_add(c, &A->y, &A->z, &s1); fe_add(c, &B->y, &B->z, &s2);
    fe_mul(c, &s1, &s2, &t4);
    fe_sub(c, &t4, &t1, &t4); fe_sub(c, &t4, &t2, &t4);
    fe_add(c, &A->x, &A->z, &s1); fe_add(c, &B->x, &B->z, &s2);
    fe_mul(c, &s1, &s2, &y3p);
    fe_sub(c, &y3p, &t0, &y3p); fe_sub(c, &y3p, &t2, &y3p);
    /* Y3 = 9 * y3p ; t2_9 = 9 * t2 ; t0 = 3 * t0 */
    u256 Y3, t2_9, tmp;
    fe_add(c, &y3p, &y3p, &tmp); fe_add(c, &tmp, &y3p, &tmp);       /* 3 y3p */
    fe_add(c, &tmp, &tmp, &Y3);  fe_add(c, &Y3, &tmp, &Y3);         /* 9 y3p */
    fe_add(c, &t2, &t2, &tmp);   fe_add(c, &tmp, &t2, &tmp);        /* 3 t2 */
    fe_add(c, &tmp, &tmp, &t2_9); fe_add(c, &t2_9, &tmp, &t2_9);    /* 9 t2 */
    fe_add(c, &t0, &t0, &tmp);   fe_add(c, &tmp, &t0, &t0);         /* 3 t0 */
    u256 Z3, t1m;
    fe_add(c, &t1, &t2_9, &Z3);
    fe_sub(c, &t1, &t2_9, &t1m);
    u256 r0, r1, r2, r3, r4, r5;
    fe_mul(c, &t3, &t1m, &r0);
    fe_mul(c, &t4, &Y3, &r1);
    fe_mul(c, &t1m, &Z3, &r2);
    fe_mul(c, &Y3, &t0, &r3);
    fe_mul(c, &Z3, &t4, &r4);
    fe_mul(c, &t0, &t3, &r5);
    fe_sub(c, &r0, &r1, &O->x);
    fe_add(c, &r2, &r3, &O->y);
    fe_add(c, &r4, &r5, &O->z);
}

/* u16-limb (16 x uint32) <-> u256 */
static inline void load_u16limbs(const uint32_t *limbs, u256 *out) {
    for (int i = 0; i < 4; i++) {
        uint64_t v = 0;
        for (int j = 3; j >= 0; j--) v = (v << 16) | (uint64_t)(limbs[i * 4 + j] & 0xFFFF);
        out->w[i] = v;
    }
}

/* Fold LSB-first digit-plane sums: result = sum_p base^p planes[p].
 * planes: (np, 3, 16) uint32 u16-limb projective Montgomery points.
 * base_bits: log2(base) (2 for base-4 planes, 3 for base-8, ...).
 * out: 64 bytes canonical affine little-endian x||y.  Returns 0 if the
 * result is the identity (out zeroed), 1 otherwise. */
int g1_fold_planes(const uint32_t *planes, size_t np, int base_bits,
                   const uint64_t *p_words, const uint64_t *r2_words,
                   uint64_t n0inv, uint8_t *out) {
    fctx c;
    fctx_init(&c, p_words, r2_words, n0inv);
    pproj acc;
    pp_identity(&c, &acc);
    for (size_t ip = 0; ip < np; ip++) {
        size_t p = np - 1 - ip;
        if (ip > 0)
            for (int d = 0; d < base_bits; d++) pp_add(&c, &acc, &acc, &acc);
        pproj s;
        load_u16limbs(planes + 48 * p, &s.x);
        load_u16limbs(planes + 48 * p + 16, &s.y);
        load_u16limbs(planes + 48 * p + 32, &s.z);
        pp_add(&c, &acc, &s, &acc);
    }
    memset(out, 0, 64);
    if (fe_is_zero(&acc.z)) return 0;
    /* affine = (X/Z, Y/Z), then out of Montgomery form */
    u256 zi, xa, ya, lit_one = {{1, 0, 0, 0}};
    fe_inv(&c, &acc.z, &zi);
    fe_mul(&c, &acc.x, &zi, &xa);
    fe_mul(&c, &acc.y, &zi, &ya);
    fe_mul(&c, &xa, &lit_one, &xa);  /* -> canonical */
    fe_mul(&c, &ya, &lit_one, &ya);
    memcpy(out, xa.w, 32);
    memcpy(out + 32, ya.w, 32);
    return 1;
}

/* Batched variant: nb independent folds (one per commitment). */
void g1_fold_planes_batch(const uint32_t *planes, size_t nb, size_t np,
                          int base_bits, const uint64_t *p_words,
                          const uint64_t *r2_words, uint64_t n0inv,
                          uint8_t *out, uint8_t *flags) {
    for (size_t b = 0; b < nb; b++)
        flags[b] = (uint8_t)g1_fold_planes(planes + b * np * 48, np, base_bits,
                                           p_words, r2_words, n0inv, out + 64 * b);
}

/* ------------------------------------------------------------------ */
/* Jacobian arithmetic for the verifier MSM                            */

typedef struct { u256 x, y, z; int inf; } pjac;

/* dbl-2009-l */
static void pj_double(const fctx *c, pjac *P) {
    if (P->inf) return;
    u256 A, B, C2, D, E, F, t;
    fe_mul(c, &P->x, &P->x, &A);
    fe_mul(c, &P->y, &P->y, &B);
    fe_mul(c, &B, &B, &C2);
    fe_add(c, &P->x, &B, &D);
    fe_mul(c, &D, &D, &D);
    fe_sub(c, &D, &A, &D);
    fe_sub(c, &D, &C2, &D);
    fe_add(c, &D, &D, &D);
    fe_add(c, &A, &A, &E); fe_add(c, &E, &A, &E);
    fe_mul(c, &E, &E, &F);
    u256 X3, Y3, Z3;
    fe_add(c, &D, &D, &t);
    fe_sub(c, &F, &t, &X3);
    fe_sub(c, &D, &X3, &t);
    fe_mul(c, &E, &t, &Y3);
    u256 c8;
    fe_add(c, &C2, &C2, &c8); fe_add(c, &c8, &c8, &c8); fe_add(c, &c8, &c8, &c8);
    fe_sub(c, &Y3, &c8, &Y3);
    fe_mul(c, &P->y, &P->z, &Z3);
    fe_add(c, &Z3, &Z3, &Z3);
    P->x = X3; P->y = Y3; P->z = Z3;
    if (fe_is_zero(&Z3)) P->inf = 1;
}

/* madd-2007-bl: P (Jacobian) += Q (affine Montgomery) */
static void pj_add_affine(const fctx *c, pjac *P, const u256 *qx, const u256 *qy) {
    if (P->inf) {
        P->x = *qx; P->y = *qy; P->z = c->one; P->inf = 0;
        return;
    }
    u256 Z1Z1, U2, S2, t;
    fe_mul(c, &P->z, &P->z, &Z1Z1);
    fe_mul(c, qx, &Z1Z1, &U2);
    fe_mul(c, qy, &Z1Z1, &t);
    fe_mul(c, &t, &P->z, &S2);
    u256 H, R;
    fe_sub(c, &U2, &P->x, &H);
    fe_sub(c, &S2, &P->y, &R);
    if (fe_is_zero(&H)) {
        if (fe_is_zero(&R)) { pj_double(c, P); return; }
        P->inf = 1; return;
    }
    fe_add(c, &R, &R, &R);
    u256 HH, I, J, V;
    fe_mul(c, &H, &H, &HH);
    fe_add(c, &HH, &HH, &I); fe_add(c, &I, &I, &I);
    fe_mul(c, &H, &I, &J);
    fe_mul(c, &P->x, &I, &V);
    u256 X3, Y3, Z3;
    fe_mul(c, &R, &R, &X3);
    fe_sub(c, &X3, &J, &X3);
    fe_sub(c, &X3, &V, &t); fe_sub(c, &t, &V, &X3);
    fe_sub(c, &V, &X3, &t);
    fe_mul(c, &R, &t, &Y3);
    u256 yj;
    fe_mul(c, &P->y, &J, &yj);
    fe_add(c, &yj, &yj, &yj);
    fe_sub(c, &Y3, &yj, &Y3);
    fe_add(c, &P->z, &H, &Z3);
    fe_mul(c, &Z3, &Z3, &Z3);
    fe_sub(c, &Z3, &Z1Z1, &Z3);
    fe_sub(c, &Z3, &HH, &Z3);
    P->x = X3; P->y = Y3; P->z = Z3;
    if (fe_is_zero(&Z3)) P->inf = 1;
}

/* Multi-scalar multiplication (Straus shared-doubling, bit-serial with
 * affine mixed adds).  points: (n, 64) canonical affine LE x||y bytes
 * (all-zero row = identity); scalars: (n, 32) canonical LE bytes.
 * out: 64 bytes canonical affine.  Returns 0 for identity result. */
int g1_msm(const uint8_t *points, const uint8_t *scalars, size_t n,
           const uint64_t *p_words, const uint64_t *r2_words, uint64_t n0inv,
           uint8_t *out) {
    if (n > 8192) return -1;  /* verifier-scale API (stack-allocated) */
    fctx c;
    fctx_init(&c, p_words, r2_words, n0inv);
    /* load + Montgomery-ize the points; find the top scalar bit */
    int top = -1;
    for (size_t i = 0; i < n; i++) {
        for (int bit = 255; bit > top; bit--) {
            if ((scalars[32 * i + (bit >> 3)] >> (bit & 7)) & 1) { top = bit; break; }
        }
    }
    memset(out, 0, 64);
    if (top < 0) return 0;
    /* Montgomery affine coords, skipping identity/zero-scalar entries */
    u256 *mx = (u256 *)__builtin_alloca(sizeof(u256) * n);
    u256 *my = (u256 *)__builtin_alloca(sizeof(u256) * n);
    uint8_t *live = (uint8_t *)__builtin_alloca(n);
    for (size_t i = 0; i < n; i++) {
        u256 x, y;
        memcpy(x.w, points + 64 * i, 32);
        memcpy(y.w, points + 64 * i + 32, 32);
        int pt_zero = fe_is_zero(&x) && fe_is_zero(&y);
        int sc_zero = 1;
        for (int j = 0; j < 32; j++) if (scalars[32 * i + j]) { sc_zero = 0; break; }
        live[i] = !(pt_zero || sc_zero);
        if (live[i]) {
            fe_mul(&c, &x, &c.r2, &mx[i]);
            fe_mul(&c, &y, &c.r2, &my[i]);
        }
    }
    pjac acc;
    acc.inf = 1;
    for (int bit = top; bit >= 0; bit--) {
        pj_double(&c, &acc);
        for (size_t i = 0; i < n; i++) {
            if (live[i] && ((scalars[32 * i + (bit >> 3)] >> (bit & 7)) & 1))
                pj_add_affine(&c, &acc, &mx[i], &my[i]);
        }
    }
    if (acc.inf) return 0;
    u256 zi, zi2, xa, ya, lit_one = {{1, 0, 0, 0}};
    fe_inv(&c, &acc.z, &zi);
    fe_mul(&c, &zi, &zi, &zi2);
    fe_mul(&c, &acc.x, &zi2, &xa);
    fe_mul(&c, &acc.y, &zi2, &ya);
    fe_mul(&c, &ya, &zi, &ya);
    fe_mul(&c, &xa, &lit_one, &xa);
    fe_mul(&c, &ya, &lit_one, &ya);
    memcpy(out, xa.w, 32);
    memcpy(out + 32, ya.w, 32);
    return 1;
}
