/* micro-benchmark: CIOS __int128 fe_mul vs BMI2/ADX intrinsics version */
#include <stdint.h>
#include <stdio.h>
#include <string.h>
#include <time.h>
#include <immintrin.h>

typedef unsigned __int128 u128;
typedef struct { uint64_t w[4]; } u256;
typedef struct { u256 p; u256 r2; u256 one; uint64_t n0inv; } fctx;

static inline int fe_geq(const u256 *a, const u256 *b) {
    for (int i = 3; i >= 0; i--) if (a->w[i] != b->w[i]) return a->w[i] > b->w[i];
    return 1;
}
static inline void fe_sub_raw(u256 *a, const u256 *b) {
    u128 borrow = 0;
    for (int i = 0; i < 4; i++) {
        u128 d = (u128)a->w[i] - b->w[i] - borrow;
        a->w[i] = (uint64_t)d; borrow = (d >> 64) & 1;
    }
}

static void fe_mul(const fctx *c, const u256 *a, const u256 *b, u256 *out) {
    uint64_t t[6] = {0,0,0,0,0,0};
    for (int i = 0; i < 4; i++) {
        u128 carry = 0;
        for (int j = 0; j < 4; j++) {
            u128 cur = (u128)t[j] + (u128)a->w[i] * b->w[j] + carry;
            t[j] = (uint64_t)cur; carry = cur >> 64;
        }
        u128 cur = (u128)t[4] + carry;
        t[4] = (uint64_t)cur; t[5] = (uint64_t)(cur >> 64);
        uint64_t m = t[0] * c->n0inv;
        carry = 0;
        for (int j = 0; j < 4; j++) {
            u128 c2 = (u128)t[j] + (u128)m * c->p.w[j] + carry;
            if (j > 0) t[j-1] = (uint64_t)c2;
            carry = c2 >> 64;
        }
        cur = (u128)t[4] + carry;
        t[3] = (uint64_t)cur;
        cur = (u128)t[5] + (cur >> 64);
        t[4] = (uint64_t)cur; t[5] = 0;
    }
    u256 r = {{t[0],t[1],t[2],t[3]}};
    if (t[4] || fe_geq(&r, &c->p)) fe_sub_raw(&r, &c->p);
    *out = r;
}

/* BMI2/ADX: one CIOS round with dual carry chains via adcx/adox intrinsics */
__attribute__((target("bmi2,adx")))
static void fe_mul_adx(const fctx *c, const u256 *a, const u256 *b, u256 *out) {
    uint64_t t0=0,t1=0,t2=0,t3=0,t4=0;
    const uint64_t *bw = b->w, *pw = c->p.w;
    for (int i = 0; i < 4; i++) {
        uint64_t ai = a->w[i];
        unsigned long long lo, hi, carry;
        unsigned char cf = 0, of = 0;
        /* t += ai * b */
        lo = _mulx_u64(ai, bw[0], &hi);
        cf = _addcarry_u64(0, t0, lo, (unsigned long long*)&t0);
        carry = hi;
        lo = _mulx_u64(ai, bw[1], &hi);
        cf = _addcarry_u64(cf, t1, lo, (unsigned long long*)&t1);
        of = _addcarry_u64(0, t1, carry, (unsigned long long*)&t1);
        carry = hi + of;   /* hi < 2^64-1 so no overflow */
        lo = _mulx_u64(ai, bw[2], &hi);
        cf = _addcarry_u64(cf, t2, lo, (unsigned long long*)&t2);
        of = _addcarry_u64(0, t2, carry, (unsigned long long*)&t2);
        carry = hi + of;
        lo = _mulx_u64(ai, bw[3], &hi);
        cf = _addcarry_u64(cf, t3, lo, (unsigned long long*)&t3);
        of = _addcarry_u64(0, t3, carry, (unsigned long long*)&t3);
        carry = hi + of;
        t4 = t4 + carry + cf;
        /* reduction: m = t0 * n0inv; t = (t + m*p) >> 64 */
        uint64_t m = t0 * c->n0inv;
        lo = _mulx_u64(m, pw[0], &hi);
        cf = _addcarry_u64(0, t0, lo, (unsigned long long*)&t0); /* t0 -> 0 */
        carry = hi;
        lo = _mulx_u64(m, pw[1], &hi);
        cf = _addcarry_u64(cf, t1, lo, (unsigned long long*)&t1);
        of = _addcarry_u64(0, t1, carry, (unsigned long long*)&t1);
        carry = hi + of;
        t0 = t1;
        lo = _mulx_u64(m, pw[2], &hi);
        cf = _addcarry_u64(cf, t2, lo, (unsigned long long*)&t2);
        of = _addcarry_u64(0, t2, carry, (unsigned long long*)&t2);
        carry = hi + of;
        t1 = t2;
        lo = _mulx_u64(m, pw[3], &hi);
        cf = _addcarry_u64(cf, t3, lo, (unsigned long long*)&t3);
        of = _addcarry_u64(0, t3, carry, (unsigned long long*)&t3);
        carry = hi + of;
        t2 = t3;
        t3 = t4 + carry + cf;
        t4 = 0;
        /* t3 can carry? t4 was < 2, carry < 2^64: t3 = t4+carry+cf fits?
           worst case t4=1, carry=2^64-1 ... overflow possible in theory;
           track it: */
        if (t3 < carry) t4 = 1;
    }
    u256 r = {{t0,t1,t2,t3}};
    if (t4 || fe_geq(&r, &c->p)) fe_sub_raw(&r, &c->p);
    *out = r;
}

int main(void) {
    /* BN254 Fq */
    fctx c;
    uint64_t p[4] = {0x3c208c16d87cfd47ULL,0x97816a916871ca8dULL,
                     0xb85045b68181585dULL,0x30644e72e131a029ULL};
    memcpy(c.p.w, p, 32);
    /* r2, n0inv for Fq */
    uint64_t r2[4] = {0xf32cfc5b538afa89ULL,0xb5e71911d44501fbULL,
                      0x47ab1eff0a417ff6ULL,0x06d89f71cab8351fULL};
    memcpy(c.r2.w, r2, 32);
    c.n0inv = 0x87d20782e4866389ULL;
    u256 a = {{123456789,987654321,555,777}}, b2 = {{42,43,44,45}}, r1, r2o;
    /* correctness: compare 1M random-ish chained muls */
    r1 = a; r2o = a;
    for (int i = 0; i < 1000000; i++) {
        fe_mul(&c, &r1, &b2, &r1);
        fe_mul_adx(&c, &r2o, &b2, &r2o);
        b2.w[0] += 1;
    }
    if (memcmp(&r1, &r2o, 32)) { printf("MISMATCH\n"); return 1; }
    struct timespec ts0, ts1;
    int N = 20000000;
    clock_gettime(CLOCK_MONOTONIC, &ts0);
    for (int i = 0; i < N; i++) fe_mul(&c, &r1, &a, &r1);
    clock_gettime(CLOCK_MONOTONIC, &ts1);
    double d1 = (ts1.tv_sec-ts0.tv_sec)+1e-9*(ts1.tv_nsec-ts0.tv_nsec);
    clock_gettime(CLOCK_MONOTONIC, &ts0);
    for (int i = 0; i < N; i++) fe_mul_adx(&c, &r2o, &a, &r2o);
    clock_gettime(CLOCK_MONOTONIC, &ts1);
    double d2 = (ts1.tv_sec-ts0.tv_sec)+1e-9*(ts1.tv_nsec-ts0.tv_nsec);
    printf("sink %llu %llu\n", (unsigned long long)r1.w[0],
           (unsigned long long)r2o.w[0]);
    printf("cios   %.1f ns/mul\nadx    %.1f ns/mul\nspeedup %.2fx\n",
           d1/N*1e9, d2/N*1e9, d1/d2);
    return 0;
}
