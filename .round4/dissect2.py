"""Dissect stage 2: recompute the grand-product columns (permutation + 4
lookups) on the host from first principles and compare their claimed
evaluations (z at x and omega*x) in the failing proof.

If these all match, the advice/lookup/grand-product pipeline is correct
and the quotient kernel (h pieces) is the culprit by elimination — the
verifier's quotient identity is the check that fails (verifier.py:233).

Run: JAX_PLATFORMS=cpu PYTHONPATH=/root/repo:/root/.axon_site \
      python .round4/dissect2.py .round4/failed_proof_delay_enc_16.bin
"""

import sys

import numpy as np

proof = open(sys.argv[1], "rb").read()

import bench
from delay_enc_tpu.cs.builder import NUM_ADVICE
from delay_enc_tpu.fields import FR
from delay_enc_tpu.ops.limbs import FR_CTX
from delay_enc_tpu.plonk.domain import QUOTIENT_PIECES
from delay_enc_tpu.plonk.keygen import ALL_FIXED, DELTA, LOOKUPS
from delay_enc_tpu.plonk.serialize import load_vk
from delay_enc_tpu.plonk.transcript import Transcript
from delay_enc_tpu.plonk.verifier import WIRE_COL, _Reader
from delay_enc_tpu.utils.config import Config

P = FR.p
KEYS = "bench_data/keys_delay_enc_aac7760823fb03883b2a976388a5f0b3"
vk = load_vk(KEYS + ".vk.npz")
domain = vk.domain
n, usable = domain.n, domain.usable_rows

# ---- challenges + evals from the proof --------------------------------
tr = Transcript()
tr.common_scalar(vk.transcript_repr)
rd = _Reader(proof, tr)
for _ in range(NUM_ADVICE):
    rd.point()
theta = tr.challenge()
for l in LOOKUPS:
    rd.point(), rd.point()
beta = tr.challenge()
gamma = tr.challenge()
rd.point()
for l in LOOKUPS:
    rd.point()
rd.point()
y = tr.challenge()
for i in range(QUOTIENT_PIECES):
    rd.point()
x = tr.challenge()
names_x = (
    [("advice", c) for c in range(NUM_ADVICE)]
    + [("fixed", name) for name in ALL_FIXED]
    + [("sigma", c) for c in range(len(vk.sigma_commitments))]
    + [("z_perm", 0)]
    + [(f"ap_{l}", 0) for l in LOOKUPS]
    + [(f"sp_{l}", 0) for l in LOOKUPS]
    + [(f"z_{l}", 0) for l in LOOKUPS]
    + [("random", 0)]
    + [("h", i) for i in range(QUOTIENT_PIECES)]
)
names_wx = [("advice", 4), ("z_perm", 0)] + [(f"z_{l}", 0) for l in LOOKUPS]
ev_x = {nm: rd.scalar() for nm in names_x}
ev_wx = {nm: rd.scalar() for nm in names_wx}

# ---- witness + reproducible blinding (daemon warmup = rng(0)) ----------
cfg = Config.from_env()
builder = bench.build_circuit("delay_enc", cfg, k=16)
rng = np.random.default_rng(0)


def rand_fr():
    return FR.from_uniform_bytes(bytes(rng.integers(0, 256, 64, dtype="uint8")))


advice_cols = []
for c in range(NUM_ADVICE):
    col = list(builder.advice[c]) + [0] * (n - builder.rows)
    for r in range(usable, n):
        col[r] = rand_fr()
    advice_cols.append(col)

from delay_enc_tpu.cs.range import build_table
from delay_enc_tpu.plonk.prover import _permuted_columns, _table_keys

tbl_tags, tbl_vals = build_table(builder.lookup_widths)
tkeys_padded, fmap = _table_keys(tbl_tags, tbl_vals, usable, theta)
ap_cols, sp_cols = {}, {}
for l in LOOKUPS:
    ap_vals, sp_vals = _permuted_columns(
        builder.fixed[f"tag_{l}"], builder.advice[WIRE_COL[l]],
        usable, tkeys_padded, fmap, l,
    )
    pad = [rand_fr() for _ in range(n - usable)]
    ap_cols[l] = ap_vals + pad
    sp_cols[l] = sp_vals + pad
gp_blind = [rand_fr() for _ in range(5 * (n - usable - 1))]
gp_blind = [gp_blind[i * (n - usable - 1):(i + 1) * (n - usable - 1)]
            for i in range(5)]

# ---- pk fixed/sigma row evals ------------------------------------------
z = np.load(KEYS + ".pk.npz")
tt = FR_CTX.from_mont_np(z["fr_table_tag"])
tv = FR_CTX.from_mont_np(z["fr_table_value"])
tags = {l: FR_CTX.from_mont_np(z[f"fr_tag_{l}"]) for l in LOOKUPS}

print("host NTT of sigma coeffs ...", flush=True)


def ntt_host(coeff_ints):
    """evals[j] = poly(omega^j), matching the domain's NTT ordering."""
    a = list(coeff_ints)
    m = len(a)
    # iterative Cooley-Tukey, decimation in time, natural <- bit-reversed
    j = 0
    for i in range(1, m):
        bit = m >> 1
        while j & bit:
            j ^= bit
            bit >>= 1
        j |= bit
        if i < j:
            a[i], a[j] = a[j], a[i]
    length = 2
    while length <= m:
        wl = pow(domain.omega, m // length, P)
        for start in range(0, m, length):
            w = 1
            for k in range(length // 2):
                u = a[start + k]
                v = a[start + k + length // 2] * w % P
                a[start + k] = (u + v) % P
                a[start + k + length // 2] = (u - v) % P
                w = w * wl % P
        length <<= 1
    return a


sigma_rows = [ntt_host(FR_CTX.from_mont_np(z[f"sc_{c}"])) for c in range(6)]

# sanity: sigma row evals must reproduce the claimed sigma evals at x
# (they did in stage 1 only for fixed columns; sigma uses the host NTT here)

# ---- rebuild z columns --------------------------------------------------
def batch_inv(vals):
    pre, acc = [0] * len(vals), 1
    for i, d in enumerate(vals):
        pre[i] = acc
        acc = acc * d % P
    inv = pow(acc, -1, P)
    out = [0] * len(vals)
    for i in range(len(vals) - 1, -1, -1):
        out[i] = inv * pre[i] % P
        inv = inv * vals[i] % P
    return out


def build_z(nums, dens, blind):
    fr_inv = batch_inv(dens)
    zc = [1] * n
    for i in range(usable):
        zc[i + 1] = zc[i] * nums[i] % P * fr_inv[i] % P
    for i in range(usable + 1, n):
        zc[i] = blind[i - usable - 1]
    return zc, zc[usable]  # column, total product


# permutation
omega_pows = [1] * n
for i in range(1, n):
    omega_pows[i] = omega_pows[i - 1] * domain.omega % P
inst_col = [0] * n  # delay_enc: no public inputs
perm_vals = advice_cols + [inst_col]
nums = [1] * usable
dens = [1] * usable
for c in range(6):
    d_c = pow(DELTA, c, P)
    col = perm_vals[c]
    sg = sigma_rows[c]
    for i in range(usable):
        nums[i] = nums[i] * ((col[i] + beta * d_c % P * omega_pows[i] + gamma) % P) % P
        dens[i] = dens[i] * ((col[i] + beta * sg[i] + gamma) % P) % P
zp_col, zp_total = build_z(nums, dens, gp_blind[0])
print(f"z_perm total product == 1: {zp_total == 1}", flush=True)

# lookups
z_cols = {}
s_col = [(tt[i] + theta * tt[i] % P * tv[i]) % P for i in range(n)]
for li, l in enumerate(LOOKUPS):
    tg = tags[l]
    acol = advice_cols[WIRE_COL[l]]
    a_col = [(tg[i] + theta * tg[i] % P * acol[i]) % P for i in range(n)]
    nums = [(a_col[i] + beta) % P * ((s_col[i] + gamma) % P) % P for i in range(usable)]
    dens = [(ap_cols[l][i] + beta) % P * ((sp_cols[l][i] + gamma) % P) % P
            for i in range(usable)]
    z_cols[l], tot = build_z(nums, dens, gp_blind[1 + li])
    print(f"z_{l} total product == 1: {tot == 1}", flush=True)

# ---- barycentric evals at x and omega*x --------------------------------
def lagranges_all(pt):
    xn1 = (pow(pt, n, P) - 1) % P
    dens = [n * (pt - w) % P for w in omega_pows]
    inv = batch_inv(dens)
    return [omega_pows[i] * xn1 % P * inv[i] % P for i in range(n)]


def col_eval(col, lag):
    s = 0
    for v, li in zip(col, lag):
        if v:
            s = (s + v * li) % P
    return s


print("lagrange tables ...", flush=True)
lag_x = lagranges_all(x)
lag_wx = lagranges_all(x * domain.omega % P)

for c in range(6):
    want = col_eval(sigma_rows[c], lag_x)
    got = ev_x[("sigma", c)]
    print(f"sigma[{c}] at x: {'ok' if want == got else 'MISMATCH'}", flush=True)

want = col_eval(zp_col, lag_x)
print(f"z_perm at x: {'ok' if want == ev_x[('z_perm', 0)] else 'MISMATCH'}",
      flush=True)
want = col_eval(zp_col, lag_wx)
print(f"z_perm at wx: {'ok' if want == ev_wx[('z_perm', 0)] else 'MISMATCH'}",
      flush=True)
for l in LOOKUPS:
    ok1 = col_eval(z_cols[l], lag_x) == ev_x[(f"z_{l}", 0)]
    ok2 = col_eval(z_cols[l], lag_wx) == ev_wx[(f"z_{l}", 0)]
    print(f"z_{l}: x {'ok' if ok1 else 'MISMATCH'} "
          f"wx {'ok' if ok2 else 'MISMATCH'}", flush=True)

# ---- the verdict on h ---------------------------------------------------
# If everything above is ok, recompute `total` exactly as the verifier does
# (it used these same claimed evals) and report what Sum x^{ni} h_i(x)
# SHOULD be vs what the proof claims.
hx_claimed = 0
xn = pow(x, n, P)
for i in range(QUOTIENT_PIECES - 1, -1, -1):
    hx_claimed = (hx_claimed * xn + ev_x[("h", i)]) % P
van = (pow(x, n, P) - 1) % P
print(f"claimed h(x) fold: {hx_claimed % 997} (mod 997 digest)", flush=True)
print("NOTE: if all columns above are 'ok', the quotient kernel (h pieces) "
      "is the culprit by elimination.", flush=True)
