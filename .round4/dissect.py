"""Dissect the failing k=16 delay_enc proof: recompute what each claimed
evaluation SHOULD be from host-side first principles (barycentric over the
domain — no device, no NTT) and compare with the proof's values.

The daemon warmup proof is rng(0)-seeded, so every blinding row is
reproducible.  Run from repo root:
  JAX_PLATFORMS=cpu PYTHONPATH=/root/repo:/root/.axon_site \
      python .round4/dissect.py .round4/failed_proof_delay_enc_16.bin
"""

import sys

import numpy as np

proof = open(sys.argv[1], "rb").read()

import bench
from delay_enc_tpu.cs.builder import NUM_ADVICE
from delay_enc_tpu.fields import FR
from delay_enc_tpu.plonk import SRS
from delay_enc_tpu.plonk.domain import QUOTIENT_PIECES
from delay_enc_tpu.plonk.keygen import ALL_FIXED, LOOKUPS
from delay_enc_tpu.plonk.serialize import load_vk
from delay_enc_tpu.plonk.transcript import Transcript
from delay_enc_tpu.plonk.verifier import WIRE_COL, _Reader
from delay_enc_tpu.utils.config import Config

P = FR.p
vk = load_vk("bench_data/keys_delay_enc_aac7760823fb03883b2a976388a5f0b3.vk.npz")
domain = vk.domain
n, usable = domain.n, domain.usable_rows

# ---- parse the proof exactly as the verifier does --------------------
tr = Transcript()
tr.common_scalar(vk.transcript_repr)
rd = _Reader(proof, tr)
advice_c = [rd.point() for _ in range(NUM_ADVICE)]
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
names_winvx = [(f"ap_{l}", 0) for l in LOOKUPS]
ev_x = {nm: rd.scalar() for nm in names_x}
ev_wx = {nm: rd.scalar() for nm in names_wx}
ev_winvx = {nm: rd.scalar() for nm in names_winvx}
print(f"challenges recovered: theta={theta % 997} beta={beta % 997} "
      f"x={x % 997} (mod 997 digests)")

# ---- rebuild the witness exactly as the daemon warmup did ------------
cfg = Config.from_env()
builder = bench.build_circuit("delay_enc", cfg, k=16)
rng = np.random.default_rng(0)  # daemon warmup seed


def rand_fr():
    return FR.from_uniform_bytes(bytes(rng.integers(0, 256, 64, dtype="uint8")))


advice_cols = []
for c in range(NUM_ADVICE):
    col = list(builder.advice[c]) + [0] * (n - builder.rows)
    for r in range(usable, n):
        col[r] = rand_fr()
    advice_cols.append(col)

# ---- barycentric evaluation over the domain ---------------------------
def lagranges_all(x):
    """l_i(x) for all i in one pass (batch inversion)."""
    xn1 = (pow(x, n, P) - 1) % P
    w = domain.omega
    ws = [1] * n
    for i in range(1, n):
        ws[i] = ws[i - 1] * w % P
    dens = [n * (x - wi) % P for wi in ws]
    pre, acc = [0] * n, 1
    for i, d in enumerate(dens):
        pre[i] = acc
        acc = acc * d % P
    inv = pow(acc, -1, P)
    out = [0] * n
    for i in range(n - 1, -1, -1):
        di = inv * pre[i] % P
        inv = inv * dens[i] % P
        out[i] = ws[i] * xn1 % P * di % P
    return out


def col_eval(col, lag):
    s = 0
    for v, li in zip(col, lag):
        if v:
            s = (s + v * li) % P
    return s


x_w = x * domain.omega % P
print("building lagrange tables ...", flush=True)
lag_x = lagranges_all(x)
lag_wx = lagranges_all(x_w)

for c in range(NUM_ADVICE):
    want = col_eval(advice_cols[c], lag_x)
    got = ev_x[("advice", c)]
    print(f"advice[{c}] at x: {'ok' if want == got else 'MISMATCH'}", flush=True)
want = col_eval(advice_cols[4], lag_wx)
print(f"advice[4] at wx: {'ok' if want == ev_wx[('advice', 4)] else 'MISMATCH'}",
      flush=True)

# ---- fixed columns (from the builder, no blinding) ---------------------
for name in ALL_FIXED:
    if name not in builder.fixed:
        continue  # table_tag/table_value are keygen-built, not in builder
    col = list(builder.fixed[name]) + [0] * (n - builder.rows)
    want = col_eval(col, lag_x)
    got = ev_x[("fixed", name)]
    print(f"fixed[{name}] at x: {'ok' if want == got else 'MISMATCH'}", flush=True)

# ---- lookup permuted columns (host logic + reproducible padding) ------
from delay_enc_tpu.cs.range import build_table
from delay_enc_tpu.plonk.prover import _permuted_columns, _table_keys

tbl_tags, tbl_vals = build_table(builder.lookup_widths)
tkeys_padded, fmap = _table_keys(tbl_tags, tbl_vals, usable, theta)
for l in LOOKUPS:
    ap_vals, sp_vals = _permuted_columns(
        builder.fixed[f"tag_{l}"], builder.advice[WIRE_COL[l]],
        usable, tkeys_padded, fmap, l,
    )
    pad = [rand_fr() for _ in range(n - usable)]
    ap_col = ap_vals + pad
    sp_col = sp_vals + pad
    ok_a = col_eval(ap_col, lag_x) == ev_x[(f"ap_{l}", 0)]
    ok_s = col_eval(sp_col, lag_x) == ev_x[(f"sp_{l}", 0)]
    print(f"lookup {l}: ap {'ok' if ok_a else 'MISMATCH'} "
          f"sp {'ok' if ok_s else 'MISMATCH'}", flush=True)
