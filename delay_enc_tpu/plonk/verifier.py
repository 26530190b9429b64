"""verify_proof: host-side verifier (pairings via curves.pairing).

Replaces `halo2_proofs::verify_proof` + `VerifierGWC` (reference
benches/delay_enc.rs:147-165).  Mirrors prover.py's transcript order
exactly; all arithmetic is host Python ints + host G1 ops (ms-scale).

Checks:
  1. the y-folded constraint expression at x equals h(x) * (x^n - 1),
     with h(x) = sum_i x^(n*i) h_i(x),
  2. the GWC pairing equation over the three opening points
     e(sum_j u^j W_j, [tau]2) == e(sum_j u^j (z_j W_j + C_Q_j - e_j G), [1]2).
"""

from __future__ import annotations

from ..curves.bn254 import G1, G1_GEN, g1_from_bytes
from ..curves.pairing import pairing_check
from ..fields.bn254 import FR
from .domain import QUOTIENT_PIECES
from .keygen import ALL_FIXED, LOOKUPS, VerifyingKey
from .transcript import Transcript

P = FR.p
NUM_ADVICE = 5
WIRE_COL = {"a": 0, "b": 1, "c": 2, "d": 3}


class _Reader:
    def __init__(self, data: bytes, tr: Transcript):
        self.data = data
        self.off = 0
        self.tr = tr

    def point(self):
        b = self.data[self.off : self.off + 32]
        self.off += 32
        pt = g1_from_bytes(b)
        self.tr.common_point(pt)
        return pt

    def scalar(self) -> int:
        b = self.data[self.off : self.off + 32]
        self.off += 32
        v = FR.from_repr(b)
        if v is None:
            raise ValueError("non-canonical scalar in proof")
        self.tr.common_scalar(v)
        return v


def verify_proof(srs, vk: VerifyingKey, proof: bytes, instances=None) -> bool:
    try:
        return _verify(srs, vk, proof, instances or [])
    except (ValueError, AssertionError, IndexError):
        return False


def _verify(srs, vk: VerifyingKey, proof: bytes, instances) -> bool:
    domain = vk.domain
    n = domain.n
    tr = Transcript()
    # vk.hash_into(transcript), mirroring the prover
    tr.common_scalar(vk.transcript_repr)
    for v in instances:
        tr.common_scalar(v)
    rd = _Reader(proof, tr)

    advice_c = [rd.point() for _ in range(NUM_ADVICE)]
    theta = tr.challenge()
    ap_c, sp_c = {}, {}
    for l in LOOKUPS:
        ap_c[l] = rd.point()
        sp_c[l] = rd.point()
    beta = tr.challenge()
    gamma = tr.challenge()
    z_perm_c = rd.point()
    z_l_c = {l: rd.point() for l in LOOKUPS}
    random_c = rd.point()
    y = tr.challenge()
    h_c = [rd.point() for _ in range(QUOTIENT_PIECES)]
    x = tr.challenge()

    # ---- read evals (same order as prover's opens lists) --------------
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

    # ---- 1. quotient identity at x ------------------------------------
    adv = [ev_x[("advice", c)] for c in range(NUM_ADVICE)]
    fx = {name: ev_x[("fixed", name)] for name in ALL_FIXED}
    sig = [ev_x[("sigma", c)] for c in range(len(vk.sigma_commitments))]
    # instance polynomial evaluated directly from the public values
    inst_x = 0
    for j, v in enumerate(instances):
        inst_x = (inst_x + v * domain.lagrange_at(j, x)) % P
    zp_x = ev_x[("z_perm", 0)]
    zp_wx = ev_wx[("z_perm", 0)]
    e_wx = ev_wx[("advice", 4)]

    l0 = domain.lagrange_at(0, x)
    l_last = domain.lagrange_at(domain.usable_rows, x)
    l_blind = domain.l_blind_at(x)
    mask = (1 - l_last - l_blind) % P

    from .keygen import DELTA

    exprs = []
    gate = (
        fx["q_a"] * adv[0]
        + fx["q_b"] * adv[1]
        + fx["q_c"] * adv[2]
        + fx["q_d"] * adv[3]
        + fx["q_e"] * adv[4]
        + fx["q_mul_ab"] * adv[0] * adv[1]
        + fx["q_mul_cd"] * adv[2] * adv[3]
        + fx["q_e_next"] * e_wx
        + fx["q_constant"]
    ) % P
    exprs.append(gate)

    exprs.append(l0 * (1 - zp_x) % P)
    exprs.append(l_last * (zp_x * zp_x - zp_x) % P)
    left, right = zp_wx, zp_x
    perm_vals = adv + [inst_x]
    for c in range(len(perm_vals)):
        left = left * ((perm_vals[c] + beta * sig[c] + gamma) % P) % P
        right = right * ((perm_vals[c] + beta * pow(DELTA, c, P) * x + gamma) % P) % P
    exprs.append(mask * (left - right) % P)

    s_exp = (fx["table_tag"] + theta * fx["table_tag"] * fx["table_value"]) % P
    for l in LOOKUPS:
        tag = fx[f"tag_{l}"]
        a_exp = (tag + theta * tag * adv[WIRE_COL[l]]) % P
        zl_x = ev_x[(f"z_{l}", 0)]
        zl_wx = ev_wx[(f"z_{l}", 0)]
        ap_x = ev_x[(f"ap_{l}", 0)]
        ap_winvx = ev_winvx[(f"ap_{l}", 0)]
        sp_x = ev_x[(f"sp_{l}", 0)]
        exprs.append(l0 * (1 - zl_x) % P)
        exprs.append(l_last * (zl_x * zl_x - zl_x) % P)
        lhs = zl_wx * (ap_x + beta) * (sp_x + gamma) % P
        rhs = zl_x * (a_exp + beta) * (s_exp + gamma) % P
        exprs.append(mask * (lhs - rhs) % P)
        exprs.append(l0 * (ap_x - sp_x) % P)
        exprs.append(mask * (ap_x - sp_x) * (ap_x - ap_winvx) % P)

    total = exprs[0]
    for e in exprs[1:]:
        total = (total * y + e) % P

    h_x = 0
    xn = pow(x, n, P)
    for i in range(QUOTIENT_PIECES - 1, -1, -1):
        h_x = (h_x * xn + ev_x[("h", i)]) % P
    if total != h_x * domain.vanishing_at(x) % P:
        return False

    # ---- 2. GWC pairing check -----------------------------------------
    v = tr.challenge()
    w_points = [rd.point() for _ in range(3)]
    u = tr.challenge()
    # the proof stream must be fully consumed: trailing bytes would make
    # proofs malleable (distinct byte strings verifying for one statement)
    if rd.off != len(proof):
        return False

    comm_map = {}
    for c in range(NUM_ADVICE):
        comm_map[("advice", c)] = advice_c[c]
    for c in range(len(vk.sigma_commitments)):
        comm_map[("sigma", c)] = vk.sigma_commitments[c]
    for name in ALL_FIXED:
        comm_map[("fixed", name)] = vk.fixed_commitments[name]
    comm_map[("z_perm", 0)] = z_perm_c
    for l in LOOKUPS:
        comm_map[(f"ap_{l}", 0)] = ap_c[l]
        comm_map[(f"sp_{l}", 0)] = sp_c[l]
        comm_map[(f"z_{l}", 0)] = z_l_c[l]
    comm_map[("random", 0)] = random_c
    for i in range(QUOTIENT_PIECES):
        comm_map[("h", i)] = h_c[i]

    x_w = x * domain.omega % P
    x_winv = x * domain.omega_inv % P
    sets = [
        (names_x, ev_x, x),
        (names_wx, ev_wx, x_w),
        (names_winvx, ev_winvx, x_winv),
    ]

    # Flatten the whole GWC combination into two host MSMs:
    #   p_comb = sum_s u^s (z_s W_s + sum_i v^i C_{s,i} - e_s G)
    #   w_comb = sum_s u^s W_s
    # (shared-doubling multi-exponentiation — one Jacobian chain instead of
    # ~40 independent 254-bit scalar muls).
    scalars, points = [], []
    g_scalar = 0
    u_pow = 1
    for (names, evs, z), w_pt in zip(sets, w_points):
        v_pow = 1
        for nm in names:
            scalars.append(u_pow * v_pow % P)
            points.append(comm_map[nm])
            g_scalar = (g_scalar + u_pow * v_pow % P * evs[nm]) % P
            v_pow = v_pow * v % P
        scalars.append(u_pow * z % P)
        points.append(w_pt)
        u_pow = u_pow * u % P
    scalars.append((-g_scalar) % P)
    points.append(G1_GEN)
    p_comb = G1.multi_scalar_mul(scalars, points)
    w_comb = G1.multi_scalar_mul(
        [pow(u, s, P) for s in range(len(w_points))], w_points
    )

    tau_prep, g2_prep = srs.prepared_pair()
    return pairing_check(
        [(w_comb, tau_prep), (G1.neg(p_comb), g2_prep)]
    )
