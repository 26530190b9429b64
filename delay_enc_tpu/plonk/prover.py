"""create_proof: the TPU proving pipeline.

Replaces `halo2_proofs::create_proof::<KZGCommitmentScheme, ProverGWC, ..>`
(reference benches/delay_enc.rs:123-132).  Protocol (transcript order is the
spec; the verifier mirrors it exactly):

 1. commit the 5 advice columns (blinding rows randomized),
 2. theta; per wire-lookup: build compressed input A = tag + theta*tag*adv
    and table S = table_tag + theta*table_tag*table_value, commit the
    permuted (A', S') pair (halo2 2021 lookup argument),
 3. beta, gamma; commit the permutation grand product Z_perm and the four
    lookup grand products Z_l (log-depth prefix products on device),
 4. commit a random masking polynomial,
 5. y; build the quotient h = (sum_i y^i expr_i) / (X^n - 1) on the 8n
    extended coset, split into 7 size-n pieces, commit each,
 6. x; batch-evaluate every opened polynomial at x / omega*x / omega^-1*x,
 7. v; GWC multiopen: one witness commitment per point, W = (Q - Q(z))/(X-z)
    via the log-depth linear-division kernel.

All heavy arithmetic (NTTs, MSMs, grand products, quotient, evals, witness
quotients) runs on device in Montgomery limb form; the host orchestrates and
sorts the lookup permutations.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..cs.builder import Builder, NUM_ADVICE
from ..fields.bn254 import FR
from ..ops import limbs as L
from ..ops import msm as M
from ..ops import poly as P
from ..ops.ntt import intt, ntt
from .domain import MAX_DEGREE, QUOTIENT_PIECES
from .keygen import ALL_FIXED, LOOKUPS, ProvingKey
from .transcript import Transcript

WIRE_COL = {"a": 0, "b": 1, "c": 2, "d": 3}


# --------------------------------------------------------------------------
# jitted device helpers (cached per domain size via jax's jit cache)

def _col_to_coeff(plan, col):
    return intt(plan, col)


def _coeff_to_ext(domain, zeta_powers, coeff):
    ctx = L.FR_CTX
    padded = jnp.concatenate(
        [coeff, jnp.zeros((domain.n_ext - domain.n, L.NLIMB), jnp.uint32)], axis=0
    )
    return ntt(domain.plan_ext, L.mont_mul(ctx, padded, zeta_powers))


def _compress_input(tag_raw, adv_raw, theta_m):
    ctx = L.FR_CTX
    return L.add(ctx, tag_raw, L.mont_mul(ctx, theta_m, L.mont_mul(ctx, tag_raw, adv_raw)))


def _grand_product(num, den, active_mask):
    """Z with Z(0)=1, Z(r) = prod_{j<r} num_j/den_j (masked rows contribute 1)."""
    ctx = L.FR_CTX
    one = jnp.broadcast_to(ctx.one_mont(), num.shape)
    num = L.select(active_mask, num, one)
    den = L.select(active_mask, den, one)
    frac = L.mont_mul(ctx, num, P.batch_inv_log(ctx, den))
    pref = P.prefix_product(ctx, frac)
    return jnp.concatenate([one[:1], pref[:-1]], axis=0)


def _rot(ext, steps):
    """rotation by omega^steps in the row domain = roll by MAX_DEGREE*steps
    on the extended domain."""
    return jnp.roll(ext, -MAX_DEGREE * steps, axis=0)


# --------------------------------------------------------------------------

@dataclass
class Proof:
    data: bytes


def _rand_fr(rng) -> int:
    return FR.from_uniform_bytes(bytes(rng.integers(0, 256, 64, dtype="uint8")))


def create_proof(srs, pk: ProvingKey, builder: Builder, rng=None) -> bytes:
    if rng is None:
        rng = np.random.default_rng()
    ctx = L.FR_CTX
    domain = pk.vk.domain
    n, usable = domain.n, domain.usable_rows
    srs = srs.truncated(domain.k)
    g1 = srs.g1_powers

    tr = Transcript()
    tr.common_bytes(pk.vk.digest)

    jit_coeff = jax.jit(lambda c: _col_to_coeff(domain.plan, c))
    jit_ext = jax.jit(lambda c: _coeff_to_ext(domain, pk.zeta_powers, c))
    jit_canon = jax.jit(lambda a: L.mont_to_canonical(ctx, a))
    jit_msm = jax.jit(M.msm)

    def commit_coeff(coeff):
        pt = M.points_from_device(jit_msm(g1, jit_canon(coeff))[None])[0]
        return pt

    # ---- 1. advice columns -------------------------------------------
    advice_host = []
    for c in range(NUM_ADVICE):
        col = list(builder.advice[c]) + [0] * (n - builder.rows)
        for r in range(usable, n):
            col[r] = _rand_fr(rng)
        advice_host.append(col)
    advice_raw = [jnp.asarray(ctx.to_mont_np(col)) for col in advice_host]
    advice_coeff = [jit_coeff(a) for a in advice_raw]
    for c in range(NUM_ADVICE):
        tr.write_point(commit_coeff(advice_coeff[c]))

    # ---- 2. lookups ---------------------------------------------------
    theta = tr.challenge(b"theta")
    theta_m = jnp.asarray(ctx.to_mont_np([theta]))  # (1,16)

    jit_compress = jax.jit(_compress_input)
    s_raw = jit_compress(
        pk.fixed_raw["table_tag"], pk.fixed_raw["table_value"], theta_m
    )
    s_host_vals = None
    a_raw, ap_raw, sp_raw = {}, {}, {}
    ap_coeff, sp_coeff = {}, {}
    for l in LOOKUPS:
        tag_raw = pk.fixed_raw[f"tag_{l}"]
        a_raw[l] = jit_compress(tag_raw, advice_raw[WIRE_COL[l]], theta_m)
        # host-side permuted construction over the usable rows
        a_vals = ctx.from_mont_np(np.asarray(jax.device_get(a_raw[l]))[:usable])
        if s_host_vals is None:
            s_host_vals = ctx.from_mont_np(np.asarray(jax.device_get(s_raw))[:usable])
        a_sorted = sorted(a_vals)
        from collections import Counter

        s_free = Counter(s_host_vals)
        s_perm: list = [None] * usable
        for i, vv in enumerate(a_sorted):
            if i == 0 or vv != a_sorted[i - 1]:
                if s_free[vv] <= 0:
                    raise ValueError(f"lookup failure: value {vv} not in table (wire {l})")
                s_free[vv] -= 1
                s_perm[i] = vv
        leftovers = []
        for val, cnt in s_free.items():
            leftovers.extend([val] * cnt)
        it = iter(leftovers)
        for i in range(usable):
            if s_perm[i] is None:
                s_perm[i] = next(it)
        pad = [_rand_fr(rng) for _ in range(n - usable)]
        ap_raw[l] = jnp.asarray(ctx.to_mont_np(a_sorted + pad))
        sp_raw[l] = jnp.asarray(ctx.to_mont_np(s_perm + pad))
        ap_coeff[l] = jit_coeff(ap_raw[l])
        sp_coeff[l] = jit_coeff(sp_raw[l])
        tr.write_point(commit_coeff(ap_coeff[l]))
        tr.write_point(commit_coeff(sp_coeff[l]))

    # ---- 3. grand products -------------------------------------------
    beta = tr.challenge(b"beta")
    gamma = tr.challenge(b"gamma")
    beta_m = jnp.asarray(ctx.to_mont_np([beta]))
    gamma_m = jnp.asarray(ctx.to_mont_np([gamma]))

    active = jnp.asarray(np.arange(n) < usable)

    # permutation Z: prod_c (p_c + beta delta^c omega^r + gamma) /
    #                (p_c + beta sigma_c + gamma)
    omega_col = []
    cur = 1
    for _ in range(n):
        omega_col.append(cur)
        cur = cur * domain.omega % FR.p
    omega_dev = jnp.asarray(ctx.to_mont_np(omega_col))
    sigma_raw = [jax.jit(lambda c: ntt(domain.plan, c))(s) for s in pk.sigma_coeff]

    def perm_fracs(advs, sigmas, omega_dev, beta_m, gamma_m):
        num = jnp.broadcast_to(ctx.one_mont(), advs[0].shape)
        den = num
        for c in range(NUM_ADVICE):
            delta_m = jnp.asarray(ctx.to_mont_np([pk.delta_powers[c]]))
            idterm = L.mont_mul(ctx, L.mont_mul(ctx, beta_m, delta_m), omega_dev)
            num = L.mont_mul(
                ctx, num, L.add(ctx, L.add(ctx, advs[c], idterm), gamma_m)
            )
            den = L.mont_mul(
                ctx,
                den,
                L.add(ctx, L.add(ctx, advs[c], L.mont_mul(ctx, beta_m, sigmas[c])), gamma_m),
            )
        return num, den

    num, den = jax.jit(perm_fracs)(advice_raw, sigma_raw, omega_dev, beta_m, gamma_m)
    z_perm_raw = jax.jit(_grand_product)(num, den, active)
    z_perm_coeff = jit_coeff(z_perm_raw)
    tr.write_point(commit_coeff(z_perm_coeff))

    def lookup_fracs(a, s, ap, sp, beta_m, gamma_m):
        num = L.mont_mul(ctx, L.add(ctx, a, beta_m), L.add(ctx, s, gamma_m))
        den = L.mont_mul(ctx, L.add(ctx, ap, beta_m), L.add(ctx, sp, gamma_m))
        return num, den

    jit_lf = jax.jit(lookup_fracs)
    z_lookup_coeff, z_lookup_raw = {}, {}
    for l in LOOKUPS:
        numl, denl = jit_lf(a_raw[l], s_raw, ap_raw[l], sp_raw[l], beta_m, gamma_m)
        z_lookup_raw[l] = jax.jit(_grand_product)(numl, denl, active)
        z_lookup_coeff[l] = jit_coeff(z_lookup_raw[l])
        tr.write_point(commit_coeff(z_lookup_coeff[l]))

    # ---- 4. random poly ----------------------------------------------
    random_coeff = jnp.asarray(ctx.to_mont_np([_rand_fr(rng) for _ in range(n)]))
    tr.write_point(commit_coeff(random_coeff))

    # ---- 5. quotient ---------------------------------------------------
    y = tr.challenge(b"y")
    y_m = jnp.asarray(ctx.to_mont_np([y]))

    advice_ext = [jit_ext(c) for c in advice_coeff]
    z_perm_ext = jit_ext(z_perm_coeff)
    z_l_ext = {l: jit_ext(z_lookup_coeff[l]) for l in LOOKUPS}
    ap_ext = {l: jit_ext(ap_coeff[l]) for l in LOOKUPS}
    sp_ext = {l: jit_ext(sp_coeff[l]) for l in LOOKUPS}

    def quotient(advice_ext, z_perm_ext, z_l_ext, ap_ext, sp_ext,
                 theta_m, beta_m, gamma_m, y_m):
        fe = pk.fixed_ext
        one = jnp.broadcast_to(ctx.one_mont(), advice_ext[0].shape)
        mask = L.sub(ctx, one, L.add(ctx, pk.l_last_ext, pk.l_blind_ext))

        def mul(a, b):
            return L.mont_mul(ctx, a, b)

        def addf(a, b):
            return L.add(ctx, a, b)

        exprs = []
        # gate
        a_e, b_e, c_e, d_e, e_e = advice_ext
        gate = mul(fe["q_a"], a_e)
        gate = addf(gate, mul(fe["q_b"], b_e))
        gate = addf(gate, mul(fe["q_c"], c_e))
        gate = addf(gate, mul(fe["q_d"], d_e))
        gate = addf(gate, mul(fe["q_e"], e_e))
        gate = addf(gate, mul(fe["q_mul_ab"], mul(a_e, b_e)))
        gate = addf(gate, mul(fe["q_mul_cd"], mul(c_e, d_e)))
        gate = addf(gate, mul(fe["q_e_next"], _rot(e_e, 1)))
        gate = addf(gate, fe["q_constant"])
        exprs.append(gate)

        # permutation
        exprs.append(mul(pk.l0_ext, L.sub(ctx, one, z_perm_ext)))
        exprs.append(
            mul(pk.l_last_ext, L.sub(ctx, mul(z_perm_ext, z_perm_ext), z_perm_ext))
        )
        left = _rot(z_perm_ext, 1)
        right = z_perm_ext
        for c in range(NUM_ADVICE):
            delta_m = jnp.asarray(ctx.to_mont_np([pk.delta_powers[c]]))
            left = mul(
                left,
                addf(addf(advice_ext[c], mul(beta_m, pk.sigma_ext[c])), gamma_m),
            )
            right = mul(
                right,
                addf(
                    addf(advice_ext[c], mul(mul(beta_m, delta_m), pk.x_ext)), gamma_m
                ),
            )
        exprs.append(mul(mask, L.sub(ctx, left, right)))

        # lookups
        s_ext = addf(
            fe["table_tag"], mul(theta_m, mul(fe["table_tag"], fe["table_value"]))
        )
        for l in LOOKUPS:
            tag_e = fe[f"tag_{l}"]
            a_exp = addf(tag_e, mul(theta_m, mul(tag_e, advice_ext[WIRE_COL[l]])))
            zl = z_l_ext[l]
            apl, spl = ap_ext[l], sp_ext[l]
            exprs.append(mul(pk.l0_ext, L.sub(ctx, one, zl)))
            exprs.append(mul(pk.l_last_ext, L.sub(ctx, mul(zl, zl), zl)))
            lhs = mul(_rot(zl, 1), mul(addf(apl, beta_m), addf(spl, gamma_m)))
            rhs = mul(zl, mul(addf(a_exp, beta_m), addf(s_ext, gamma_m)))
            exprs.append(mul(mask, L.sub(ctx, lhs, rhs)))
            exprs.append(mul(pk.l0_ext, L.sub(ctx, apl, spl)))
            exprs.append(
                mul(mask, mul(L.sub(ctx, apl, spl), L.sub(ctx, apl, _rot(apl, -1))))
            )

        total = exprs[0]
        for e in exprs[1:]:
            total = addf(mul(total, y_m), e)
        h_ext = mul(total, pk.zh_inv_ext)
        h_coeff = intt(domain.plan_ext, h_ext)
        return L.mont_mul(ctx, h_coeff, pk.zeta_inv_powers)

    h_coeff = jax.jit(quotient)(
        advice_ext, z_perm_ext, z_l_ext, ap_ext, sp_ext, theta_m, beta_m, gamma_m, y_m
    )
    h_pieces = [h_coeff[i * n : (i + 1) * n] for i in range(QUOTIENT_PIECES)]
    for piece in h_pieces:
        tr.write_point(commit_coeff(piece))

    # ---- 6. evaluations ------------------------------------------------
    x = tr.challenge(b"x")
    x_w = x * domain.omega % FR.p
    x_winv = x * domain.omega_inv % FR.p

    opens_x = (
        [("advice", c, advice_coeff[c]) for c in range(NUM_ADVICE)]
        + [("fixed", name, pk.fixed_coeff[name]) for name in ALL_FIXED]
        + [("sigma", c, pk.sigma_coeff[c]) for c in range(NUM_ADVICE)]
        + [("z_perm", 0, z_perm_coeff)]
        + [(f"ap_{l}", 0, ap_coeff[l]) for l in LOOKUPS]
        + [(f"sp_{l}", 0, sp_coeff[l]) for l in LOOKUPS]
        + [(f"z_{l}", 0, z_lookup_coeff[l]) for l in LOOKUPS]
        + [("random", 0, random_coeff)]
        + [("h", i, h_pieces[i]) for i in range(QUOTIENT_PIECES)]
    )
    opens_wx = [("advice", 4, advice_coeff[4]), ("z_perm", 0, z_perm_coeff)] + [
        (f"z_{l}", 0, z_lookup_coeff[l]) for l in LOOKUPS
    ]
    opens_winvx = [(f"ap_{l}", 0, ap_coeff[l]) for l in LOOKUPS]

    def batch_eval(coeff_stack, pows):
        return jax.vmap(lambda cfs: P.eval_poly(ctx, cfs, pows))(coeff_stack)

    jit_batch_eval = jax.jit(batch_eval)
    jit_powers = jax.jit(lambda xm: P.powers_of(ctx, xm, n))

    def eval_set(opens, point):
        xm = jnp.asarray(ctx.to_mont_np([point]))[0]
        pows = jit_powers(xm)
        stack = jnp.stack([cf for (_, _, cf) in opens])
        evs = jit_batch_eval(stack, pows)
        return ctx.from_mont_np(np.asarray(jax.device_get(evs)))

    evals_x = eval_set(opens_x, x)
    evals_wx = eval_set(opens_wx, x_w)
    evals_winvx = eval_set(opens_winvx, x_winv)
    for v in evals_x + evals_wx + evals_winvx:
        tr.write_scalar(v)

    # ---- 7. GWC multiopen ---------------------------------------------
    v = tr.challenge(b"v")

    def gwc_witness(opens, evals, point):
        # Q = sum v^i p_i ; W = (Q - Q(point)) / (X - point)
        v_m = jnp.asarray(ctx.to_mont_np([v]))
        q = jnp.zeros((n, L.NLIMB), jnp.uint32)
        for (_, _, cf) in reversed(opens):
            q = L.add(ctx, L.mont_mul(ctx, q, v_m), cf)
        zp = jit_powers(jnp.asarray(ctx.to_mont_np([point]))[0])
        zinv = pow(point, -1, FR.p)
        zinv_pows = jax.jit(lambda xm: P.powers_of(ctx, xm, n + 1))(
            jnp.asarray(ctx.to_mont_np([zinv]))[0]
        )
        w = P.divide_by_linear(ctx, q, zp, zinv_pows)
        return w

    jit_gwc = jax.jit(gwc_witness, static_argnums=())
    for opens, evals, point in (
        (opens_x, evals_x, x),
        (opens_wx, evals_wx, x_w),
        (opens_winvx, evals_winvx, x_winv),
    ):
        w = gwc_witness(opens, evals, point)
        tr.write_point(commit_coeff(w))

    return bytes(tr.data)
