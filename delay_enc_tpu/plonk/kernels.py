"""Shared jitted prover kernels.

Every function takes its large tables (NTT bit-reversal/power tables, coset
powers, SRS points) as explicit ARGUMENTS: capturing them as closure
constants would embed tens of MB into the compiled executable, which some
PJRT transports re-ship on every invocation.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..cs.builder import NUM_ADVICE
from ..ops import limbs as L
from ..ops import msm as M
from ..ops import poly as P
from .domain import MAX_DEGREE

WIRE_COL = {"a": 0, "b": 1, "c": 2, "d": 3}
LOOKUPS = ("a", "b", "c", "d")
CTX = L.FR_CTX


# ------------------------------------------------------------ jitted kernels
# All take tables explicitly; k (python int) selects the cache entry.

def _ntt_with(k: int, a, bitrev, pows):
    idx = jnp.arange(1 << k, dtype=jnp.int32)
    a = jnp.take(a, bitrev, axis=0)

    def stage(a, s):
        half = jnp.int32(1) << (s - 1)
        partner = idx ^ half
        is_hi = (idx & half) != 0
        tw_idx = (idx & (half - 1)) << (k - s)
        w = jnp.take(pows, tw_idx, axis=0)
        y = jnp.take(a, partner, axis=0)
        t_in = jnp.where(is_hi[:, None], a, y)
        t = L.mont_mul(CTX, w, t_in)
        out = jnp.where(is_hi[:, None], L.sub(CTX, y, t), L.add(CTX, a, t))
        return out, None

    a, _ = jax.lax.scan(stage, a, jnp.arange(1, k + 1, dtype=jnp.int32))
    return a


@jax.jit
def _jit_coeff(a, bitrev, inv_pows, n_inv):
    k = a.shape[0].bit_length() - 1
    out = _ntt_with(k, a, bitrev, inv_pows)
    return L.mont_mul(CTX, out, n_inv[None, :])


@jax.jit
def _jit_ext(coeff, zeta_powers, bitrev_ext, pows_ext):
    n_ext = zeta_powers.shape[0]
    k_ext = n_ext.bit_length() - 1
    padded = jnp.concatenate(
        [coeff, jnp.zeros((n_ext - coeff.shape[0], L.NLIMB), jnp.uint32)], axis=0
    )
    return _ntt_with(k_ext, L.mont_mul(CTX, padded, zeta_powers), bitrev_ext, pows_ext)


@jax.jit
def _jit_evals(coeff, bitrev, pows):
    k = coeff.shape[0].bit_length() - 1
    return _ntt_with(k, coeff, bitrev, pows)


@jax.jit
def _jit_canon(a):
    return L.mont_to_canonical(CTX, a)


_jit_msm = jax.jit(M.msm)

# batched commitment: vmap the MSM over a stack of coefficient vectors —
# the bit-plane kernel is depth-bound, so sharing one launch schedule
# across b polys costs ~the same wall time as one
_jit_msm_batch = jax.jit(jax.vmap(M.msm, in_axes=(None, 0)))

# Large MSMs are split into fixed 2^14-point partials: one compiled graph
# serves every chunk (and the PJRT remote-compile helper rejects the
# monolithic graph beyond ~2^14 points).
MSM_CHUNK = 1 << 14


@jax.jit
def _jit_point_tree(stacked):
    """Reduce (m, ..., 3, 16) partial MSM results with complete adds."""
    while stacked.shape[0] > 1:
        half = stacked.shape[0] // 2
        top = M.complete_add(stacked[:half], stacked[half : 2 * half])
        if stacked.shape[0] % 2:
            top = jnp.concatenate([top, stacked[-1:]], axis=0)
        stacked = top
    return stacked[0]


def msm_chunked(g1, scalars):
    """(n,3,16) x (n,16) -> (3,16); n a multiple of MSM_CHUNK or small."""
    n = scalars.shape[0]
    if n <= MSM_CHUNK:
        return _jit_msm(g1, scalars)
    parts = [
        _jit_msm(g1[off : off + MSM_CHUNK], scalars[off : off + MSM_CHUNK])
        for off in range(0, n, MSM_CHUNK)
    ]
    return _jit_point_tree(jnp.stack(parts))


def msm_batch_chunked(g1, stacked_scalars):
    """(n,3,16) x (b,n,16) -> (b,3,16).

    For n beyond one chunk the batch falls back to per-poly chunked MSMs:
    the vmapped kernel's intermediate footprint scales with b*chunk and
    exceeds the compile service's program-memory ceiling."""
    n = stacked_scalars.shape[1]
    if n <= MSM_CHUNK:
        return _jit_msm_batch(g1, stacked_scalars)
    outs = [msm_chunked(g1, stacked_scalars[i]) for i in range(stacked_scalars.shape[0])]
    return jnp.stack(outs)


@jax.jit
def _jit_canon_batch(a):
    return L.mont_to_canonical(CTX, a)


@jax.jit
def _jit_compress(tag_raw, adv_raw, theta_m):
    return L.add(
        CTX, tag_raw, L.mont_mul(CTX, theta_m, L.mont_mul(CTX, tag_raw, adv_raw))
    )


@jax.jit
def _jit_perm_fracs(perm_cols, sigmas, omega_dev, beta_m, gamma_m, delta_ms):
    """perm_cols: the 5 advice columns + the instance column (row evals)."""
    num = jnp.broadcast_to(CTX.one_mont(), perm_cols[0].shape)
    den = num
    for c in range(len(perm_cols)):
        idterm = L.mont_mul(CTX, L.mont_mul(CTX, beta_m, delta_ms[c]), omega_dev)
        num = L.mont_mul(CTX, num, L.add(CTX, L.add(CTX, perm_cols[c], idterm), gamma_m))
        den = L.mont_mul(
            CTX,
            den,
            L.add(CTX, L.add(CTX, perm_cols[c], L.mont_mul(CTX, beta_m, sigmas[c])), gamma_m),
        )
    return num, den


@jax.jit
def _jit_lookup_fracs(a, s, ap, sp, beta_m, gamma_m):
    num = L.mont_mul(CTX, L.add(CTX, a, beta_m), L.add(CTX, s, gamma_m))
    den = L.mont_mul(CTX, L.add(CTX, ap, beta_m), L.add(CTX, sp, gamma_m))
    return num, den


@jax.jit
def _jit_grand_product(num, den, active_mask):
    one = jnp.broadcast_to(CTX.one_mont(), num.shape)
    num = L.select(active_mask, num, one)
    den = L.select(active_mask, den, one)
    frac = L.mont_mul(CTX, num, P.batch_inv_log(CTX, den))
    pref = P.prefix_product(CTX, frac)
    return jnp.concatenate([one[:1], pref[:-1]], axis=0)


def _rot(ext, steps):
    """rotation by omega^steps in the row domain = roll by MAX_DEGREE*steps
    on the extended domain."""
    return jnp.roll(ext, -MAX_DEGREE * steps, axis=0)


@jax.jit
def _jit_quotient(advice_ext, instance_ext, z_perm_ext, z_l_ext, ap_ext, sp_ext,
                  fe, sigma_ext, masks, chals, delta_ms, zh_inv_ext,
                  zeta_inv_powers, bitrev_ext, inv_pows_ext, n_ext_inv):
    """masks = (l0_ext, l_last_ext, l_blind_ext, x_ext);
    chals = (theta_m, beta_m, gamma_m, y_m)."""
    l0_ext, l_last_ext, l_blind_ext, x_ext = masks
    theta_m, beta_m, gamma_m, y_m = chals
    one = jnp.broadcast_to(CTX.one_mont(), advice_ext[0].shape)
    mask = L.sub(CTX, one, L.add(CTX, l_last_ext, l_blind_ext))

    mul = lambda a, b: L.mont_mul(CTX, a, b)
    addf = lambda a, b: L.add(CTX, a, b)

    exprs = []
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

    exprs.append(mul(l0_ext, L.sub(CTX, one, z_perm_ext)))
    exprs.append(mul(l_last_ext, L.sub(CTX, mul(z_perm_ext, z_perm_ext), z_perm_ext)))
    left = _rot(z_perm_ext, 1)
    right = z_perm_ext
    perm_cols_ext = list(advice_ext) + [instance_ext]
    for c in range(len(perm_cols_ext)):
        left = mul(left, addf(addf(perm_cols_ext[c], mul(beta_m, sigma_ext[c])), gamma_m))
        right = mul(
            right,
            addf(addf(perm_cols_ext[c], mul(mul(beta_m, delta_ms[c]), x_ext)), gamma_m),
        )
    exprs.append(mul(mask, L.sub(CTX, left, right)))

    s_ext = addf(fe["table_tag"], mul(theta_m, mul(fe["table_tag"], fe["table_value"])))
    for l in LOOKUPS:
        tag_e = fe[f"tag_{l}"]
        a_exp = addf(tag_e, mul(theta_m, mul(tag_e, advice_ext[WIRE_COL[l]])))
        zl = z_l_ext[l]
        apl, spl = ap_ext[l], sp_ext[l]
        exprs.append(mul(l0_ext, L.sub(CTX, one, zl)))
        exprs.append(mul(l_last_ext, L.sub(CTX, mul(zl, zl), zl)))
        lhs = mul(_rot(zl, 1), mul(addf(apl, beta_m), addf(spl, gamma_m)))
        rhs = mul(zl, mul(addf(a_exp, beta_m), addf(s_ext, gamma_m)))
        exprs.append(mul(mask, L.sub(CTX, lhs, rhs)))
        exprs.append(mul(l0_ext, L.sub(CTX, apl, spl)))
        exprs.append(mul(mask, mul(L.sub(CTX, apl, spl), L.sub(CTX, apl, _rot(apl, -1)))))

    total = exprs[0]
    for e in exprs[1:]:
        total = addf(mul(total, y_m), e)
    h_ext = mul(total, zh_inv_ext)
    k_ext = h_ext.shape[0].bit_length() - 1
    h_coeff = _ntt_with(k_ext, h_ext, bitrev_ext, inv_pows_ext)
    h_coeff = L.mont_mul(CTX, h_coeff, n_ext_inv[None, :])
    return L.mont_mul(CTX, h_coeff, zeta_inv_powers)


def _tree_sum(x):
    """Modular sum along axis 0 via pairwise tree (log depth)."""
    while x.shape[0] > 1:
        half = x.shape[0] // 2
        s = L.add(CTX, x[:half], x[half : 2 * half])
        if x.shape[0] % 2:
            s = jnp.concatenate([s, x[-1:]], axis=0)
        x = s
    return x[0]


@jax.jit
def _jit_eval_stack(stacked, x_m):
    """Evaluate every poly in (m, n, 16) at the point x.  Sequential lax.map
    over the poly axis keeps per-step intermediates at one poly's footprint
    (a broadcast (m,n,16,16) product would blow the compile service's
    memory ceiling)."""
    n = stacked.shape[1]
    pows = P.powers_of(CTX, x_m, n)

    def one(cf):
        return _tree_sum(L.mont_mul(CTX, cf, pows))

    return jax.lax.map(one, stacked)


@jax.jit
def _jit_gwc_witness(stacked, v_m, z_m, zinv_m):
    """W = (Q - Q(z))/(X - z) with Q = sum_i v^i p_i over the stacked polys.
    The v-weighted combination runs as a lax.map over the poly axis (see
    _jit_eval_stack for why)."""
    m, n, _ = stacked.shape
    v_pows = P.powers_of(CTX, v_m, m)

    def one(inp):
        cf, vp = inp
        return L.mont_mul(CTX, cf, vp[None, :])

    prods = jax.lax.map(one, (stacked, v_pows))
    q = _tree_sum(prods)
    zp = P.powers_of(CTX, z_m, n)
    zinv_p = P.powers_of(CTX, zinv_m, n + 1)
    return P.divide_by_linear(CTX, q, zp, zinv_p)


