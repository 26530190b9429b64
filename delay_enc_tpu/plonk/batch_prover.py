"""Data-parallel batched prover: B independent proofs in one device pipeline.

BASELINE config 5 (many ciphertexts proven across a pod).  The reference
has no batching at all — each `create_proof` is an independent CPU run
(benches/delay_enc.rs:123); here every device phase carries a leading
instance axis, so one launch processes all B instances and, when the
(B, ...) arrays are sharded over a mesh axis, XLA runs each shard's
instances on its own device with no cross-device communication (the proofs
are independent — pure DP).

Fiat-Shamir forces host synchronization at each phase boundary (instance
i's challenges depend on instance i's commitments), so the pipeline is:
batched device phase -> host transcripts absorb per-instance results ->
per-instance challenges re-enter the next batched phase as (B, 1, 16)
tensors.  Orchestration is deliberately separate from plonk/prover.py: the
single-proof path keeps its compiled shapes (and its warm TPU compile
cache) stable while this module vmaps the same kernels over the instance
axis.

Sharding: pass `mesh` (a 1-axis jax Mesh) and the (B, ...) tensors are
placed with NamedSharding(P(axis)) — jit then partitions every batched
phase across the mesh (dp analog of SURVEY.md §2.3).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from ..cs.builder import NUM_ADVICE
from ..fields.bn254 import FR
from ..ops import limbs as L
from .domain import QUOTIENT_PIECES
from .keygen import ALL_FIXED, LOOKUPS, ProvingKey
from .prover import (
    WIRE_COL,
    _mont1,
    _permuted_columns,
    _rand_fr,
    _table_keys,
)
from .transcript import Transcript
from . import kernels as K

CTX = L.FR_CTX


def _monts(xs) -> jnp.ndarray:
    """host ints -> (B, 1, 16) Montgomery (per-instance scalar operands)."""
    return jnp.asarray(CTX.to_mont_np(xs))[:, None, :]


# ---- batched kernels (vmapped over the instance axis) -------------------

def _perm_fracs(perm_cols, sigmas, omega_dev, beta_m, gamma_m, delta_ms):
    num = jnp.broadcast_to(CTX.one_mont(), perm_cols[0].shape)
    den = num
    for c in range(len(perm_cols)):
        idterm = L.mont_mul(CTX, L.mont_mul(CTX, beta_m, delta_ms[c]), omega_dev)
        num = L.mont_mul(CTX, num, L.add(CTX, L.add(CTX, perm_cols[c], idterm), gamma_m))
        den = L.mont_mul(
            CTX, den,
            L.add(CTX, L.add(CTX, perm_cols[c], L.mont_mul(CTX, beta_m, sigmas[c])), gamma_m),
        )
    return num, den


# advice (B, 6, n, 16); sigmas (6, n, 16); omega (n,16); beta/gamma (B,1,16)
_jit_perm_fracs_batch = jax.jit(jax.vmap(
    lambda adv, sig, om, b, g, d: _perm_fracs(
        [adv[c] for c in range(adv.shape[0])], [sig[c] for c in range(sig.shape[0])],
        om, b, g, [d[c][None] for c in range(d.shape[0])],
    ),
    in_axes=(0, None, None, 0, 0, None),
))


def _lookup_fracs(a, s, ap, sp, beta_m, gamma_m):
    num = L.mont_mul(CTX, L.add(CTX, a, beta_m), L.add(CTX, s, gamma_m))
    den = L.mont_mul(CTX, L.add(CTX, ap, beta_m), L.add(CTX, sp, gamma_m))
    return num, den


# a/ap/sp (B, 4, n, 16); s (B, n, 16); beta/gamma (B, 1, 16)
_jit_lookup_fracs_batch = jax.jit(jax.vmap(jax.vmap(
    _lookup_fracs, in_axes=(0, None, 0, 0, None, None)
), in_axes=(0, 0, 0, 0, 0, 0)))


_jit_compress_b = jax.jit(
    lambda tag_raw, adv, theta: L.add(
        CTX, tag_raw, L.mont_mul(CTX, theta, L.mont_mul(CTX, tag_raw, adv))
    )
)

_jit_quotient_batch = jax.jit(jax.vmap(
    K._jit_quotient.__wrapped__,
    in_axes=(0, 0, 0, 0, 0, 0, None, None, None, 0, None, None, None, 0, None, None),
))

_jit_eval_stack_batch = jax.jit(jax.vmap(
    K._jit_eval_stack.__wrapped__, in_axes=(0, 0)
))

_jit_gwc_witness_batch = jax.jit(jax.vmap(
    K._jit_gwc_witness.__wrapped__, in_axes=(0, 0, 0, 0)
))


def _shard(mesh, axis, x):
    if mesh is None:
        return x
    return jax.device_put(x, NamedSharding(mesh, P(axis)))


def create_proofs_batched(srs, pk: ProvingKey, builders, rng=None, mesh=None,
                          axis: str = "dp") -> list[bytes]:
    """Prove every builder in one batched pipeline; returns B proof byte
    strings (each independently verifiable by plonk.verifier).  All
    builders must share the circuit structure of `pk` (same fixed columns /
    lookups / copies), mirroring halo2's one-pk-many-witnesses reuse."""
    if rng is None:
        rng = np.random.default_rng()
    B = len(builders)
    ctx = CTX
    domain = pk.vk.domain
    n, usable = domain.n, domain.usable_rows
    srs = srs.truncated(domain.k)
    plan, plan_ext = domain.plan, domain.plan_ext
    delta_st = jnp.stack([jnp.asarray(ctx.to_mont_np([d])[0]) for d in pk.delta_powers])
    sh = lambda x: _shard(mesh, axis, x)

    trs = [Transcript() for _ in range(B)]
    for tr, b in zip(trs, builders):
        tr.common_scalar(pk.vk.transcript_repr)
        for v in b.instance:
            tr.common_scalar(v)

    pair_tables = srs.msm_tables()

    def commit_rows(stacked_coeff):
        """(m, n, 16) mont coeffs -> m host affine points."""
        canon = K._jit_canon_batch(stacked_coeff)
        return K.msm_commit_batch(pair_tables, canon)

    # ---- 1. advice ----------------------------------------------------
    cols = []
    for b in builders:
        for c in range(NUM_ADVICE):
            col = list(b.advice[c]) + [0] * (n - b.rows)
            for r in range(usable, n):
                col[r] = _rand_fr(rng)
            cols.append(col)
        inst = list(b.instance) + [0] * (n - len(b.instance))
        cols.append(inst)
    raw = sh(jnp.asarray(np.stack([ctx.to_mont_np(c) for c in cols])))  # (B*6, n, 16)
    coeffs = K._jit_coeff_batch(raw, plan.tw_inv, plan.n_inv)
    raw_b = raw.reshape(B, NUM_ADVICE + 1, n, L.NLIMB)
    coeff_b = coeffs.reshape(B, NUM_ADVICE + 1, n, L.NLIMB)
    adv_sel = coeff_b[:, :NUM_ADVICE].reshape(B * NUM_ADVICE, n, L.NLIMB)
    for i, pt in enumerate(commit_rows(adv_sel)):
        trs[i // NUM_ADVICE].write_point(pt)

    # ---- 2. lookups ----------------------------------------------------
    thetas = [tr.challenge() for tr in trs]
    theta_b = _monts(thetas)  # (B, 1, 16)
    s_raw = _jit_compress_b(pk.fixed_raw["table_tag"][None],
                            pk.fixed_raw["table_value"][None], theta_b)  # (B, n, 16)
    from ..cs.range import build_table

    tbl_tags, tbl_vals = build_table(builders[0].lookup_widths)
    a_raw = _jit_compress_b(
        jnp.stack([pk.fixed_raw[f"tag_{l}"] for l in LOOKUPS])[None],
        raw_b[:, :NUM_ADVICE][:, [WIRE_COL[l] for l in LOOKUPS]],
        theta_b[:, None],
    )  # (B, 4, n, 16)
    ap_cols, sp_cols = [], []
    for i, b in enumerate(builders):
        tkeys, fvals = _table_keys(tbl_tags, tbl_vals, usable, thetas[i])
        for l in LOOKUPS:
            ap_limbs, sp_limbs = _permuted_columns(
                b.fixed[f"tag_{l}"], b.advice[WIRE_COL[l]], usable, tkeys, fvals, l
            )
            pad = ctx.to_mont_np([_rand_fr(rng) for _ in range(n - usable)])
            pad = pad.reshape(-1, L.NLIMB).astype(np.uint32)
            pad2 = ctx.to_mont_np([_rand_fr(rng) for _ in range(n - usable)])
            pad2 = pad2.reshape(-1, L.NLIMB).astype(np.uint32)
            ap_cols.append(np.concatenate([ap_limbs, pad]))
            sp_cols.append(np.concatenate([sp_limbs, pad2]))
    ap_raw = sh(jnp.asarray(np.stack(ap_cols)))
    sp_raw = sh(jnp.asarray(np.stack(sp_cols)))
    lk_coeff = K._jit_coeff_batch(
        jnp.concatenate([ap_raw, sp_raw]), plan.tw_inv, plan.n_inv
    )
    ap_coeff = lk_coeff[: B * 4].reshape(B, 4, n, L.NLIMB)
    sp_coeff = lk_coeff[B * 4 :].reshape(B, 4, n, L.NLIMB)
    inter = jnp.stack([ap_coeff, sp_coeff], axis=2).reshape(B * 8, n, L.NLIMB)
    for i, pt in enumerate(commit_rows(inter)):
        trs[i // 8].write_point(pt)

    # ---- 3. grand products ---------------------------------------------
    betas = [tr.challenge() for tr in trs]
    gammas = [tr.challenge() for tr in trs]
    beta_b, gamma_b = _monts(betas), _monts(gammas)
    active = jnp.asarray(np.arange(n) < usable)
    omega_col, cur = [], 1
    for _ in range(n):
        omega_col.append(cur)
        cur = cur * domain.omega % FR.p
    omega_dev = jnp.asarray(ctx.to_mont_np(omega_col))
    sigma_raw = K._jit_evals_batch(jnp.stack(pk.sigma_coeff), plan.tw)
    num_p, den_p = _jit_perm_fracs_batch(
        raw_b, sigma_raw, omega_dev, beta_b, gamma_b, delta_st
    )  # (B, n, 16) each
    numl, denl = _jit_lookup_fracs_batch(
        a_raw, s_raw, ap_raw.reshape(B, 4, n, L.NLIMB),
        sp_raw.reshape(B, 4, n, L.NLIMB), beta_b, gamma_b,
    )  # (B, 4, n, 16)
    nums = jnp.concatenate([num_p[:, None], numl], axis=1).reshape(B * 5, n, L.NLIMB)
    dens = jnp.concatenate([den_p[:, None], denl], axis=1).reshape(B * 5, n, L.NLIMB)
    num_a, pre, suf, totals = K._jit_gp_partials_batch(nums, dens, active)
    total_ints = ctx.from_mont_np(np.asarray(jax.device_get(totals)))
    if any(t == 0 for t in total_ints):
        raise ValueError("grand product denominator vanished")
    total_inv = jnp.asarray(ctx.to_mont_np([pow(t, -1, FR.p) for t in total_ints]))
    blind = jnp.asarray(
        ctx.to_mont_np([_rand_fr(rng) for _ in range(B * 5 * (n - usable - 1))])
    ).reshape(B * 5, n - usable - 1, L.NLIMB)
    z5 = K._jit_gp_finish_batch(num_a, pre, suf, total_inv, blind)
    z_coeff = K._jit_coeff_batch(z5, plan.tw_inv, plan.n_inv).reshape(
        B, 5, n, L.NLIMB
    )
    for i, pt in enumerate(commit_rows(z_coeff.reshape(B * 5, n, L.NLIMB))):
        trs[i // 5].write_point(pt)

    # ---- 4. random poly -------------------------------------------------
    from .prover import _rand_fr_mont_bulk

    random_coeff = jnp.asarray(_rand_fr_mont_bulk(rng, B * n)).reshape(
        B, n, L.NLIMB
    )
    for i, pt in enumerate(commit_rows(random_coeff)):
        trs[i].write_point(pt)

    # ---- 5. quotient ----------------------------------------------------
    ys = [tr.challenge() for tr in trs]
    n_exprs = 4 + 5 * len(LOOKUPS)
    y_pows = jnp.asarray(ctx.to_mont_np(
        [pow(y, n_exprs - 1 - i, FR.p) for y in ys for i in range(n_exprs)]
    )).reshape(B, n_exprs, L.NLIMB)

    # one batched extended-coset NTT for all instances' opened polys
    open_stack = jnp.concatenate(
        [coeff_b, z_coeff, ap_coeff, sp_coeff], axis=1
    )  # (B, 6+5+4+4=19, n, 16)
    ext = K.ext_batch_padded(
        open_stack.reshape(B * 19, n, L.NLIMB), pk.zeta_powers, plan_ext.tw
    ).reshape(B, 19, domain.n_ext, L.NLIMB)

    # open_stack layout: [advice 0-4, instance 5, z_perm 6, z_lookups 7-10,
    # ap 11-14, sp 15-18]
    Z_PERM, Z_LK, AP, SP = 6, 7, 11, 15
    theta_bc = _monts(thetas)[:, 0]
    beta_bc = _monts(betas)[:, 0]
    gamma_bc = _monts(gammas)[:, 0]
    h_coeff = _jit_quotient_batch(
        [ext[:, c] for c in range(NUM_ADVICE)],  # advice_ext
        ext[:, NUM_ADVICE],  # instance_ext
        ext[:, Z_PERM],
        {l: ext[:, Z_LK + j] for j, l in enumerate(LOOKUPS)},
        {l: ext[:, AP + j] for j, l in enumerate(LOOKUPS)},
        {l: ext[:, SP + j] for j, l in enumerate(LOOKUPS)},
        pk.fixed_ext, pk.sigma_ext,
        (pk.l0_ext, pk.l_last_ext, pk.l_blind_ext, pk.x_ext),
        (theta_bc, beta_bc, gamma_bc),
        [delta_st[c][None] for c in range(delta_st.shape[0])],
        pk.zh_inv_ext, pk.zeta_inv_powers, y_pows,
        plan_ext.tw_inv, plan_ext.n_inv,
    )  # (B, n_ext, 16)
    h_pieces = h_coeff[:, : QUOTIENT_PIECES * n].reshape(
        B, QUOTIENT_PIECES, n, L.NLIMB
    )
    for i, pt in enumerate(commit_rows(h_pieces.reshape(B * QUOTIENT_PIECES, n, L.NLIMB))):
        trs[i // QUOTIENT_PIECES].write_point(pt)

    # ---- 6. evaluations --------------------------------------------------
    xs = [tr.challenge() for tr in trs]
    fixed_stack = jnp.stack([pk.fixed_coeff[name] for name in ALL_FIXED])
    sigma_stack = jnp.stack(pk.sigma_coeff)

    # open sets per instance (same order as plonk/prover.py)
    stacks = {"x": [], "wx": [], "winvx": []}
    for i in range(B):
        sx = jnp.concatenate([
            open_stack[i, :NUM_ADVICE], fixed_stack, sigma_stack,
            open_stack[i, Z_PERM][None],
            open_stack[i, AP : AP + 4],
            open_stack[i, SP : SP + 4],
            open_stack[i, Z_LK : Z_LK + 4],
            random_coeff[i][None],
            h_pieces[i],
        ])
        swx = jnp.concatenate([
            open_stack[i, 4][None], open_stack[i, Z_PERM][None],
            open_stack[i, Z_LK : Z_LK + 4],
        ])
        swinvx = open_stack[i, AP : AP + 4]
        stacks["x"].append(sx)
        stacks["wx"].append(swx)
        stacks["winvx"].append(swinvx)
    points = {
        "x": xs,
        "wx": [x * domain.omega % FR.p for x in xs],
        "winvx": [x * domain.omega_inv % FR.p for x in xs],
    }
    evals = {}
    for key in ("x", "wx", "winvx"):
        st = jnp.stack(stacks[key])  # (B, m, n, 16)
        pts_m = jnp.asarray(ctx.to_mont_np(points[key]))  # (B, 16)
        ev = _jit_eval_stack_batch(st, pts_m)
        evals[key] = np.asarray(jax.device_get(ev))
    for key in ("x", "wx", "winvx"):
        for i in range(B):
            for v in ctx.from_mont_np(evals[key][i]):
                trs[i].write_scalar(v)

    # ---- 7. GWC multiopen ------------------------------------------------
    vs = [tr.challenge() for tr in trs]
    v_m = jnp.asarray(ctx.to_mont_np(vs))
    for key in ("x", "wx", "winvx"):
        z_m = jnp.asarray(ctx.to_mont_np(points[key]))
        zinv_m = jnp.asarray(ctx.to_mont_np([pow(z, -1, FR.p) for z in points[key]]))
        w = _jit_gwc_witness_batch(jnp.stack(stacks[key]), v_m, z_m, zinv_m)
        for i, pt in enumerate(commit_rows(w)):
            trs[i].write_point(pt)

    return [bytes(tr.data) for tr in trs]
