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

Engineering notes (these dominated early profiles):
 * every jitted function takes its large tables (NTT plans, coset powers,
   fixed/sigma extended evals) as ARGUMENTS — capturing them as closure
   constants embeds tens of MB in the executable, which some PJRT
   transports re-ship per call;
 * the evaluation and GWC phases operate on one stacked (m, n, 16) tensor
   per opening point inside a single jit each — no per-polynomial eager
   dispatch.
"""

from __future__ import annotations

import os
import time as _time

import jax
import jax.numpy as jnp
import numpy as np

from ..cs.builder import Builder, NUM_ADVICE
from ..fields.bn254 import FR
from ..ops import limbs as L
from ..ops import msm as M
from ..ops import poly as P
from ..ops.ntt import NTTPlan
from .domain import MAX_DEGREE, QUOTIENT_PIECES
from .keygen import ALL_FIXED, LOOKUPS, ProvingKey
from .transcript import Transcript

WIRE_COL = {"a": 0, "b": 1, "c": 2, "d": 3}
CTX = L.FR_CTX


from .kernels import (
    _jit_canon_batch,
    ext_batch_padded,
    msm_commit_batch,
    _jit_coeff,
    _jit_coeff_batch,
    _jit_compress,
    _jit_eval_stack,
    _jit_evals_batch,
    _jit_ext_batch,
    _jit_gp_finish_batch,
    _jit_gp_partials_batch,
    _jit_gwc_witness,
    _jit_lookup_fracs,
    _jit_perm_fracs,
    _jit_quotient,
)

def _rand_fr(rng) -> int:
    return FR.from_uniform_bytes(bytes(rng.integers(0, 256, 64, dtype="uint8")))


def _rand_fr_mont_bulk(rng, count: int) -> np.ndarray:
    """count wide-reduced random Fr as (count, 16) Montgomery limbs — C
    fast path (~15 ms at 2^16 vs ~0.2 s Python bigints), Python fallback."""
    raw = rng.integers(0, 256, (count, 64), dtype="uint8")
    from ..native.ec import uniform_to_fr_mont

    out = uniform_to_fr_mont(raw)
    if out is not None:
        return out
    return CTX.to_mont_np(
        [FR.from_uniform_bytes(bytes(raw[i])) for i in range(count)]
    )


def _table_keys(tbl_tags, tbl_vals, usable: int, theta: int):
    """Lookup permutation support: the range table's rows as u32 pair keys
    (tag << 16 | value) padded with zeros to `usable` rows, plus the map
    key -> compressed field value tag + theta*tag*value mod p.

    Pair keys are a faithful proxy for the 254-bit compressed values: every
    looked-up (tag, value) pair is small (tags are sublimb bit-widths <= 16,
    values < 2^16 — cs/range.py build_table), equal keys give identical
    compressed values, and distinct keys give distinct compressed values
    except with negligible probability over theta (the same injectivity the
    halo2 lookup compression itself relies on).  Sorting/matching u32 keys
    in numpy replaces the old per-proof 254-bit Python sort (the dominant
    host cost of the lookup phase)."""
    p = FR.p
    assert all(int(t) < (1 << 16) and int(v) < (1 << 16) for t, v in zip(tbl_tags, tbl_vals)), \
        "u32 pair keys require 16-bit tags and values (cs/range.py widths <= 16)"
    keys = [(int(t) << 16) | int(v) for t, v in zip(tbl_tags, tbl_vals)]
    tkeys = np.asarray(keys, dtype=np.uint32)
    assert np.all(np.diff(tkeys.astype(np.int64)) >= 0), "table keys must be sorted"
    tkeys_padded = np.concatenate([np.zeros(usable - len(keys), np.uint32), tkeys])
    fvals = _fvals_mont(tkeys_padded, theta)
    return tkeys_padded, fvals


def _fvals_mont(keys: np.ndarray, theta: int) -> np.ndarray:
    """Montgomery device limbs of the compressed value tag + theta*tag*value
    for every u32 pair key, aligned with `keys` (key 0 maps to 0 by the
    formula itself).  One vectorized C pass (native/limbops.c lookup_fvals);
    bit-identical Python fallback."""
    from ..native import get_lib

    keys = np.ascontiguousarray(keys, dtype=np.uint32)
    lib = get_lib()
    if lib is not None and hasattr(lib, "lookup_fvals"):
        out = np.empty((len(keys), L.NLIMB), dtype=np.uint32)
        pw, r2w, n0 = CTX._native_consts()
        lib.lookup_fvals(
            keys.ctypes.data, len(keys), theta.to_bytes(32, "little"),
            pw.ctypes.data, r2w.ctypes.data, n0, out.ctypes.data,
        )
        return out
    p = FR.p
    vals = [(int(k >> 16) + theta * int(k >> 16) % p * int(k & 0xFFFF)) % p
            for k in keys]
    return CTX.to_mont_np(vals)


def _permuted_columns(tag_col, adv_col, usable: int, tkeys_padded, fvals, wire):
    """halo2's lookup permutation (lookup/prover.rs permute_expression_pair):
    A' = A sorted (grouped by value), S' = matching table value at each
    first occurrence, remaining table rows filling the rest.  Computed in
    key space (see _table_keys) with numpy; the returned columns are
    (usable, 16) Montgomery limb arrays gathered from `fvals` — no
    per-row Python bigint work anywhere on this path."""
    rows = len(tag_col)
    keys = np.zeros(usable, dtype=np.uint32)
    t = np.fromiter((int(x) for x in tag_col), dtype=np.uint32, count=rows)
    # tagged rows must hold sub-2^16 values (cs/range.py table widths); a
    # wider value here is a buggy witness/gadget — raise prover-side rather
    # than silently truncating into a possibly-valid key (and an invalid
    # proof that only fails at verify time)
    def masked():
        for i, (tv, av) in enumerate(zip(tag_col, adv_col[:rows])):
            av = int(av)
            if av >= (1 << 16) and int(tv) != 0:
                raise ValueError(
                    f"lookup failure: tagged advice value >= 2^16 at row {i} "
                    f"(wire {wire}, tag={int(tv)}) — buggy witness/gadget"
                )
            yield av & 0xFFFF

    a = np.fromiter(masked(), dtype=np.uint32, count=rows)
    keys[:rows] = np.where(t != 0, (t << 16) | a, 0)

    ks = np.sort(keys)
    is_first = np.empty(usable, dtype=bool)
    is_first[0] = True
    is_first[1:] = ks[1:] != ks[:-1]
    firsts = ks[is_first]
    pos = np.searchsorted(tkeys_padded, firsts, side="left")
    ok = (pos < usable) & (tkeys_padded[np.minimum(pos, usable - 1)] == firsts)
    if not ok.all():
        bad = firsts[~ok][0]
        raise ValueError(
            f"lookup failure: (tag={bad >> 16}, value={bad & 0xFFFF}) not in table (wire {wire})"
        )
    used = np.zeros(usable, dtype=bool)
    used[pos] = True
    leftovers = tkeys_padded[~used]
    sp_keys = np.empty(usable, dtype=np.uint32)
    sp_keys[is_first] = firsts
    sp_keys[~is_first] = leftovers[: usable - len(firsts)]

    # key -> limb row via one searchsorted gather per column (the zero pad
    # keys land on index 0, whose fvals row is 0 by the compression formula)
    ap_limbs = fvals[np.searchsorted(tkeys_padded, ks, side="left")]
    sp_limbs = fvals[np.searchsorted(tkeys_padded, sp_keys, side="left")]
    return ap_limbs, sp_limbs


def _mont1(x: int) -> jnp.ndarray:
    return jnp.asarray(CTX.to_mont_np([x]))


# ---- split-quotient mode (k >= SPLIT_QUOTIENT_K) -------------------------

_coset_cache: dict = {}


def _coset_shift_powers(domain, j: int) -> jnp.ndarray:
    """(n,16) mont powers shift^i of the j-th coset shift (cached per k)."""
    key = (domain.k, j, "pow")
    if key not in _coset_cache:
        shift = domain.coset_shift(j)
        vals, cur = [], 1
        for _ in range(domain.n):
            vals.append(cur)
            cur = cur * shift % FR.p
        _coset_cache[key] = jnp.asarray(CTX.to_mont_np(vals))
    return _coset_cache[key]


def _coset_x_evals(domain, j: int) -> jnp.ndarray:
    """(n,16) mont evals of the identity poly X on coset j: shift*omega^i."""
    key = (domain.k, j, "x")
    if key not in _coset_cache:
        shift = domain.coset_shift(j)
        vals, cur = [], shift
        for _ in range(domain.n):
            vals.append(cur)
            cur = cur * domain.omega % FR.p
        _coset_cache[key] = jnp.asarray(CTX.to_mont_np(vals))
    return _coset_cache[key]


def _split_quotient(pk, domain, witness_coeffs, chals, delta_ms, y_pows_rev):
    """Quotient via MAX_DEGREE separate size-n cosets (halo2's strategy):
    at no point is more than one coset's evaluations live, so peak HBM is
    ~MAX_DEGREE-fold lower than the fused 8n path — required for k >= 18
    (reference k=18/19 rows, benches/README.md:61-63)."""
    from .domain import MAX_DEGREE
    from .kernels import (
        _jit_coset_evals,
        _jit_interleave_intt,
        _jit_quotient_coset,
    )

    n = domain.n
    plan, plan_ext = domain.plan, domain.plan_ext
    wit_stack = jnp.stack(witness_coeffs)  # (19, n, 16)
    static_stack = jnp.stack(
        [pk.fixed_coeff[name] for name in ALL_FIXED]
        + list(pk.sigma_coeff)
        + [pk.l0_coeff, pk.l_last_coeff, pk.l_blind_coeff]
    )
    nf = len(ALL_FIXED)
    ns = len(pk.sigma_coeff)
    h_cosets = []
    for j in range(MAX_DEGREE):
        sp = _coset_shift_powers(domain, j)
        wit_j = _jit_coset_evals(wit_stack, sp, plan.tw)
        stat_j = _jit_coset_evals(static_stack, sp, plan.tw)
        fe_c = {name: stat_j[i] for i, name in enumerate(ALL_FIXED)}
        sigma_c = [stat_j[nf + c] for c in range(ns)]
        masks_c = (stat_j[nf + ns], stat_j[nf + ns + 1], stat_j[nf + ns + 2],
                   _coset_x_evals(domain, j))
        shift_n = pow(domain.coset_shift(j), n, FR.p)
        zh_inv = _mont1(pow((shift_n - 1) % FR.p, -1, FR.p))
        off = NUM_ADVICE + 2
        h_j = _jit_quotient_coset(
            [wit_j[c] for c in range(NUM_ADVICE)],
            wit_j[NUM_ADVICE], wit_j[NUM_ADVICE + 1],
            {l: wit_j[off + i] for i, l in enumerate(LOOKUPS)},
            {l: wit_j[off + 4 + i] for i, l in enumerate(LOOKUPS)},
            {l: wit_j[off + 8 + i] for i, l in enumerate(LOOKUPS)},
            fe_c, sigma_c, masks_c, chals, delta_ms, zh_inv, y_pows_rev,
        )
        h_cosets.append(h_j)
    return _jit_interleave_intt(
        jnp.stack(h_cosets), plan_ext.tw_inv, plan_ext.n_inv, pk.zeta_inv_powers
    )


def create_proof(srs, pk: ProvingKey, builder: Builder, rng=None) -> bytes:
    profile = bool(os.environ.get("DELAY_ENC_PROFILE"))
    _t = [_time.time()]

    from ..utils.timers import GLOBAL_METRICS

    def _phase(name):
        now = _time.time()
        GLOBAL_METRICS.spans[f"prove/{name}"] = (
            GLOBAL_METRICS.spans.get(f"prove/{name}", 0.0) + now - _t[0]
        )
        if profile:
            # stderr: stdout is reserved for JSON metric lines (bench.py)
            import sys as _sys

            print(f"#   phase {name}: {now - _t[0]:.2f}s", file=_sys.stderr, flush=True)
        _t[0] = now

    # sub-phase attribution (DELAY_ENC_PROFILE_FINE=1): where inside a
    # phase the time goes — host witness prep vs device launches vs the
    # fold/transfer sync.  `sync=` blocks on the given device arrays so
    # the async dispatch cost lands on the right mark; this adds sync
    # overhead, so it is OFF unless explicitly requested.  Pure host-side
    # timers: the traced kernels (and the compile cache) are unchanged.
    fine = bool(os.environ.get("DELAY_ENC_PROFILE_FINE"))
    _tf = [_time.time()]

    def _fine(name, sync=None):
        if not fine:
            return
        import sys as _sys

        if sync is not None:
            jax.block_until_ready(sync)
        now = _time.time()
        print(f"#     sub {name}: {now - _tf[0]:.3f}s", file=_sys.stderr,
              flush=True)
        _tf[0] = now

    if rng is None:
        rng = np.random.default_rng()
    ctx = CTX
    domain = pk.vk.domain
    n, usable = domain.n, domain.usable_rows
    srs = srs.truncated(domain.k)
    g1 = srs.g1_powers
    plan, plan_ext = domain.plan, domain.plan_ext
    delta_ms = [_mont1(d) for d in pk.delta_powers]

    tr = Transcript()
    # vk.hash_into(transcript): the first absorption is the vk's
    # transcript_repr scalar (halo2 plonk/prover.rs)
    tr.common_scalar(pk.vk.transcript_repr)
    # bind public inputs (instance column values) into the transcript, as
    # halo2's create_proof does for non-QUERY_INSTANCE (KZG) schemes
    for v in builder.instance:
        tr.common_scalar(v)

    # DELAY_ENC_NTT=mxu: run every domain transform on the matmul NTT
    # (ops/ntt_mxu.py) — MXU dots instead of VPU butterfly ladders.  The
    # split-quotient path (k >= 18) keeps the Stockham kernels: its
    # per-coset transforms would need one plan per coset shift.
    use_mxu = os.environ.get("DELAY_ENC_NTT") == "mxu" and not pk.split
    if use_mxu:
        from ..ops import ntt_mxu as NX

    def to_coeff(col):
        if use_mxu:
            return NX.ntt_mxu(domain.mxu_inv, col)
        return _jit_coeff(col, plan.tw_inv, plan.n_inv)

    def to_coeff_batch(cols):
        """One batched iNTT launch for a stack of columns."""
        if use_mxu:
            return NX.ntt_mxu_stack(domain.mxu_inv, jnp.stack(cols))
        return _jit_coeff_batch(jnp.stack(cols), plan.tw_inv, plan.n_inv)

    pair_tables = srs.msm_tables()

    from . import selfcheck as SC

    sc_level = SC.level() if os.environ.get("DELAY_ENC_SELFCHECK") else 0

    def commit_many(coeffs, tag=""):
        stacked = _jit_canon_batch(jnp.stack(coeffs))
        pts = msm_commit_batch(pair_tables, stacked)
        if sc_level:
            SC.check_commits(srs, coeffs, pts, tag or "commit")
        return pts

    def commit_coeff(coeff, tag=""):
        return commit_many([coeff], tag)[0]

    # ---- 1. advice columns -------------------------------------------
    _fine("phase1 start")
    advice_host = []
    for c in range(NUM_ADVICE):
        col = list(builder.advice[c]) + [0] * (n - builder.rows)
        for r in range(usable, n):
            col[r] = _rand_fr(rng)
        advice_host.append(col)
    _fine("advice host build")
    advice_raw = [jnp.asarray(ctx.to_mont_np(col)) for col in advice_host]
    # instance column: public values padded with zeros, NOT blinded
    instance_col = list(builder.instance) + [0] * (n - len(builder.instance))
    instance_raw = jnp.asarray(ctx.to_mont_np(instance_col))
    _fine("advice to_mont")
    coeffs6 = to_coeff_batch(advice_raw + [instance_raw])
    _fine("advice iNTT", sync=coeffs6)
    advice_coeff = [coeffs6[c] for c in range(NUM_ADVICE)]
    instance_coeff = coeffs6[NUM_ADVICE]
    for pt in commit_many(advice_coeff, 'advice'):
        tr.write_point(pt)
    _fine("advice commit+fold")
    _phase("advice commit")

    # ---- 2. lookups ---------------------------------------------------
    theta = tr.challenge()
    theta_m = _mont1(theta)

    _fine("phase2 start")
    s_raw = _jit_compress(pk.fixed_raw["table_tag"], pk.fixed_raw["table_value"], theta_m)
    # Permuted columns via u32 (tag, value) pair keys — see _permuted_columns.
    from ..cs.range import build_table

    tbl_tags, tbl_vals = build_table(builder.lookup_widths)
    tkeys_padded, fvals = _table_keys(tbl_tags, tbl_vals, usable, theta)
    a_raw, ap_raw, sp_raw = {}, {}, {}
    for l in LOOKUPS:
        tag_raw = pk.fixed_raw[f"tag_{l}"]
        a_raw[l] = _jit_compress(tag_raw, advice_raw[WIRE_COL[l]], theta_m)
        ap_limbs, sp_limbs = _permuted_columns(
            builder.fixed[f"tag_{l}"], builder.advice[WIRE_COL[l]],
            usable, tkeys_padded, fvals, l,
        )
        pad = ctx.to_mont_np([_rand_fr(rng) for _ in range(n - usable)])
        pad = pad.reshape(-1, L.NLIMB).astype(np.uint32)
        ap_raw[l] = jnp.asarray(np.concatenate([ap_limbs, pad]))
        sp_raw[l] = jnp.asarray(np.concatenate([sp_limbs, pad]))
    _fine("lookup host permute+to_mont")
    lk8 = to_coeff_batch([ap_raw[l] for l in LOOKUPS] + [sp_raw[l] for l in LOOKUPS])
    _fine("lookup iNTT", sync=lk8)
    ap_coeff = {l: lk8[i] for i, l in enumerate(LOOKUPS)}
    sp_coeff = {l: lk8[4 + i] for i, l in enumerate(LOOKUPS)}
    lk_pts = commit_many(
        [c for l in LOOKUPS for c in (ap_coeff[l], sp_coeff[l])], 'lookup'
    )
    for pt in lk_pts:
        tr.write_point(pt)
    _fine("lookup commit+fold")
    _phase("lookup permuted")

    # ---- 3. grand products -------------------------------------------
    beta = tr.challenge()
    gamma = tr.challenge()
    beta_m, gamma_m = _mont1(beta), _mont1(gamma)
    active = jnp.asarray(np.arange(n) < usable)

    _fine("phase3 start")
    omega_col, cur = [], 1
    for _ in range(n):
        omega_col.append(cur)
        cur = cur * domain.omega % FR.p
    omega_dev = jnp.asarray(ctx.to_mont_np(omega_col))
    _fine("gp omega host")
    if use_mxu:
        sigma_raw = NX.ntt_mxu_stack(domain.mxu_fwd, jnp.stack(pk.sigma_coeff))
    else:
        sigma_raw = _jit_evals_batch(jnp.stack(pk.sigma_coeff), plan.tw)
    sigma_raw = [sigma_raw[c] for c in range(len(pk.sigma_coeff))]
    # all 5 grand products (permutation + 4 lookups) batched: one partials
    # launch, 5 host inversions, one finish launch, one batched iNTT
    num_p, den_p = _jit_perm_fracs(
        advice_raw + [instance_raw], sigma_raw, omega_dev, beta_m, gamma_m, delta_ms
    )
    nums, dens = [num_p], [den_p]
    for l in LOOKUPS:
        numl, denl = _jit_lookup_fracs(a_raw[l], s_raw, ap_raw[l], sp_raw[l], beta_m, gamma_m)
        nums.append(numl)
        dens.append(denl)
    num_a, pre, suf, totals = _jit_gp_partials_batch(
        jnp.stack(nums), jnp.stack(dens), active
    )
    _fine("gp fracs+partials launch")
    total_ints = ctx.from_mont_np(np.asarray(jax.device_get(totals)))
    _fine("gp totals d2h")
    if any(t == 0 for t in total_ints):
        raise ValueError("grand product denominator vanished")
    total_inv_m = jnp.asarray(ctx.to_mont_np([pow(t, -1, FR.p) for t in total_ints]))
    blind = jnp.asarray(
        ctx.to_mont_np([_rand_fr(rng) for _ in range(5 * (n - usable - 1))])
    ).reshape(5, n - usable - 1, L.NLIMB)
    z5 = _jit_gp_finish_batch(num_a, pre, suf, total_inv_m, blind)
    if use_mxu:
        z5_coeff = NX.ntt_mxu_stack(domain.mxu_inv, z5)
    else:
        z5_coeff = _jit_coeff_batch(z5, plan.tw_inv, plan.n_inv)
    _fine("gp finish+iNTT", sync=z5_coeff)
    z_perm_coeff = z5_coeff[0]
    z_lookup_coeff = {l: z5_coeff[1 + i] for i, l in enumerate(LOOKUPS)}
    for pt in commit_many([z_perm_coeff] + [z_lookup_coeff[l] for l in LOOKUPS], 'gp'):
        tr.write_point(pt)
    _fine("gp commit+fold")
    _phase("grand products")

    # ---- 4. random poly ----------------------------------------------
    random_coeff = jnp.asarray(_rand_fr_mont_bulk(rng, n))
    tr.write_point(commit_coeff(random_coeff, 'random'))

    # ---- 5. quotient ---------------------------------------------------
    y = tr.challenge()
    n_exprs = 4 + 5 * len(LOOKUPS)
    y_pows_rev = jnp.asarray(
        ctx.to_mont_np([pow(y, n_exprs - 1 - i, FR.p) for i in range(n_exprs)])
    )

    witness_coeffs = (
        advice_coeff
        + [instance_coeff, z_perm_coeff]
        + [z_lookup_coeff[l] for l in LOOKUPS]
        + [ap_coeff[l] for l in LOOKUPS]
        + [sp_coeff[l] for l in LOOKUPS]
    )
    if pk.split:
        h_coeff = _split_quotient(
            pk, domain, witness_coeffs, (theta_m, beta_m, gamma_m), delta_ms,
            y_pows_rev,
        )
    else:
        # one batched extended-coset NTT for every opened witness polynomial
        _fine("phase5 start")
        if use_mxu:
            wstack = jnp.stack(witness_coeffs)
            padded = jnp.concatenate(
                [wstack, jnp.zeros((wstack.shape[0],
                                    domain.n_ext - n, L.NLIMB), jnp.uint32)],
                axis=1)
            ext_stack = NX.ntt_mxu_stack(domain.mxu_ext, padded)
        else:
            ext_stack = ext_batch_padded(
                jnp.stack(witness_coeffs), pk.zeta_powers, plan_ext.tw,
            )
        _fine("quotient ext NTT", sync=ext_stack)
        advice_ext = [ext_stack[c] for c in range(NUM_ADVICE)]
        instance_ext = ext_stack[NUM_ADVICE]
        z_perm_ext = ext_stack[NUM_ADVICE + 1]
        off = NUM_ADVICE + 2
        z_l_ext = {l: ext_stack[off + i] for i, l in enumerate(LOOKUPS)}
        ap_ext = {l: ext_stack[off + 4 + i] for i, l in enumerate(LOOKUPS)}
        sp_ext = {l: ext_stack[off + 8 + i] for i, l in enumerate(LOOKUPS)}

        if use_mxu:
            from .kernels import _jit_quotient_mxu

            mp = domain.mxu_ext_inv
            h_coeff = _jit_quotient_mxu(mp.mu, mp.n1, mp.n2)(
                advice_ext, instance_ext, z_perm_ext, z_l_ext, ap_ext,
                sp_ext, pk.fixed_ext, pk.sigma_ext,
                (pk.l0_ext, pk.l_last_ext, pk.l_blind_ext, pk.x_ext),
                (theta_m, beta_m, gamma_m), delta_ms, pk.zh_inv_ext,
                y_pows_rev, *mp.arrays,
            )
        else:
            h_coeff = _jit_quotient(
                advice_ext, instance_ext, z_perm_ext, z_l_ext, ap_ext, sp_ext,
                pk.fixed_ext, pk.sigma_ext,
                (pk.l0_ext, pk.l_last_ext, pk.l_blind_ext, pk.x_ext),
                (theta_m, beta_m, gamma_m),
                delta_ms, pk.zh_inv_ext, pk.zeta_inv_powers, y_pows_rev,
                plan_ext.tw_inv, plan_ext.n_inv,
            )
        # free the extended-domain arrays — the opening phases don't need
        # them, and at k=17 they hold ~1.5 GB of HBM
        del advice_ext, instance_ext, z_perm_ext, z_l_ext, ap_ext, sp_ext, ext_stack
    del a_raw, ap_raw, sp_raw, s_raw, num_a, pre, suf, omega_dev, sigma_raw
    _fine("quotient eval+iNTT", sync=h_coeff)
    h_pieces = [h_coeff[i * n : (i + 1) * n] for i in range(QUOTIENT_PIECES)]
    for pt in commit_many(h_pieces, 'quotient'):
        tr.write_point(pt)
    _fine("quotient commit+fold")
    _phase("quotient")

    # ---- 6. evaluations ------------------------------------------------
    x = tr.challenge()
    x_w = x * domain.omega % FR.p
    x_winv = x * domain.omega_inv % FR.p

    opens_x = (
        [("advice", c, advice_coeff[c]) for c in range(NUM_ADVICE)]
        + [("fixed", name, pk.fixed_coeff[name]) for name in ALL_FIXED]
        + [("sigma", c, pk.sigma_coeff[c]) for c in range(len(pk.sigma_coeff))]
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

    stacks, evals = {}, {}
    for key, opens, point in (
        ("x", opens_x, x),
        ("wx", opens_wx, x_w),
        ("winvx", opens_winvx, x_winv),
    ):
        stacked = jnp.stack([cf for (_, _, cf) in opens])
        stacks[key] = stacked
        evs = _jit_eval_stack(stacked, jnp.asarray(ctx.to_mont_np([point]))[0])
        evals[key] = ctx.from_mont_np(np.asarray(jax.device_get(evs)))
    for key in ("x", "wx", "winvx"):
        for v in evals[key]:
            tr.write_scalar(v)
    _phase("evals")

    # ---- 7. GWC multiopen ---------------------------------------------
    # the three W commitments share one challenge phase (no transcript
    # absorption between them), so their MSMs batch into one launch set
    v = tr.challenge()
    v_m0 = jnp.asarray(ctx.to_mont_np([v]))[0]
    ws = []
    for key, point in (("x", x), ("wx", x_w), ("winvx", x_winv)):
        z_m = jnp.asarray(ctx.to_mont_np([point]))[0]
        zinv_m = jnp.asarray(ctx.to_mont_np([pow(point, -1, FR.p)]))[0]
        ws.append(_jit_gwc_witness(stacks[key], v_m0, z_m, zinv_m))
    if sc_level >= 2:
        for w_dev, (key, point) in zip(ws, (("x", x), ("wx", x_w),
                                            ("winvx", x_winv))):
            SC.check_gwc_witness(stacks[key], w_dev, v, point, key)
    for pt in commit_many(ws, 'gwc'):
        tr.write_point(pt)
    _phase("gwc")

    return bytes(tr.data)
