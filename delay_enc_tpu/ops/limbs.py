"""Device (TPU) big-field arithmetic over base-2^16 limb tensors.

TPU-first design decisions (replacing `halo2curves`'s u64x4 Montgomery code,
the reference's field backend — Cargo.toml:14-17):

 * An element of a 254-bit field is a little-endian vector of 16 x 16-bit
   limbs stored as ``uint32`` — a 16x16-bit product fits exactly in uint32,
   and per-column sums of 16 such split halves stay < 2^21, so the full
   schoolbook product needs no 64-bit carries (TPUs have no u64 ALU).
 * All values are kept in Montgomery form (R = 2^256); `mont_mul` does a
   carry-save schoolbook product followed by a 16-step base-2^16 Montgomery
   reduction.  Everything is vectorized over arbitrary leading batch axes —
   the VPU sees large elementwise workloads, the sequential depth is the
   per-element limb schedule (O(n) steps of O(batch*n) vector work).
 * Comparisons/subtract-p are branchless borrow chains + selects.

The NTT, MSM and Poseidon device kernels are built on these primitives.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..fields.prime import PrimeField
from ..fields.bn254 import FQ, FR

NLIMB = 16  # 16 limbs x 16 bits = 256 bits
LIMB_BITS = 16
MASK = 0xFFFF  # python int: usable inside Pallas kernels (no captured consts)


# ---------------------------------------------------------------- host side

def int_to_limbs_np(x: int) -> np.ndarray:
    """One int -> (16,) uint32 limb vector (canonical, NOT Montgomery)."""
    b = int(x).to_bytes(32, "little")
    return np.frombuffer(b, dtype="<u2").astype(np.uint32)


def ints_to_limbs_np(xs) -> np.ndarray:
    """Sequence of ints -> (N, 16) uint32 (canonical form)."""
    buf = b"".join(int(x).to_bytes(32, "little") for x in xs)
    return np.frombuffer(buf, dtype="<u2").reshape(len(xs), NLIMB).astype(np.uint32)


def limbs_to_ints_np(a) -> list[int]:
    a = np.asarray(a, dtype=np.uint64).reshape(-1, NLIMB)
    out = []
    for row in a:
        v = 0
        for i in range(NLIMB - 1, -1, -1):
            v = (v << LIMB_BITS) | int(row[i])
        out.append(v)
    return out


@dataclass(frozen=True)
class FieldCtx:
    """Per-field device constants."""

    field: PrimeField
    p_limbs: jnp.ndarray  # (16,) uint32
    p_host: tuple  # same limbs as python ints (for unrolled/Pallas paths)
    n_prime: int  # -p^-1 mod 2^16
    r_mod_p: jnp.ndarray  # R mod p, canonical limbs (= Montgomery ONE)
    r2_limbs: jnp.ndarray  # R^2 mod p, canonical limbs
    zero: jnp.ndarray  # (16,) zeros

    @staticmethod
    def make(field: PrimeField) -> "FieldCtx":
        p = field.p
        r = (1 << 256) % p
        r2 = (r * r) % p
        return FieldCtx(
            field=field,
            p_limbs=jnp.asarray(int_to_limbs_np(p)),
            p_host=tuple(int(v) for v in int_to_limbs_np(p)),
            n_prime=(-pow(p, -1, 1 << LIMB_BITS)) % (1 << LIMB_BITS),
            r_mod_p=jnp.asarray(int_to_limbs_np(r)),
            r2_limbs=jnp.asarray(int_to_limbs_np(r2)),
            zero=jnp.zeros(NLIMB, jnp.uint32),
        )

    # host conversions (native C fast path with pure-Python fallback) ----
    def _native_consts(self):
        if not hasattr(self, "_nc"):
            p = self.field.p
            p_words = np.frombuffer(p.to_bytes(32, "little"), dtype="<u8").copy()
            r2 = ((1 << 256) % p) ** 2 % p
            r2_words = np.frombuffer(r2.to_bytes(32, "little"), dtype="<u8").copy()
            n0inv = (-pow(p, -1, 1 << 64)) % (1 << 64)
            object.__setattr__(self, "_nc", (p_words, r2_words, n0inv))
        return self._nc

    def to_mont_np(self, xs) -> np.ndarray:
        """ints -> Montgomery limb array."""
        from ..native import get_lib

        lib = get_lib()
        p = self.field.p
        if lib is not None:
            n = len(xs)
            buf = b"".join(int(x % p).to_bytes(32, "little") for x in xs)
            inp = np.frombuffer(buf, dtype=np.uint8)
            out = np.empty((n, NLIMB), dtype=np.uint32)
            pw, r2w, n0 = self._native_consts()
            lib.to_mont(
                inp.ctypes.data, n, pw.ctypes.data, r2w.ctypes.data, n0, out.ctypes.data
            )
            return out
        return ints_to_limbs_np([(int(x) << 256) % p for x in xs])

    def from_mont_np(self, a) -> list[int]:
        from ..native import get_lib

        lib = get_lib()
        p = self.field.p
        arr = np.ascontiguousarray(np.asarray(a, dtype=np.uint32).reshape(-1, NLIMB))
        if lib is not None:
            n = arr.shape[0]
            out = np.empty(n * 32, dtype=np.uint8)
            pw, _, n0 = self._native_consts()
            lib.from_mont(arr.ctypes.data, n, pw.ctypes.data, n0, out.ctypes.data)
            ob = out.tobytes()
            return [int.from_bytes(ob[32 * i : 32 * i + 32], "little") for i in range(n)]
        rinv = pow((1 << 256) % p, -1, p)
        return [(v * rinv) % p for v in limbs_to_ints_np(arr)]

    def one_mont(self) -> jnp.ndarray:
        return self.r_mod_p


FR_CTX = FieldCtx.make(FR)
FQ_CTX = FieldCtx.make(FQ)


# ------------------------------------------------------------- device math
#
# Every per-limb chain has two implementations:
#  * a lax.scan form (tiny trace, fast XLA compiles) for large batches,
#  * an unrolled form for small batches, where a scan's ~16 sequential
#    micro-kernels per op would make depth-bound chains (e.g. the MSM
#    Horner combine over 254 bit planes) dispatch-latency-bound.
# `_is_small` picks the variant by static batch size.

# Unrolled limb chains are orders of magnitude faster at runtime than the
# lax.scan forms on TPU (XLA fuses them into single elementwise kernels;
# the scan forms materialize their carried (…, 32) state in HBM on every
# one of the ~34 steps — a measured ~400x slowdown, and a 25 GB allocation
# at k=16's batched quotient sizes).  The threshold is only a safety valve
# for absurd shapes; in practice every TPU kernel unrolls.
_UNROLL_MAX_ELEMS = 1 << 27
_FORCE_UNROLL = False


from contextlib import contextmanager


@contextmanager
def force_unroll():
    """Select the unrolled limb chains regardless of batch size — used when
    tracing Pallas kernel bodies, where ops execute on VMEM tiles and the
    Mosaic compiler handles large unrolled bodies cheaply."""
    global _FORCE_UNROLL
    prev = _FORCE_UNROLL
    _FORCE_UNROLL = True
    try:
        yield
    finally:
        _FORCE_UNROLL = prev


def _backend_unrolls() -> bool:
    """Unrolled limb chains only on TPU: XLA:TPU fuses them into near
    speed-of-light elementwise kernels, while XLA:CPU takes minutes to
    compile the wide graphs (the lax.scan forms compile in seconds there
    and tests/dryruns don't need peak throughput)."""
    import jax

    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def _is_small(shape) -> bool:
    if _FORCE_UNROLL:
        return True
    if not _backend_unrolls():
        return False
    n = 1
    for d in shape[:-1]:
        n *= int(d)
    return n <= _UNROLL_MAX_ELEMS


# ---------------------------------------------------------- limb-list core
#
# Profiling the padded/concatenated unrolled forms showed XLA lowers every
# jnp.pad-shifted column accumulation to its own pad_add kernel (~60 kernels
# and ~60 full HBM round trips per Montgomery multiply).  The limb-LIST core
# below keeps each limb as an independent (batch,) array and does all column
# shifting by Python list indexing at trace time: the entire multiply (and
# chains of multiplies, additions, selects across ops) is one pure
# elementwise DAG that XLA fuses into a handful of kernels.
#
# Arrays at jit boundaries stay in the (…, 16) minor-dim layout; `unpack`
# (16 free slice-views) and `pack` (one stack) convert at the edges.

def unpack(a: jnp.ndarray) -> list:
    """(…, 16) -> list of 16 (…,) limb rows (zero-copy views)."""
    return [a[..., i] for i in range(NLIMB)]


def pack(rows: list) -> jnp.ndarray:
    """list of 16 (…,) rows -> (…, 16) (broadcasting rows as needed)."""
    shape = jnp.broadcast_shapes(*(r.shape for r in rows))
    return jnp.stack([jnp.broadcast_to(r, shape) for r in rows], axis=-1)


def ll_zero_like(rows: list) -> list:
    z = rows[0] * 0
    return [z] * NLIMB


def ll_carry_and_mod(ctx: FieldCtx, cols: list) -> list:
    """Fused carry-propagate over 16 columns (each < 2^32 total) +
    conditional subtract-p; returns canonical limb rows."""
    ph = ctx.p_host
    limbs, diffs = [], []
    carry = cols[0] * 0
    borrow = carry
    for i in range(NLIMB):
        v = cols[i] + carry
        limb = v & MASK
        carry = v >> LIMB_BITS
        d = limb - ph[i] - borrow
        borrow = (d >> 31) & 1
        limbs.append(limb)
        diffs.append(d & MASK)
    ge = borrow == 0
    return [jnp.where(ge, d, r) for d, r in zip(diffs, limbs)]


def ll_add(ctx: FieldCtx, a: list, b: list) -> list:
    return ll_carry_and_mod(ctx, [x + y for x, y in zip(a, b)])


def ll_sub(ctx: FieldCtx, a: list, b: list) -> list:
    """(a + p) - b with fused carry/borrow chains, then reduce."""
    ph = ctx.p_host
    outs, diffs = [], []
    carry = a[0] * 0 + b[0] * 0
    borrow = carry
    borrow2 = carry
    for i in range(NLIMB):
        v = a[i] + ph[i] + carry
        carry = v >> LIMB_BITS
        d = (v & MASK) - b[i] - borrow
        borrow = (d >> 31) & 1
        r = d & MASK
        d2 = r - ph[i] - borrow2
        borrow2 = (d2 >> 31) & 1
        outs.append(r)
        diffs.append(d2 & MASK)
    ge = borrow2 == 0
    return [jnp.where(ge, d, r) for d, r in zip(diffs, outs)]


def ll_mont_mul(ctx: FieldCtx, a: list, b: list) -> list:
    """Montgomery product on limb rows: schoolbook into 32 carry-save
    columns (pure adds — column shifts are list indices), then the 16-step
    base-2^16 reduction."""
    ph = ctx.p_host
    npi = ctx.n_prime
    cols = [None] * (2 * NLIMB)

    def acc(k, v):
        cols[k] = v if cols[k] is None else cols[k] + v

    for j in range(NLIMB):
        bj = b[j]
        for i in range(NLIMB):
            p = a[i] * bj  # 16x16-bit product, exact in uint32
            acc(i + j, p & MASK)
            acc(i + j + 1, p >> LIMB_BITS)
    zero = a[0] * 0 + b[0] * 0
    for k in range(2 * NLIMB):
        if cols[k] is None:
            cols[k] = zero

    carry = zero
    for i in range(NLIMB):
        tot = cols[i] + carry
        u = ((tot & MASK) * npi) & MASK
        up0 = u * ph[0]
        carry = (tot + (up0 & MASK)) >> LIMB_BITS
        cols[i + 1] = cols[i + 1] + (up0 >> LIMB_BITS)
        for jl in range(1, NLIMB):
            up = u * ph[jl]
            cols[i + jl] = cols[i + jl] + (up & MASK)
            cols[i + jl + 1] = cols[i + jl + 1] + (up >> LIMB_BITS)
    top = cols[NLIMB:]
    top[0] = top[0] + carry
    return ll_carry_and_mod(ctx, top)


def ll_select(cond, a: list, b: list) -> list:
    """cond ? a : b elementwise on limb rows (cond batch-shaped)."""
    return [jnp.where(cond, x, y) for x, y in zip(a, b)]


def ll_const(ctx: FieldCtx, limbs_np, like: list) -> list:
    """Broadcast a host (16,) canonical/Montgomery constant to limb rows."""
    z = like[0] * 0
    return [z + int(v) for v in np.asarray(limbs_np)]


def _carry_propagate(cols: jnp.ndarray, n_out: int) -> jnp.ndarray:
    """Sequential carry chain over limb positions."""
    if _is_small(cols.shape):
        outs = []
        carry = cols[..., 0:1] * 0
        for i in range(n_out):
            v = cols[..., i : i + 1] + carry
            outs.append(v & MASK)
            carry = v >> LIMB_BITS
        return jnp.concatenate(outs, axis=-1)
    cols_t = jnp.moveaxis(cols[..., :n_out], -1, 0)

    def step(carry, col):
        v = col + carry
        return v >> LIMB_BITS, v & MASK

    # init derived from the input so it carries the same manual-axes type
    # under shard_map (jnp.zeros would not)
    _, outs = jax.lax.scan(step, cols[..., 0] * 0, cols_t)
    return jnp.moveaxis(outs, 0, -1)


def _sub_p_if_ge(ctx: FieldCtx, a: jnp.ndarray) -> jnp.ndarray:
    """a (canonical limbs, value < 2p) -> a mod p via branchless borrow chain."""
    if _is_small(a.shape):
        ph = ctx.p_host
        diffs = []
        borrow = a[..., 0:1] * 0
        for i in range(NLIMB):
            d = a[..., i : i + 1] - ph[i] - borrow
            borrow = (d >> 31) & 1
            diffs.append(d & MASK)
        diff = jnp.concatenate(diffs, axis=-1)
        return jnp.where(borrow == 0, diff, a)
    a_t = jnp.moveaxis(a, -1, 0)
    p_t = ctx.p_limbs.reshape(NLIMB, *([1] * (a.ndim - 1)))

    def step(borrow, inp):
        ai, pi = inp
        d = ai - pi - borrow
        return (d >> 31) & 1, d & MASK

    borrow, diffs = jax.lax.scan(step, a[..., 0] * 0 + jnp.uint32(0) * p_t[0], (a_t, p_t))
    diff = jnp.moveaxis(diffs, 0, -1)
    ge = (borrow == 0)[..., None]  # a >= p
    return jnp.where(ge, diff, a)


def _carry_and_mod(ctx: FieldCtx, cols: jnp.ndarray) -> jnp.ndarray:
    """Fused carry-propagate (16 columns, values < 2^32, total < 2p after
    propagation) + conditional subtract-p — a single 16-step chain instead
    of two (sequential depth is the scarce resource on-device)."""
    p = ctx.p_limbs
    if _is_small(cols.shape):
        return pack(ll_carry_and_mod(ctx, [cols[..., i] for i in range(NLIMB)]))
    cols_t = jnp.moveaxis(cols[..., :NLIMB], -1, 0)
    p_t = p.reshape(NLIMB, *([1] * (cols.ndim - 1)))

    def step(state, inp):
        carry, borrow = state
        ci, pi = inp
        v = ci + carry
        limb = v & MASK
        d = limb - pi - borrow
        return ((v >> LIMB_BITS), (d >> 31) & 1), (limb, d & MASK)

    zero = cols[..., 0] * 0
    (carry, borrow), (limbs, diffs) = jax.lax.scan(step, (zero, zero), (cols_t, p_t))
    raw = jnp.moveaxis(limbs, 0, -1)
    diff = jnp.moveaxis(diffs, 0, -1)
    return jnp.where((borrow == 0)[..., None], diff, raw)


def add(ctx: FieldCtx, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return _carry_and_mod(ctx, a + b)  # column sums < 2^17, value < 2p


def sub(ctx: FieldCtx, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    # (a + p) - b via a fused carry/borrow chain; result < 2p, then reduce.
    p = ctx.p_limbs
    if _is_small(a.shape) and _is_small(b.shape):
        shape = jnp.broadcast_shapes(a.shape, b.shape)
        a = jnp.broadcast_to(a, shape)
        b = jnp.broadcast_to(b, shape)
        return pack(ll_sub(ctx, unpack(a), unpack(b)))
    s_t = jnp.moveaxis(a + ctx.p_limbs, -1, 0)  # columns < 2^17
    b_t = jnp.moveaxis(b, -1, 0)
    p_t = p.reshape(NLIMB, *([1] * (a.ndim - 1)))

    def step(state, inp):
        carry, borrow, borrow2 = state
        v, bi, pi = inp
        v = v + carry
        d = (v & MASK) - bi - borrow
        r = d & MASK
        d2 = r - pi - borrow2
        return ((v >> LIMB_BITS), (d >> 31) & 1, (d2 >> 31) & 1), (r, d2 & MASK)

    zero = a[..., 0] * 0 + b[..., 0] * 0
    # For p < 2^255, a + p - b < 2p < 2^256: the value fits 16 limbs exactly
    # (final carry cancels the final borrow), so no top limb is needed.
    (_, _, borrow2), (outs, diffs) = jax.lax.scan(
        step, (zero, zero, zero), (s_t, b_t, p_t)
    )
    raw = jnp.moveaxis(outs, 0, -1)
    diff = jnp.moveaxis(diffs, 0, -1)
    return jnp.where((borrow2 == 0)[..., None], diff, raw)


def neg(ctx: FieldCtx, a: jnp.ndarray) -> jnp.ndarray:
    return sub(ctx, jnp.broadcast_to(ctx.zero, a.shape), a)


def is_zero(a: jnp.ndarray) -> jnp.ndarray:
    return jnp.all(a == 0, axis=-1)


def eq(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return jnp.all(a == b, axis=-1)


def select(cond: jnp.ndarray, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """cond ? a : b, cond shaped like the batch (no limb axis)."""
    return jnp.where(cond[..., None], a, b)


def _pad_to(x: jnp.ndarray, width: int) -> jnp.ndarray:
    pad = [(0, 0)] * (x.ndim - 1) + [(0, width - x.shape[-1])]
    return jnp.pad(x, pad)


def _schoolbook_cols(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Full 512-bit product in 32 carry-save columns (each < 2^21).
    Anti-diagonal accumulation as a scan over the 16 b-limbs, each shifted
    into place with a dynamic roll (no scatters, tiny trace)."""
    shape = jnp.broadcast_shapes(a.shape, b.shape)
    a = jnp.broadcast_to(a, shape)
    b = jnp.broadcast_to(b, shape)
    if _is_small(shape):
        # column-oriented 2-D form: per b-limb scalar products, padded into
        # place — no (…,16,16) tensor (3-D relayouts crash Mosaic)
        width = 2 * NLIMB
        cols = jnp.concatenate([a, b], axis=-1) * 0
        for j in range(NLIMB):
            pj = a * b[..., j : j + 1]  # (…,16) exact 16x16-bit products
            lo = pj & MASK
            hi = pj >> LIMB_BITS
            pad_lo = [(0, 0)] * (lo.ndim - 1) + [(j, NLIMB - j)]
            pad_hi = [(0, 0)] * (hi.ndim - 1) + [(j + 1, NLIMB - j - 1)]
            cols = cols + jnp.pad(lo, pad_lo)
            cols = cols + jnp.pad(hi, pad_hi)
        return cols
    t = a[..., :, None] * b[..., None, :]  # (…,16,16) exact in uint32

    lo = jnp.moveaxis(t & MASK, -1, 0)  # (16, …, 16) indexed by j
    hi = jnp.moveaxis(t >> LIMB_BITS, -1, 0)
    width = 2 * NLIMB
    # derive the init from BOTH operands so its manual-axes varying
    # type matches the body output under shard_map
    init = jnp.concatenate([a, b], axis=-1) * 0
    js = jnp.arange(NLIMB, dtype=jnp.int32)

    def step(cols, inp):
        lo_j, hi_j, j = inp
        cols = cols + jnp.roll(_pad_to(lo_j, width), j, axis=-1)
        cols = cols + jnp.roll(_pad_to(hi_j, width), j + 1, axis=-1)
        return cols, None

    cols, _ = jax.lax.scan(step, init, (lo, hi, js))
    return cols


def mont_mul(ctx: FieldCtx, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Montgomery product: a*b*R^-1 mod p (inputs/outputs in Montgomery form,
    canonical 16-bit limbs).  Reduction is a 16-step scan with a scalar
    carry-of-column-i state (the retired column's upper bits), so no dynamic
    scatters are needed."""
    p = ctx.p_limbs
    width = 2 * NLIMB
    shape = jnp.broadcast_shapes(a.shape, b.shape)
    if _is_small(shape):
        a = jnp.broadcast_to(a, shape)
        b = jnp.broadcast_to(b, shape)
        return pack(ll_mont_mul(ctx, unpack(a), unpack(b)))
    cols = _schoolbook_cols(a, b)

    np_ = jnp.uint32(ctx.n_prime)
    first_mask = jnp.ones(NLIMB, jnp.uint32).at[0].set(0)

    def step(state, i):
        cols, carry = state
        total_i = jax.lax.dynamic_index_in_dim(cols, i, axis=-1, keepdims=False) + carry
        low = total_i & MASK
        u = (low * np_) & MASK
        up = u[..., None] * p  # (…,16) exact
        up_lo = up & MASK
        up_hi = up >> LIMB_BITS
        # column i retires: its final value is total_i + up_lo[0]; only the
        # upper bits survive, carried into column i+1 via the scalar state.
        carry_next = (total_i + up_lo[..., 0]) >> LIMB_BITS
        cols = cols + jnp.roll(_pad_to(up_lo * first_mask, width), i, axis=-1)
        cols = cols + jnp.roll(_pad_to(up_hi, width), i + 1, axis=-1)
        return (cols, carry_next), None

    init = (cols, cols[..., 0] * 0)
    (cols, carry), _ = jax.lax.scan(step, init, jnp.arange(NLIMB, dtype=jnp.int32))
    top = cols[..., NLIMB:]
    top = jnp.concatenate([(top[..., 0] + carry)[..., None], top[..., 1:]], axis=-1)
    return _carry_and_mod(ctx, top)


def mont_sqr(ctx: FieldCtx, a: jnp.ndarray) -> jnp.ndarray:
    return mont_mul(ctx, a, a)


def mont_pow(ctx: FieldCtx, a: jnp.ndarray, e: int) -> jnp.ndarray:
    """Fixed (host-known) exponent power; e >= 0."""
    result = jnp.broadcast_to(ctx.one_mont(), a.shape)
    base = a
    while e:
        if e & 1:
            result = mont_mul(ctx, result, base)
        base = mont_sqr(ctx, base)
        e >>= 1
    return result


def inv(ctx: FieldCtx, a: jnp.ndarray) -> jnp.ndarray:
    """Batched inversion via Fermat (a^(p-2)).  Implemented as a lax.scan
    over the 256 exponent bits (MSB first) so the traced graph stays small;
    prefer batch_inv for large arrays (3 muls/element amortized)."""
    e = ctx.field.p - 2
    bits = jnp.asarray([(e >> (255 - i)) & 1 for i in range(256)], jnp.uint32)

    def step(result, bit):
        result = mont_sqr(ctx, result)
        with_mul = mont_mul(ctx, result, a)
        return select(jnp.broadcast_to(bit.astype(bool), a.shape[:-1]), with_mul, result), None

    init = a * 0 + ctx.one_mont()
    out, _ = jax.lax.scan(step, init, bits)
    return out


def batch_inv(ctx: FieldCtx, a: jnp.ndarray) -> jnp.ndarray:
    """Montgomery batch inversion along the leading axis: one Fermat
    inversion + 3(N-1) multiplications.  Zero entries map to zero."""
    n = a.shape[0]
    zero_mask = is_zero(a)
    a_safe = select(zero_mask, jnp.broadcast_to(ctx.one_mont(), a.shape), a)

    def fwd(carry, x):
        nxt = mont_mul(ctx, carry, x)
        return nxt, carry  # prefix products exclusive

    total, prefixes = jax.lax.scan(fwd, a[0] * 0 + ctx.one_mont(), a_safe)
    total_inv = inv(ctx, total)

    def bwd(carry, xs):
        x, prefix = xs
        out = mont_mul(ctx, carry, prefix)
        nxt = mont_mul(ctx, carry, x)
        return nxt, out

    _, invs = jax.lax.scan(bwd, total_inv, (a_safe, prefixes), reverse=True)
    return select(zero_mask, jnp.zeros_like(a), invs)


def mont_to_canonical(ctx: FieldCtx, a: jnp.ndarray) -> jnp.ndarray:
    """Montgomery form -> canonical limbs, on device (a * 1 * R^-1)."""
    one = jnp.zeros(NLIMB, jnp.uint32).at[0].set(1)
    return mont_mul(ctx, a, jnp.broadcast_to(one, a.shape))


def canonical_to_mont(ctx: FieldCtx, a: jnp.ndarray) -> jnp.ndarray:
    """Canonical limbs -> Montgomery form, on device (a * R^2 * R^-1)."""
    return mont_mul(ctx, a, jnp.broadcast_to(ctx.r2_limbs, a.shape))


# host <-> device round trip helpers ------------------------------------

def to_device_mont(ctx: FieldCtx, xs) -> jnp.ndarray:
    return jnp.asarray(ctx.to_mont_np(xs))


def from_device_mont(ctx: FieldCtx, a) -> list[int]:
    return ctx.from_mont_np(np.asarray(jax.device_get(a)))
