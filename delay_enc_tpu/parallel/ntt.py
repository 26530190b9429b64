"""Distributed NTT over a device mesh (the "sequence parallel" analog,
SURVEY §2.3): decimation-in-frequency cross-device stages + local NTT +
one all_to_all index reshuffle.

Structure for D = 2^m devices, N = 2^k, L = N/D per shard:
  * m DIF stages: shard-sized ppermute exchanges between partner devices
    d <-> d XOR (G/2); the "bottom" partner applies per-element twiddles
    (precomputed (D, L) tables, sharded so each device holds its own row);
  * a fully local length-L NTT (root omega^D);
  * output element (block b, local l) is global eval index l*D + rev(b):
    one all_to_all (split into D chunks) + a bit-reverse source permute +
    transpose puts results into natural block-sharded order.

The inverse runs the same machinery with inverse twiddles and a 1/N scale,
plus the inverse reshuffle first.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..fields.bn254 import FR
from ..ops import limbs as L
from ..ops.ntt import NTTPlan, intt as local_intt, ntt as local_ntt


def _bit_rev(x: int, bits: int) -> int:
    r = 0
    for i in range(bits):
        r |= ((x >> i) & 1) << (bits - 1 - i)
    return r


@dataclass
class ShardedNTTPlan:
    k: int
    ndev: int
    local_plan: NTTPlan
    stage_tw: list  # per stage: (D, L, 16) mont twiddles (bottom rows)
    stage_tw_inv: list
    rev_idx: jnp.ndarray  # (D,) int32 bit-reversal of device indices
    n_inv: jnp.ndarray  # (16,) mont 1/N

    @staticmethod
    def make(k: int, ndev: int) -> "ShardedNTTPlan":
        ctx = L.FR_CTX
        n = 1 << k
        m = ndev.bit_length() - 1
        assert 1 << m == ndev, "device count must be a power of two"
        assert ndev * ndev <= n, "need D^2 <= N for the chunked reshuffle"
        l_len = n // ndev
        omega = FR.root_of_unity(k)
        omega_inv = FR.inv(omega)
        stage_tw, stage_tw_inv = [], []
        for s in range(m):
            g = ndev >> s  # group size in blocks
            tw = np.zeros((ndev, l_len), dtype=object)
            twi = np.zeros((ndev, l_len), dtype=object)
            for d in range(ndev):
                pos = d % g
                if pos >= g // 2:  # bottom partner
                    i0 = (pos - g // 2) * l_len
                    for ll in range(l_len):
                        e = ((i0 + ll) * (1 << s)) % n
                        tw[d, ll] = pow(omega, e, FR.p)
                        twi[d, ll] = pow(omega_inv, e, FR.p)
                else:
                    tw[d, :] = 1
                    twi[d, :] = 1
            stage_tw.append(
                jnp.asarray(ctx.to_mont_np(tw.reshape(-1).tolist())).reshape(
                    ndev, l_len, L.NLIMB
                )
            )
            stage_tw_inv.append(
                jnp.asarray(ctx.to_mont_np(twi.reshape(-1).tolist())).reshape(
                    ndev, l_len, L.NLIMB
                )
            )
        rev = jnp.asarray([_bit_rev(d, m) for d in range(ndev)], dtype=jnp.int32)
        return ShardedNTTPlan(
            k=k,
            ndev=ndev,
            local_plan=NTTPlan.make(ctx, k - m),
            stage_tw=stage_tw,
            stage_tw_inv=stage_tw_inv,
            rev_idx=rev,
            n_inv=jnp.asarray(ctx.to_mont_np([FR.inv(n)])[0]),
        )


def _dif_stages(plan, x, tws, axis):
    """x: local shard (L,16). Applies the cross-device DIF stages."""
    ctx = L.FR_CTX
    ndev = plan.ndev
    m = ndev.bit_length() - 1
    d = jax.lax.axis_index(axis)
    for s in range(m):
        g = ndev >> s
        half = g // 2
        perm = [(i, i ^ half) for i in range(ndev)]
        recv = jax.lax.ppermute(x, axis, perm)
        is_bot = (d % g) >= half
        top = L.add(ctx, x, recv)
        bot = L.mont_mul(ctx, L.sub(ctx, recv, x), tws[s][0])  # local (1,L,16) shard
        x = jnp.where(jnp.broadcast_to(is_bot, x.shape), bot, top)
    return x


def _forward_local(plan, x, tws, axis):
    ctx = L.FR_CTX
    ndev = plan.ndev
    l_len = x.shape[0]
    x = _dif_stages(plan, x, tws, axis)
    x = local_ntt(plan.local_plan, x)
    # reshuffle: (b, l) -> global j = l*D + rev(b); chunk and all_to_all
    chunk = l_len // ndev
    x = x.reshape(ndev, chunk, L.NLIMB)
    recv = jax.lax.all_to_all(x, axis, split_axis=0, concat_axis=0, tiled=False)
    recv = jnp.take(recv, plan.rev_idx, axis=0)  # source order by rev(b)
    out = jnp.transpose(recv, (1, 0, 2)).reshape(l_len, L.NLIMB)
    return out


def sharded_ntt(mesh: Mesh, plan: ShardedNTTPlan, a: jnp.ndarray, axis: str = "shard"):
    """a: (N,16) Montgomery coefficients (block-sharded or replicated input);
    returns (N,16) evals in natural order, block-sharded."""
    tw_specs = tuple(P(axis) for _ in plan.stage_tw)
    f = shard_map(
        lambda x, *tws: _forward_local(plan, x, tws, axis),
        mesh=mesh,
        in_specs=(P(axis),) + tw_specs,
        out_specs=P(axis),
    )
    return f(a, *plan.stage_tw)


def sharded_intt(mesh: Mesh, plan: ShardedNTTPlan, a: jnp.ndarray, axis: str = "shard"):
    """Inverse: undo the reshuffle, inverse local NTT, inverse DIF stages
    (run in reverse with inverse twiddles), then scale by 1/N."""
    ctx = L.FR_CTX
    ndev = plan.ndev
    m = ndev.bit_length() - 1

    def local(x, *tws):
        l_len = x.shape[0]
        chunk = l_len // ndev
        # inverse reshuffle: out[t*D + r] came from (b=rev(r), q=me)[t]
        y = x.reshape(chunk, ndev, L.NLIMB)  # (t, r, limb)
        y = jnp.transpose(y, (1, 0, 2))  # (r, t, limb)
        y = jnp.take(y, plan.rev_idx, axis=0)  # back to source order b
        y = jax.lax.all_to_all(y, axis, split_axis=0, concat_axis=0, tiled=False)
        y = y.reshape(l_len, L.NLIMB)
        # inverse local NTT (unscaled): forward with inverse twiddles
        y = local_ntt_inv_unscaled(plan.local_plan, y)
        # inverse DIF stages, in reverse order (they become DIT butterflies)
        d = jax.lax.axis_index(axis)
        for s in range(m - 1, -1, -1):
            g = ndev >> s
            half = g // 2
            is_bot = (d % g) >= half
            # bottom first un-twiddles, then butterfly x_top' = (t + b)/...:
            # forward: top = t + b_in ; bot = (b_in - t) * w
            # inverse: t = (top - bot/w) / 2 ... instead use DIT butterfly:
            # t_in = (top + bot*w^-1)/2? Avoid halving: standard inverse DIF
            # stage == DIT stage with inverse twiddle and no scaling, with
            # the global 1/N factor applied once at the end.
            bw = L.mont_mul(ctx, y, tws[s][0])  # bottom pre-twiddled (top rows *1)
            val = jnp.where(jnp.broadcast_to(is_bot, y.shape), bw, y)
            perm = [(i, i ^ half) for i in range(ndev)]
            recv = jax.lax.ppermute(val, axis, perm)
            top_out = L.add(ctx, val, recv)
            bot_out = L.sub(ctx, recv, val)
            y = jnp.where(jnp.broadcast_to(is_bot, y.shape), bot_out, top_out)
        return L.mont_mul(ctx, y, plan.n_inv[None, :])

    tw_specs = tuple(P(axis) for _ in plan.stage_tw_inv)
    f = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(axis),) + tw_specs,
        out_specs=P(axis),
    )
    return f(a, *plan.stage_tw_inv)


def local_ntt_inv_unscaled(plan: NTTPlan, a: jnp.ndarray) -> jnp.ndarray:
    from ..ops.ntt import stockham

    return stockham(plan.ctx, a, plan.tw_inv)
