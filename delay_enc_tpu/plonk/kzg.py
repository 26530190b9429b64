"""KZG structured reference string and commitments.

Replaces `ParamsKZG::<Bn256>::setup` + the commitment MSMs inside
create_proof (reference benches/delay_enc.rs:39-54,123).  The SRS G1 powers
are built ON DEVICE with the fixed-base batched scalar-mul kernel and cached
to disk keyed by k — mirroring the reference's `./benches/data` artifact
cache (delay_enc.rs:39-54).

The trusted-setup secret tau is generated from OS randomness and discarded
(same security model as the reference's OsRng setup: test/bench-grade, not a
ceremony).
"""

from __future__ import annotations

import os
import secrets

import jax
import numpy as np

from ..curves.bn254 import G1, G2, G1_GEN, G2_GEN
from ..fields.bn254 import FR
from ..ops import limbs as L
from ..ops import msm as M


class SRS:
    def __init__(self, k: int, g1_powers_dev, tau_g2, g2):
        self.k = k
        self.n = 1 << k
        self.g1_powers = g1_powers_dev  # (n,3,16) projective Montgomery
        self.tau_g2 = tau_g2  # [tau] G2 (host)
        self.g2 = g2  # G2 generator
        # MSM pair tables keyed by truncation k, shared across truncated
        # views (they depend only on the points — ops/msm.py design notes)
        self._pair_tables: dict = {}
        self._cache_dir: str | None = None
        self._prepared: dict = {}  # verifier G2Prepared lines (lazy)

    def prepared_pair(self):
        """(G2Prepared(tau_g2), G2Prepared(g2)) with precomputed Miller-loop
        line coefficients — both points are fixed per SRS, so the verifier
        skips all G2 arithmetic (one-time ~10 ms, then ~2x faster loops)."""
        if "pair" not in self._prepared:
            from ..curves.pairing import G2Prepared

            self._prepared["pair"] = (G2Prepared(self.tau_g2), G2Prepared(self.g2))
        return self._prepared["pair"]

    def _digest(self) -> str:
        """Short content digest of the SRS points: binds derived artifacts
        (MSM tables) to THIS SRS, so a regenerated SRS can never silently
        pair with stale tables (wrong commitments, no diagnostic)."""
        import hashlib

        h = hashlib.blake2b(digest_size=8)
        sample = np.asarray(jax.device_get(self.g1_powers[:2]))
        h.update(sample.tobytes())
        h.update(str(self.tau_g2[0].c0).encode())
        return h.hexdigest()

    def _cached_tables(self, tag: str, build):
        """Build-or-load a per-SRS derived table, disk-cached keyed by the
        SRS content digest (a regenerated SRS can never silently pair with
        stale tables)."""
        key = (tag, self.k)
        if key not in self._pair_tables:
            import numpy as _np

            path = None
            if self._cache_dir:
                path = os.path.join(
                    self._cache_dir, f"msmtab{tag}_bn254_k{self.k}_{self._digest()}.npy"
                )
            if path and os.path.exists(path):
                import jax.numpy as jnp

                self._pair_tables[key] = jnp.asarray(_np.load(path))
            else:
                tab = build()
                self._pair_tables[key] = tab
                if path:
                    try:
                        tmp = path + ".tmp"
                        with open(tmp, "wb") as f:
                            _np.save(f, _np.asarray(jax.device_get(tab)))
                        os.replace(tmp, path)
                    except Exception:
                        pass
        return self._pair_tables[key]

    def pair_tables(self):
        """Per-SRS MSM base-4 pair tables (16, n/2, 3, 16) u16 — built once,
        reused by every commit (ops/msm.py design notes)."""
        return self._cached_tables("", lambda: M._jit_pair_tables(self.g1_powers))

    def pair_tables16(self):
        """Per-SRS base-16 pair tables in the int8 MXU-selection layout
        (n/2, 96, 256) — ops/msm16.py.  16x the base-4 table bytes
        (805 MB at k=16), half the addition tree.

        On TPU the table is built ON DEVICE and never disk-cached: through
        the PJRT relay a host->device upload of the cached .npy costs
        30-130 min at tunnel bandwidth, while the on-device rebuild is ~45
        cached batched-add launches over the already-resident SRS points
        (the .npy cache remains for CPU runs, where rebuild means slow
        scan-form compiles)."""
        import jax as _jax

        from ..ops import msm16 as M16

        def build():
            tab = M16._jit_pair_tables16(self.g1_powers)
            return M16._jit_tables_to_i8(tab)

        if _jax.default_backend() == "tpu":
            key = ("16dev", self.k)
            if key not in self._pair_tables:
                self._pair_tables[key] = build()
            return self._pair_tables[key]
        return self._cached_tables("16", build)

    def msm_tables(self):
        """(kind, tables) for the prover's commitment MSMs, selected by
        DELAY_ENC_MSM (b4 | b16; default b4 until b16 is TPU-validated)."""
        kind = os.environ.get("DELAY_ENC_MSM", "b4")
        if kind == "b16":
            return "b16", self.pair_tables16()
        return "b4", self.pair_tables()

    @staticmethod
    def setup(k: int, cache_dir: str | None = None, tau: int | None = None) -> "SRS":
        cache = None
        if cache_dir:
            os.makedirs(cache_dir, exist_ok=True)
            cache = os.path.join(cache_dir, f"srs_bn254_k{k}.npz")
            if os.path.exists(cache):
                srs = SRS.load(cache)
                srs._cache_dir = cache_dir
                return srs
        if tau is None:
            tau = (secrets.randbits(300) % (FR.p - 1)) + 1
        n = 1 << k
        # tau powers host-side (cheap), points on device (fixed-base kernel)
        powers = []
        cur = 1
        for _ in range(n):
            powers.append(cur)
            cur = cur * tau % FR.p
        table = M.base_table(G1_GEN)
        scalar_limbs = M.scalars_to_limbs(powers)
        g1_powers = jax.jit(M.fixed_base_batch_mul)(table, scalar_limbs)
        g1_powers.block_until_ready()
        tau_g2 = G2.mul(G2_GEN, tau)
        srs = SRS(k, g1_powers, tau_g2, G2_GEN)
        srs._cache_dir = cache_dir
        del tau, powers
        if cache:
            srs.save(cache)
        return srs

    # ---- persistence (artifact cache parity: benches/data) -----------
    def save(self, path: str) -> None:
        arr = np.asarray(jax.device_get(self.g1_powers))
        tg = self.tau_g2
        from .serialize import _atomic_savez

        # zstd-compressing multi-GB point arrays takes minutes and the
        # entropy is near-max anyway; store big SRS files uncompressed
        _atomic_savez(
            path,
            compressed=self.k < 21,
            k=self.k,
            g1=arr,
            tau_g2=np.array(
                [tg[0].c0, tg[0].c1, tg[1].c0, tg[1].c1], dtype=object
            ).astype(str),
        )

    @staticmethod
    def load_host_meta(path: str) -> "SRS":
        """Verifier-only SRS view: reads just k and tau_g2 from the cache
        file, never touching the (multi-GB) g1 powers or any device — the
        host verifier needs only `prepared_pair()` (verifier.py:230).
        Lets `bench.py --workload verify` bank a metric with the PJRT
        relay down."""
        from ..fields.bn254 import Fq2

        z = np.load(path, allow_pickle=True)
        t = [int(s) for s in z["tau_g2"]]
        return SRS(int(z["k"]), None, (Fq2(t[0], t[1]), Fq2(t[2], t[3])), G2_GEN)

    @staticmethod
    def load(path: str) -> "SRS":
        import jax.numpy as jnp
        from ..fields.bn254 import Fq2

        z = np.load(path, allow_pickle=True)
        k = int(z["k"])
        g1 = jnp.asarray(z["g1"])
        t = [int(s) for s in z["tau_g2"]]
        tau_g2 = (Fq2(t[0], t[1]), Fq2(t[2], t[3]))
        return SRS(k, g1, tau_g2, G2_GEN)

    def truncated(self, k: int) -> "SRS":
        """A lower-degree view of the same SRS (shared tau and table cache)."""
        assert k <= self.k
        s = SRS(k, self.g1_powers[: 1 << k], self.tau_g2, self.g2)
        s._pair_tables = self._pair_tables  # share across views
        s._cache_dir = self._cache_dir
        s._prepared = self._prepared
        return s


def commit(srs: SRS, coeff_limbs) -> jax.Array:
    """KZG commitment to a coefficient-form poly: MSM over the SRS powers.
    coeff_limbs: (m,16) canonical limb scalars (m <= n).  Returns (3,16)."""
    m = coeff_limbs.shape[0]
    return M.msm(srs.g1_powers[:m], coeff_limbs)
