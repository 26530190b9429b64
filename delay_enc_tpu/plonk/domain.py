"""Evaluation domain: the 2^k row domain H, the extended coset domain for
quotient construction, and Lagrange helpers.

Replaces `halo2_proofs`' EvaluationDomain (driven inside create_proof,
reference benches/delay_enc.rs:123).  The max constraint degree in this
framework is 7 (the 5-column permutation product, see prover.py), so the
extended domain is 8n and the quotient splits into 7 pieces of size n.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import cached_property

from ..fields.bn254 import FR
from ..ops import limbs as L
from ..ops.ntt import NTTPlan

# degree bound: gate 3, lookup 6, permutation 2 + NUM_ADVICE = 7
MAX_DEGREE = 8  # extended domain multiplier (next pow2 >= max constraint deg)
EXT_LOG = 3  # log2(MAX_DEGREE)
QUOTIENT_PIECES = 7
BLINDING_ROWS = 6
# From this k on, the quotient is built on MAX_DEGREE separate size-n
# cosets instead of one fused 8n domain (halo2's strategy): peak HBM for
# the quotient phase drops ~8x, the enabler for k=18/19 on a 16 GB chip.
SPLIT_QUOTIENT_K = 18


@dataclass
class Domain:
    k: int

    @property
    def n(self) -> int:
        return 1 << self.k

    @property
    def k_ext(self) -> int:
        return self.k + EXT_LOG

    @property
    def n_ext(self) -> int:
        return 1 << self.k_ext

    @property
    def usable_rows(self) -> int:
        """Rows available to the circuit: [0, usable); row `usable` is the
        l_last row, the final BLINDING_ROWS rows hold blinding values."""
        return self.n - BLINDING_ROWS - 1

    @cached_property
    def omega(self) -> int:
        return FR.root_of_unity(self.k)

    @cached_property
    def omega_inv(self) -> int:
        return FR.inv(self.omega)

    @cached_property
    def omega_ext(self) -> int:
        return FR.root_of_unity(self.k_ext)

    @cached_property
    def zeta(self) -> int:
        """Coset generator for the extended domain (any non-root works; use
        the field generator)."""
        return FR.generator

    def coset_shift(self, j: int) -> int:
        """Shift of the j-th size-n coset in split-quotient mode: the union
        of zeta*g^j*H over j (g = omega_ext) is the extended coset zeta*H_ext
        with coset j's element i at extended index MAX_DEGREE*i + j."""
        return self.zeta * pow(self.omega_ext, j, FR.p) % FR.p

    @cached_property
    def plan(self) -> NTTPlan:
        return NTTPlan.make(L.FR_CTX, self.k)

    @cached_property
    def plan_ext(self) -> NTTPlan:
        return NTTPlan.make(L.FR_CTX, self.k_ext)

    # ---- MXU (matmul) NTT plans: built lazily, used when the prover runs
    # with DELAY_ENC_NTT=mxu (ops/ntt_mxu.py).  Scale folds make the coset
    # scaling and 1/n multiplies free.
    @cached_property
    def mxu_fwd(self):
        from ..ops import ntt_mxu as NX

        return NX.make_plan(L.FR_CTX, self.k, self.omega)

    @cached_property
    def mxu_inv(self):
        from ..ops import ntt_mxu as NX

        return NX.make_plan(L.FR_CTX, self.k, self.omega_inv,
                            out_mul=FR.inv(self.n))

    @cached_property
    def mxu_ext(self):
        """coeffs (zero-padded to 8n) -> evals on the extended coset
        zeta*H_ext: the zeta^j input scale folds into W1/T."""
        from ..ops import ntt_mxu as NX

        return NX.make_plan(L.FR_CTX, self.k_ext, self.omega_ext,
                            in_scale=self.zeta)

    @cached_property
    def mxu_ext_inv(self):
        """evals on zeta*H_ext -> coeffs: 1/8n and the zeta^-i unscale
        both fold into W2/T."""
        from ..ops import ntt_mxu as NX

        return NX.make_plan(L.FR_CTX, self.k_ext, FR.inv(self.omega_ext),
                            out_mul=FR.inv(self.n_ext),
                            out_scale=FR.inv(self.zeta))

    # ---- host-side Lagrange helpers (verifier) -----------------------
    def lagrange_at(self, i: int, x: int) -> int:
        """l_i(x) = omega^i (x^n - 1) / (n (x - omega^i))."""
        p = FR.p
        wi = pow(self.omega, i, p)
        num = wi * (pow(x, self.n, p) - 1) % p
        den = self.n * (x - wi) % p
        return num * pow(den, -1, p) % p

    def l_blind_at(self, x: int) -> int:
        """sum of l_i(x) over the blinding rows (usable+1 .. n-1)."""
        vals = self.lagranges_at(range(self.usable_rows + 1, self.n), x)
        return sum(vals.values()) % FR.p

    def lagranges_at(self, idxs, x: int) -> dict:
        """{i: l_i(x)} for several indices with ONE field inversion
        (Montgomery batch-inversion; the verifier needs ~10 Lagrange values
        per proof and a 254-bit `pow(d, -1, p)` each was its hottest
        Python line)."""
        idxs = list(idxs)
        p = FR.p
        xn1 = (pow(x, self.n, p) - 1) % p
        ws = [pow(self.omega, i, p) for i in idxs]
        dens = [self.n * (x - w) % p for w in ws]
        pre, acc = [], 1
        for d in dens:
            pre.append(acc)
            acc = acc * d % p
        inv = pow(acc, -1, p)
        out = {}
        for j in range(len(dens) - 1, -1, -1):
            di = inv * pre[j] % p
            inv = inv * dens[j] % p
            out[idxs[j]] = ws[j] * xn1 % p * di % p
        return out

    def vanishing_at(self, x: int) -> int:
        return (pow(x, self.n, FR.p) - 1) % FR.p
