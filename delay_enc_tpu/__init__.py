"""delay_enc_tpu — a TPU-native zero-knowledge proving framework.

A from-scratch JAX/XLA/Pallas re-architecture with the capabilities of the
reference Rust crate `halo2_delay_enc` (delay-encryption / PVDE circuits in a
halo2-style PLONK proof system with KZG commitments on BN254):

 - ``fields``     host-side BN254 Fr/Fq (+ Fq2/Fq6/Fq12 tower) and pasta params
 - ``curves``     host-side G1/G2 and the optimal-ate pairing (verifier side)
 - ``ops``        device kernels: limb field arithmetic, NTT, MSM, Poseidon
 - ``poseidon``   native Poseidon spec (Grain LFSR, optimized constants,
                  sparse MDS) — bit-exact vs. the hadeshash test vectors
 - ``encryption`` native Poseidon sponge cipher (delay-encryption payload)
 - ``cs``         columnar constraint system: 5-wire main gate, range lookups,
                  copy constraints, and a device-friendly "mock prover"
 - ``plonk``      the proving pipeline: keygen, prover, verifier, KZG/GWC,
                  Fiat-Shamir transcript
 - ``gadgets``    circuit gadgets: big-integer, RSA, Poseidon chips
 - ``models``     top-level circuits: pose_enc, mod_pow (RSA), delay_enc
 - ``parallel``   multi-chip sharding: distributed MSM/NTT, batch proving

Reference behavior citations use ``/root/reference`` paths (file:line).
"""

__version__ = "0.1.0"

from .utils.jaxcfg import configure_jax as _configure_jax

_configure_jax()
