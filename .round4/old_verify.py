"""Discriminator: verify a proof with the pre-round-4 (05df51c) verifier.

Usage: JAX_PLATFORMS=cpu python .round4/old_verify.py <proof.bin>
Run from the repo root.  Prints old-verifier and new-verifier verdicts.
"""

import sys

proof = open(sys.argv[1], "rb").read()
VK = "bench_data/keys_delay_enc_aac7760823fb03883b2a976388a5f0b3.vk.npz"
SRSP = "bench_data/srs_bn254_k16.npz"

# new (HEAD) verifier first
from delay_enc_tpu.plonk import SRS
from delay_enc_tpu.plonk.serialize import load_vk
from delay_enc_tpu.plonk.verifier import verify_proof

vk = load_vk(VK)
srs = SRS.load_host_meta(SRSP)
print("new verifier:", verify_proof(srs, vk, proof))

# old verifier from the extracted 05df51c tree
sys.path.insert(0, ".round4/old_tree")
for m in [m for m in list(sys.modules) if m.startswith("delay_enc_tpu")]:
    del sys.modules[m]
from delay_enc_tpu.plonk import SRS as OldSRS  # noqa: E402
from delay_enc_tpu.plonk.serialize import load_vk as old_load_vk  # noqa: E402
from delay_enc_tpu.plonk.verifier import verify_proof as old_verify  # noqa: E402

ovk = old_load_vk(VK)
osrs = OldSRS.load_host_meta(SRSP)
print("old verifier:", old_verify(osrs, ovk, proof))
