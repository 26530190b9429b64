"""Blake2b Fiat-Shamir transcript.

Plays the role of `Blake2bWrite/Blake2bRead<Challenge255>` in the reference
pipeline (benches/delay_enc.rs:19-22,120,150).  Framework-defined format
(documented here; prover and verifier share this implementation, so proofs
verify end-to-end):

 * state: rolling blake2b-512 over domain-separated absorptions,
 * points absorbed as the 32-byte G1 encoding (curves.bn254.g1_to_bytes),
 * scalars absorbed as 32-byte canonical little-endian repr,
 * challenges: state digest reduced into Fr via from_uniform_bytes (64B),
   then re-absorbed to separate successive challenges.
"""

from __future__ import annotations

import hashlib

from ..curves.bn254 import g1_to_bytes
from ..fields.bn254 import FR

_PERSONAL = b"delay-enc-tpu-v1"


class Transcript:
    def __init__(self):
        self.state = hashlib.blake2b(person=_PERSONAL)
        self.data = bytearray()

    # --- absorb -------------------------------------------------------
    def common_bytes(self, b: bytes) -> None:
        self.state.update(b"\x00" + len(b).to_bytes(8, "little") + b)

    def common_point(self, pt) -> None:
        self.common_bytes(b"P" + g1_to_bytes(pt))

    def common_scalar(self, v: int) -> None:
        self.common_bytes(b"S" + FR.to_repr(v))

    # prover-side: absorb and append to the proof stream
    def write_point(self, pt) -> None:
        self.common_point(pt)
        self.data.extend(g1_to_bytes(pt))

    def write_scalar(self, v: int) -> None:
        self.common_scalar(v)
        self.data.extend(FR.to_repr(v))

    # --- squeeze ------------------------------------------------------
    def challenge(self, label: bytes = b"") -> int:
        self.state.update(b"\x01" + label)
        digest = self.state.digest()  # 64 bytes
        c = FR.from_uniform_bytes(digest)
        self.state.update(b"\x02" + digest)
        return c
