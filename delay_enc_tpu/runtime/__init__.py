"""Runtime services around the proving pipeline.

The compute path (delay_enc_tpu.plonk, .ops) is stateless jitted JAX; this
package holds the long-lived serving layer: the warm prover daemon
(`daemon.py`) that keeps compiled executables, MSM tables and proving keys
resident on the device between requests — the production deployment shape
(one cold start, then steady-state latency per proof), and the same regime
the reference's criterion bench measures (benches/delay_enc.rs:121-133
times a warmed in-process prover, never a fresh-process cold start).
"""

from .client import daemon_request, default_socket_path  # noqa: F401
