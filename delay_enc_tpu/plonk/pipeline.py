"""Pipeline-parallel proving (PP analog, SURVEY.md §2.3).

A single proof is Fiat-Shamir-serial: each phase's challenges depend on the
previous phase's commitments, so its host work (transcript absorption, the
numpy lookup permutation, the C plane folds) cannot overlap its own device
work.  Across INSTANCES there is no such dependency — while instance i
blocks on a device->host commitment fetch, instance i+1's next device phase
can be dispatching.

`create_proofs_pipelined` runs `depth` instances concurrently on worker
threads sharing one set of compiled kernels: XLA serializes the device
work on its stream (the chip stays busy back-to-back), and each thread's
host phases execute while the other threads' device phases run.  This
complements plonk/batch_prover.py (which fuses instances into one wide
launch — best throughput, but a lock-step memory footprint of B instances);
the pipelined form keeps per-instance memory at 1x and still hides host
time, which is the right trade at large k where B fused instances would
not fit HBM.
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor

import numpy as np

from .prover import create_proof


def create_proofs_pipelined(srs, pk, builders, seeds=None, depth: int = 2,
                            on_proof=None) -> list[bytes]:
    """Prove each builder with `depth`-way instance overlap.  Returns the
    proofs in builder order.  seeds: per-instance rng seeds (defaults to
    0..B-1); each instance gets its own np.random.default_rng so results
    are independent of scheduling order.  on_proof(i, proof) fires as each
    completes (in order) — progress reporting for long batches."""
    if seeds is None:
        seeds = list(range(len(builders)))
    assert len(seeds) == len(builders)

    def one(b, seed):
        return create_proof(srs, pk, b, np.random.default_rng(seed))

    proofs = []
    with ThreadPoolExecutor(max_workers=max(1, depth)) as pool:
        futs = [pool.submit(one, b, s) for b, s in zip(builders, seeds)]
        for i, f in enumerate(futs):
            proofs.append(f.result())
            if on_proof is not None:
                on_proof(i, proofs[-1])
    return proofs
