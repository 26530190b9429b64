"""pk/vk artifact serialization (checkpoint/resume parity).

The reference caches SRS params, vk and pk to ./benches/data keyed by
circuit+K (benches/delay_enc.rs:39-115); this module provides the same
amortization for the TPU framework: keys round-trip through .npz files so
repeated bench/server runs skip keygen.
"""

from __future__ import annotations

import os

import numpy as np

from ..curves.bn254 import g1_from_bytes, g1_to_bytes
from .domain import Domain
from .keygen import ALL_FIXED, ProvingKey, VerifyingKey


def _atomic_savez(path: str, compressed: bool = True, **arrays) -> None:
    """Write-then-rename: concurrent producers (prover daemon + a parallel
    keygen process) may race on the same artifact path; a torn npz would
    crash whichever loads it.  os.replace is atomic on one filesystem and
    both writers produce identical bytes (keygen is deterministic per
    SRS + circuit), so last-writer-wins is safe."""
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        (np.savez_compressed if compressed else np.savez)(f, **arrays)
    os.replace(tmp, path)


def save_vk(vk: VerifyingKey, path: str) -> None:
    _atomic_savez(
        path,
        k=vk.domain.k,
        fixed=np.stack(
            [np.frombuffer(g1_to_bytes(vk.fixed_commitments[n]), dtype=np.uint8) for n in ALL_FIXED]
        ),
        sigma=np.stack(
            [np.frombuffer(g1_to_bytes(p), dtype=np.uint8) for p in vk.sigma_commitments]
        ),
    )


def load_vk(path: str) -> VerifyingKey:
    from .keygen import transcript_repr

    z = np.load(path)
    k = int(z["k"])
    fixed = {
        name: g1_from_bytes(z["fixed"][i].tobytes())
        for i, name in enumerate(ALL_FIXED)
    }
    sigma = [g1_from_bytes(row.tobytes()) for row in z["sigma"]]
    # recompute (never trust a stored digest): a tampered vk file must not
    # be able to bind an inconsistent digest into the Fiat-Shamir transcript
    domain = Domain(k)
    return VerifyingKey(domain, fixed, sigma, transcript_repr(domain, fixed, sigma))


def save_pk(pk: ProvingKey, path: str) -> None:
    import jax

    g = lambda a: np.asarray(jax.device_get(a))
    arrays = {
        "k": np.int64(pk.vk.domain.k),
        "split": np.bool_(pk.split),
        "zeta_inv_powers": g(pk.zeta_inv_powers),
        "delta_powers": np.array([str(d) for d in pk.delta_powers]),
    }
    if pk.split:
        arrays["l0_coeff"] = g(pk.l0_coeff)
        arrays["l_last_coeff"] = g(pk.l_last_coeff)
        arrays["l_blind_coeff"] = g(pk.l_blind_coeff)
    else:
        arrays["l0_ext"] = g(pk.l0_ext)
        arrays["l_last_ext"] = g(pk.l_last_ext)
        arrays["l_blind_ext"] = g(pk.l_blind_ext)
        arrays["x_ext"] = g(pk.x_ext)
        arrays["zeta_powers"] = g(pk.zeta_powers)
        arrays["zh_inv_ext"] = g(pk.zh_inv_ext)
    for name in ALL_FIXED:
        arrays[f"fr_{name}"] = g(pk.fixed_raw[name])
        arrays[f"fc_{name}"] = g(pk.fixed_coeff[name])
        if not pk.split:
            arrays[f"fe_{name}"] = g(pk.fixed_ext[name])
    for c in range(len(pk.sigma_coeff)):
        arrays[f"sc_{c}"] = g(pk.sigma_coeff[c])
        if not pk.split:
            arrays[f"se_{c}"] = g(pk.sigma_ext[c])
    _atomic_savez(path + ".pk.npz", **arrays)
    save_vk(pk.vk, path + ".vk.npz")


def load_pk(path: str) -> ProvingKey:
    import jax.numpy as jnp

    z = np.load(path + ".pk.npz")
    vk = load_vk(path + ".vk.npz")
    a = lambda name: jnp.asarray(z[name])
    nsig = len(vk.sigma_commitments)
    split = bool(z["split"]) if "split" in z.files else False
    return ProvingKey(
        vk=vk,
        fixed_raw={n: a(f"fr_{n}") for n in ALL_FIXED},
        fixed_coeff={n: a(f"fc_{n}") for n in ALL_FIXED},
        fixed_ext=None if split else {n: a(f"fe_{n}") for n in ALL_FIXED},
        sigma_coeff=[a(f"sc_{c}") for c in range(nsig)],
        sigma_ext=None if split else [a(f"se_{c}") for c in range(nsig)],
        l0_ext=None if split else a("l0_ext"),
        l_last_ext=None if split else a("l_last_ext"),
        l_blind_ext=None if split else a("l_blind_ext"),
        x_ext=None if split else a("x_ext"),
        zeta_powers=None if split else a("zeta_powers"),
        zeta_inv_powers=a("zeta_inv_powers"),
        zh_inv_ext=None if split else a("zh_inv_ext"),
        delta_powers=[int(d) for d in z["delta_powers"]],
        split=split,
        l0_coeff=a("l0_coeff") if split else None,
        l_last_coeff=a("l_last_coeff") if split else None,
        l_blind_coeff=a("l_blind_coeff") if split else None,
    )
