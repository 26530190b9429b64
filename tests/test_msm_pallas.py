"""Pallas MSM tree-reduction kernel tests.

Interpret-mode evaluation costs minutes per grid step on the real ~33K-op
body, so coverage splits into:
  * the kernel BODY math (complete-add tree levels) eagerly at full
    semantics on small widths, vs the host group oracle;
  * the pallas_call PLUMBING (grid, BlockSpecs, lane-halving block maps)
    in interpret mode with the body monkeypatched to a cheap u32 fold.
The Mosaic compile path itself is validated on real TPU benches
(DELAY_ENC_PALLAS_TREE=1)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from delay_enc_tpu.curves.bn254 import G1, G1_GEN
from delay_enc_tpu.ops import msm as M
from delay_enc_tpu.ops import msm_pallas as MP


def test_tree_body_math_eager():
    rng = np.random.default_rng(12)
    w = 8
    pts = [G1.mul(G1_GEN, int(rng.integers(1, 1 << 48))) for _ in range(w)]
    pts[3] = None  # identity inside the tree
    dev = M.points_to_device(pts)
    x = jnp.asarray(dev).reshape(1, w, 48).transpose(0, 2, 1).astype(jnp.uint32)[0]
    with jax.disable_jit():
        reduced = MP._tree_body(x, levels=3)  # (48, 1)
    got = M.points_from_device(reduced.T.reshape(1, 3, 16))[0]
    acc = None
    for p in pts:
        acc = G1.add(acc, p)
    assert got == acc


def test_stage_plumbing_interpret(monkeypatch):
    """Grid/BlockSpec indexing with a cheap additive body: each stage must
    fold lanes exactly like the reference numpy fold, per plane block."""
    monkeypatch.setattr(MP, "STAGE_W", 8)
    monkeypatch.setattr(MP, "MIN_W", 2)
    monkeypatch.setattr(MP, "LEVELS_PER_STAGE", 2)

    def cheap_body(x, levels):
        for _ in range(levels):
            w = x.shape[-1]
            x = x[:, : w // 2] + x[:, w // 2 :]
        return x

    monkeypatch.setattr(MP, "_tree_body", cheap_body)

    rng = np.random.default_rng(13)
    c, w = 3, 32
    x = jnp.asarray(rng.integers(0, 1 << 20, (c, MP.ROWS, w), dtype=np.uint32))

    def ref_fold(a, levels):
        for _ in range(levels):
            half = a.shape[-1] // 2
            a = a[..., :half] + a[..., half:]
        return a

    ref = np.asarray(x)
    got = np.asarray(x)
    # two stages: 32 -> 8 -> 2; per stage the grid splits lanes into
    # STAGE_W blocks, so the reference folds within each block
    for _ in range(2):
        blocks = got.shape[-1] // MP.STAGE_W
        parts = [
            ref_fold(got[..., b * MP.STAGE_W : (b + 1) * MP.STAGE_W],
                     MP.LEVELS_PER_STAGE)
            for b in range(blocks)
        ]
        got_ref = np.concatenate(parts, axis=-1)
        got_dev = np.asarray(MP._stage(jnp.asarray(got), interpret=True))
        assert (got_dev == got_ref).all()
        got = got_ref
