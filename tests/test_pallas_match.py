"""Pallas fused matcher: parity with the XLA reference path (interpret
mode on CPU; the same kernel compiles with Mosaic on TPU)."""

import numpy as np
import jax.numpy as jnp

from mam3slam_tpu.ops import matching as M
from mam3slam_tpu.ops import pallas_match as PM

import pytest

pytestmark = pytest.mark.slow  # full-suite tier; smoke = -m "not slow"

RNG = np.random.default_rng(41)


def test_fused_match_parity():
    Q, F = 700, 768
    dq = RNG.integers(0, 256, (Q, 32), dtype=np.uint8)
    dt = RNG.integers(0, 256, (F, 32), dtype=np.uint8)
    q_uv = RNG.uniform(0, 640, (Q, 2)).astype(np.float32)
    t_uv = RNG.uniform(0, 640, (F, 2)).astype(np.float32)
    # plant guaranteed matches: first 200 targets near queries w/ same desc
    t_uv[:200] = q_uv[:200] + RNG.uniform(-3, 3, (200, 2))
    dt[:200] = dq[:200]
    radius = np.full(Q, 8.0, np.float32)
    q_lvl = RNG.integers(0, 4, Q).astype(np.int32)
    t_lvl = q_lvl[np.arange(F) % Q].astype(np.int32)
    q_valid = np.ones(Q, bool)
    q_valid[::17] = False
    t_valid = np.ones(F, bool)
    t_valid[::13] = False

    bq = M.unpack_desc(jnp.asarray(dq))
    bt = M.unpack_desc(jnp.asarray(dt))

    # XLA reference
    ham = M.hamming_matrix(bq, bt)
    mask = (M.radius_mask(jnp.asarray(q_uv), jnp.asarray(t_uv),
                          jnp.asarray(radius))
            & M.level_window_mask(jnp.asarray(q_lvl), jnp.asarray(t_lvl),
                                  1, 1)
            & jnp.asarray(q_valid)[:, None] & jnp.asarray(t_valid)[None, :])
    ref = M.best_in_mask(ham, mask)

    idx, d1, d2 = PM.fused_masked_match(
        bq, jnp.asarray(q_uv), jnp.asarray(radius), jnp.asarray(q_lvl),
        jnp.asarray(q_valid), bt, jnp.asarray(t_uv), jnp.asarray(t_lvl),
        jnp.asarray(t_valid), interpret=True)

    ref_ok = np.asarray(ref.ok)
    np.testing.assert_array_equal(np.asarray(d1)[ref_ok],
                                  np.asarray(ref.dist)[ref_ok])
    np.testing.assert_array_equal(np.asarray(idx)[ref_ok],
                                  np.asarray(ref.idx)[ref_ok])
    # second-best matches wherever it is meaningful (not BIG)
    d2_np = np.asarray(d2)
    sel = ref_ok & (np.asarray(ref.dist2) < 1000)
    np.testing.assert_array_equal(d2_np[sel].astype(np.int32),
                                  np.asarray(ref.dist2)[sel])
    # matched plants found
    planted_ok = ref_ok[:200]
    assert planted_ok.mean() > 0.85


def test_min_hamming2_parity():
    """Fused matmul+2-min kernel (interpret mode) vs numpy oracle."""
    rng = np.random.default_rng(11)
    Q, T = 128, 300
    dq = rng.integers(0, 256, (Q, 32), dtype=np.uint8)
    dt = rng.integers(0, 256, (T, 32), dtype=np.uint8)
    # plant exact duplicates so best=0 somewhere
    dt[:40] = dq[:40]
    t_valid = np.ones(T, bool)
    t_valid[5] = False

    bq = M.unpack_desc(jnp.asarray(dq))
    bt = M.unpack_desc(jnp.asarray(dt))
    idx, d1, d2 = PM.min_hamming2(bq, bt, jnp.asarray(t_valid),
                                  interpret=True, tile_m=128)

    ham = np.asarray(M.hamming_matrix(bq, bt)).copy()
    ham[:, ~t_valid] = 1 << 20
    ref_idx = ham.argmin(1)
    ref_d1 = ham.min(1)
    ham2 = ham.copy()
    ham2[np.arange(Q), ref_idx] = 1 << 20
    ref_d2 = ham2.min(1)

    np.testing.assert_array_equal(np.asarray(d1).astype(int), ref_d1)
    np.testing.assert_array_equal(np.asarray(idx), ref_idx)
    np.testing.assert_array_equal(np.asarray(d2).astype(int),
                                  np.minimum(ref_d2, 1 << 20))
    planted = np.ones(40, bool)
    planted[5] = False  # its duplicate target was invalidated
    assert (np.asarray(d1)[:40][planted] == 0).all()
