"""Fused describe kernel (patch DMA + IC angle + rBRIEF): parity with the
XLA path of ops/orb.py (interpret mode on CPU; Mosaic-compiled on TPU)."""

import numpy as np
import jax.numpy as jnp

import mam3slam_tpu.ops.orb as O
from mam3slam_tpu.ops import pallas_orb_desc as POD

import pytest

pytestmark = pytest.mark.slow  # full-suite tier; smoke = -m "not slow"

RNG = np.random.default_rng(11)


def test_fused_describe_parity():
    # W multiple of 128 and H multiple of 8: window_origins' clip bounds
    # (Hp-48, Wp-256) stay tile-aligned, matching the extract_orb path
    # which pads the stacks to aligned extents
    H, W = 240, 384
    cfg = O.OrbConfig(height=H, width=W, n_features=300, n_levels=4)
    img = jnp.asarray(RNG.uniform(0, 255, (H, W)).astype(np.float32))

    pyr = O.compute_pyramid(img, cfg)
    L = cfg.n_levels
    Hp, Wp = cfg.level_sizes[0]
    elig_np, lvl_np, scales_np, hws_np = O._stack_constants(cfg)
    stack = jnp.stack(
        [jnp.pad(pyr[lv], ((0, Hp - cfg.level_sizes[lv][0]),
                           (0, Wp - cfg.level_sizes[lv][1])))
         for lv in range(L)])
    score = O.fast_score_map(stack)
    xy_i, resp, valid = O._select_keypoints_stacked(score, cfg)
    lvl = jnp.asarray(lvl_np)
    blur_stack = jnp.stack(
        [jnp.pad(jnp.round(O.gaussian_blur(pyr[lv])),
                 ((0, Hp - cfg.level_sizes[lv][0]),
                  (0, Wp - cfg.level_sizes[lv][1])))
         for lv in range(L)])

    # XLA reference
    raw_p, blur_p, cy, cx, sy, sx = O._extract_patches_pair(
        stack, blur_stack, xy_i, lvl)
    ang_ref = O._ic_angles_patch(raw_p, cy, cx)
    desc_ref = O._brief_descriptors_patch(blur_p, cy, cx, sy, sx,
                                          jnp.asarray(hws_np), ang_ref)

    # fused kernel, interpret mode
    N = xy_i.shape[0]
    pad = (-N) % POD.CHUNK
    xk = jnp.pad(xy_i[:, 0], (0, pad))
    yk = jnp.pad(xy_i[:, 1], (0, pad))
    lv = jnp.pad(lvl, (0, pad))
    y0, wsx = POD.window_origins(yk, xk, Hp, Wp)
    hw = jnp.asarray(hws_np)[lv]
    z = jnp.zeros_like(xk)
    meta = jnp.stack([yk, xk, y0, wsx, hw[:, 0], hw[:, 1], z, z],
                     axis=-1).astype(jnp.int32)
    dma_s = jnp.stack([(lv * Hp + y0) // 8, wsx // 128],
                      axis=0).astype(jnp.int32)
    patf = jnp.asarray(O._PATTERN, jnp.float32)
    pat4 = jnp.zeros((4, 512), jnp.float32)
    pat4 = pat4.at[0].set(jnp.concatenate([patf[:, 0], patf[:, 2]]))
    pat4 = pat4.at[1].set(jnp.concatenate([patf[:, 1], patf[:, 3]]))

    ang, bits = POD.ic_brief_fused(
        stack.reshape(L * Hp, Wp), blur_stack.reshape(L * Hp, Wp),
        dma_s, meta, pat4, interpret=True)
    ang = ang[:N]
    desc = O.pack_bits_256(bits[:N] > 0.5)

    ok = np.asarray(valid)
    # IC moments are f32 sums over a different window shape than the XLA
    # path, so reduction order differs: angles agree to ~1e-4 rad and a
    # tap at an exact rounding boundary may flip the odd bit.
    np.testing.assert_allclose(np.asarray(ang)[ok],
                               np.asarray(ang_ref)[ok], atol=2e-3)
    ham = np.unpackbits(
        np.asarray(desc)[ok] ^ np.asarray(desc_ref)[ok],
        axis=-1).sum(axis=-1)
    assert ham.max() <= 6, ham.max()
    assert ham.mean() <= 0.5, ham.mean()
    assert (ham == 0).mean() >= 0.8
    assert ok.sum() > 100
