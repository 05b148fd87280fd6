"""Fused Pallas kernel: per-keypoint patch fetch + IC orientation + rBRIEF.

The XLA path in ops/orb.py realizes the describe phase as (a) a vmapped
``dynamic_slice`` patch gather — XLA lowers it to a sequential while loop
of ~N DMA block copies (~0.6 ms for 768 keypoints), (b) an interleaved
raw/blur stack build (a strided 23 MB scatter, ~0.36 ms), and (c) one-hot
MXU contractions whose [N, 512, P] intermediates round-trip HBM.  This
kernel replaces all three: a double-buffered DMA pipeline streams each
keypoint's raw and blurred [40, 128] windows HBM->VMEM while the previous
chunk computes its IC moments (reference IC_Angle, ORBextractor.cc:76) and
its 512 rotated BRIEF taps (computeOrbDescriptor, :107) entirely in VMEM.

Numerics: blurred-and-rounded pixels are integers <= 255 — exactly
representable in bf16 — and each one-hot contraction touches exactly one
of them, so a *tap at a given coordinate* matches the XLA path bitwise.
The IC moments, however, are float32 sums over a different window shape
([40, 128] here vs the tight patch in the XLA path), so reduction order
differs and angles agree only to ~1e-4 rad; a tap whose rotated offset
sits exactly at a rounding boundary can then land one pixel off, flipping
the odd descriptor bit.  Parity (angle atol + small Hamming budget) is
tested in interpret mode (tests/test_pallas_orb_desc.py); the XLA path
remains the CPU/fallback implementation.

Geometry: Mosaic requires dynamic HBM slice origins to be tile-aligned
(8 rows / 128 lanes), so the window is [48, 256] with origin
y0 = align8(yk-19) clipped to [0, Hp-48] and x0 = align128(xk-64) clipped
to [0, Wp-256].  Then yk-y0 in [19, 27) and xk-x0 in [64, 192) (edge
clips only widen the margin), which encloses the r<=15 IC circle and
every clipped BRIEF tap (|rotated tap| <= 19, detection border 16).
Requires Hp % 8 == 0, Wp % 128 == 0, Wp >= 256, Hp >= 48.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROWS = 48      # window rows (8-aligned origin, covers the 40-row patch)
LANES = 256    # window lanes (128-aligned origin)
CHUNK = 8      # keypoints per grid step


def window_origins(yk, xk, Hp, Wp):
    """Tile-aligned window origins (y0, x0) for keypoints (yk, xk)."""
    y0 = jnp.clip(((yk - 19) // 8) * 8, 0, Hp - ROWS)
    x0 = jnp.clip(((xk - 64) // 128) * 128, 0, Wp - LANES)
    return y0, x0


def _kernel(umax, n_valid_rows, dma_s_ref, meta_ref, pat_ref,
            raw_hbm, blur_hbm, mom_out, bits_out,
            raw_buf, blur_buf, sems):
    """Grid step g: describe keypoints [g*CHUNK, (g+1)*CHUNK).

    dma_s_ref: scalar-prefetch [2, N] i32 (row0//8 in the stacked image,
    window x start // 128) — [2, N] so SMEM lane padding stays O(N).  meta_ref: [CHUNK, 8] i32 VMEM block per step:
    (cy_g, cx_g, y0_lvl, x0, h, w, 0, 0) — global level coords of the
    keypoint, window origin, level extents.  pat_ref: [4, 512] f32
    (px, py of the 512 taps in rows 0-1).
    """
    g = pl.program_id(0)
    n_g = pl.num_programs(0)

    def start_chunk(cidx, slot):
        for k in range(CHUNK):
            # dma_s holds (row0//8, x0//128); multiplying here makes the
            # tile-divisibility of the slice origin syntactically provable
            row0 = dma_s_ref[0, cidx * CHUNK + k] * 8
            wsx = dma_s_ref[1, cidx * CHUNK + k] * 128
            pltpu.make_async_copy(
                raw_hbm.at[pl.ds(row0, ROWS), pl.ds(wsx, LANES)],
                raw_buf.at[slot, k], sems.at[slot, k, 0]).start()
            pltpu.make_async_copy(
                blur_hbm.at[pl.ds(row0, ROWS), pl.ds(wsx, LANES)],
                blur_buf.at[slot, k], sems.at[slot, k, 1]).start()

    def wait_chunk(cidx, slot):
        for k in range(CHUNK):
            row0 = dma_s_ref[0, cidx * CHUNK + k] * 8
            wsx = dma_s_ref[1, cidx * CHUNK + k] * 128
            pltpu.make_async_copy(
                raw_hbm.at[pl.ds(row0, ROWS), pl.ds(wsx, LANES)],
                raw_buf.at[slot, k], sems.at[slot, k, 0]).wait()
            pltpu.make_async_copy(
                blur_hbm.at[pl.ds(row0, ROWS), pl.ds(wsx, LANES)],
                blur_buf.at[slot, k], sems.at[slot, k, 1]).wait()

    @pl.when(g == 0)
    def _():
        start_chunk(0, 0)

    slot = jax.lax.rem(g, 2)

    @pl.when(g + 1 < n_g)
    def _():
        start_chunk(g + 1, jax.lax.rem(g + 1, 2))

    wait_chunk(g, slot)

    raw = raw_buf[slot]          # [CHUNK, ROWS, LANES] f32
    blur = blur_buf[slot]

    cy_g = meta_ref[:, 0:1]      # [CHUNK, 1] i32 (global level coords)
    cx_g = meta_ref[:, 1:2]
    y0 = meta_ref[:, 2:3]
    x0 = meta_ref[:, 3:4]
    h = meta_ref[:, 4:5]
    w_l = meta_ref[:, 5:6]
    cy = cy_g - y0               # window-local keypoint position
    cx = cx_g - x0

    iy = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, ROWS, LANES), 1)
    ix = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, ROWS, LANES), 2)
    dy = iy - cy[:, :, None]
    dx = ix - cx[:, :, None]
    ady = jnp.abs(dy)
    # circular mask |dx| <= umax[|dy|] from the unrolled 16-entry table
    u = jnp.zeros_like(ady)
    for r, uv in enumerate(umax):
        u = u + jnp.where(ady == r, jnp.int32(int(uv)), 0)
    mask = ((ady <= len(umax) - 1) & (jnp.abs(dx) <= u)).astype(raw.dtype)
    # two 2D reductions (lane axis then row axis): Mosaic's layout pass
    # chokes on [CHUNK, 1, 1] keepdims intermediates
    m10 = jnp.sum(jnp.sum(raw * (dx.astype(raw.dtype) * mask), axis=2),
                  axis=1, keepdims=True)                     # [CHUNK, 1]
    m01 = jnp.sum(jnp.sum(raw * (dy.astype(raw.dtype) * mask), axis=2),
                  axis=1, keepdims=True)
    # Mosaic TC has no atan2; emit the moments and let the caller compute
    # the angle.  cos/sin come directly from the normalized moments.
    mom_out[:, 0:1] = m10
    mom_out[:, 1:2] = m01
    nrm = jnp.sqrt(m10 * m10 + m01 * m01)                    # [CHUNK, 1]
    safe = nrm > 0.0
    ca = jnp.where(safe, m10 / jnp.where(safe, nrm, 1.0), 1.0)
    sa = jnp.where(safe, m01 / jnp.where(safe, nrm, 1.0), 0.0)
    px = pat_ref[0:1, :]         # [1, 512]
    py = pat_ref[1:2, :]
    rx = jnp.round(px * ca - py * sa).astype(jnp.int32)      # [CHUNK, 512]
    ry = jnp.round(px * sa + py * ca).astype(jnp.int32)
    gx = jnp.clip(cx_g + rx, 0, w_l - 1)
    gy = jnp.clip(cy_g + ry, 0, h - 1)
    pr = gy - y0                                             # [CHUNK, 512]
    pc = gx - x0

    # Tap gather as one-hot contractions, unrolled over the chunk: Mosaic
    # lowers 2D matmuls cleanly where the batched 3D form crashes layout
    # assignment; explicit dynamic_slice avoids mixed fancy indexing,
    # which Mosaic would lower as an (unsupported-shape) gather.  Taps
    # stay in the 512-lane dimension throughout:
    #   tmp = blur_k^T-contract-rows onehot_rows  -> [LANES, 512]
    #   v   = sum_lanes tmp * onehot_cols         -> [1, 512]
    rr = jax.lax.broadcasted_iota(jnp.int32, (ROWS, 512), 0)
    cc = jax.lax.broadcasted_iota(jnp.int32, (LANES, 512), 0)
    vs = []
    for k in range(CHUNK):
        pr_k = jax.lax.slice(pr, (k, 0), (k + 1, 512))       # [1, 512]
        pc_k = jax.lax.slice(pc, (k, 0), (k + 1, 512))
        oh_r = (rr == pr_k).astype(jnp.bfloat16)             # [R, 512]
        tmp = jax.lax.dot_general(
            blur[k].astype(jnp.bfloat16), oh_r,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)              # [L, 512]
        oh_c = (cc == pc_k).astype(jnp.float32)
        vs.append(jnp.sum(tmp * oh_c, axis=0, keepdims=True))  # [1, 512]
    v = jnp.concatenate(vs, axis=0)                          # [CHUNK, 512]
    bits_out[:, :] = (v[:, :256] < v[:, 256:]).astype(jnp.float32)

    if n_valid_rows is not None:
        pass  # capacity == N by construction


@functools.partial(jax.jit, static_argnames=("interpret",))
def ic_brief_fused(raw2d, blur2d, dma_starts, meta, pattern,
                   interpret: bool = False):
    """Run the fused describe kernel.

    raw2d/blur2d: [L*Hp, Wp] f32 stacked pyramids (HBM-resident).
    dma_starts: [2, N] i32 (row0//8, x0//128) — N multiple of CHUNK.
    meta: [N, 8] i32 (cy_g, cx_g, y0, x0, h, w, 0, 0).
    pattern: [4, 512] f32 (px, py rows).
    Returns (angle [N], bits [N, 512] f32 0/1 of the 256 comparisons
    duplicated layout: first 256 columns are the bit values).
    """
    N = meta.shape[0]
    assert dma_starts.shape == (2, N)
    assert N % CHUNK == 0
    from mam3slam_tpu.ops.orb import _circular_umax
    umax = tuple(int(x) for x in _circular_umax())

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(N // CHUNK,),
        in_specs=[
            pl.BlockSpec((CHUNK, 8), lambda g, s: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),      # pattern
            pl.BlockSpec(memory_space=pl.ANY),          # raw2d (HBM)
            pl.BlockSpec(memory_space=pl.ANY),          # blur2d (HBM)
        ],
        out_specs=(
            pl.BlockSpec((CHUNK, 2), lambda g, s: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((CHUNK, 256), lambda g, s: (g, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, CHUNK, ROWS, LANES), jnp.float32),
            pltpu.VMEM((2, CHUNK, ROWS, LANES), jnp.float32),
            pltpu.SemaphoreType.DMA((2, CHUNK, 2)),
        ],
    )
    kern = functools.partial(_kernel, umax, None)
    mom, bits = pl.pallas_call(
        kern,
        out_shape=(jax.ShapeDtypeStruct((N, 2), jnp.float32),
                   jax.ShapeDtypeStruct((N, 256), jnp.float32)),
        grid_spec=grid_spec,
        interpret=interpret,
    )(dma_starts, meta, pattern, raw2d, blur2d)
    return jnp.arctan2(mom[:, 1], mom[:, 0]), bits
