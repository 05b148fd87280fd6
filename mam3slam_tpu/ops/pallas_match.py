"""Pallas TPU kernel: fused masked descriptor matching.

The projection-guided search (`ops/matching.search_by_projection_frame`)
is the hottest per-frame op.  The XLA version materializes several
[Q, F] intermediates in HBM (Hamming matrix, radius mask, level mask,
masked distances) — ~5 round trips of Q*F*4 bytes.  This kernel fuses the
whole thing per Q-tile in VMEM:

  dot = bits_q_tile @ bits_t^T          (MXU, 256-deep bit matmul)
  ham = |q| + |t| - 2 dot               (VPU)
  mask = radius & level-window & valid  (VPU, from uv/level/valid tiles)
  best, second = masked 2-min reduction (VPU)

One HBM read per operand tile, no [Q, F] traffic.  Falls back to the XLA
path off-TPU (tests run the kernel in interpreter mode for parity).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BIG = float(1 << 20)  # python scalar: jnp constants can't be captured


def _match_kernel(q_bits_ref, q_uv_ref, q_rad_ref, q_lvl_ref, q_valid_ref,
                  t_bits_ref, t_uv_ref, t_lvl_ref, t_valid_ref,
                  best_ref, d1_ref, d2_ref):
    q_bits = q_bits_ref[:]                       # [TQ, 256] bf16
    t_bits = t_bits_ref[:]                       # [F, 256] bf16
    dot = jax.lax.dot_general(
        q_bits, t_bits, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)      # [TQ, F]
    pop_q = jnp.sum(q_bits.astype(jnp.float32), axis=1, keepdims=True)
    pop_t = jnp.sum(t_bits.astype(jnp.float32), axis=1, keepdims=True)
    ham = pop_q + pop_t.T - 2.0 * dot            # [TQ, F]

    # spatial + level-window + validity mask
    dx = q_uv_ref[:, 0:1] - t_uv_ref[:, 0:1].T
    dy = q_uv_ref[:, 1:2] - t_uv_ref[:, 1:2].T
    r2 = q_rad_ref[:] ** 2                        # [TQ, 1]
    in_r = (dx * dx + dy * dy) <= r2
    lv_t = t_lvl_ref[:, 0:1].T                    # [1, F]
    lv_q = q_lvl_ref[:]                           # [TQ, 1]
    in_lvl = (lv_t >= lv_q - 1.0) & (lv_t <= lv_q + 1.0)
    ok = (in_r & in_lvl & (q_valid_ref[:] > 0)
          & (t_valid_ref[:, 0:1].T > 0))

    d = jnp.where(ok, ham, BIG)
    d1 = jnp.min(d, axis=1)                       # [TQ]
    idx = jnp.argmin(d, axis=1).astype(jnp.int32)
    cols = jax.lax.broadcasted_iota(jnp.int32, d.shape, 1)
    d_wo = jnp.where(cols == idx[:, None], BIG, d)
    d2 = jnp.min(d_wo, axis=1)

    best_ref[:] = idx[:, None]
    d1_ref[:] = d1[:, None]
    d2_ref[:] = d2[:, None]


@functools.partial(jax.jit, static_argnames=("interpret", "tile_q"))
def fused_masked_match(bits_q, q_uv, q_radius, q_level, q_valid,
                       bits_t, t_uv, t_level, t_valid,
                       interpret: bool = False, tile_q: int = 512):
    """Fused masked best/second-best Hamming match.

    bits_q [Q, 256] bf16, bits_t [F, 256] bf16 (F <= a few K so the target
    block fits VMEM); returns (idx [Q] i32, d1 [Q] f32, d2 [Q] f32).
    Level window is the reference's [pred-1, pred+1].
    """
    Q = bits_q.shape[0]
    F = bits_t.shape[0]
    pad = (-Q) % tile_q
    if pad:
        bits_q = jnp.pad(bits_q, ((0, pad), (0, 0)))
        q_uv = jnp.pad(q_uv, ((0, pad), (0, 0)))
        q_radius = jnp.pad(q_radius, (0, pad))
        q_level = jnp.pad(q_level, (0, pad))
        q_valid = jnp.pad(q_valid, (0, pad))
    Qp = Q + pad
    grid = (Qp // tile_q,)

    q_spec = lambda w: pl.BlockSpec((tile_q, w), lambda i: (i, 0),
                                    memory_space=pltpu.ANY
                                    if False else pltpu.VMEM)
    t_spec = lambda w: pl.BlockSpec((F, w), lambda i: (0, 0),
                                    memory_space=pltpu.VMEM)

    idx, d1, d2 = pl.pallas_call(
        _match_kernel,
        grid=grid,
        in_specs=[
            q_spec(256),                       # q bits
            q_spec(2),                         # q uv
            pl.BlockSpec((tile_q, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),  # radius
            pl.BlockSpec((tile_q, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),  # level
            pl.BlockSpec((tile_q, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),  # valid
            t_spec(256), t_spec(2),
            pl.BlockSpec((F, 1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((F, 1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tile_q, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_q, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_q, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Qp, 1), jnp.int32),
            jax.ShapeDtypeStruct((Qp, 1), jnp.float32),
            jax.ShapeDtypeStruct((Qp, 1), jnp.float32),
        ],
        interpret=interpret,
    )(bits_q, q_uv, q_radius[:, None].astype(jnp.float32),
      q_level[:, None].astype(jnp.float32),
      q_valid[:, None].astype(jnp.float32),
      bits_t, t_uv, t_level[:, None].astype(jnp.float32),
      t_valid[:, None].astype(jnp.float32))
    return idx[:Q, 0], d1[:Q, 0], d2[:Q, 0]


# ---------------------------------------------------------------------------
# fused Hamming matmul + 2-min reduction over target tiles
# ---------------------------------------------------------------------------

# Packed-key layout: comb = (pop_t + 512 - 2 dot) * 16384 + col, all
# folded into ONE f32 matmul + one [1, TM] broadcast add.  Values stay
# <= 768*16384 + 16383 < 2^24, so every comb is an EXACT f32 integer and
# one min yields both the best distance and its index (ties -> lowest
# col, identical to argmin).  Invalid/padded targets carry col = CINV.
_SCALE = 16384.0
_CINV = float(1 << 24)          # invalid-target key offset
_CINV2 = float(1 << 26)         # mask value for the second-min pass


def _minham2_kernel(qaug_ref, taug_ref, col_ref, m1_ref, m2_ref):
    """One target tile: ONE MXU matmul produces the packed keys; the VPU
    does exactly four element passes ([Q,TM] add, min, eq-mask, min) —
    the previous formulation's popcount adds, argmin and masked re-min
    made it VPU-bound at ~14% MXU."""
    j = pl.program_id(0)
    acc = jax.lax.dot_general(
        qaug_ref[:], taug_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)       # [Q, TM]  (MXU)
    comb = acc + col_ref[:]                       # packed value*S + col
    m1n = jnp.min(comb, axis=1)
    m2n = jnp.min(jnp.where(comb == m1n[:, None], _CINV2, comb), axis=1)

    @pl.when(j == 0)
    def _():
        m1_ref[:] = m1n[:, None]
        m2_ref[:] = m2n[:, None]

    @pl.when(j > 0)
    def _():
        a1 = m1_ref[:, 0]
        a2 = m2_ref[:, 0]
        m1_ref[:] = jnp.minimum(a1, m1n)[:, None]
        # keys are globally unique, so the exact global second-best is
        # min(max of the two firsts, min of the two seconds)
        m2_ref[:] = jnp.minimum(jnp.maximum(a1, m1n),
                                jnp.minimum(a2, m2n))[:, None]


@functools.partial(jax.jit, static_argnames=("interpret", "tile_m"))
def min_hamming2(bits_q, bits_t, t_valid, interpret: bool = False,
                 tile_m: int = 2048):
    """Best + second-best Hamming distance of every query against ALL
    targets, fully fused: the [Q, M] distance matrix never leaves VMEM
    (the XLA einsum+min path round-trips it through HBM).  bits are
    unpacked 0/1 bf16 [*, 256].

    The Hamming identity |q| + |t| - 2 q.t rides the MXU entirely: the
    query operand is augmented with two scaled constant features and the
    target operand with |t|+512 split into exact-bf16 hi/lo nibbles, so
    the matmul emits (|t| + 512 - 2 q.t) * 16384 directly; a [1, TM]
    broadcast add of (col | invalid-key) packs the index, and a single
    min per tile recovers (distance, argmin) at once.  |q| is re-added
    after decode (row-constant terms commute with min).

    Returns (idx [Q] i32, d1 [Q] f32, d2 [Q] f32); invalid targets get
    distance BIG (idx is meaningful only when d1 < BIG)."""
    Q = bits_q.shape[0]
    Mt = bits_t.shape[0]
    pad_m = (-Mt) % tile_m
    Mp = Mt + pad_m
    grid = (Mp // tile_m,)

    bq = bits_q.astype(jnp.bfloat16)
    bt = bits_t.astype(jnp.bfloat16)
    pop_q = jnp.sum(bits_q.astype(jnp.float32), axis=1)        # [Q]
    pop_t = jnp.sum(bits_t.astype(jnp.float32), axis=1) + 512.0
    hi = jnp.floor(pop_t / 16.0)          # <= 48: exact in bf16
    lo = pop_t - hi * 16.0                # 0..15: exact in bf16
    # K padded to 384 keeps the contraction MXU-aligned (128 multiple)
    qaug = jnp.concatenate([
        bq * jnp.bfloat16(-2.0 * _SCALE),
        jnp.full((Q, 1), 16.0 * _SCALE, jnp.bfloat16),
        jnp.full((Q, 1), _SCALE, jnp.bfloat16),
        jnp.zeros((Q, 126), jnp.bfloat16)], axis=1)
    taug = jnp.concatenate([
        bt, hi[:, None].astype(jnp.bfloat16),
        lo[:, None].astype(jnp.bfloat16),
        jnp.zeros((Mt, 126), jnp.bfloat16)], axis=1)
    if pad_m:
        taug = jnp.pad(taug, ((0, pad_m), (0, 0)))
    col = jnp.where(t_valid, jnp.arange(Mt, dtype=jnp.float32), _CINV)
    col = jnp.pad(col, (0, pad_m), constant_values=_CINV)[None, :]

    m1, m2 = pl.pallas_call(
        _minham2_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((Q, 384), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_m, 384), lambda j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_m), lambda j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((Q, 1), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Q, 1), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Q, 1), jnp.float32),
            jax.ShapeDtypeStruct((Q, 1), jnp.float32),
        ],
        interpret=interpret,
    )(qaug, taug, col)

    def decode(m, with_idx):
        m = m[:, 0]
        v = jnp.floor(m / _SCALE)
        d = jnp.where(m >= _CINV, BIG, v - 512.0 + pop_q)
        if not with_idx:
            return d
        return d, (m - v * _SCALE).astype(jnp.int32)

    d1, idx = decode(m1, True)
    d2 = decode(m2, False)
    return idx, d1, d2
