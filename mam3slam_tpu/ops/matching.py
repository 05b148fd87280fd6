"""Batched ORB descriptor matching primitives.

TPU-native replacement for the reference's ``src/ORBmatcher.cc`` (SURVEY.md
§2.4: 9 search/fuse routines, Hamming distance, TH_HIGH=100 / TH_LOW=50,
30-bin rotation-consistency histogram).

TPU design: the reference accelerates candidate lookup with a 64x48 frame
grid and BoW feature-vector buckets because it runs scalar loops on CPU.
On TPU the idiomatic form is *dense masked* matching: compute the full
[Q, M] Hamming matrix on the MXU and mask out candidates that fail the
spatial / level / epipolar predicates.  The Hamming matrix itself uses the
bit-matmul identity  popcount(a XOR b) = |a| + |b| - 2 a.b  over {0,1}
bit vectors, which turns descriptor distance into a 256-deep matmul —
exactly what the MXU is built for (exact in bf16 inputs + f32 accumulation
since all values are integers <= 256).

All routines are fixed-shape, mask-aware, and jit/vmap-safe.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

TH_HIGH = 100
TH_LOW = 50
HISTO_BINS = 30
BIG = jnp.int32(1 << 20)


def unpack_desc(desc: jnp.ndarray) -> jnp.ndarray:
    """[..., 32] uint8 -> [..., 256] bf16 bit matrix (OpenCV bit order).

    Implemented over int32 words: uint8 shift/reshape lowers to sublane
    relayouts that cost ~15 ms for a single frame on TPU, while the i32
    path is native VPU work.  Little-endian u8->i32 bitcast preserves the
    global bit order (bit 32*w + b == byte 4*w + b//8, bit b%8).
    """
    words = jax.lax.bitcast_convert_type(
        desc.reshape(desc.shape[:-1] + (8, 4)), jnp.int32)  # [..., 8]
    shifts = jnp.arange(32, dtype=jnp.int32)
    bits = (words[..., :, None] >> shifts) & jnp.int32(1)   # [..., 8, 32]
    return bits.reshape(desc.shape[:-1] + (256,)).astype(jnp.bfloat16)


def hamming_matrix(bits_q: jnp.ndarray, bits_t: jnp.ndarray) -> jnp.ndarray:
    """[Q, 256], [M, 256] bit matrices -> [Q, M] int32 Hamming distances.

    Exact: 0/1 entries are exact in bf16 and the MXU accumulates in f32.
    """
    pq = jnp.sum(bits_q.astype(jnp.float32), axis=-1)
    pt = jnp.sum(bits_t.astype(jnp.float32), axis=-1)
    dot = jax.lax.dot_general(
        bits_q, bits_t,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return (pq[:, None] + pt[None, :] - 2.0 * dot).astype(jnp.int32)


def hamming_pairs(desc_a: jnp.ndarray, desc_b: jnp.ndarray) -> jnp.ndarray:
    """Elementwise Hamming distance between paired [..., 32] u8 descriptors."""
    x = jnp.bitwise_xor(desc_a, desc_b)
    return jnp.sum(jax.lax.population_count(x).astype(jnp.int32), axis=-1)


class MatchResult(NamedTuple):
    """Per-query best match into a target feature set; a pytree."""

    idx: jnp.ndarray    # [Q] int32 target index (undefined where not ok)
    dist: jnp.ndarray   # [Q] int32 best Hamming distance
    dist2: jnp.ndarray  # [Q] int32 second-best distance (for ratio tests)
    ok: jnp.ndarray     # [Q] bool


def best_in_mask(ham: jnp.ndarray, mask: jnp.ndarray,
                 max_dist: int = TH_HIGH) -> MatchResult:
    """Best + second-best target per query within an arbitrary candidate
    mask.  ``ham [Q, M]``, ``mask [Q, M]`` bool.

    Implemented as three min/argmin reductions instead of lax.top_k —
    top_k lowers to a sort on TPU and dominated the matcher's runtime.
    """
    d = jnp.where(mask, ham, BIG)
    i1 = jnp.argmin(d, axis=1).astype(jnp.int32)
    d1 = jnp.take_along_axis(d, i1[:, None], axis=1)[:, 0]
    cols = jax.lax.broadcasted_iota(jnp.int32, d.shape, 1)
    d_wo = jnp.where(cols == i1[:, None], BIG, d)
    d2 = jnp.min(d_wo, axis=1)
    ok = d1 <= max_dist
    return MatchResult(idx=i1, dist=d1.astype(jnp.int32),
                       dist2=d2.astype(jnp.int32), ok=ok)


def radius_mask(query_uv: jnp.ndarray, target_uv: jnp.ndarray,
                radius: jnp.ndarray) -> jnp.ndarray:
    """[Q, 2], [M, 2], radius [Q] (pixels) -> bool [Q, M]."""
    d2 = jnp.sum((query_uv[:, None, :] - target_uv[None, :, :]) ** 2, axis=-1)
    return d2 <= (radius[:, None] ** 2)


def level_window_mask(pred_level: jnp.ndarray, target_level: jnp.ndarray,
                      lo: int = 0, hi: int = 1) -> jnp.ndarray:
    """Scale-consistency mask: target level in [pred-lo, pred+hi]
    (reference ORBmatcher checks nPredictedLevel-1 <= octave <= +1)."""
    lv = target_level[None, :]
    pl = pred_level[:, None]
    return (lv >= pl - lo) & (lv <= pl + hi)


def rotation_consistency_mask(angle_q: jnp.ndarray, angle_t: jnp.ndarray,
                              idx: jnp.ndarray, ok: jnp.ndarray
                              ) -> jnp.ndarray:
    """30-bin rotation histogram filter (reference keeps matches in the 3
    most-populated bins of the per-match angle difference histogram,
    ``ORBmatcher::ComputeThreeMaxima``).  Returns refined ``ok``."""
    diff = angle_q - angle_t[idx]
    two_pi = 2.0 * jnp.pi
    frac = (diff / two_pi) % 1.0
    bins = jnp.clip((frac * HISTO_BINS + 0.5).astype(jnp.int32) % HISTO_BINS,
                    0, HISTO_BINS - 1)
    hist = jnp.zeros((HISTO_BINS,), jnp.int32).at[bins].add(
        ok.astype(jnp.int32))
    top3 = jax.lax.top_k(hist, 3)[0]
    # mirror reference pruning: drop bins 2/3 when much weaker than bin 1
    keep_thresh = jnp.stack([
        top3[0],
        jnp.where(top3[1] > 0.1 * top3[0], top3[1], BIG),
        jnp.where(top3[2] > 0.1 * top3[0], top3[2], BIG),
    ])
    good_bins = jnp.zeros((HISTO_BINS,), jnp.bool_)
    for k in range(3):
        good_bins = good_bins | (hist == keep_thresh[k]) & (hist > 0)
    return ok & good_bins[bins]


def resolve_duplicates(res: MatchResult, num_targets: int) -> MatchResult:
    """Enforce one-to-one: when several queries claim one target keypoint,
    keep only the lowest-distance claimant (reference resolves conflicts
    via per-keypoint bookkeeping in its scalar loops)."""
    d = jnp.where(res.ok, res.dist, BIG)
    best_per_target = jnp.full((num_targets,), BIG, jnp.int32).at[
        res.idx].min(d)
    q = jnp.arange(res.idx.shape[0])
    # tie-break equal distances by query order
    first_claim = jnp.full((num_targets,), 1 << 30, jnp.int32).at[res.idx].min(
        jnp.where(res.ok & (d == best_per_target[res.idx]), q, 1 << 30))
    keep = res.ok & (d == best_per_target[res.idx]) & (
        first_claim[res.idx] == q)
    return res._replace(ok=keep)


# ---------------------------------------------------------------------------
# composed search routines (reference ORBmatcher entry points)
# ---------------------------------------------------------------------------

def search_for_initialization(uv1, bits1, angle1, valid1,
                              uv2, bits2, angle2, valid2,
                              window: float = 100.0,
                              ratio: float = 0.9,
                              check_rotation: bool = True) -> MatchResult:
    """Windowed first-to-second-frame matching for monocular init
    (reference ``ORBmatcher::SearchForInitialization``, src/ORBmatcher.cc:648:
    radius window, TH_LOW, best/second ratio, rotation histogram)."""
    ham = hamming_matrix(bits1, bits2)
    mask = (radius_mask(uv1, uv2, jnp.full(uv1.shape[0], window))
            & valid1[:, None] & valid2[None, :])
    res = best_in_mask(ham, mask, TH_LOW)
    ok = res.ok & (res.dist.astype(jnp.float32)
                   <= ratio * res.dist2.astype(jnp.float32))
    res = res._replace(ok=ok)
    if check_rotation:
        res = res._replace(
            ok=rotation_consistency_mask(angle1, angle2, res.idx, res.ok))
    return resolve_duplicates(res, uv2.shape[0])


def search_by_projection_frame(pred_uv, pred_level, pred_radius, bits_q,
                               valid_q, feat_uv, feat_level, bits_f, valid_f,
                               max_dist: int = TH_HIGH,
                               ratio: Optional[float] = None,
                               level_lo: int = 1, level_hi: int = 1
                               ) -> MatchResult:
    """Guided projection search of map points into a frame (reference
    ``SearchByProjection(Frame&, vector<MapPoint*>)`` src/ORBmatcher.cc:43
    and the motion-model variant :1676).

    pred_uv/pred_level/pred_radius: per-query projected position, predicted
    pyramid level and search radius (already scale-multiplied by caller).
    """
    ham = hamming_matrix(bits_q, bits_f)
    mask = (radius_mask(pred_uv, feat_uv, pred_radius)
            & level_window_mask(pred_level, feat_level, level_lo, level_hi)
            & valid_q[:, None] & valid_f[None, :])
    res = best_in_mask(ham, mask, max_dist)
    if ratio is not None:
        res = res._replace(
            ok=res.ok & (res.dist.astype(jnp.float32)
                         <= ratio * res.dist2.astype(jnp.float32)))
    return resolve_duplicates(res, feat_uv.shape[0])


def search_by_brute_force(bits_q, valid_q, angle_q, bits_t, valid_t, angle_t,
                          max_dist: int = TH_LOW, ratio: float = 0.75,
                          check_rotation: bool = True,
                          mutual: bool = True) -> MatchResult:
    """Dense descriptor matching with ratio + mutual-best + rotation checks.

    Serves the role of the reference's ``SearchByBoW`` pair (KF-Frame :223 /
    KF-KF :765): the vocabulary-node bucketing there is a CPU pruning trick;
    the quality filters (TH_LOW, best/second ratio, rotation histogram) are
    the semantics and are preserved here.  A vocab-node equality mask can be
    AND-ed in by callers once BoW is attached (see place_recognition)."""
    ham = hamming_matrix(bits_q, bits_t)
    mask = valid_q[:, None] & valid_t[None, :]
    res = best_in_mask(ham, mask, max_dist)
    ok = res.ok & (res.dist.astype(jnp.float32)
                   <= ratio * res.dist2.astype(jnp.float32))
    if mutual:
        back = best_in_mask(ham.T, mask.T, max_dist)
        q = jnp.arange(res.idx.shape[0])
        ok = ok & back.ok[res.idx] & (back.idx[res.idx] == q)
    res = res._replace(ok=ok)
    if check_rotation:
        res = res._replace(
            ok=rotation_consistency_mask(angle_q, angle_t, res.idx, res.ok))
    return resolve_duplicates(res, bits_t.shape[0])


def epipolar_distance_sq(uv1: jnp.ndarray, uv2: jnp.ndarray,
                         F12: jnp.ndarray) -> jnp.ndarray:
    """Squared point-to-epipolar-line distance of every (kp1, kp2) pair.

    uv1 [N, 2] in image 1, uv2 [M, 2] in image 2, F12 fundamental matrix
    such that x2^T F12 x1 = 0.  Returns [N, M] distances of kp2 to the line
    of kp1 (reference CheckDistEpipolarLine semantics).
    """
    ones1 = jnp.ones_like(uv1[:, :1])
    x1 = jnp.concatenate([uv1, ones1], axis=-1)  # [N, 3]
    lines = x1 @ F12.T  # [N, 3] lines in image 2: a x + b y + c = 0
    a, b, c = lines[:, 0:1], lines[:, 1:2], lines[:, 2:3]
    num = a * uv2[:, 0][None, :] + b * uv2[:, 1][None, :] + c
    den = a * a + b * b
    return (num * num) / jnp.maximum(den, 1e-12)


def search_for_triangulation(uv1, bits1, level1, valid1,
                             uv2, bits2, level2, valid2,
                             F12, sigma2_per_level,
                             max_dist: int = TH_LOW,
                             epi_chi2: float = 3.84) -> MatchResult:
    """Epipolar-constrained matching for new map-point creation (reference
    ``SearchForTriangulation`` src/ORBmatcher.cc:907: candidates must lie
    near the epipolar line with a scale-dependent threshold)."""
    ham = hamming_matrix(bits1, bits2)
    epi2 = epipolar_distance_sq(uv1, uv2, F12)
    sig2 = sigma2_per_level[level2]  # [M]
    mask = ((epi2 < epi_chi2 * sig2[None, :])
            & valid1[:, None] & valid2[None, :])
    res = best_in_mask(ham, mask, max_dist)
    return resolve_duplicates(res, uv2.shape[0])
