"""Absolute pose from 2D-3D correspondences (PnP) with batched RANSAC.

TPU-native replacement for the reference's ``src/MLPnPsolver.cpp``
(maximum-likelihood PnP inside RANSAC, used only by
``Tracking::Relocalization`` — SURVEY.md §2.5).  Instead of the ML
null-space formulation, we use the DLT linear solve (6+ points) per RANSAC
sample — all samples estimated by one batched SVD — followed by the
standard motion-only GN polish (solvers/ba.pose_optimization), which is
the part that actually determines final accuracy in the reference too.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from mam3slam_tpu.geometry import cameras as cam_mod
from mam3slam_tpu.geometry import lie


class PnPResult(NamedTuple):
    ok: jnp.ndarray       # [] bool
    q: jnp.ndarray        # [4] T_cw
    t: jnp.ndarray        # [3]
    inliers: jnp.ndarray  # [N] bool
    n_inliers: jnp.ndarray


def _dlt_pnp(X: jnp.ndarray, xn: jnp.ndarray):
    """Batched DLT camera resection.  X [S, M, 3] world points,
    xn [S, M, 2] normalized image coords.  Returns (R [S,3,3], t [S,3])."""
    S, Mn, _ = X.shape
    zeros = jnp.zeros((S, Mn, 4))
    Xh = jnp.concatenate([X, jnp.ones((S, Mn, 1))], axis=-1)  # [S, M, 4]
    r1 = jnp.concatenate([Xh, jnp.zeros_like(Xh),
                          -xn[..., 0:1] * Xh], axis=-1)  # [S, M, 12]
    r2 = jnp.concatenate([jnp.zeros_like(Xh), Xh,
                          -xn[..., 1:2] * Xh], axis=-1)
    A = jnp.concatenate([r1, r2], axis=-2)  # [S, 2M, 12]
    _, _, vt = jnp.linalg.svd(A, full_matrices=False)
    P = vt[..., -1, :].reshape(S, 3, 4)
    Rraw = P[:, :, :3]  # = lambda * R with unknown signed scale lambda
    u, sv, vt2 = jnp.linalg.svd(Rraw)
    # det(u vt) = sign(lambda); nearest rotation to Rraw/lambda is
    # sign * (u vt) (proper: det(sign*(u vt)) = sign^3 * sign = +1)
    sgn = jnp.sign(jnp.linalg.det(u @ vt2))
    sgn = jnp.where(sgn == 0, 1.0, sgn)
    R = sgn[:, None, None] * (u @ vt2)
    lam = sgn * jnp.mean(sv, axis=-1)
    t = P[:, :, 3] / jnp.where(jnp.abs(lam) < 1e-12, 1e-12, lam)[:, None]
    return R, t


def ransac_pnp(pts: jnp.ndarray, uv: jnp.ndarray, valid: jnp.ndarray,
               cam: cam_mod.Camera, key, inv_sigma2: jnp.ndarray,
               n_iter: int = 128, sample_size: int = 6,
               chi2_th: float = 5.991, min_inliers: int = 15) -> PnPResult:
    """RANSAC DLT-PnP.  pts [N, 3] world, uv [N, 2] observed pixels."""
    n = pts.shape[0]
    order = jnp.argsort(~valid)
    n_valid = jnp.sum(valid.astype(jnp.int32))
    probe = jax.random.uniform(key, (n_iter, sample_size))
    pos = (probe * jnp.maximum(n_valid, sample_size).astype(jnp.float32)
           ).astype(jnp.int32)
    samples = order[pos]  # [S, m]

    # normalized coords for DLT
    rays = cam_mod.unproject(cam, uv)[:, :2]
    R, t = _dlt_pnp(pts[samples], rays[samples])

    Xc = jnp.einsum("sij,nj->sni", R, pts) + t[:, None, :]
    pr = cam_mod.project_ideal(cam, Xc)
    chi2 = jnp.sum((pr - uv[None]) ** 2, axis=-1) * inv_sigma2[None]
    inl = (chi2 < chi2_th) & (Xc[..., 2] > 0.01) & valid[None]
    counts = jnp.sum(inl, axis=-1)
    best = jnp.argmax(counts)
    q = lie.quat_from_matrix(R[best])
    return PnPResult(ok=counts[best] >= min_inliers, q=q, t=t[best],
                     inliers=inl[best],
                     n_inliers=counts[best].astype(jnp.int32))
