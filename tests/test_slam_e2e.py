"""End-to-end single-agent SLAM on a synthetic scene: init, tracking,
keyframes, mapping, local BA — ATE vs ground truth after Sim3 alignment."""

import numpy as np
import jax.numpy as jnp
from scipy.spatial.transform import Rotation as Rsc

from mam3slam_tpu.geometry import cameras, lie
from mam3slam_tpu.slam import steps
from mam3slam_tpu.slam.system import (OK, SlamConfig, SlamSystem)

FX, FY, CX, CY = 300.0, 300.0, 320.0, 240.0
W, H = 640, 480
N_FEAT = 256


class SyntheticWorld:
    """Landmarks with stable descriptors; renders FrameObs per pose."""

    def __init__(self, n_mp=800, seed=0):
        rng = np.random.default_rng(seed)
        self.rng = rng
        self.pts = np.stack([
            rng.uniform(-6, 8, n_mp), rng.uniform(-4, 4, n_mp),
            rng.uniform(3, 14, n_mp)], axis=1).astype(np.float32)
        self.desc = rng.integers(0, 256, (n_mp, 32), dtype=np.uint8)

    def render(self, R, t, noise=0.3, flip_bits=2):
        pc = self.pts @ R.T + t
        uv = pc[:, :2] / np.maximum(pc[:, 2:3], 1e-6) * [FX, FY] + [CX, CY]
        vis = ((pc[:, 2] > 0.5) & (pc[:, 2] < 20)
               & (uv[:, 0] > 5) & (uv[:, 0] < W - 5)
               & (uv[:, 1] > 5) & (uv[:, 1] < H - 5))
        ids = np.where(vis)[0][:N_FEAT]  # deterministic subset
        n = len(ids)
        f_uv = np.zeros((N_FEAT, 2), np.float32)
        f_desc = np.zeros((N_FEAT, 32), np.uint8)
        f_uv[:n] = uv[ids] + self.rng.normal(0, noise, (n, 2))
        d = self.desc[ids].copy()
        # flip a couple of random bits (descriptor noise)
        for _ in range(flip_bits):
            byte = self.rng.integers(0, 32, n)
            bit = self.rng.integers(0, 8, n).astype(np.uint8)
            d[np.arange(n), byte] ^= (1 << bit).astype(np.uint8)
        f_desc[:n] = d
        valid = np.arange(N_FEAT) < n
        return steps.FrameObs(
            uv=jnp.asarray(f_uv), level=jnp.zeros(N_FEAT, jnp.int32),
            angle=jnp.zeros(N_FEAT, jnp.float32),
            desc=jnp.asarray(f_desc), valid=jnp.asarray(valid)), ids


def make_trajectory(n=60):
    """Sideways + forward arc with gentle yaw."""
    poses = []
    for i in range(n):
        yaw = np.deg2rad(0.15 * i)
        R = Rsc.from_euler("y", yaw).as_matrix().astype(np.float32)
        C = np.array([0.045 * i, 0.01 * np.sin(i * 0.3), 0.02 * i],
                     np.float32)
        t = (-R @ C).astype(np.float32)
        poses.append((R, t))
    return poses


def umeyama_align(X, Y):
    """Similarity aligning X -> Y (both [N, 3]); returns aligned X."""
    mx, my = X.mean(0), Y.mean(0)
    Xc, Yc = X - mx, Y - my
    U, D, Vt = np.linalg.svd(Yc.T @ Xc / len(X))
    Ssgn = np.eye(3)
    if np.linalg.det(U) * np.linalg.det(Vt) < 0:
        Ssgn[2, 2] = -1
    R = U @ Ssgn @ Vt
    var = (Xc ** 2).sum() / len(X)
    s = np.trace(np.diag(D) @ Ssgn) / var
    return (s * (R @ Xc.T)).T + my


def run_slam(n_frames=60, seed=0):
    world = SyntheticWorld(seed=seed)
    poses = make_trajectory(n_frames)
    cam = cameras.make_pinhole(FX, FY, CX, CY)
    cfg = SlamConfig(width=W, height=H, n_feat=N_FEAT, max_kf=64,
                     max_mp=4096, n_levels=4, kf_max_interval=12,
                     min_init_matches=60)
    sys_ = SlamSystem(cfg, cam)
    aid = sys_.add_agent()
    states = []
    for i, (R, t) in enumerate(poses):
        frame, _ = world.render(R, t)
        state, pose = sys_.track(aid, frame, ts=float(i))
        states.append(state)
    return sys_, aid, poses, states


def test_e2e_tracking_and_ate():
    sys_, aid, poses, states = run_slam()
    # initialized within the first frames, then stayed OK
    assert OK in states
    first_ok = states.index(OK)
    assert first_ok < 20, first_ok
    frac_ok = np.mean([s == OK for s in states[first_ok:]])
    assert frac_ok > 0.95, frac_ok

    # keyframes + map points created
    n_kf = int(np.asarray(sys_.ms.kf_valid).sum())
    n_mp = int(np.asarray(sys_.ms.mp_valid).sum())
    assert n_kf >= 4, n_kf
    assert n_mp > 200, n_mp

    # ATE after similarity alignment (mono is up-to-scale)
    traj = sys_.trajectory_world(aid)
    est, gt = [], []
    for (ts, qw, tw, st), (R, t) in zip(traj, poses[len(poses) - len(traj):]):
        if st != OK:
            continue
        est.append(tw)                      # camera center (Twc translation)
        gt.append(-R.T @ t)
    est, gt = np.array(est), np.array(gt)
    assert len(est) > 30
    aligned = umeyama_align(est, gt)
    ate = np.sqrt(((aligned - gt) ** 2).sum(axis=1).mean())
    # trajectory span is ~2.7 m; demand sub-2% ATE
    assert ate < 0.05, ate


def test_e2e_map_quality():
    sys_, aid, poses, states = run_slam(n_frames=40, seed=3)
    ms = sys_.ms
    # observations are bidirectionally consistent
    fmp = np.asarray(ms.kf_feat_mp)
    okf = np.asarray(ms.mp_obs_kf)
    off = np.asarray(ms.mp_obs_feat)
    nobs = np.asarray(ms.mp_nobs)
    mp_valid = np.asarray(ms.mp_valid)
    P, M = okf.shape
    checked = 0
    for p in np.where(mp_valid)[0][:200]:
        for m in range(nobs[p]):
            kf, ft = okf[p, m], off[p, m]
            if kf < 0:
                continue
            assert fmp[kf, ft] == p, (p, kf, ft, fmp[kf, ft])
            checked += 1
    assert checked > 100
