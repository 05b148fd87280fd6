"""Single-agent loop closure: circular tour, revisit start, PGO correction."""

import numpy as np
import jax.numpy as jnp
from scipy.spatial.transform import Rotation as Rsc

from mam3slam_tpu.geometry import cameras
from mam3slam_tpu.slam import steps
from mam3slam_tpu.slam.server import LoopServer, ServerConfig
from mam3slam_tpu.slam.system import OK, SlamConfig, SlamSystem

from test_slam_e2e import FX, FY, CX, CY, H, N_FEAT, W, umeyama_align

import pytest

pytestmark = pytest.mark.slow  # full-suite tier; smoke = -m "not slow"


class RingWorld:
    """Landmarks in a ring band; camera tours a circle looking outward."""

    def __init__(self, n_mp=2400, r_inner=7.0, r_outer=11.0, seed=0):
        rng = np.random.default_rng(seed)
        self.rng = rng
        ang = rng.uniform(0, 2 * np.pi, n_mp)
        rad = rng.uniform(r_inner, r_outer, n_mp)
        self.pts = np.stack([
            rad * np.sin(ang), rng.uniform(-2.5, 2.5, n_mp),
            rad * np.cos(ang)], axis=1).astype(np.float32)
        self.desc = rng.integers(0, 256, (n_mp, 32), dtype=np.uint8)

    def render(self, R, t, noise=0.3, flip_bits=2):
        pc = self.pts @ R.T + t
        uv = pc[:, :2] / np.maximum(pc[:, 2:3], 1e-6) * [FX, FY] + [CX, CY]
        vis = ((pc[:, 2] > 1.0) & (pc[:, 2] < 9.0)
               & (uv[:, 0] > 5) & (uv[:, 0] < W - 5)
               & (uv[:, 1] > 5) & (uv[:, 1] < H - 5))
        ids = np.where(vis)[0][:N_FEAT]
        n = len(ids)
        f_uv = np.zeros((N_FEAT, 2), np.float32)
        f_desc = np.zeros((N_FEAT, 32), np.uint8)
        f_uv[:n] = uv[ids] + self.rng.normal(0, noise, (n, 2))
        d = self.desc[ids].copy()
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


def circle_tour(n, radius=5.0, frac=1.08):
    """Outward-looking circular trajectory covering `frac` revolutions."""
    poses = []
    for i in range(n):
        ang = 2 * np.pi * frac * i / n
        # camera at radius, looking radially outward (+z toward ring)
        Rwc = Rsc.from_euler("y", ang).as_matrix()
        C = np.array([radius * np.sin(ang), 0.0, radius * np.cos(ang)])
        # look outward: camera z axis along (sin, 0, cos)
        Rcw = Rwc.T.astype(np.float32)
        t = (-Rcw @ C).astype(np.float32)
        poses.append((Rcw, t))
    return poses


def test_loop_closure_detected_and_corrected():
    world = RingWorld(seed=2)
    cam = cameras.make_pinhole(FX, FY, CX, CY)
    cfg = SlamConfig(width=W, height=H, n_feat=N_FEAT, max_kf=128,
                     max_mp=8192, n_levels=4, kf_max_interval=8,
                     min_init_matches=60)
    sys_ = SlamSystem(cfg, cam)
    aid = sys_.add_agent()
    srv = LoopServer(sys_, ServerConfig(min_kfs_in_map=10, vocab_k=8,
                                        vocab_depth=3))
    sys_.server = srv

    n_frames = 230  # ~1.7 deg/frame — realistic angular rate per frame
    poses = circle_tour(n_frames)
    states = []
    for i, (R, t) in enumerate(poses):
        f, _ = world.render(R, t)
        st, _ = sys_.track(aid, f, float(i))
        states.append(st)

    assert OK in states
    ok_frac = np.mean([s == OK for s in states[states.index(OK):]])
    assert ok_frac > 0.9, ok_frac

    loops = [e for e in srv.events if e.startswith("LOOP")]
    assert loops, f"no loop closure; events={srv.events}"

    # trajectory accuracy after the loop closure (similarity-aligned)
    traj = sys_.trajectory_world(aid)
    est, gt = [], []
    for (ts, qw, tw, st) in traj:
        if st != OK:
            continue
        R, t = poses[int(ts)]
        est.append(tw)
        gt.append(-R.T @ t)
    est, gt = np.array(est), np.array(gt)
    aligned = umeyama_align(est, gt)
    ate = np.sqrt(((aligned - gt) ** 2).sum(axis=1).mean())
    # tour circumference ~34 m; demand ~1% ATE post-loop-closure
    assert ate < 0.4, ate


def test_loop_in_multimap_atlas_skips_gba():
    """Reference parity (LoopClosing.cc:1766-1775): the post-loop GBA
    runs only when the map is small AND the atlas holds a single map.  A
    loop closed while another map exists must correct via PGO but skip
    the GBA (round-4 VERDICT weak #7)."""
    world = RingWorld(seed=2)
    cam = cameras.make_pinhole(FX, FY, CX, CY)
    cfg = SlamConfig(width=W, height=H, n_feat=N_FEAT, max_kf=128,
                     max_mp=8192, n_levels=4, kf_max_interval=8,
                     min_init_matches=60)
    sys_ = SlamSystem(cfg, cam)
    aid = sys_.add_agent()
    srv = LoopServer(sys_, ServerConfig(min_kfs_in_map=10, vocab_k=8,
                                        vocab_depth=3))
    sys_.server = srv

    n_frames = 230
    poses = circle_tour(n_frames)
    for i, (R, t) in enumerate(poses):
        if i == 40:
            # a second (empty) atlas map appears — e.g. another agent
            # initializing — before this agent's loop closes
            sys_.ms = sys_.ms._replace(
                map_valid=sys_.ms.map_valid.at[1].set(True))
        f, _ = world.render(R, t)
        sys_.track(aid, f, float(i))

    loops = [e for e in srv.events if e.startswith("LOOP")]
    assert loops, f"no loop closure; events={srv.events}"
    assert srv.gba_runs == [], \
        f"GBA ran in a multi-map atlas: {srv.gba_runs}"


def test_loop_closure_inertial_uses_4dof_pgo():
    """An IMU-initialized map closes its loop through the 4DoF essential
    graph (yaw about gravity + translation, scale held metric) —
    reference Optimizer::OptimizeEssentialGraph4DoF (Optimizer.cc:5299)
    reached via the inertial LoopClosing branch (LoopClosing.cc:2918-2934,
    commented out there; wired here behind the same
    IsInertial/GetIniertialBA2-style gate).  Accuracy must match the
    Sim3 path on this metric, gravity-aligned tour."""
    world = RingWorld(seed=2)
    cam = cameras.make_pinhole(FX, FY, CX, CY)
    cfg = SlamConfig(width=W, height=H, n_feat=N_FEAT, max_kf=128,
                     max_mp=8192, n_levels=4, kf_max_interval=8,
                     min_init_matches=60)
    sys_ = SlamSystem(cfg, cam)
    aid = sys_.add_agent()
    srv = LoopServer(sys_, ServerConfig(min_kfs_in_map=10, vocab_k=8,
                                        vocab_depth=3))
    sys_.server = srv

    n_frames = 230
    poses = circle_tour(n_frames)
    states = []
    for i, (R, t) in enumerate(poses):
        if i == 40:
            # mark the map inertial, as a completed VI init would: the
            # camera tours the y=0 plane, so map-frame gravity is -y
            a = sys_.agents[aid]
            a.imu_initialized = True
            a.imu_init_map = a.map_id
            a.gravity_w = np.array([0.0, -9.81, 0.0])
        f, _ = world.render(R, t)
        st, _ = sys_.track(aid, f, float(i))
        states.append(st)

    loops = [e for e in srv.events if e.startswith("LOOP")]
    assert loops, f"no loop closure; events={srv.events}"
    assert all("pgo=4dof" in e for e in loops), loops

    ok_frac = np.mean([s == OK for s in states[states.index(OK):]])
    assert ok_frac > 0.9, ok_frac
    traj = sys_.trajectory_world(aid)
    est, gt = [], []
    for (ts, qw, tw, st) in traj:
        if st != OK:
            continue
        R, t = poses[int(ts)]
        est.append(tw)
        gt.append(-R.T @ t)
    est, gt = np.array(est), np.array(gt)
    aligned = umeyama_align(est, gt)
    ate = np.sqrt(((aligned - gt) ** 2).sum(axis=1).mean())
    assert ate < 0.4, ate
