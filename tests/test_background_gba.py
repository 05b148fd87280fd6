"""Background (task-parallel) global BA: async dispatch on a second
device, spanning-tree catch-up for KFs born during the GBA, reference-KF
correction for new points, and abort semantics (reference
LoopClosing::RunGlobalBundleAdjustment, src/LoopClosing.cc:3579-3831)."""

import copy

import numpy as np
import jax
import jax.numpy as jnp

from mam3slam_tpu.geometry import lie
from mam3slam_tpu.slam.background_gba import BackgroundGBA
from mam3slam_tpu.slam.system import OK

from test_slam_e2e import SyntheticWorld, make_trajectory, run_slam

import pytest

pytestmark = pytest.mark.slow  # full-suite tier; smoke = -m "not slow"


def _rel_se3(q_a, t_a, q_b, t_b):
    """T_a * T_b^-1 as (q, t) numpy."""
    T = lie.se3_compose(lie.SE3(jnp.asarray(q_a), jnp.asarray(t_a)),
                        lie.se3_inverse(lie.SE3(jnp.asarray(q_b),
                                                jnp.asarray(t_b))))
    return np.asarray(T.q), np.asarray(T.t)


def test_background_gba_matches_sync_and_catches_up():
    sys_, aid, poses, states = run_slam(n_frames=46)
    assert sys_.agents[aid].state == OK
    map_id = sys_.agents[aid].map_id

    # synchronous GBA on the snapshot = ground truth for snapshot KFs
    ms_snap = sys_.ms
    ms_sync = sys_.fns["global_ba"](ms_snap, jnp.asarray(map_id))

    # background GBA on a second virtual device, tracking continues
    dev = jax.devices("cpu")[1]
    gba = BackgroundGBA(sys_, device=dev)
    gba.start(map_id)
    n_snap = int(ms_snap.n_kf)   # insertion counter, NOT a slot bound
    seq_snap = np.asarray(ms_snap.kf_seq).copy()

    world = SyntheticWorld(seed=0)  # fresh rng; same landmarks
    extra = make_trajectory(70)[46:]
    for i, (R, t) in enumerate(extra):
        frame, _ = world.render(R, t)
        sys_.track(aid, frame, ts=float(46 + i))
    n_now = int(sys_.ms.n_kf)
    assert n_now > n_snap, "tracking must have inserted KFs during GBA"

    q_before = np.asarray(sys_.ms.kf_q).copy()
    t_before = np.asarray(sys_.ms.kf_t).copy()
    parent = np.asarray(sys_.ms.kf_parent)
    kf_valid = np.asarray(sys_.ms.kf_valid)

    assert gba.running
    applied = gba.finish()
    assert applied and not gba.running

    q_after = np.asarray(sys_.ms.kf_q)
    t_after = np.asarray(sys_.ms.kf_t)

    # snapshot KFs got exactly the sync-GBA poses (same program+input).
    # Identity across the window is kf_seq (slots recycle after culling):
    # a slot is a snapshot KF iff its seq is unchanged and < n_snap.
    sync_q = np.asarray(ms_sync.kf_q)
    sync_t = np.asarray(ms_sync.kf_t)
    kf_seq = np.asarray(sys_.ms.kf_seq)
    snap_live = kf_valid & (kf_seq == seq_snap) & (kf_seq < n_snap)
    anchor = int(np.argmin(np.where(snap_live, seq_snap, 1 << 30)))
    checked = 0
    for k in np.where(snap_live)[0]:
        if k == anchor:  # gauge anchor stays fixed
            continue
        np.testing.assert_allclose(q_after[k], sync_q[k], atol=1e-6)
        np.testing.assert_allclose(t_after[k], sync_t[k], atol=1e-6)
        checked += 1
    assert checked >= 3

    # KFs born during the GBA: relative pose to parent preserved
    caught = 0
    for k in np.where(kf_valid & (kf_seq >= n_snap))[0]:
        p = parent[k]
        if p < 0 or not kf_valid[p]:
            continue
        q_rel_old, t_rel_old = _rel_se3(q_before[k], t_before[k],
                                        q_before[p], t_before[p])
        q_rel_new, t_rel_new = _rel_se3(q_after[k], t_after[k],
                                        q_after[p], t_after[p])
        if np.dot(q_rel_old, q_rel_new) < 0:
            q_rel_new = -q_rel_new
        np.testing.assert_allclose(q_rel_new, q_rel_old, atol=1e-5)
        np.testing.assert_allclose(t_rel_new, t_rel_old, atol=1e-4)
        caught += 1
    assert caught >= 1


def test_background_gba_abort_is_noop():
    sys_, aid, poses, states = run_slam(n_frames=40)
    map_id = sys_.agents[aid].map_id
    q0 = np.asarray(sys_.ms.kf_q).copy()
    t0 = np.asarray(sys_.ms.kf_t).copy()

    gba = BackgroundGBA(sys_)
    gba.start(map_id)
    gba.abort()
    assert not gba.running
    np.testing.assert_array_equal(np.asarray(sys_.ms.kf_q), q0)
    np.testing.assert_array_equal(np.asarray(sys_.ms.kf_t), t0)


def test_server_async_gba_config_path():
    """The loop-closure scenario runs with async_gba on: GBA dispatched
    by the server, harvested on later keyframes or flush, and the map
    stays consistent (reprojection of map points through their observing
    KFs stays small)."""
    from test_server_loop import RingWorld, circle_tour
    from test_slam_e2e import FX, FY, CX, CY, H, N_FEAT, W
    from mam3slam_tpu.geometry import cameras
    from mam3slam_tpu.slam.server import LoopServer, ServerConfig
    from mam3slam_tpu.slam.system import SlamConfig, SlamSystem

    world = RingWorld(seed=2)
    cam = cameras.make_pinhole(FX, FY, CX, CY)
    cfg = SlamConfig(width=W, height=H, n_feat=N_FEAT, max_kf=128,
                     max_mp=8192, n_levels=4, kf_max_interval=8,
                     min_init_matches=60)
    sys_ = SlamSystem(cfg, cam)
    aid = sys_.add_agent()
    srv = LoopServer(sys_, ServerConfig(min_kfs_in_map=10, vocab_k=8,
                                        vocab_depth=3, async_gba=True),
                     gba_device=jax.devices("cpu")[1])
    sys_.server = srv

    poses = circle_tour(230)
    for i, (R, t) in enumerate(poses):
        frame, _ = world.render(R, t)
        sys_.track(aid, frame, ts=float(i))
    srv.flush_gba()

    assert any(e.startswith("LOOP") for e in srv.events)
    assert any(e.startswith("GBA applied") for e in srv.events) or (
        srv.gba is None)
