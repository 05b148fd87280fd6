"""Persistent loop/merge edges in the essential graph (VERDICT round-1
missing #3): storage, inclusion in later PGOs, protection from culling,
successive-loop consistency, and vectorized edge assembly at K=512.

Reference: KeyFrame::AddLoopEdge / GetLoopEdges (include/KeyFrame.h:244-248)
fed into Optimizer::OptimizeEssentialGraph (src/Optimizer.cc:1652-1676).
"""

import time

import numpy as np
import jax.numpy as jnp

from mam3slam_tpu.geometry import cameras, lie
from mam3slam_tpu.mapstate import state as S
from mam3slam_tpu.slam.server import LoopServer, ServerConfig
from mam3slam_tpu.slam.system import OK, SlamConfig, SlamSystem

from test_slam_e2e import FX, FY, CX, CY, H, N_FEAT, W, umeyama_align
from test_server_loop import RingWorld, circle_tour

import pytest

pytestmark = pytest.mark.slow  # full-suite tier; smoke = -m "not slow"


def test_add_remove_loop_edges():
    cfg = S.MapConfig(max_kf=8, max_mp=64, n_feat=8, max_obs=4,
                      max_loop_edges=4)
    ms = S.init_map_state(cfg)
    ms = ms._replace(kf_valid=ms.kf_valid.at[:5].set(True))
    ms = S.add_loop_edge(ms, 0, 3)
    ms = S.add_loop_edge(ms, 1, 4)
    assert int(ms.loop_valid.sum()) == 2
    assert int(ms.loop_i[0]) == 0 and int(ms.loop_j[0]) == 3
    # removing an endpoint KF drops its edges
    ms = S.remove_keyframe(ms, jnp.asarray(4))
    assert int(ms.loop_valid.sum()) == 1
    assert int(ms.loop_i[0]) == 0


def test_historical_edges_enter_pgo():
    """A stored loop edge from an earlier closure appears in the edge set
    of a later PGO (with relative-pose measurement at current estimates)."""
    cam = cameras.make_pinhole(FX, FY, CX, CY)
    cfg = SlamConfig(width=W, height=H, n_feat=N_FEAT, max_kf=16,
                     max_mp=1024, n_levels=4)
    sys_ = SlamSystem(cfg, cam)
    srv = LoopServer(sys_, ServerConfig())
    rng = np.random.default_rng(0)
    K = 10
    kf_q = np.tile([1.0, 0, 0, 0], (cfg.max_kf, 1)).astype(np.float32)
    kf_t = np.zeros((cfg.max_kf, 3), np.float32)
    kf_t[:K, 0] = np.arange(K) * 0.3
    ms = sys_.ms._replace(
        kf_q=jnp.asarray(kf_q), kf_t=jnp.asarray(kf_t),
        kf_valid=sys_.ms.kf_valid.at[:K].set(True),
        kf_seq=sys_.ms.kf_seq.at[:K].set(jnp.arange(K)),
        kf_map=sys_.ms.kf_map.at[:K].set(0),
        kf_parent=sys_.ms.kf_parent.at[1:K].set(jnp.arange(K - 1)),
    )
    ms = S.add_loop_edge(ms, 2, 7)   # historical edge from an old closure
    sys_.ms = ms
    in_map = np.zeros(cfg.max_kf, bool)
    in_map[:K] = True
    S_corr = lie.Sim3(jnp.asarray([1.0, 0, 0, 0]),
                      jnp.asarray([0.1, 0, 0.0]), jnp.asarray(1.0))
    edges = srv._essential_edges(ms, 9, 0, S_corr, in_map)
    ei = np.asarray(edges.i)
    ej = np.asarray(edges.j)
    pairs = set(zip(ei.tolist(), ej.tolist()))
    assert (2, 7) in pairs                      # historical loop edge
    assert (0, 9) in pairs                      # the new loop edge
    for k in range(1, K):                       # spanning tree complete
        assert (k - 1, k) in pairs
    # measurement of the historical edge = rel pose at current estimates
    idx = [i for i, p in enumerate(zip(ei, ej)) if tuple(p) == (2, 7)][0]
    np.testing.assert_allclose(np.asarray(edges.t)[idx],
                               [0.3 * 5, 0, 0], atol=1e-5)
    np.testing.assert_allclose(np.asarray(edges.s)[idx], 1.0, atol=1e-6)


def test_double_loop_closure_stays_consistent():
    """Two revolutions => two loop closures; the second PGO must keep the
    first loop closed (persistent loop edge), and final ATE stays ~1%."""
    world = RingWorld(seed=3)
    cam = cameras.make_pinhole(FX, FY, CX, CY)
    cfg = SlamConfig(width=W, height=H, n_feat=N_FEAT, max_kf=192,
                     max_mp=10240, n_levels=4, kf_max_interval=8,
                     min_init_matches=60)
    sys_ = SlamSystem(cfg, cam)
    aid = sys_.add_agent()
    srv = LoopServer(sys_, ServerConfig(min_kfs_in_map=10, vocab_k=8,
                                        vocab_depth=3))
    sys_.server = srv

    n_frames = 440  # ~2.1 revolutions
    poses = circle_tour(n_frames, frac=2.12)
    states = []
    for i, (R, t) in enumerate(poses):
        f, _ = world.render(R, t)
        st, _ = sys_.track(aid, f, float(i))
        states.append(st)

    loops = [e for e in srv.events if e.startswith("LOOP")]
    assert len(loops) >= 2, f"expected >=2 loop closures; {srv.events}"
    assert int(sys_.ms.loop_valid.sum()) >= 2

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
    assert ate < 0.4, ate  # circumference ~31 m -> ~1.3%


def test_edge_assembly_is_fast_at_k512():
    """Edge assembly for a full 512-KF arena with a dense covis band must
    run in well under a second (round-1 weakness: O(K^2) host loop took
    minutes)."""
    cam = cameras.make_pinhole(FX, FY, CX, CY)
    cfg = SlamConfig(width=W, height=H, n_feat=64, max_kf=512,
                     max_mp=512, n_levels=4)
    sys_ = SlamSystem(cfg, cam)
    srv = LoopServer(sys_, ServerConfig())
    K = 512
    rng = np.random.default_rng(0)
    covis = np.zeros((K, K), np.int32)
    for d in range(1, 6):  # banded covisibility, ~5 strong edges per KF
        idx = np.arange(K - d)
        covis[idx, idx + d] = 150
        covis[idx + d, idx] = 150
    ms = sys_.ms._replace(
        kf_valid=jnp.ones(K, bool),
        kf_seq=jnp.arange(K, dtype=jnp.int32),
        kf_map=jnp.zeros(K, jnp.int32),
        kf_parent=jnp.concatenate([jnp.asarray([-1], jnp.int32),
                                   jnp.arange(K - 1, dtype=jnp.int32)]),
        kf_t=jnp.asarray(rng.normal(0, 1, (K, 3)), jnp.float32),
        covis=jnp.asarray(covis),
    )
    ms = S.add_loop_edge(ms, 3, 400)
    sys_.ms = ms
    in_map = np.ones(K, bool)
    S_corr = lie.Sim3(jnp.asarray([1.0, 0, 0, 0]), jnp.zeros(3),
                      jnp.asarray(1.0))
    srv._essential_edges(ms, 511, 0, S_corr, in_map)  # warm up jit
    t0 = time.perf_counter()
    edges = srv._essential_edges(ms, 511, 0, S_corr, in_map)
    np.asarray(edges.q)  # force materialization
    dt = time.perf_counter() - t0
    assert edges.i.shape[0] > 2500
    assert dt < 1.0, f"edge assembly took {dt:.3f}s"
