"""Map state (SoA Atlas/KeyFrame/MapPoint) invariants."""

import numpy as np
import jax.numpy as jnp

from mam3slam_tpu.mapstate import state as S

CFG = S.MapConfig(max_kf=16, max_mp=128, n_feat=32, max_obs=8, n_levels=8)
SCALES = jnp.asarray([1.2 ** i for i in range(8)], jnp.float32)
RNG = np.random.default_rng(5)


def add_kf(ms, agent=0, map_id=0, feat_mp=None, n_valid_feat=32):
    F = CFG.n_feat
    fmp = (jnp.full((F,), -1, jnp.int32) if feat_mp is None
           else jnp.asarray(feat_mp, jnp.int32))
    fv = jnp.arange(F) < n_valid_feat
    ms, kf = S.add_keyframe(
        ms, jnp.asarray([1.0, 0, 0, 0]), jnp.zeros(3), agent, map_id, 0.0, 0,
        jnp.asarray(RNG.uniform(0, 100, (F, 2)), jnp.float32),
        jnp.zeros((F,), jnp.int32), jnp.zeros((F,), jnp.float32),
        jnp.asarray(RNG.integers(0, 255, (F, 32)), jnp.uint8), fv, fmp)
    return ms, int(kf)


def test_add_keyframe_and_observations():
    ms = S.init_map_state(CFG)
    # create 4 map points manually
    ms = ms._replace(mp_valid=ms.mp_valid.at[:4].set(True),
                     mp_map=ms.mp_map.at[:4].set(0))
    fmp = np.full(32, -1)
    fmp[0], fmp[5], fmp[9] = 0, 1, 2
    ms, kf = add_kf(ms, feat_mp=fmp)
    assert kf == 0
    assert bool(ms.kf_valid[0])
    np.testing.assert_array_equal(np.asarray(ms.kf_feat_mp[0])[[0, 5, 9]],
                                  [0, 1, 2])
    assert int(ms.mp_nobs[0]) == 1
    assert int(ms.mp_obs_kf[0, 0]) == 0
    assert int(ms.mp_obs_feat[0, 0]) == 0
    assert int(ms.mp_obs_feat[2, 0]) == 9
    assert int(ms.mp_nobs[3]) == 0


def test_covisibility_and_parent():
    ms = S.init_map_state(CFG)
    ms = ms._replace(mp_valid=ms.mp_valid.at[:10].set(True),
                     mp_map=ms.mp_map.at[:10].set(0))
    fmp1 = np.full(32, -1)
    fmp1[:6] = np.arange(6)          # kf0 sees mp 0..5
    ms, k0 = add_kf(ms, feat_mp=fmp1)
    fmp2 = np.full(32, -1)
    fmp2[:4] = np.arange(2, 6)       # kf1 shares mp 2..5 (4 points)
    ms, k1 = add_kf(ms, feat_mp=fmp2)
    assert int(ms.covis[0, 1]) == 4
    assert int(ms.covis[1, 0]) == 4
    assert int(ms.kf_parent[1]) == 0
    assert int(ms.kf_parent[0]) == -1

    idx, w, ok = S.best_covisible(ms, jnp.asarray(1), 4)
    assert int(idx[0]) == 0 and int(w[0]) == 4
    assert not bool(ok[1])


def test_alloc_slots_recycles():
    ms = S.init_map_state(CFG)
    ms = ms._replace(mp_valid=ms.mp_valid.at[:5].set(True))
    want = jnp.asarray([True, True, False, True])
    slots, granted = S.alloc_mp_slots(ms, want)
    slots = np.asarray(slots)
    assert slots[0] == 5 and slots[1] == 6 and slots[3] == 7
    assert np.asarray(granted).tolist() == [True, True, False, True]
    # kill slot 2 and realloc: should hand out 2 first
    ms = S.remove_map_points(ms, jnp.zeros(128, bool).at[2].set(True))
    slots, granted = S.alloc_mp_slots(ms, jnp.asarray([True]))
    assert int(slots[0]) == 2 and bool(granted[0])


def test_alloc_slots_overflow_drops():
    """Defined full-arena behavior: requests beyond capacity are refused
    via the granted mask instead of silently aliasing the last slot."""
    ms = S.init_map_state(CFG)
    P = ms.mp_valid.shape[0]
    ms = ms._replace(mp_valid=ms.mp_valid.at[: P - 2].set(True))
    want = jnp.ones(5, bool)
    slots, granted = S.alloc_mp_slots(ms, want)
    g = np.asarray(granted)
    assert g.tolist() == [True, True, False, False, False]
    s = np.asarray(slots)[g]
    assert sorted(s.tolist()) == [P - 2, P - 1]


def test_remove_map_points_clears_links():
    ms = S.init_map_state(CFG)
    ms = ms._replace(mp_valid=ms.mp_valid.at[:3].set(True))
    fmp = np.full(32, -1)
    fmp[1], fmp[2] = 0, 1
    ms, _ = add_kf(ms, feat_mp=fmp)
    ms = S.remove_map_points(ms, jnp.zeros(128, bool).at[0].set(True))
    assert int(ms.kf_feat_mp[0, 1]) == -1
    assert int(ms.kf_feat_mp[0, 2]) == 1
    assert not bool(ms.mp_valid[0])
    assert int(ms.mp_nobs[0]) == 0


def test_replace_and_rebuild_reverse():
    ms = S.init_map_state(CFG)
    ms = ms._replace(mp_valid=ms.mp_valid.at[:4].set(True))
    fmp0 = np.full(32, -1)
    fmp0[0] = 0
    ms, _ = add_kf(ms, feat_mp=fmp0)
    fmp1 = np.full(32, -1)
    fmp1[3] = 1
    ms, _ = add_kf(ms, feat_mp=fmp1)
    # replace mp1 -> mp0  (fuse duplicate)
    ms = S.replace_map_points(ms, jnp.asarray([1]), jnp.asarray([0]),
                              jnp.asarray([True]))
    assert int(ms.kf_feat_mp[1, 3]) == 0
    assert not bool(ms.mp_valid[1])
    ms = S.rebuild_reverse_obs(ms)
    assert int(ms.mp_nobs[0]) == 2
    pairs = {(int(ms.mp_obs_kf[0, i]), int(ms.mp_obs_feat[0, i]))
             for i in range(2)}
    assert pairs == {(0, 0), (1, 3)}


def test_refresh_mp_stats_descriptor_and_depth():
    ms = S.init_map_state(CFG)
    ms = ms._replace(mp_valid=ms.mp_valid.at[0].set(True),
                     mp_pos=ms.mp_pos.at[0].set(jnp.asarray([0, 0, 4.0])))
    fmp = np.full(32, -1)
    fmp[7] = 0
    ms, k0 = add_kf(ms, feat_mp=fmp)
    fmp2 = np.full(32, -1)
    fmp2[11] = 0
    ms, k1 = add_kf(ms, feat_mp=fmp2)
    ms = S.refresh_mp_stats(ms, jnp.zeros(128, bool).at[0].set(True), SCALES)
    # distinctive descriptor equals one of the two observation descriptors
    d = np.asarray(ms.mp_desc[0])
    d1 = np.asarray(ms.kf_feat_desc[0, 7])
    d2 = np.asarray(ms.kf_feat_desc[1, 11])
    assert (d == d1).all() or (d == d2).all()
    # depth bounds: both cams at origin, dist 4, level 0
    assert abs(float(ms.mp_max_dist[0]) - 4.0) < 1e-4
    assert abs(float(ms.mp_min_dist[0]) - 4.0 / 1.2 ** 7) < 1e-3
    # normal points from cameras (origin) to the point: +z
    np.testing.assert_allclose(np.asarray(ms.mp_normal[0]), [0, 0, 1],
                               atol=1e-5)


def test_remove_keyframe_reparents():
    ms = S.init_map_state(CFG)
    ms = ms._replace(mp_valid=ms.mp_valid.at[:8].set(True))
    f0 = np.full(32, -1)
    f0[:6] = np.arange(6)
    ms, _ = add_kf(ms, feat_mp=f0)
    f1 = np.full(32, -1)
    f1[:5] = np.arange(5)
    ms, _ = add_kf(ms, feat_mp=f1)
    f2 = np.full(32, -1)
    f2[:4] = np.arange(4)
    ms, _ = add_kf(ms, feat_mp=f2)
    assert int(ms.kf_parent[2]) in (0, 1)
    # force chain 0 <- 1 <- 2
    ms = ms._replace(kf_parent=jnp.asarray(
        [-1, 0, 1] + [-1] * 13, jnp.int32))
    ms = S.remove_keyframe(ms, jnp.asarray(1))
    assert not bool(ms.kf_valid[1])
    assert int(ms.kf_parent[2]) == 0
    assert int(ms.covis[0, 1]) == 0
    # reverse obs no longer reference kf1
    assert not (np.asarray(ms.mp_obs_kf) == 1).any()
