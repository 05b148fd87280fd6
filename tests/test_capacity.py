"""Capacity-limit behaviors: loud failure / defined overflow instead of
the silent jit-scatter drops flagged in round 1 (VERDICT items 5, 7).

* atlas map slots recycle after merges; exhaustion raises MapCapacityError
* keyframe arena exhaustion raises MapCapacityError before corruption
* keyframe slots freed by culling are recycled (kf_seq keeps identity)
* map-point arena overflow drops triangulations and counts them
"""

import numpy as np
import pytest
import jax.numpy as jnp

from mam3slam_tpu.geometry import cameras
from mam3slam_tpu.mapstate import state as S
from mam3slam_tpu.slam.system import (MapCapacityError, SlamConfig,
                                      SlamSystem)

from test_slam_e2e import FX, FY, CX, CY, H, N_FEAT, W, SyntheticWorld, \
    make_trajectory

pytestmark = pytest.mark.slow  # full-suite tier; smoke = -m "not slow"


def small_system(max_kf=8, max_mp=512, max_maps=None, **kw):
    cam = cameras.make_pinhole(FX, FY, CX, CY)
    cfg = SlamConfig(width=W, height=H, n_feat=N_FEAT, max_kf=max_kf,
                     max_mp=max_mp, n_levels=4, min_init_matches=60, **kw)
    sys_ = SlamSystem(cfg, cam)
    if max_maps is not None:
        mv = jnp.zeros((max_maps,), bool)
        sys_.ms = sys_.ms._replace(map_valid=mv,
                                   map_change=jnp.zeros((max_maps,),
                                                        jnp.int32))
    return sys_


def test_map_id_allocator_exhausts_loudly():
    sys_ = small_system(max_maps=3)
    a0 = sys_.add_agent()   # map 0
    a1 = sys_.add_agent()   # map 1
    a2 = sys_.add_agent()   # map 2
    with pytest.raises(MapCapacityError):
        sys_.add_agent()


def test_map_id_allocator_recycles_freed_slots():
    sys_ = small_system(max_maps=4)
    aid = sys_.add_agent()  # map 0
    # simulate: agent abandons map 0 (stays valid in the atlas), spawns 1
    sys_.ms = sys_.ms._replace(map_valid=sys_.ms.map_valid.at[0].set(True))
    sys_._create_map_in_atlas(sys_.agents[aid])
    assert sys_.agents[aid].map_id == 1
    # map 1 never initialized; a merge frees map 0
    sys_.ms = sys_.ms._replace(map_valid=sys_.ms.map_valid.at[0].set(False))
    sys_._create_map_in_atlas(sys_.agents[aid])
    assert sys_.agents[aid].map_id == 0  # recycled


def test_kf_arena_exhaustion_raises():
    sys_ = small_system(max_kf=8)
    sys_.add_agent()
    sys_.ms = sys_.ms._replace(kf_valid=jnp.ones(8, bool))
    with pytest.raises(MapCapacityError):
        sys_._kf_capacity_check(1)
    # one slot free but init needs two
    sys_.ms = sys_.ms._replace(
        kf_valid=sys_.ms.kf_valid.at[3].set(False))
    sys_._kf_capacity_check(1)
    with pytest.raises(MapCapacityError):
        sys_._kf_capacity_check(2)


def test_kf_arena_tiny_run_stays_bounded():
    """Driving a tiny arena either stays within capacity (culling keeps
    up) or fails loudly — never silent slot-0 corruption."""
    world = SyntheticWorld(seed=0)
    sys_ = small_system(max_kf=6, kf_max_interval=1, kf_min_interval=1)
    aid = sys_.add_agent()
    traj = make_trajectory(60)
    try:
        for i, (R, t) in enumerate(traj):
            frame, _ = world.render(R, t)
            sys_.track(aid, frame, float(i))
    except MapCapacityError:
        pass
    assert int(np.asarray(sys_.ms.kf_valid).sum()) <= 6
    # slot 0 must still be the map anchor created at init (seq 0) unless
    # it was legitimately culled — it must never hold a clobbered pose
    seqs = np.asarray(sys_.ms.kf_seq)[np.asarray(sys_.ms.kf_valid)]
    assert len(seqs) == len(set(seqs.tolist()))  # identities unique


def test_kf_slot_recycling_preserves_identity():
    cfg = S.MapConfig(max_kf=4, max_mp=64, n_feat=8, max_obs=4)
    ms = S.init_map_state(cfg)

    def add(ms, x):
        F = cfg.n_feat
        return S.add_keyframe(
            ms, jnp.asarray([1.0, 0, 0, 0]), jnp.asarray([x, 0.0, 0.0]),
            0, 0, 0.0, 0, jnp.zeros((F, 2)), jnp.zeros(F, jnp.int32),
            jnp.zeros(F), jnp.zeros((F, 32), jnp.uint8),
            jnp.zeros(F, bool), jnp.full((F,), -1, jnp.int32))

    ms, k0 = add(ms, 0.0)
    ms, k1 = add(ms, 1.0)
    ms, k2 = add(ms, 2.0)
    assert [int(k0), int(k1), int(k2)] == [0, 1, 2]
    ms = S.remove_keyframe(ms, jnp.asarray(1))
    ms, k3 = add(ms, 3.0)
    assert int(k3) == 1                      # slot recycled
    assert int(ms.kf_seq[1]) == 3            # but identity is new
    assert int(ms.n_kf) == 4                 # insertion counter monotonic
    assert float(ms.kf_t[1, 0]) == 3.0
    # creation-order queries use kf_seq, not slots
    seqs = np.asarray(ms.kf_seq)[np.asarray(ms.kf_valid)]
    assert sorted(seqs.tolist()) == [0, 2, 3]


def test_mp_arena_overflow_drops_and_counts():
    world = SyntheticWorld(n_mp=1200, seed=1)
    sys_ = small_system(max_kf=32, max_mp=192)
    aid = sys_.add_agent()
    traj = make_trajectory(30)
    for i, (R, t) in enumerate(traj):
        frame, _ = world.render(R, t)
        sys_.track(aid, frame, float(i))
    # arena never over-filled, and the drops were counted + logged
    assert int(np.asarray(sys_.ms.mp_valid).sum()) <= 192
    if sys_.mp_dropped:
        assert any(e.startswith("MP_ARENA_FULL") for e in sys_.events)
