"""Atlas checkpoint/resume: save mid-run, reload into a fresh system,
continue tracking seamlessly (incl. relocalization via restored BoW)."""

import numpy as np
import jax.numpy as jnp

from mam3slam_tpu.geometry import cameras
from mam3slam_tpu.mapstate import checkpoint
from mam3slam_tpu.slam.server import LoopServer, ServerConfig
from mam3slam_tpu.slam.system import OK, SlamConfig, SlamSystem

from test_slam_e2e import (FX, FY, CX, CY, H, N_FEAT, W, SyntheticWorld)
from test_server_merge import arc_trajectory

import pytest

pytestmark = pytest.mark.slow  # full-suite tier; smoke = -m "not slow"


def _cfg():
    return SlamConfig(width=W, height=H, n_feat=N_FEAT, max_kf=64,
                      max_mp=4096, n_levels=4, kf_max_interval=10,
                      min_init_matches=60)


def test_checkpoint_roundtrip_and_resume(tmp_path):
    world = SyntheticWorld(n_mp=900, seed=6)
    cam = cameras.make_pinhole(FX, FY, CX, CY)
    sys1 = SlamSystem(_cfg(), cam)
    aid = sys1.add_agent()
    srv1 = LoopServer(sys1, ServerConfig(min_kfs_in_map=4, vocab_k=8,
                                         vocab_depth=3))
    sys1.server = srv1
    traj = arc_trajectory(60)
    for i in range(35):
        f, _ = world.render(*traj[i])
        sys1.track(aid, f, float(i))
    assert sys1.agents[aid].state == OK
    n_kf1 = int(np.asarray(sys1.ms.kf_valid).sum())
    n_mp1 = int(np.asarray(sys1.ms.mp_valid).sum())

    path = str(tmp_path / "atlas.npz")
    checkpoint.save_atlas(sys1, path, server=srv1)

    # fresh process equivalent: new system + server, restore
    sys2 = SlamSystem(_cfg(), cam)
    srv2 = LoopServer(sys2, ServerConfig(min_kfs_in_map=4, vocab_k=8,
                                         vocab_depth=3))
    sys2.server = srv2
    checkpoint.load_atlas(sys2, path, server=srv2)

    assert int(np.asarray(sys2.ms.kf_valid).sum()) == n_kf1
    assert int(np.asarray(sys2.ms.mp_valid).sum()) == n_mp1
    np.testing.assert_array_equal(np.asarray(sys2.ms.kf_q),
                                  np.asarray(sys1.ms.kf_q))
    assert srv2.voc is not None
    a2 = sys2.agents[aid]
    assert a2.state == OK and a2.ref_kf == sys1.agents[aid].ref_kf

    # resumed system keeps tracking the same world
    states = []
    for i in range(35, 55):
        f, _ = world.render(*traj[i])
        st, _ = sys2.track(aid, f, float(i))
        states.append(st)
    assert np.mean([s == OK for s in states]) > 0.9, states
    assert int(np.asarray(sys2.ms.kf_valid).sum()) > n_kf1  # map grew
