"""Cross-agent relocalization: an agent that loses tracking relocalizes
into ANOTHER agent's map and switches to it (reference Tracking.cc:3491 —
the KF-database map filter is deliberately disabled)."""

import numpy as np
import jax.numpy as jnp
from scipy.spatial.transform import Rotation as Rsc

from mam3slam_tpu.geometry import cameras
from mam3slam_tpu.slam.server import LoopServer, ServerConfig
from mam3slam_tpu.slam.system import OK, RECENTLY_LOST, SlamConfig, SlamSystem

from test_slam_e2e import FX, FY, CX, CY, H, N_FEAT, W, SyntheticWorld
from test_server_merge import arc_trajectory
from test_atlas import empty_frame

import pytest

pytestmark = pytest.mark.slow  # full-suite tier; smoke = -m "not slow"


def test_agent_relocalizes_into_other_agents_map():
    world = SyntheticWorld(n_mp=1400, seed=9)
    cam = cameras.make_pinhole(FX, FY, CX, CY)
    cfg = SlamConfig(width=W, height=H, n_feat=N_FEAT, max_kf=96,
                     max_mp=6144, n_levels=4, kf_max_interval=10,
                     min_init_matches=60, recently_lost_frames=12)
    sys_ = SlamSystem(cfg, cam)
    a0 = sys_.add_agent()
    a1 = sys_.add_agent()
    srv = LoopServer(sys_, ServerConfig(min_kfs_in_map=4, vocab_k=8,
                                        vocab_depth=3))
    sys_.server = srv

    # agent 0 maps region around x in [0, 1.8]
    traj0 = arc_trajectory(40, start_x=0.0)
    t = 0.0
    for R, tt in traj0:
        f, _ = world.render(R, tt)
        sys_.track(a0, f, t)
        t += 1.0
    assert sys_.agents[a0].state == OK

    # agent 1 initializes its OWN map in a disjoint region (x ~ 4.5)
    traj1 = arc_trajectory(24, start_x=4.5)
    for R, tt in traj1:
        f, _ = world.render(R, tt)
        sys_.track(a1, f, t)
        t += 1.0
    assert sys_.agents[a1].state == OK
    assert sys_.agents[a1].map_id != sys_.agents[a0].map_id

    # agent 1 gets occluded, then "wakes up" inside agent 0's region
    for _ in range(3):
        sys_.track(a1, empty_frame(), t)
        t += 1.0
    assert sys_.agents[a1].state == RECENTLY_LOST
    traj_re = arc_trajectory(10, start_x=0.4)
    states = []
    for R, tt in traj_re:
        f, _ = world.render(R, tt)
        st, _ = sys_.track(a1, f, t)
        states.append(st)
        t += 1.0

    relocs = [e for e in sys_.events if e.startswith("RELOC")]
    cross = [e for e in relocs if f"-> {sys_.agents[a0].map_id}" in e]
    assert cross, (sys_.events, states)
    # agent 1 now co-tracks in agent 0's map
    assert sys_.agents[a1].map_id == sys_.agents[a0].map_id
    assert OK in states
    agents_in_map = [a.agent_id for a in sys_.agents
                     if a.map_id == sys_.agents[a0].map_id]
    assert sorted(agents_in_map) == [0, 1]
