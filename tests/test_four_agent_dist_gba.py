"""Four-agent run with concurrent merges + distributed global BA over the
8-device mesh (BASELINE config 5, single-host virtual form)."""

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from mam3slam_tpu.geometry import cameras
from mam3slam_tpu.parallel import dist_ba
from mam3slam_tpu.slam import steps
from mam3slam_tpu.slam.server import LoopServer, ServerConfig
from mam3slam_tpu.slam.system import OK, SlamConfig, SlamSystem
from mam3slam_tpu.solvers import ba as ba_mod

from test_slam_e2e import (FX, FY, CX, CY, H, N_FEAT, W, SyntheticWorld)
from test_server_merge import arc_trajectory

import pytest

pytestmark = pytest.mark.slow  # full-suite tier; smoke = -m "not slow"


def test_four_agents_merge_and_distributed_gba():
    world = SyntheticWorld(n_mp=2000, seed=11)
    cam = cameras.make_pinhole(FX, FY, CX, CY)
    cfg = SlamConfig(width=W, height=H, n_feat=N_FEAT, max_kf=160,
                     max_mp=10240, n_levels=4, kf_max_interval=10,
                     min_init_matches=60)
    sys_ = SlamSystem(cfg, cam)
    srv = LoopServer(sys_, ServerConfig(min_kfs_in_map=4, vocab_k=8,
                                        vocab_depth=3))
    sys_.server = srv
    aids = [sys_.add_agent() for _ in range(4)]

    # four overlapping strips of one world
    starts = [0.0, 1.1, 2.2, 3.3]
    trajs = [arc_trajectory(64, start_x=s) for s in starts]

    t_i = 0.0
    for a, traj in zip(aids, trajs):
        for i in range(64):
            f, _ = world.render(*traj[i])
            sys_.track(a, f, t_i)
            t_i += 1.0

    merges = [e for e in srv.events if e.startswith("MERGE")]
    assert len(merges) >= 3, srv.events  # all four maps fused
    kfm = np.asarray(sys_.ms.kf_map)[np.asarray(sys_.ms.kf_valid)]
    assert len(np.unique(kfm)) == 1
    final_map = int(kfm[0])
    assert sorted(a.map_id for a in sys_.agents) == [final_map] * 4

    # --- distributed GBA over the merged map on the 8-device mesh
    ms = sys_.ms
    in_map = ms.kf_valid & (ms.kf_map == final_map)
    anchor = jnp.argmax(in_map)
    opt_mask = in_map.at[anchor].set(False)
    prob = steps.build_local_ba_problem(
        ms, opt_mask, jnp.asarray(cfg.inv_sigma2))

    local = ba_mod.run_ba(prob, cameras.PINHOLE, iters=6, cg_iters=30)
    mesh = Mesh(np.array(jax.devices()[:8]), ("edge",))
    dist = dist_ba.dist_run_ba(prob, mesh, cameras.PINHOLE, iters=6,
                               cg_iters=30)

    # distributed == local (same control flow; f32 reduction-order noise)
    np.testing.assert_allclose(np.asarray(dist.cam_t),
                               np.asarray(local.cam_t), atol=1e-2)
    assert float(dist.cost) <= float(ba_mod.ba_cost_and_inliers(
        prob, cameras.PINHOLE)[0]) * 1.001  # did not degrade
