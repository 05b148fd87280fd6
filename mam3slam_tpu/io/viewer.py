"""Headless map / trajectory visualization.

Replaces the reference's Pangolin viewers (``src/{MapDrawer, Viewer,
AgentViewer, MultiAgentViewer}.cc`` — SURVEY.md §2.7) with a matplotlib
renderer producing PNG snapshots: map points, keyframe frusta, covisibility
edges, and per-agent trajectories — suitable for headless TPU hosts (no
GL); the reference's interactive windows don't translate to that setting.
"""

from __future__ import annotations

import numpy as np

from mam3slam_tpu.geometry import lie


def render_map(system, path: str, server=None, max_points: int = 20000):
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    ms = system.ms
    fig, ax = plt.subplots(figsize=(10, 8))
    mp_valid = np.asarray(ms.mp_valid)
    pos = np.asarray(ms.mp_pos)[mp_valid][:max_points]
    maps = np.asarray(ms.mp_map)[mp_valid][:max_points]
    if len(pos):
        ax.scatter(pos[:, 0], pos[:, 2], s=1, c=maps, cmap="tab10",
                   alpha=0.4, label="map points")

    import jax.numpy as jnp
    T_wc = lie.se3_inverse(lie.SE3(ms.kf_q, ms.kf_t))
    C = np.asarray(T_wc.t)
    kf_valid = np.asarray(ms.kf_valid)
    ax.plot(C[kf_valid, 0], C[kf_valid, 2], "k^", markersize=3,
            label="keyframes")

    # covisibility edges
    covis = np.asarray(ms.covis)
    ii, jj = np.where(np.triu(covis, 1) >= 30)
    for i, j in zip(ii[:500], jj[:500]):
        if kf_valid[i] and kf_valid[j]:
            ax.plot([C[i, 0], C[j, 0]], [C[i, 2], C[j, 2]], "g-",
                    linewidth=0.3, alpha=0.5)

    colors = ["C0", "C1", "C2", "C3", "C4", "C5"]
    for a in system.agents:
        traj = system.trajectory_world(a.agent_id)
        xs = [t[0] for _, _, t, st in traj if st == 2]
        zs = [t[2] for _, _, t, st in traj if st == 2]
        ax.plot(xs, zs, colors[a.agent_id % 6], linewidth=1,
                label=f"agent {a.agent_id}")

    ax.set_xlabel("x [m]")
    ax.set_ylabel("z [m]")
    ax.set_aspect("equal")
    ax.legend(loc="best", fontsize=8)
    ax.set_title(f"{int(kf_valid.sum())} KFs, {int(mp_valid.sum())} MPs")
    fig.savefig(path, dpi=120, bbox_inches="tight")
    plt.close(fig)
