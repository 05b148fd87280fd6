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
    """3D map snapshot written to ``path`` (PNG)."""
    import matplotlib
    matplotlib.use("Agg")

    fig = _map_figure(system, server=server, max_points=max_points)
    fig.savefig(path, dpi=120, bbox_inches="tight")
    import matplotlib.pyplot as plt
    plt.close(fig)


def draw_map_image(system, server=None, max_points: int = 20000,
                   figsize=(7, 5.6), dpi: int = 80) -> np.ndarray:
    """The 3D map view as a BGR ndarray — the live MapDrawer window's
    headless twin (reference src/MapDrawer.cc:1-419 renders points, KF
    frusta, covisibility graph and trajectories continuously;
    ``MjpegServer`` streams this image at ~1 Hz on ``/map``)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig = _map_figure(system, server=server, max_points=max_points,
                      figsize=figsize)
    fig.set_dpi(dpi)
    fig.canvas.draw()
    buf = np.asarray(fig.canvas.buffer_rgba())[..., :3].copy()
    plt.close(fig)
    return buf[..., ::-1]  # RGB -> BGR for the cv2/MJPEG pipeline


def _map_figure(system, server=None, max_points: int = 20000,
                figsize=(10, 8)):
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    ms = system.ms
    fig, ax = plt.subplots(figsize=figsize)
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
    return fig


_STATE_TEXT = {0: "WAITING FOR IMAGES", 1: "TRYING TO INITIALIZE",
               2: "SLAM", 3: "RECENTLY LOST", 4: "LOST"}


def draw_tracking_frame(system, agent_id: int,
                        image: np.ndarray) -> np.ndarray:
    """Annotated per-frame tracking image (the reference FrameDrawer,
    src/FrameDrawer.cc:1-489): keypoints drawn colored by match state —
    green square+dot for features tracking a map point (inlier of the
    last pose optimization), blue dot for extracted-but-unmatched — plus
    the state banner with map statistics.  Returns the BGR image (the
    live viewers stream it; ``render_tracking_frame`` writes it)."""
    import cv2

    a = system.agents[agent_id]
    img = np.asarray(image, np.float32)
    bgr = cv2.cvtColor(np.clip(img, 0, 255).astype(np.uint8),
                       cv2.COLOR_GRAY2BGR)
    n_tracked = 0
    if a.last_frame is not None:
        uv = np.asarray(a.last_frame.uv)
        valid = np.asarray(a.last_frame.valid)
        fmp = (np.asarray(a.last_feat_mp)
               if a.last_feat_mp is not None
               else np.full(len(uv), -1, np.int32))
        for i in np.flatnonzero(valid):
            x, y = int(round(uv[i, 0])), int(round(uv[i, 1]))
            if not (0 <= x < bgr.shape[1] and 0 <= y < bgr.shape[0]):
                continue
            if fmp[i] >= 0:
                cv2.rectangle(bgr, (x - 3, y - 3), (x + 3, y + 3),
                              (0, 200, 0), 1)
                cv2.circle(bgr, (x, y), 1, (0, 200, 0), -1)
                n_tracked += 1
            else:
                cv2.circle(bgr, (x, y), 1, (200, 120, 0), -1)

    ms = system.ms
    n_kf = int(np.asarray(ms.kf_valid).sum())
    n_mp = int(np.asarray(ms.mp_valid).sum())
    state = _STATE_TEXT.get(a.state, "?")
    banner = (f"{state} | agent {agent_id} map {a.map_id} | "
              f"KFs: {n_kf}  MPs: {n_mp}  matches: {n_tracked}")
    bar = np.zeros((22, bgr.shape[1], 3), np.uint8)
    cv2.putText(bar, banner, (6, 15), cv2.FONT_HERSHEY_SIMPLEX, 0.45,
                (255, 255, 255), 1, cv2.LINE_AA)
    return np.concatenate([bgr, bar], axis=0)


def render_tracking_frame(system, agent_id: int, image: np.ndarray,
                          path: str):
    """``draw_tracking_frame`` written to disk as PNG (headless use)."""
    import cv2

    cv2.imwrite(path, draw_tracking_frame(system, agent_id, image))
