"""Benchmark: tracked frames/s of the per-frame device pipeline on one chip.

Measures the steady-state per-frame compute of the tracking front end —
full ORB extraction (8-level pyramid, FAST score map, top-K select,
orientation, rBRIEF) on a 752x480 EuRoC-sized image, dense map-point
projection matching against a 16k-point map, and motion-only pose
optimization — as one jitted step, end to end on device.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
``vs_baseline``: the reference (CPU, per SURVEY.md §6 no absolute numbers
published) runs EuRoC mono at ~20 fps realtime budget; the driver target is
>= 3x that (BASELINE.md), so vs_baseline = fps / 60.
"""

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from mam3slam_tpu.geometry import cameras, lie
    from mam3slam_tpu.mapstate import state as S
    from mam3slam_tpu.ops import orb
    from mam3slam_tpu.slam import steps
    from mam3slam_tpu.solvers import ba

    H, W = 480, 752
    N_MP = 16384
    cfg = orb.OrbConfig(height=H, width=W, n_features=700)
    cam = cameras.make_pinhole(458.0, 458.0, 376.0, 240.0)
    sf = jnp.asarray(cfg.scales, jnp.float32)
    inv_s2 = 1.0 / sf ** 2

    rng = np.random.default_rng(0)
    # synthetic textured frames (uint8-like) and a synthetic map
    imgs = []
    base = rng.uniform(0, 255, (H, W)).astype(np.float32)
    for i in range(4):
        img = np.roll(base, i * 3, axis=1)
        imgs.append(jnp.asarray(img))

    mcfg = S.MapConfig(max_kf=8, max_mp=N_MP, n_feat=cfg.capacity)
    ms = S.init_map_state(mcfg)
    pts = np.stack([rng.uniform(-4, 4, N_MP), rng.uniform(-3, 3, N_MP),
                    rng.uniform(2, 12, N_MP)], axis=1).astype(np.float32)
    ms = ms._replace(
        mp_pos=jnp.asarray(pts),
        mp_valid=jnp.ones(N_MP, bool),
        mp_desc=jnp.asarray(rng.integers(0, 255, (N_MP, 32)), jnp.uint8),
        mp_normal=jnp.asarray(np.tile([0, 0, -1.0], (N_MP, 1)), jnp.float32),
        mp_min_dist=jnp.full((N_MP,), 0.1, jnp.float32),
        mp_max_dist=jnp.full((N_MP,), 50.0, jnp.float32),
    )

    @jax.jit
    def frame_step(ms, img, q0, t0):
        feats = orb.extract_orb(img, cfg)
        frame = steps.FrameObs(uv=feats.uv, level=feats.level,
                               angle=feats.angle, desc=feats.desc,
                               valid=feats.valid)
        feat_mp, n, visible = steps.match_map_to_frame(
            ms, frame, q0, t0, cam, float(W), float(H), ms.mp_valid, sf,
            th_radius=3.0)
        q, t, inlier, n_in = steps.track_pose(ms, frame, feat_mp, q0, t0,
                                              cam, inv_s2)
        return q, t, n_in

    q0 = lie.quat_identity()
    t0 = jnp.zeros(3)

    # Chain CHUNK sequential frames per dispatch (each frame's pose seeds
    # the next, like real tracking) so the measurement amortizes the
    # per-dispatch host->device launch overhead (~1 ms through the
    # tunneled backend) and reflects device throughput.
    CHUNK = 40
    img_chunk = jnp.stack([imgs[i % 4] for i in range(CHUNK)])

    @jax.jit
    def chunk_step(ms, img_chunk, q0, t0):
        def body(carry, img):
            q, t = carry
            q, t, n_in = frame_step(ms, img, q, t)
            return (q, t), n_in
        (q, t), n_ins = jax.lax.scan(body, (q0, t0), img_chunk)
        return q, t, jnp.sum(n_ins)

    # warmup/compile — force a VALUE fetch: on the tunneled axon backend
    # block_until_ready is a no-op, only a D2H read truly synchronizes
    q, t, n_in = chunk_step(ms, img_chunk, q0, t0)
    _ = float(jnp.sum(t))

    n_iter = 6
    start = time.perf_counter()
    for _ in range(n_iter):
        q, t, n_in = chunk_step(ms, img_chunk, q0, t0)
    _ = float(jnp.sum(t)) + float(n_in)  # sync on the last result
    dt = time.perf_counter() - start
    fps = n_iter * CHUNK / dt

    print(json.dumps({
        "metric": "tracking_frontend_fps",
        "value": round(fps, 2),
        "unit": "frames/s (752x480, 700 ORB feats, 16k-pt map, 1 chip)",
        "vs_baseline": round(fps / 60.0, 3),
    }))


if __name__ == "__main__":
    main()
