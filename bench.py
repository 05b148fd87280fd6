"""Benchmark: whole-system throughput of the SLAM pipeline on one chip.

Primary metric (comparable across rounds): tracked frames/s of the
per-frame device pipeline — full ORB extraction (8-level pyramid, FAST
score map, top-K select, orientation, rBRIEF) on a 752x480 EuRoC-sized
image, dense map-point projection matching against a 16k-point map, and
motion-only pose optimization — as one jitted step, end to end on device.

``extra`` carries the back-end stage timings (VERDICT round-1 item 5):
per-KF mapping step (triangulate + fuse + windowed LBA on a realistic
64-KF/12k-point arena — the reference's hottest path,
src/LocalMapping.cc:168), essential-graph PGO at K=256, full-map GBA, the
amortized full-system fps at the reference KF cadence (1 KF / 8 frames),
and an MXU speed-of-light probe for the Hamming-matmul matcher core.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "extra"}.
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

    extra = backend_stage_bench()
    # full-system fps: tracking front end + per-KF mapping amortized at
    # the reference cadence of ~1 KF per 8 frames (server PR cost rides
    # the mapping epoch)
    t_frame = 1.0 / fps
    t_kf = extra["mapping_kf_ms"] / 1000.0
    extra["fps_full_system"] = round(1.0 / (t_frame + t_kf / 8.0), 2)

    print(json.dumps({
        "metric": "tracking_frontend_fps",
        "value": round(fps, 2),
        "unit": "frames/s (752x480, 700 ORB feats, 16k-pt map, 1 chip)",
        "vs_baseline": round(fps / 60.0, 3),
        "extra": extra,
    }))


def _sync(x):
    import jax
    return float(jax.numpy.sum(jax.tree_util.tree_leaves(x)[0]))


def _time_it(fn, n=3):
    import time
    fn()  # warmup/compile
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    _sync(out)
    return (time.perf_counter() - t0) / n * 1000.0


def _synthetic_arena(n_kf=64, n_pt=12288, n_feat=512, seed=0):
    """A realistic mid-run MapState: n_kf keyframes on an orbit inside a
    shell of n_pt points, full observation wiring (feat_mp + reverse obs +
    covisibility), half the features left unmatched so triangulation has
    real work.  Built with the system's own insertion functions."""
    import jax.numpy as jnp
    from mam3slam_tpu.geometry import cameras, lie
    from mam3slam_tpu.mapstate import state as S
    from mam3slam_tpu.slam.system import SlamConfig, _compiled

    rng = np.random.default_rng(seed)
    cfg = SlamConfig(width=752, height=480, n_feat=n_feat, max_kf=max(
        n_kf * 2, 128), max_mp=n_pt * 2, n_levels=4)
    cam = cameras.make_pinhole(458.0, 458.0, 376.0, 240.0)
    fns = _compiled(cfg, cam.kind)

    # points on a shell around the orbit
    th = rng.uniform(0, 2 * np.pi, n_pt)
    r = rng.uniform(4.0, 5.0, n_pt)
    pts = np.stack([r * np.cos(th), rng.uniform(-1.5, 1.5, n_pt),
                    r * np.sin(th)], axis=1).astype(np.float32)
    desc = rng.integers(0, 256, (n_pt, 32), dtype=np.uint8)

    ms = S.init_map_state(cfg.map_config())
    ms = ms._replace(
        mp_pos=jnp.asarray(np.pad(pts, ((0, n_pt), (0, 0)))),
        mp_valid=jnp.arange(2 * n_pt) < n_pt,
        mp_map=jnp.zeros(2 * n_pt, jnp.int32),
        mp_desc=jnp.asarray(np.pad(desc, ((0, n_pt), (0, 0)))),
        mp_min_dist=jnp.full(2 * n_pt, 0.1, jnp.float32),
        mp_max_dist=jnp.full(2 * n_pt, 50.0, jnp.float32),
        map_valid=ms.map_valid.at[0].set(True))

    K = cam.K()
    fx, fy, cx, cy = 458.0, 458.0, 376.0, 240.0
    for k in range(n_kf):
        ang = 2 * np.pi * k / n_kf
        c, s = np.cos(ang), np.sin(ang)
        C = np.array([2.5 * c, 0.0, 2.5 * s], np.float32)
        # rows: x=tangent, y=down, z=outward radial — det(R)=+1 (a
        # reflection here would make the stored quaternions disagree with
        # the synthesized uv and turn every BA edge into an outlier)
        R = np.stack([np.array([s, 0.0, -c]), np.array([0.0, 1.0, 0.0]),
                      np.array([c, 0.0, s])]).astype(np.float32)
        t = (-R @ C).astype(np.float32)
        pc = pts @ R.T + t
        u = fx * pc[:, 0] / pc[:, 2] + cx
        v = fy * pc[:, 1] / pc[:, 2] + cy
        vis = (pc[:, 2] > 0.2) & (u >= 0) & (u < 752) & (v >= 0) & (v < 480)
        cand = np.flatnonzero(vis)
        rng.shuffle(cand)
        sel = cand[:n_feat]
        F = n_feat
        uv = np.zeros((F, 2), np.float32)
        uv[:len(sel)] = np.stack([u[sel], v[sel]], 1)
        uv += rng.normal(0, 0.3, uv.shape).astype(np.float32)
        fvalid = np.arange(F) < len(sel)
        fmp = np.full(F, -1, np.int32)
        # half matched (observations), half free (triangulation work)
        half = len(sel) // 2
        fmp[:half] = sel[:half]
        fdesc = np.zeros((F, 32), np.uint8)
        fdesc[:len(sel)] = desc[sel]
        q = lie.quat_from_matrix(jnp.asarray(R))
        ms, kf = S.add_keyframe(
            ms, q, jnp.asarray(t), jnp.asarray(0), jnp.asarray(0),
            jnp.asarray(float(k), jnp.float32), jnp.asarray(k),
            jnp.asarray(uv), jnp.zeros(F, jnp.int32),
            jnp.zeros(F, jnp.float32), jnp.asarray(fdesc),
            jnp.asarray(fvalid), jnp.asarray(fmp),
            cam_params=cam.params)
        ms = S.update_covis_for_kf(ms, kf)
    ms = S.rebuild_reverse_obs(ms)
    ms = ms._replace(
        mp_first_agent=jnp.zeros(2 * n_pt, jnp.int32),
        mp_first_agent_kf=jnp.zeros(2 * n_pt, jnp.int32),
        mp_nobs=jnp.where(jnp.arange(2 * n_pt) < n_pt, 8, 0))
    return ms, cfg, cam, fns


def backend_stage_bench():
    """Per-stage back-end timings on realistic shapes (VERDICT item 5)."""
    import jax
    import jax.numpy as jnp
    from mam3slam_tpu.geometry import lie
    from mam3slam_tpu.solvers import pgo as pgo_mod

    out = {}
    ms, cfg, cam, fns = _synthetic_arena()
    kf = 63  # newest
    neighbor = 62

    from mam3slam_tpu.mapstate import state as S
    nb_idx, nb_w, nb_ok = S.best_covisible(ms, jnp.asarray(kf), 8)
    out["triangulate8_ms"] = round(_time_it(
        lambda: fns["triangulate_multi_step"](ms, jnp.asarray(kf), nb_idx,
                                              nb_ok, jnp.asarray(0))[0]), 2)
    local_mask = fns["local_mp_mask"](ms, jnp.asarray(kf), 16)
    out["fuse_ms"] = round(_time_it(
        lambda: fns["fuse_step"](ms, jnp.asarray(kf), local_mask)[0]), 2)
    out["lba_ms"] = round(_time_it(
        lambda: fns["local_ba"](ms, jnp.asarray(kf)), n=2), 2)
    # the per-KF mapping epoch: cull + triangulate(8 neighbors) + compact
    # stat refresh + fuse + windowed LBA, ONE fused device program
    # (slam/system.py mapping_epoch) plus the batched KF-redundancy
    # dispatch — exactly what _local_mapping runs per inserted keyframe
    def _epoch():
        res = fns["mapping_epoch"](ms, jnp.asarray(kf), jnp.asarray(0))
        fr, nt = fns["kf_redundancy_batch"](res[0], res[5], res[6])
        return fr
    out["mapping_kf_ms"] = round(_time_it(_epoch, n=3), 2)
    out["gba_ms"] = round(_time_it(
        lambda: fns["global_ba"](ms, jnp.asarray(0)), n=2), 2)

    # essential-graph PGO at K=256 (reference OptimizeEssentialGraph)
    Kp = 256
    rng = np.random.default_rng(1)
    ang = np.linspace(0, 2 * np.pi, Kp, endpoint=False)
    qs, ts = [], []
    for a in ang:
        c, s = np.cos(a), np.sin(a)
        R = np.stack([np.array([s, 0.0, -c]), np.array([0.0, 1.0, 0.0]),
                      np.array([c, 0.0, s])]).astype(np.float32)
        C = np.array([2.5 * c, 0.0, 2.5 * s], np.float32)
        qs.append(np.asarray(lie.quat_from_matrix(jnp.asarray(R))))
        ts.append(-R @ C)
    q = jnp.asarray(np.stack(qs))
    t = jnp.asarray(np.stack(ts) + rng.normal(0, 0.05, (Kp, 3)))
    s = jnp.ones(Kp)
    # chain + skip-2 covis edges + 1 loop edge
    ei = np.r_[np.arange(Kp - 1), np.arange(Kp - 2), [0]]
    ej = np.r_[np.arange(1, Kp), np.arange(2, Kp), [Kp - 1]]
    qrel = []
    trel = []
    for i, j in zip(ei, ej):
        qi, ti_ = qs[i], ts[i]
        qj, tj = qs[j], ts[j]
        qr = np.asarray(lie.quat_mul(jnp.asarray(qj), lie.quat_conj(
            jnp.asarray(qi))))
        qrel.append(qr)
        trel.append(tj - np.asarray(lie.quat_rotate(jnp.asarray(qr),
                                                    jnp.asarray(ti_))))
    edges = pgo_mod.PGOEdges(
        i=jnp.asarray(ei, jnp.int32), j=jnp.asarray(ej, jnp.int32),
        q=jnp.asarray(np.stack(qrel)), t=jnp.asarray(np.stack(trel)),
        s=jnp.ones(len(ei)), w=jnp.ones(len(ei)),
        valid=jnp.ones(len(ei), bool))
    fixed = jnp.zeros(Kp, bool).at[0].set(True)
    pgo_fn = jax.jit(lambda: pgo_mod.optimize_essential_graph(
        q, t, s, fixed, edges, iters=20))
    out["pgo256_ms"] = round(_time_it(pgo_fn, n=2), 2)

    # ---- roofline probes (VERDICT r2 #6): amortized ON-CHIP kernel
    # timings — each probe scan-chains CHAIN dependent iterations inside
    # one jitted program, so per-dispatch latency (~1.7 ms through the
    # tunneled backend, measured) amortizes away and the number reflects
    # device throughput.  v5e peaks: ~197 TFLOP/s bf16 MXU, ~819 GB/s HBM.
    CHAIN = 32
    V5E_BF16_TFLOPS = 197.0

    # (1) Hamming bit-matmul at matcher shape [Q=768, D=256] x [M=16384,
    # D=256] -> min-reduce.  The matcher's real pipeline fuses the
    # min-reduction, so the 50 MB distance matrix never round-trips HBM:
    # traffic ~8.8 MB/iter, 6.4 GFLOP/iter => compute-bound on the MXU
    # (arithmetic intensity ~730 flop/byte >> ridge ~240).
    rngb = np.random.default_rng(2)
    a = jnp.asarray(rngb.integers(0, 2, (768, 256)).astype(np.float32),
                    jnp.bfloat16)
    b = jnp.asarray(rngb.integers(0, 2, (16384, 256)).astype(np.float32),
                    jnp.bfloat16)

    @jax.jit
    def mm_chain(a):
        def body(a, _):
            d = jnp.einsum("qd,md->qm", a, b,
                           preferred_element_type=jnp.float32)
            best = jnp.min(d, axis=1)                      # fused reduce
            # feed a scalar back so iterations are dependent (no hoisting)
            a2 = a + (jnp.sum(best) * 1e-12).astype(jnp.bfloat16)
            return a2, jnp.sum(best)
        a, s = jax.lax.scan(body, a, None, length=CHAIN)
        return jnp.sum(s)

    t_mm = _time_it(lambda: mm_chain(a), n=3) / CHAIN      # ms / matmul
    flops = 768 * 16384 * 256 * 2
    tf = flops / (t_mm / 1e3) / 1e12
    out["match_matmul_tflops"] = round(tf, 2)
    out["match_matmul_pct_peak"] = round(100.0 * tf / V5E_BF16_TFLOPS, 1)

    # (2) LBA LM iteration (dense reduced-camera solve) amortized over the
    # fori_loop inside run_window_ba_dense: (8-iter - 1-iter) / 7.  This
    # kernel is VPU/bandwidth-bound (small-block jacobian algebra at
    # ~131k edges, ~0.2 GFLOP/iter over ~100 MB of edge tensors).
    from mam3slam_tpu.slam import steps as steps_mod
    from mam3slam_tpu.solvers import ba_window as bw
    is2 = jnp.asarray(cfg.inv_sigma2)
    opt = fns["local_mp_mask"]  # noqa: F841  (arena already built above)
    idxw, _, okw = S.best_covisible(ms, jnp.asarray(kf), cfg.lba_window)
    wmask = jnp.zeros((ms.kf_valid.shape[0],), bool).at[
        jnp.where(okw, idxw, kf)].set(True).at[kf].set(True) & ms.kf_valid
    prob = jax.jit(lambda ms, m: steps_mod.build_window_problem(
        ms, m, is2, cfg.lba_cam_cap, cfg.lba_pt_cap, with_cm=False))(
        ms, wmask)
    t8 = _time_it(lambda: bw.run_window_ba_dense(prob, cfg.cam_kind,
                                                 iters=8), n=3)
    t1 = _time_it(lambda: bw.run_window_ba_dense(prob, cfg.cam_kind,
                                                 iters=1), n=3)
    out["lba_lm_iter_ms"] = round((t8 - t1) / 7.0, 2)

    # (3) PGO GN step at K=256, amortized: (20-iter - 2-iter) / 18.
    pgo2 = jax.jit(lambda: pgo_mod.optimize_essential_graph(
        q, t, s, fixed, edges, iters=2))
    t_pgo2 = _time_it(lambda: pgo2(), n=3)
    out["pgo_gn_iter_ms"] = round((out["pgo256_ms"] - t_pgo2) / 18.0, 2)
    return out


if __name__ == "__main__":
    main()
