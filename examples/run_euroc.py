#!/usr/bin/env python
"""Run monocular SLAM on EuRoC sequences (single- or multi-agent).

Single agent:
    python examples/run_euroc.py --seq /data/euroc/MH_01_easy --out output/

Two agents as a centralized multi-agent run (the MAM3SLAM headline
configuration — each sequence is one agent, maps merge when they overlap):
    python examples/run_euroc.py --seq MH_01_easy --seq MH_02_easy --out output/

Writes the reference artifact set (Trajectory_i.txt, KF_traj.txt,
MapLogs.txt, Times*.txt, map.png) and prints ATE RMSE when ground truth is
available.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seq", action="append", required=True,
                    help="EuRoC sequence dir (repeat for multi-agent)")
    ap.add_argument("--out", default="output")
    ap.add_argument("--max-frames", type=int, default=None)
    ap.add_argument("--n-features", type=int, default=1000)
    args = ap.parse_args()

    from mam3slam_tpu import api
    from mam3slam_tpu.io import euroc, viewer, writers
    from mam3slam_tpu.io.settings import Settings

    c = euroc.EUROC_CAM0
    yaml_text = f"""%YAML:1.0
File.version: "1.0"
Camera.type: "PinHole"
Camera1.fx: {c['fx']}
Camera1.fy: {c['fy']}
Camera1.cx: {c['cx']}
Camera1.cy: {c['cy']}
Camera1.k1: {c['dist'][0]}
Camera1.k2: {c['dist'][1]}
Camera1.p1: {c['dist'][2]}
Camera1.p2: {c['dist'][3]}
Camera.width: {c['width']}
Camera.height: {c['height']}
Camera.fps: {c['fps']}
Camera.RGB: 1
ORBextractor.nFeatures: {args.n_features}
ORBextractor.scaleFactor: 1.2
ORBextractor.nLevels: 8
ORBextractor.iniThFAST: 20
ORBextractor.minThFAST: 7
"""
    os.makedirs(args.out, exist_ok=True)
    yaml_path = os.path.join(args.out, "euroc_cam0.yaml")
    with open(yaml_path, "w") as f:
        f.write(yaml_text)

    mas = api.MultiAgentSystem()
    agents = [mas.add_agent(yaml_path) for _ in args.seq]

    for aid, seq in zip(agents, args.seq):
        print(f"agent {aid}: {seq}")
        for i, (ts, img) in enumerate(
                euroc.frames(seq, max_frames=args.max_frames)):
            state, pose = mas.track_monocular(aid, img, ts)
            if i % 100 == 0:
                print(f"  frame {i}  state={state}")

    mas.shutdown(out_dir=args.out)
    viewer.render_map(mas.sys, os.path.join(args.out, "map.png"),
                      server=mas.server)

    # ATE vs ground truth where available
    for aid, seq in zip(agents, args.seq):
        try:
            gt = euroc.load_groundtruth(seq)
        except FileNotFoundError:
            continue
        traj = mas.sys.trajectory_world(aid)
        est, ref = [], []
        for ts, q, t, st in traj:
            if st != 2:
                continue
            j = np.searchsorted(gt[:, 0], ts)
            if 0 < j < len(gt):
                est.append(t)
                ref.append(gt[j, 1:4])
        if len(est) > 10:
            ate = writers.ate_rmse(np.asarray(est), np.asarray(ref))
            print(f"agent {aid} ATE RMSE (Sim3-aligned): {ate:.4f} m "
                  f"over {len(est)} frames")


if __name__ == "__main__":
    main()
