"""EuRoC MAV dataset driver (ASL format).

Replaces the reference's (missing-from-tree) ``test/mono_euroc.cc`` driver
and the ROS image-topic feeders (``Examples/ROS/MAM3SLAM`` — SURVEY.md
§2.7): iterates ``mav0/cam0/data.csv`` timestamps + PNGs and ground truth
from ``state_groundtruth_estimate0`` for ATE evaluation.
"""

from __future__ import annotations

import csv
import os
from typing import Iterator, List, Optional, Tuple

import numpy as np


def load_image_index(seq_dir: str, cam: str = "cam0") -> List[Tuple[float, str]]:
    """[(timestamp_s, image_path)] from mav0/<cam>/data.csv."""
    cam_dir = os.path.join(seq_dir, "mav0", cam)
    csv_path = os.path.join(cam_dir, "data.csv")
    if not os.path.exists(csv_path):
        raise FileNotFoundError(
            f"not an EuRoC ASL sequence dir (no {csv_path}); expected "
            f"layout <seq>/mav0/{cam}/data.csv")
    out = []
    with open(csv_path) as f:
        for row in csv.reader(f):
            if not row or row[0].startswith("#"):
                continue
            ts_ns, fname = row[0], row[1].strip()
            out.append((int(ts_ns) * 1e-9,
                        os.path.join(cam_dir, "data", fname)))
    out.sort()
    return out


def load_groundtruth(seq_dir: str) -> np.ndarray:
    """[(t, x, y, z)] from the ground-truth CSV (for ATE)."""
    path = os.path.join(seq_dir, "mav0", "state_groundtruth_estimate0",
                        "data.csv")
    rows = []
    with open(path) as f:
        for row in csv.reader(f):
            if not row or row[0].startswith("#"):
                continue
            rows.append([int(row[0]) * 1e-9] + [float(v) for v in row[1:4]])
    return np.array(rows)


def frames(seq_dir: str, cam: str = "cam0",
           max_frames: Optional[int] = None
           ) -> Iterator[Tuple[float, np.ndarray]]:
    """Yield (timestamp_s, grayscale f32 [H, W]) frames."""
    import cv2

    index = load_image_index(seq_dir, cam)
    if max_frames:
        index = index[:max_frames]
    for ts, path in index:
        img = cv2.imread(path, cv2.IMREAD_GRAYSCALE)
        if img is None:
            continue
        yield ts, img.astype(np.float32)


EUROC_CAM0 = dict(  # factory calibration of EuRoC cam0 (public)
    fx=458.654, fy=457.296, cx=367.215, cy=248.375,
    dist=(-0.28340811, 0.07395907, 0.00019359, 1.76187114e-05),
    width=752, height=480, fps=20.0,
)
