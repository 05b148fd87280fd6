"""Frame-drop policy of the live-stream pump (reference ImageGrabber slot
semantics, Examples/ROS/MAM3SLAM/nodes/ros_mono_multi.cc:93-122): a slow
tracker drops intermediate frames, always consumes the freshest, and the
counters account for every frame."""

import time

import numpy as np

from mam3slam_tpu.io.stream import LatestFrameBuffer, replay_realtime


def test_slow_consumer_drops_and_gets_freshest():
    buf = LatestFrameBuffer()
    frames = [(i / 100.0, i) for i in range(100)]
    replay_realtime(frames, buf, rate_hz=100.0)  # 10 ms period

    taken = []
    while True:
        item = buf.take(timeout_s=2.0)
        if item is None:
            break
        taken.append(item)
        time.sleep(0.035)  # tracker ~3.5x slower than the camera

    # every frame accounted for: taken + dropped = pushed
    assert buf.n_pushed == 100
    assert buf.n_taken == len(taken)
    assert buf.n_taken + buf.n_dropped == buf.n_pushed
    # a slow consumer MUST have dropped frames
    assert buf.n_dropped > 30, buf.n_dropped
    # monotonic timestamps, no duplicates — always the freshest frame
    ts = [t for t, _ in taken]
    assert all(b > a for a, b in zip(ts, ts[1:]))
    # the tail of the stream was seen (reader never starves)
    assert taken[-1][1] > 90


def test_fast_consumer_sees_everything():
    """Zero-drop property of the buffer itself, deterministically: when
    every push is consumed before the next push (interlocked, no wall-
    clock races), nothing is ever dropped."""
    buf = LatestFrameBuffer()
    taken = []
    for i in range(50):
        buf.push(i / 1000.0, i)
        taken.append(buf.take(timeout_s=2.0))
    buf.close()
    assert buf.take(timeout_s=0.1) is None
    assert buf.n_dropped == 0
    assert [i for _, i in taken] == list(range(50))


def test_fast_consumer_realtime_nearly_lossless():
    """Wall-clock-paced variant: a consumer much faster than the camera
    sees (almost) everything.  A small drop budget absorbs scheduler
    stalls under parallel test load — the contract under real load is
    'freshest frame, bounded drops', not 'zero drops on a busy host'."""
    buf = LatestFrameBuffer()
    replay_realtime([(i / 1000.0, i) for i in range(50)], buf,
                    rate_hz=50.0)
    taken = []
    while True:
        item = buf.take(timeout_s=2.0)
        if item is None:
            break
        taken.append(item)
    assert buf.n_dropped <= 2, buf.n_dropped
    assert len(taken) >= 48
    ids = [i for _, i in taken]
    assert all(b > a for a, b in zip(ids, ids[1:]))
    assert ids[-1] == 49


def test_tracking_survives_drops():
    """End-to-end: the synthetic-world pipeline keeps tracking when fed
    through the dropping pump at a rate faster than it can consume."""
    import sys, os
    sys.path.insert(0, os.path.dirname(__file__))
    from test_slam_e2e import (FX, FY, CX, CY, H, N_FEAT, W,
                               SyntheticWorld, make_trajectory)
    from mam3slam_tpu.geometry import cameras
    from mam3slam_tpu.slam.system import OK, SlamConfig, SlamSystem

    world = SyntheticWorld(n_mp=600, seed=0)
    cam = cameras.make_pinhole(FX, FY, CX, CY)
    cfg = SlamConfig(width=W, height=H, n_feat=N_FEAT, max_kf=64,
                     max_mp=4096, n_levels=4, min_init_matches=60)
    sys_ = SlamSystem(cfg, cam)
    aid = sys_.add_agent()

    traj = make_trajectory(160)
    frames = []
    for i, (R, t) in enumerate(traj):
        f, _ = world.render(R, t)
        frames.append((i / 20.0, f))

    # warm up (compile every pipeline stage incl. the mapping epoch by
    # inserting several keyframes) and measure the tracker's steady rate
    # — the camera then runs 3x faster than the tracker can consume
    for ts, f in frames[:48]:
        sys_.track(aid, f, ts)
    t0 = time.perf_counter()
    for ts, f in frames[48:60]:
        sys_.track(aid, f, ts)
    track_hz = 12.0 / max(time.perf_counter() - t0, 1e-6)

    # 2x the calibrated rate: fast enough to force drops, with headroom
    # for the tracker slowing further under parallel-suite host load
    # (a 3x rate left <10 consumable frames when other workers stole
    # cores mid-replay)
    buf = LatestFrameBuffer()
    replay_realtime(frames[60:], buf, rate_hz=2.0 * track_hz)
    states = []
    while True:
        item = buf.take(timeout_s=10.0)
        if item is None:
            break
        ts, f = item
        st, _ = sys_.track(aid, f, ts)
        states.append(st)
    assert buf.n_dropped > 0
    assert len(states) >= 8, (buf.n_dropped, len(states))
    assert states.count(OK) >= int(0.5 * len(states)), (
        buf.n_dropped, states)
