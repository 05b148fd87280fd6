"""Disk-backed rendered-sequence cache (VERDICT r4 #7)."""

import numpy as np

from mam3slam_tpu.io import render


def test_render_sequence_cached_roundtrip(tmp_path):
    scene = render.RoomScene(seed=9, px_per_m=20.0)
    cam = render.RenderCam(width=64, height=48, fx=40.0, fy=40.0,
                           cx=32.0, cy=24.0)
    traj = render.orbit_trajectory(5, 0.0, 40.0, radius=2.5)
    d = str(tmp_path)
    f1 = render.render_sequence_cached(scene, traj, cam, cache_dir=d)
    assert f1.shape == (5, 48, 64) and f1.dtype == np.float16
    # direct render agrees to float16 precision
    direct = scene.render(traj[2][0], traj[2][1], cam)
    np.testing.assert_allclose(f1[2].astype(np.float32), direct,
                               atol=0.25)
    # second call is a cache HIT: bit-identical, no re-render
    import os
    files = os.listdir(d)
    assert len(files) == 1
    scene.render = None  # poison: a re-render would crash
    f2 = render.render_sequence_cached(scene, traj, cam, cache_dir=d)
    np.testing.assert_array_equal(f1, f2)


def test_render_cache_key_sensitivity(tmp_path):
    d = str(tmp_path)
    cam = render.RenderCam(width=64, height=48, fx=40.0, fy=40.0,
                           cx=32.0, cy=24.0)
    traj = render.orbit_trajectory(3, 0.0, 20.0, radius=2.5)
    render.render_sequence_cached(render.RoomScene(seed=1, px_per_m=20.0),
                                  traj, cam, cache_dir=d)
    render.render_sequence_cached(render.RoomScene(seed=2, px_per_m=20.0),
                                  traj, cam, cache_dir=d)
    traj2 = render.orbit_trajectory(3, 5.0, 25.0, radius=2.5)
    render.render_sequence_cached(render.RoomScene(seed=1, px_per_m=20.0),
                                  traj2, cam, cache_dir=d)
    import os
    assert len(os.listdir(d)) == 3  # seed and trajectory both keyed
