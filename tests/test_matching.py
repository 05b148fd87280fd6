"""Matching primitive tests vs numpy brute-force oracles."""

import numpy as np
import jax.numpy as jnp

from mam3slam_tpu.ops import matching as M

RNG = np.random.default_rng(21)


def rand_desc(n):
    return RNG.integers(0, 256, (n, 32), dtype=np.uint8)


def np_hamming(a, b):
    return np.array([[np.unpackbits(x ^ y).sum() for y in b] for x in a])


def test_hamming_matrix_exact():
    a, b = rand_desc(64), rand_desc(48)
    got = np.asarray(M.hamming_matrix(M.unpack_desc(jnp.asarray(a)),
                                      M.unpack_desc(jnp.asarray(b))))
    np.testing.assert_array_equal(got, np_hamming(a, b))


def test_hamming_pairs():
    a, b = rand_desc(100), rand_desc(100)
    got = np.asarray(M.hamming_pairs(jnp.asarray(a), jnp.asarray(b)))
    want = np.array([np.unpackbits(x ^ y).sum() for x, y in zip(a, b)])
    np.testing.assert_array_equal(got, want)


def test_best_in_mask_top2():
    a, b = rand_desc(32), rand_desc(64)
    ham = np_hamming(a, b)
    mask = RNG.random((32, 64)) > 0.3
    res = M.best_in_mask(jnp.asarray(ham, jnp.int32), jnp.asarray(mask))
    for i in range(32):
        cand = np.where(mask[i])[0]
        if len(cand) == 0:
            assert not bool(res.ok[i])
            continue
        order = cand[np.argsort(ham[i][cand], kind="stable")]
        if ham[i][order[0]] <= M.TH_HIGH:
            assert bool(res.ok[i])
            assert ham[i][int(res.idx[i])] == ham[i][order[0]]
            if len(order) > 1:
                assert int(res.dist2[i]) == ham[i][order[1]]


def test_resolve_duplicates_keeps_best():
    idx = jnp.asarray([0, 0, 1, 2, 2], jnp.int32)
    dist = jnp.asarray([5, 3, 7, 4, 4], jnp.int32)
    ok = jnp.asarray([True, True, True, True, True])
    res = M.MatchResult(idx=idx, dist=dist, dist2=dist, ok=ok)
    out = M.resolve_duplicates(res, 8)
    np.testing.assert_array_equal(np.asarray(out.ok),
                                  [False, True, True, True, False])


def test_rotation_consistency():
    # 200 inliers at ~10 deg rotation offset, 40 outliers random
    n_in, n_out = 200, 40
    angle_t = RNG.uniform(0, 2 * np.pi, n_in + n_out).astype(np.float32)
    angle_q = angle_t.copy()
    angle_q[:n_in] += np.deg2rad(10.0) + RNG.normal(0, 0.02, n_in)
    angle_q[n_in:] = RNG.uniform(0, 2 * np.pi, n_out)
    idx = np.arange(n_in + n_out, dtype=np.int32)
    ok = np.ones(n_in + n_out, bool)
    out = np.asarray(M.rotation_consistency_mask(
        jnp.asarray(angle_q), jnp.asarray(angle_t), jnp.asarray(idx),
        jnp.asarray(ok)))
    assert out[:n_in].mean() > 0.95     # inliers retained
    assert out[n_in:].mean() < 0.35     # most outliers dropped


def _make_matchable_scene(n=150, sep=48):
    """Two 'frames' sharing n features with distinct descriptors."""
    desc = rand_desc(n)
    # frame2 descriptors: flip a few bits (realistic noise)
    noise = (RNG.random((n, 32, 8)) < 0.02)
    d2 = desc ^ np.packbits(noise, axis=-1).reshape(n, 32)
    uv1 = RNG.uniform(50, 600, (n, 2)).astype(np.float32)
    uv2 = uv1 + RNG.uniform(-20, 20, (n, 2)).astype(np.float32)
    return desc, d2, uv1, uv2


def test_search_for_initialization_recovers_truth():
    desc1, desc2, uv1, uv2 = _make_matchable_scene()
    n = desc1.shape[0]
    perm = RNG.permutation(n)
    res = M.search_for_initialization(
        jnp.asarray(uv1), M.unpack_desc(jnp.asarray(desc1)),
        jnp.zeros(n), jnp.ones(n, bool),
        jnp.asarray(uv2[perm]), M.unpack_desc(jnp.asarray(desc2[perm])),
        jnp.zeros(n), jnp.ones(n, bool),
        window=100.0, check_rotation=False)
    ok = np.asarray(res.ok)
    idx = np.asarray(res.idx)
    inv = np.empty(n, int)
    inv[perm] = np.arange(n)
    correct = (idx[ok] == inv[np.arange(n)[ok]]).mean()
    assert ok.mean() > 0.9
    assert correct > 0.98


def test_search_by_projection_levels_and_radius():
    desc1, desc2, uv1, uv2 = _make_matchable_scene()
    n = desc1.shape[0]
    levels = RNG.integers(0, 8, n).astype(np.int32)
    res = M.search_by_projection_frame(
        jnp.asarray(uv2), jnp.asarray(levels),
        jnp.full(n, 25.0), M.unpack_desc(jnp.asarray(desc1)),
        jnp.ones(n, bool),
        jnp.asarray(uv2), jnp.asarray(levels),
        M.unpack_desc(jnp.asarray(desc2)), jnp.ones(n, bool))
    ok = np.asarray(res.ok)
    assert ok.mean() > 0.95
    assert (np.asarray(res.idx)[ok] == np.arange(n)[ok]).all()

    # shrink radius to exclude: no matches
    res2 = M.search_by_projection_frame(
        jnp.asarray(uv2 + 100.0), jnp.asarray(levels),
        jnp.full(n, 5.0), M.unpack_desc(jnp.asarray(desc1)),
        jnp.ones(n, bool),
        jnp.asarray(uv2), jnp.asarray(levels),
        M.unpack_desc(jnp.asarray(desc2)), jnp.ones(n, bool))
    assert np.asarray(res2.ok).sum() == 0


def test_brute_force_mutual_ratio():
    desc1, desc2, uv1, uv2 = _make_matchable_scene(100)
    n = 100
    res = M.search_by_brute_force(
        M.unpack_desc(jnp.asarray(desc1)), jnp.ones(n, bool), jnp.zeros(n),
        M.unpack_desc(jnp.asarray(desc2)), jnp.ones(n, bool), jnp.zeros(n),
        check_rotation=False)
    ok = np.asarray(res.ok)
    assert ok.mean() > 0.9
    assert (np.asarray(res.idx)[ok] == np.arange(n)[ok]).all()


def test_epipolar_distance():
    # pure-translation stereo: F = [e]_x for horizontal motion -> epipolar
    # lines are horizontal; distance = |v2 - v1| for matched rows.
    F = np.array([[0, 0, 0], [0, 0, -1], [0, 1, 0]], np.float32)
    uv1 = np.array([[10.0, 20.0], [5.0, 7.0]], np.float32)
    uv2 = np.array([[300.0, 20.0], [40.0, 9.0]], np.float32)
    d2 = np.asarray(M.epipolar_distance_sq(jnp.asarray(uv1),
                                           jnp.asarray(uv2), jnp.asarray(F)))
    # line of uv1[0]: y = 20 -> uv2[0] distance 0, uv2[1] distance 11
    np.testing.assert_allclose(d2[0], [0.0, 121.0], atol=1e-3)
    np.testing.assert_allclose(d2[1], [169.0, 4.0], atol=1e-3)
