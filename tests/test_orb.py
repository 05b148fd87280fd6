"""ORB extraction tests vs OpenCV oracles (FAST, ORB descriptors)."""

import cv2
import numpy as np
import jax.numpy as jnp

from mam3slam_tpu.ops import orb

import pytest

pytestmark = pytest.mark.slow  # full-suite tier; smoke = -m "not slow"

RNG = np.random.default_rng(7)


def synth_image(h=240, w=320, n_blobs=120, seed=3):
    """Textured synthetic image with corner-rich structure."""
    rng = np.random.default_rng(seed)
    img = np.full((h, w), 120.0, np.float32)
    for _ in range(n_blobs):
        y, x = rng.integers(10, h - 20), rng.integers(10, w - 20)
        bh, bw = rng.integers(4, 16), rng.integers(4, 16)
        img[y:y + bh, x:x + bw] = rng.uniform(0, 255)
    img += rng.normal(0, 2.0, (h, w)).astype(np.float32)
    return np.clip(img, 0, 255).astype(np.float32)


def test_fast_score_agrees_with_cv2_detection():
    img = synth_image()
    score = np.asarray(orb.fast_score_map(jnp.asarray(img)))

    det = cv2.FastFeatureDetector_create(threshold=20,
                                         nonmaxSuppression=False)
    kps = det.detect(img.astype(np.uint8))
    cv_mask = np.zeros(img.shape, bool)
    for kp in kps:
        cv_mask[int(kp.pt[1]), int(kp.pt[0])] = True

    ours = score > 20
    inner = np.zeros_like(cv_mask)
    inner[5:-5, 5:-5] = True
    cv_in = cv_mask & inner
    ours_in = ours & inner
    # uint8 rounding vs f32 input gives tiny borderline flips; demand
    # near-complete mutual agreement.
    recall = (cv_in & ours_in).sum() / max(cv_in.sum(), 1)
    precision = (cv_in & ours_in).sum() / max(ours_in.sum(), 1)
    assert recall > 0.95, recall
    assert precision > 0.95, precision


def test_fast_score_value_matches_cv2_threshold_sweep():
    # score > t must exactly track cv2 detection at threshold t (mod rounding)
    img = synth_image(seed=11)
    score = np.asarray(orb.fast_score_map(jnp.asarray(img)))
    for t in (10, 30):
        det = cv2.FastFeatureDetector_create(threshold=t,
                                             nonmaxSuppression=False)
        kps = det.detect(img.astype(np.uint8))
        cv_mask = np.zeros(img.shape, bool)
        for kp in kps:
            cv_mask[int(kp.pt[1]), int(kp.pt[0])] = True
        ours = score > t
        inner = np.zeros(img.shape, bool)
        inner[5:-5, 5:-5] = True
        agree = (cv_mask & ours & inner).sum()
        assert agree / max((cv_mask & inner).sum(), 1) > 0.93


def test_extract_counts_and_validity():
    img = synth_image(480, 640, n_blobs=400)
    cfg = orb.OrbConfig(height=480, width=640, n_features=500)
    feats = orb.extract_orb(jnp.asarray(img), cfg)
    n_valid = int(np.asarray(feats.valid).sum())
    assert n_valid > 350  # textured image should nearly fill the budget
    v = np.asarray(feats.valid)
    xy = np.asarray(feats.xy)[v]
    assert xy[:, 0].min() >= 0 and xy[:, 0].max() < 640
    assert xy[:, 1].min() >= 0 and xy[:, 1].max() < 480
    # spatial spread: at least 25% of 40px cells occupied
    cells = set(map(tuple, (xy // 40).astype(int)))
    assert len(cells) > 0.25 * (640 // 40) * (480 // 40)


def _cv2_level0_kps(img, n=500):
    """cv2 ORB's own detected level-0 keypoints (they carry IC angles)."""
    o = cv2.ORB_create(nfeatures=n, nlevels=1, edgeThreshold=19, patchSize=31,
                       fastThreshold=20)
    kps, desc = o.detectAndCompute(img.astype(np.uint8), None)
    keep = [(kp, d) for kp, d in zip(kps, desc) if kp.octave == 0]
    return keep


def test_orientation_matches_cv2_orb():
    img = synth_image(480, 640, n_blobs=400, seed=5)
    pairs = _cv2_level0_kps(img)
    assert len(pairs) > 50
    m10, m01 = orb.orientation_maps(jnp.asarray(img))
    m10, m01 = np.asarray(m10), np.asarray(m01)
    diffs = []
    for kp, _ in pairs:
        x, y = int(round(kp.pt[0])), int(round(kp.pt[1]))
        ours = np.rad2deg(np.arctan2(m01[y, x], m10[y, x])) % 360.0
        d = abs(((ours - kp.angle) + 180) % 360 - 180)
        diffs.append(d)
    assert np.median(diffs) < 3.0, np.median(diffs)


def test_descriptors_close_to_cv2():
    img = synth_image(480, 640, n_blobs=400, seed=9)
    pairs = _cv2_level0_kps(img)
    assert len(pairs) > 50
    xy = np.array([[round(kp.pt[0]), round(kp.pt[1])] for kp, _ in pairs],
                  np.int32)
    ang = np.array([np.deg2rad(kp.angle) for kp, _ in pairs], np.float32)
    cv_desc = np.array([d for _, d in pairs])

    # match cv2's arithmetic: uint8 input, blur rounded to the integer grid
    u8 = img.astype(np.uint8).astype(np.float32)
    blur = jnp.round(orb.gaussian_blur(jnp.asarray(u8)))
    ours = np.asarray(orb.brief_descriptors(blur, jnp.asarray(xy),
                                            jnp.asarray(ang)))
    dists = np.array([np.unpackbits(a ^ b).sum()
                      for a, b in zip(ours, cv_desc)])
    # bit-exact parity with OpenCV ORB descriptors (mean ~0.002 bits)
    assert np.median(dists) <= 1, np.median(dists)
    assert dists.mean() < 2, dists.mean()


def test_extract_jits_and_is_deterministic():
    import jax

    img = synth_image(240, 320)
    cfg = orb.OrbConfig(height=240, width=320, n_features=200, n_levels=4)
    f = jax.jit(lambda im: orb.extract_orb(im, cfg))
    a = f(jnp.asarray(img))
    b = f(jnp.asarray(img))
    np.testing.assert_array_equal(np.asarray(a.desc), np.asarray(b.desc))
    np.testing.assert_array_equal(np.asarray(a.xy), np.asarray(b.xy))


def test_matmul_pyramid_close_to_cascade():
    """The TPU matmul pyramid (direct anti-aliased resize from level 0)
    must stay close to the CPU resize cascade: small mean intensity
    error and substantially overlapping FAST keypoint selections."""
    import numpy as np
    rng = np.random.default_rng(3)
    H, W = 240, 320
    base = rng.uniform(0, 255, (H, W)).astype(np.float32)
    # smooth the noise a little so corners are not pixel-level noise
    img = jnp.asarray(np.asarray(orb.gaussian_blur(jnp.asarray(base))))
    cfg = orb.OrbConfig(height=H, width=W, n_features=400, n_levels=4)

    mm = orb.pyramid_stack_matmul(img, cfg)
    pyr = orb.compute_pyramid(img, cfg)
    for lv in range(cfg.n_levels):
        h, w = cfg.level_sizes[lv]
        a = np.asarray(mm[lv, :h, :w])
        b = np.asarray(pyr[lv])
        mad = np.abs(a - b).mean()
        assert mad < 3.0, (lv, mad)

    # FAST keypoints from both stacks mostly agree
    Hp, Wp = cfg.level_sizes[0]

    def rpad(x, lv):
        h, w = cfg.level_sizes[lv]
        ry, rx = min(3, Hp - h), min(3, Wp - w)
        x = jnp.pad(x, ((0, ry), (0, rx)), mode="reflect")
        return jnp.pad(x, ((0, Hp - h - ry), (0, Wp - w - rx)))

    casc = jnp.stack([rpad(pyr[lv], lv) for lv in range(cfg.n_levels)])
    kp_m, _, v_m = orb._select_keypoints_stacked(orb.fast_score_map(mm), cfg)
    kp_c, _, v_c = orb._select_keypoints_stacked(orb.fast_score_map(casc), cfg)
    sm = {tuple(r) for r in np.asarray(kp_m)[np.asarray(v_m)]}
    sc = {tuple(r) for r in np.asarray(kp_c)[np.asarray(v_c)]}
    inter = len(sm & sc)
    assert inter / max(1, min(len(sm), len(sc))) > 0.6, (len(sm), len(sc), inter)
