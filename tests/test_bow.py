"""BoW vocabulary / place recognition tests."""

import numpy as np
import jax.numpy as jnp

from mam3slam_tpu.ops import bow
from mam3slam_tpu.ops import matching as M

RNG = np.random.default_rng(31)


def make_vocab(n_train=3000, k=6, depth=3):
    descs = RNG.integers(0, 256, (n_train, 32), dtype=np.uint8)
    return bow.build_vocabulary(descs, k=k, depth=depth, iters=3), descs


def _bits(desc):
    return jnp.asarray(
        np.unpackbits(desc, axis=-1, bitorder="little").astype(np.float32))


def test_quantize_stability_under_noise():
    voc, descs = make_vocab()
    d = descs[:300]
    w1 = np.asarray(bow.quantize(voc, _bits(d)))
    # flip 4 random bits per descriptor — most should stay in the same word
    noisy = d.copy()
    for _ in range(4):
        byte = RNG.integers(0, 32, len(d))
        bit = RNG.integers(0, 8, len(d)).astype(np.uint8)
        noisy[np.arange(len(d)), byte] ^= (1 << bit).astype(np.uint8)
    w2 = np.asarray(bow.quantize(voc, _bits(noisy)))
    assert (w1 == w2).mean() > 0.6, (w1 == w2).mean()


def test_quantize_matches_numpy_descent():
    voc, descs = make_vocab(n_train=1000, k=4, depth=2)
    d = descs[:100]
    words = np.asarray(bow.quantize(voc, _bits(d)))
    # numpy oracle descent
    bits = np.unpackbits(d, axis=-1, bitorder="little").astype(np.float32)
    node = np.zeros(len(d), np.int64)
    for lv in range(voc.depth):
        cents = np.unpackbits(np.asarray(voc.centroid_bits[lv]), axis=-1,
                              bitorder="little").astype(np.float32)
        for i in range(len(d)):
            ch = cents[node[i] * voc.k:(node[i] + 1) * voc.k]
            dist = np.abs(bits[i][None, :] - ch).sum(axis=1)
            node[i] = node[i] * voc.k + dist.argmin()
    np.testing.assert_array_equal(words, node)


def test_bow_scores_rank_similar_frames_first():
    voc, descs = make_vocab()
    # frame A and a noisy copy A' share descriptors; frame B is unrelated
    dA = descs[:200]
    dA2 = dA.copy()
    byte = RNG.integers(0, 32, 200)
    bit = RNG.integers(0, 8, 200).astype(np.uint8)
    dA2[np.arange(200), byte] ^= (1 << bit).astype(np.uint8)
    dB = RNG.integers(0, 256, (200, 32), dtype=np.uint8)

    valid = jnp.ones(200, bool)
    vecs = []
    for d in (dA, dA2, dB):
        words = bow.quantize(voc, _bits(d))
        vecs.append(bow.bow_vector(voc, words, valid))
    q, a2, b = vecs
    scores = np.asarray(bow.l1_scores(q, jnp.stack([a2, b])))
    assert scores[0] > scores[1] + 0.3, scores


def test_detect_candidates_split_and_gate():
    K = 10
    scores = jnp.asarray(np.linspace(0.1, 0.9, K), jnp.float32)
    shared = jnp.asarray([50, 45, 44, 10, 44, 44, 3, 44, 50, 44], jnp.int32)
    eligible = jnp.ones(K, bool).at[9].set(False)  # e.g. covisible: excluded
    same_map = jnp.asarray([True] * 5 + [False] * 5)
    li, lok, mi, mok = bow.detect_candidates(scores, shared, eligible,
                                             same_map, n_best=3)
    li, mi = np.asarray(li), np.asarray(mi)
    lok, mok = np.asarray(lok), np.asarray(mok)
    # idx 3 (shared=10 < 0.8*50) and idx 6 must be gated out; idx 9 excluded
    assert set(li[lok]) == {0, 1, 2, 4}.intersection(set(li[lok])) and \
        3 not in set(li[lok])
    assert 6 not in set(mi[mok]) and 9 not in set(mi[mok])
    # best merge candidates by score: 8 gated? shared[8]=50 ok -> highest
    assert mi[0] == 8 and mok[0]


def test_detect_candidates_grouped_rejects_isolated_hit():
    """Covisibility-group accumulated scoring (reference
    DetectNBestCandidates, src/KeyFrameDatabase.cc:604-730): an isolated
    single-KF hit with the best RAW score is outranked by a covisible
    group whose members each score slightly lower but accumulate higher;
    groups below 0.75x the best accumulated score are rejected."""
    K = 16
    scores = np.zeros(K, np.float32)
    shared = np.zeros(K, np.int32)
    eligible = np.zeros(K, bool)
    covis = np.zeros((K, K), np.int32)

    # isolated candidate 3: best raw score, no covisible support
    scores[3] = 0.50
    shared[3] = 40
    eligible[3] = True

    # group {7, 8, 9}: individually weaker, mutually covisible
    for i in (7, 8, 9):
        scores[i] = 0.40
        shared[i] = 40
        eligible[i] = True
    for i in (7, 8, 9):
        for j in (7, 8, 9):
            if i != j:
                covis[i, j] = 50

    # weak group {12, 13}: below the 0.75 * best-acc threshold
    for i in (12, 13):
        scores[i] = 0.15
        shared[i] = 40
        eligible[i] = True
    covis[12, 13] = covis[13, 12] = 50

    reps, acc, ok = bow.detect_candidates_grouped(
        jnp.asarray(scores), jnp.asarray(shared), jnp.asarray(eligible),
        jnp.asarray(covis), n_out=6)
    reps = np.asarray(reps)[np.asarray(ok)]
    accs = np.asarray(acc)[np.asarray(ok)]
    # the top-ranked representative comes from the covisible group, with
    # accumulated score 1.2 > the isolated KF's 0.5
    assert reps[0] in (7, 8, 9)
    assert abs(accs[0] - 1.2) < 1e-5
    # the isolated hit survives only if >= 0.75 * best acc — 0.5 < 0.9
    assert 3 not in reps
    # the weak group is rejected too
    assert 12 not in reps and 13 not in reps


def test_detect_candidates_grouped_common_word_gate():
    """Candidates sharing fewer than 0.8 * max common words are not
    scored (the reference's minCommonWords gate)."""
    K = 8
    scores = np.full(K, 0.4, np.float32)
    shared = np.zeros(K, np.int32)
    eligible = np.ones(K, bool)
    covis = np.zeros((K, K), np.int32)
    shared[2] = 100   # max
    shared[4] = 85    # > 0.8 * 100: scored
    shared[5] = 60    # < 0.8 * 100: gated out
    reps, acc, ok = bow.detect_candidates_grouped(
        jnp.asarray(scores), jnp.asarray(shared), jnp.asarray(eligible),
        jnp.asarray(covis), n_out=4)
    reps = set(int(r) for r, o in zip(np.asarray(reps), np.asarray(ok))
               if o)
    assert 2 in reps and 4 in reps and 5 not in reps
