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
