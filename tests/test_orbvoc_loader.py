"""DBoW2 ORBvoc.txt loader tests (ops/bow.load_orb_vocabulary_text).

The reference loads a pretrained k=10, L=6 text vocabulary
(ORBVocabulary::loadFromTextFile, TemplatedVocabulary.h). We synthesize
small vocabularies in the same text format — including INCOMPLETE trees
(nodes with fewer than k children, early leaves), which the real file has —
and check the flat-array descent reproduces a brute-force tree descent.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from orbslamm_tpu.ops import bow


def _write_voc(path, k, L, seed=0, drop_prob=0.25):
    """Emit a random (possibly incomplete) vocabulary in DBoW2 text format.

    Returns (lines-parsed tree) as dicts for the brute-force reference:
    parents, children, descs, weights, is_leaf.
    """
    rng = np.random.default_rng(seed)
    parents = [0]
    is_leaf = [False]
    descs = [np.zeros(32, np.uint8)]
    weights = [0.0]
    children = {0: []}

    frontier = [0]
    for level in range(L):
        next_frontier = []
        for node in frontier:
            if is_leaf[node]:
                continue
            n_kids = k if level == 0 else int(rng.integers(1, k + 1))
            for _ in range(n_kids):
                nid = len(parents)
                parents.append(node)
                # a node above the bottom can be an early leaf
                early = level < L - 1 and rng.random() < drop_prob
                leaf = level == L - 1 or early
                is_leaf.append(leaf)
                descs.append(rng.integers(0, 256, 32).astype(np.uint8))
                weights.append(float(rng.uniform(0.1, 3.0)) if leaf else 0.0)
                children.setdefault(node, []).append(nid)
                children[nid] = []
                next_frontier.append(nid)
        frontier = next_frontier

    lines = [f"{k} {L} 0 0"]
    for i in range(1, len(parents)):
        d = " ".join(str(int(x)) for x in descs[i])
        lines.append(f"{parents[i]} {int(is_leaf[i])} {d} {weights[i]:.6f}")
    path.write_text("\n".join(lines) + "\n")
    return parents, children, descs, weights, is_leaf


def _brute_descent(desc, children, descs, is_leaf, depth):
    """Nearest-child descent to `depth` levels; returns the file node id."""
    bits = np.unpackbits(desc, bitorder="little")
    node = 0
    for _ in range(depth):
        kids = children.get(node, [])
        if is_leaf[node] or not kids:
            break  # early leaf: stays put (loader chains it downward)
        dists = [
            np.sum(bits != np.unpackbits(descs[c], bitorder="little"))
            for c in kids
        ]
        node = kids[int(np.argmin(dists))]
    return node


@pytest.fixture(scope="module")
def voc_file(tmp_path_factory):
    path = tmp_path_factory.mktemp("voc") / "ORBvoc.txt"
    tree = _write_voc(path, k=4, L=3, seed=11)
    return path, tree


def test_loader_shapes(voc_file):
    path, _ = voc_file
    voc = bow.load_orb_vocabulary_text(path, max_depth=3)
    assert voc.branching == 4 and voc.depth == 3
    assert voc.nodes.shape == (4 + 16 + 64, 32)
    assert voc.node_valid is not None
    assert voc.idf.shape == (64,)
    # root's k children always exist
    assert bool(voc.node_valid[:4].all())


def test_descent_matches_brute_force(voc_file):
    path, (parents, children, descs, weights, is_leaf) = voc_file
    voc = bow.load_orb_vocabulary_text(path, max_depth=3)
    rng = np.random.default_rng(5)
    q = rng.integers(0, 256, (64, 32)).astype(np.uint8)
    words = np.asarray(
        bow.assign_words(voc, jnp.asarray(q), jnp.ones(64, bool))
    )
    ref_nodes = [_brute_descent(d, children, descs, is_leaf, 3) for d in q]
    # same file leaf -> same word id; different file leaf -> different word
    seen = {}
    for w, r in zip(words, ref_nodes):
        assert w >= 0
        if r in seen:
            assert seen[r] == w, "one file leaf mapped to two words"
        else:
            assert w not in seen.values(), "two file leaves collided"
            seen[r] = w
    # idf of a word = max leaf weight below its file node
    def max_leaf_weight(n):
        kids = children.get(n, [])
        if is_leaf[n] or not kids:
            return weights[n]
        return max(max_leaf_weight(c) for c in kids)

    idf = np.asarray(voc.idf)
    for r, w in seen.items():
        np.testing.assert_allclose(idf[w], max_leaf_weight(r), rtol=1e-5)


def test_depth_truncation(voc_file):
    path, (parents, children, descs, weights, is_leaf) = voc_file
    voc = bow.load_orb_vocabulary_text(path, max_depth=2)
    assert voc.depth == 2
    assert voc.nodes.shape == (4 + 16, 32)
    rng = np.random.default_rng(6)
    q = rng.integers(0, 256, (32, 32)).astype(np.uint8)
    words = np.asarray(
        bow.assign_words(voc, jnp.asarray(q), jnp.ones(32, bool))
    )
    ref_nodes = [_brute_descent(d, children, descs, is_leaf, 2) for d in q]
    seen = {}
    for w, r in zip(words, ref_nodes):
        assert 0 <= w < 16
        assert seen.setdefault(r, w) == w


def test_scoring_pipeline_with_loaded_voc(voc_file):
    """BoW vectors from a loaded vocabulary must score self-similar > cross."""
    path, _ = voc_file
    voc = bow.load_orb_vocabulary_text(path, max_depth=3)
    rng = np.random.default_rng(7)
    a = rng.integers(0, 256, (128, 32)).astype(np.uint8)
    b = rng.integers(0, 256, (128, 32)).astype(np.uint8)
    # a_noisy = a with a few bit flips per descriptor
    a_noisy = a.copy()
    flips = rng.integers(0, 32, (128, 2))
    for i in range(128):
        for j in flips[i]:
            a_noisy[i, j] ^= np.uint8(1 << int(rng.integers(0, 8)))
    ones = jnp.ones(128, bool)
    va = bow.bow_vector(voc, bow.assign_words(voc, jnp.asarray(a), ones))
    vn = bow.bow_vector(voc, bow.assign_words(voc, jnp.asarray(a_noisy), ones))
    vb = bow.bow_vector(voc, bow.assign_words(voc, jnp.asarray(b), ones))
    s_self = float(bow.bow_score(va, vn))
    s_cross = float(bow.bow_score(va, vb))
    assert s_self > s_cross
