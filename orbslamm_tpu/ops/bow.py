"""Bag-of-binary-words place recognition (the DBoW2 replacement).

Reference: Thirdparty/DBoW2 TemplatedVocabulary (transform/score) +
KeyFrameDatabase inverted-index candidate search (KeyFrameDatabase.cc:79).
TPU re-design:

  * The vocabulary is a flat array of node descriptors; tree descent is a
    fixed-depth ladder of masked Hamming matmuls (descriptors vs the k
    children of the current node) — no pointers, fully batched over the
    whole feature set.
  * A BoW "vector" is a dense [vocab_size] tf-idf row (vocabularies here are
    10^3-10^4 words — dense rows beat sparse bookkeeping on TPU).
  * The keyframe database is just the stacked [K, vocab] matrix; candidate
    retrieval = one similarity matmul + masks, replacing the inverted index.
  * Training (k-medians with majority-bit centroids) replaces the offline
    DBoW2 ORBvoc.txt — the reference ships a pre-trained 1M-word tree; we
    train a compact vocabulary from data (build_vocabulary) which is
    adequate for loop candidates because scoring only ranks.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from orbslamm_tpu.ops.matching import hamming_matrix, unpack_bits


class Vocabulary(NamedTuple):
    nodes: jax.Array  # [n_nodes, 32] uint8 — level-major flat tree
    branching: int
    depth: int
    idf: jax.Array  # [n_words] float32
    # per-node validity for trees loaded from DBoW2 files (which are NOT
    # complete k-ary trees); None = every slot populated (trained vocabs)
    node_valid: jax.Array | None = None

    @property
    def n_words(self) -> int:
        return self.branching**self.depth


def _majority_centroid(desc_bits: np.ndarray, weight: np.ndarray) -> np.ndarray:
    """Majority-vote binary centroid. desc_bits [N,256] in {0,1}."""
    w = weight[:, None]
    mean = (desc_bits * w).sum(0) / max(w.sum(), 1e-9)
    return (mean >= 0.5).astype(np.uint8)


def _pack(bits: np.ndarray) -> np.ndarray:
    return np.packbits(bits.reshape(-1, 32, 8), axis=-1, bitorder="little").reshape(-1, 32)


def build_vocabulary(
    descriptors: np.ndarray,
    branching: int = 8,
    depth: int = 3,
    iters: int = 8,
    seed: int = 0,
) -> Vocabulary:
    """Hierarchical binary k-medians (k-majority) vocabulary training.

    descriptors: [N, 32] uint8 training set. Returns a Vocabulary with
    branching^depth leaf words, idf initialized from the training set.
    """
    rng = np.random.default_rng(seed)
    bits_all = np.unpackbits(descriptors, axis=-1, bitorder="little").astype(np.float32)

    levels: list[np.ndarray] = []

    def kmajority(bits: np.ndarray, k: int) -> tuple[np.ndarray, np.ndarray]:
        n = len(bits)
        if n == 0:
            cents = rng.integers(0, 2, (k, bits_all.shape[1])).astype(np.uint8)
            return cents, np.zeros(0, np.int64)
        init = bits[rng.choice(n, min(k, n), replace=False)]
        cents = np.concatenate(
            [init, rng.integers(0, 2, (k - len(init), bits.shape[1])).astype(np.float32)]
        ) if len(init) < k else init
        for _ in range(iters):
            d = np.abs(bits[:, None, :] - cents[None, :, :]).sum(-1)  # hamming
            assign = d.argmin(1)
            new = []
            for c in range(k):
                sel = bits[assign == c]
                if len(sel) == 0:
                    new.append(cents[c])
                else:
                    new.append((sel.mean(0) >= 0.5).astype(np.float32))
            cents = np.stack(new)
        d = np.abs(bits[:, None, :] - cents[None, :, :]).sum(-1)
        return cents.astype(np.uint8), d.argmin(1)

    # level 0
    groups = {(): bits_all}
    node_rows: list[np.ndarray] = []
    for level in range(depth):
        new_groups = {}
        rows = []
        for path in sorted(groups.keys()):
            bits = groups[path]
            cents, assign = kmajority(bits, branching)
            rows.append(cents)
            for c in range(branching):
                new_groups[path + (c,)] = bits[assign == c] if len(bits) else bits
        node_rows.append(np.concatenate(rows, 0))
        groups = new_groups
    nodes = np.concatenate(node_rows, 0)  # level-major
    nodes_packed = _pack(np.concatenate([r.reshape(-1, 256) for r in [nodes]], 0).astype(np.uint8))

    voc = Vocabulary(
        nodes=jnp.asarray(nodes_packed),
        branching=branching,
        depth=depth,
        idf=jnp.ones(branching**depth, jnp.float32),
    )
    # idf from training data
    words = np.asarray(assign_words(voc, jnp.asarray(descriptors), jnp.ones(len(descriptors), bool)))
    counts = np.bincount(words[words >= 0], minlength=voc.n_words) + 1.0
    idf = np.log(len(descriptors) / counts)
    return voc._replace(idf=jnp.asarray(idf, jnp.float32))


def load_orb_vocabulary_text(
    path, max_depth: int = 4
) -> Vocabulary:
    """Load a DBoW2 text vocabulary (the reference's ``ORBvoc.txt``,
    ORBVocabulary::loadFromTextFile via TemplatedVocabulary.h — format:
    header ``k L scoring weighting`` then one node per line
    ``parent_id is_leaf d0..d31 weight``, node ids implicit by line order
    starting at 1, root = 0).

    The pretrained tree is k=10, L=6 (~1M words). Dense BoW rows at 10^6
    words are wasteful on TPU, so the tree is truncated to ``max_depth``
    levels (10^4 words at the default) — the upper levels of the tree carry
    almost all of the discriminative power for loop RANKING, which is the
    only thing scores are used for here. Nodes that are leaves above the
    cut are propagated downward as single-child chains so their descriptors
    keep resolving to a word. idf of a cut word = max leaf weight below it.
    """
    from pathlib import Path

    lines = Path(path).read_text().split("\n")
    k, L = (int(x) for x in lines[0].split()[:2])
    depth = min(L, max_depth)

    n_nodes = 0
    parents: list[int] = [0]  # node 0 = root
    is_leaf: list[bool] = [False]
    descs: list[np.ndarray] = [np.zeros(32, np.uint8)]
    weights: list[float] = [0.0]
    for ln in lines[1:]:
        ln = ln.strip()
        if not ln:
            continue
        parts = ln.split()
        parents.append(int(parts[0]))
        is_leaf.append(bool(int(parts[1])))
        descs.append(np.asarray([int(x) for x in parts[2:34]], np.uint8))
        weights.append(float(parts[34]))
    n_nodes = len(parents)
    children: list[list[int]] = [[] for _ in range(n_nodes)]
    for i in range(1, n_nodes):
        children[parents[i]].append(i)

    # map the (possibly incomplete) tree onto the complete level-major array
    total = sum(k ** (l + 1) for l in range(depth))
    nodes = np.zeros((total, 32), np.uint8)
    valid = np.zeros((total,), bool)
    idf = np.zeros((k**depth,), np.float32)

    def max_leaf_weight(node: int) -> float:
        if is_leaf[node] or not children[node]:
            return weights[node]
        return max(max_leaf_weight(c) for c in children[node])

    # BFS over our complete-tree slots: (file_node, level, slot_in_level)
    stack = [(c, 0, i) for i, c in enumerate(children[0][:k])]
    while stack:
        node, level, slot = stack.pop()
        off = _level_offset(k, level)
        nodes[off + slot] = descs[node]
        valid[off + slot] = True
        if level == depth - 1:
            idf[slot] = max_leaf_weight(node)
            continue
        kids = children[node][:k]
        if not kids or is_leaf[node]:
            # early leaf (or cut): propagate as a single-child chain
            stack.append((node, level + 1, slot * k))
        else:
            for j, c in enumerate(kids):
                stack.append((c, level + 1, slot * k + j))

    return Vocabulary(
        nodes=jnp.asarray(nodes),
        branching=k,
        depth=depth,
        idf=jnp.asarray(idf),
        node_valid=jnp.asarray(valid),
    )


def _level_offset(branching: int, level: int) -> int:
    """Start row of ``level`` in the level-major nodes array."""
    return sum(branching ** (l + 1) for l in range(level))


def assign_words(voc: Vocabulary, desc: jax.Array, valid: jax.Array) -> jax.Array:
    """[M,32] descriptors -> [M] int32 word ids (-1 for invalid)."""
    M = desc.shape[0]
    node = jnp.zeros(M, jnp.int32)  # index within current level
    for level in range(voc.depth):
        off = _level_offset(voc.branching, level)
        child_base = node * voc.branching
        # gather the k children of each descriptor's current node
        idx = off + child_base[:, None] + jnp.arange(voc.branching)[None, :]
        child_desc = voc.nodes[idx]  # [M,k,32]
        d = jnp.sum(
            jnp.abs(
                unpack_bits(desc)[:, None, :] - unpack_bits(child_desc)
            ),
            axis=-1,
        )
        if voc.node_valid is not None:
            d = jnp.where(voc.node_valid[idx], d, jnp.inf)
        best = jnp.argmin(d, axis=-1).astype(jnp.int32)
        node = child_base + best
    return jnp.where(valid, node, -1)


def bow_vector(voc: Vocabulary, words: jax.Array) -> jax.Array:
    """[M] word ids -> L1-normalized tf-idf [n_words]."""
    n = voc.n_words
    safe = jnp.where(words >= 0, words, n)
    tf = jnp.zeros(n + 1, jnp.float32).at[safe].add(1.0)[:n]
    v = tf * voc.idf
    return v / jnp.maximum(v.sum(), 1e-9)


def bow_score(v1: jax.Array, v2: jax.Array) -> jax.Array:
    """DBoW2 L1 score: 1 - 0.5 * |v1 - v2|_1 (ScoringObject.cpp L1Scoring).

    v2 may be [K, n_words] for batched scoring against a database.
    """
    if v2.ndim == 2:
        return 1.0 - 0.5 * jnp.sum(jnp.abs(v1[None, :] - v2), axis=-1)
    return 1.0 - 0.5 * jnp.sum(jnp.abs(v1 - v2))
