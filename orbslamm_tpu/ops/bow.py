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

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from orbslamm_tpu.ops.matching import hamming_matrix, unpack_bits


@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=("nodes", "idf", "node_valid"),
    meta_fields=("branching", "depth"),
)
@dataclasses.dataclass(frozen=True)
class Vocabulary:
    """Registered pytree with STATIC branching/depth so a Vocabulary can be
    passed straight into jitted functions (one compile per tree shape, not
    per vocabulary instance — each map trains its own)."""

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

    def _replace(self, **kw) -> "Vocabulary":
        return dataclasses.replace(self, **kw)


def _majority_centroid(desc_bits: np.ndarray, weight: np.ndarray) -> np.ndarray:
    """Majority-vote binary centroid. desc_bits [N,256] in {0,1}."""
    w = weight[:, None]
    mean = (desc_bits * w).sum(0) / max(w.sum(), 1e-9)
    return (mean >= 0.5).astype(np.uint8)


def _pack(bits: np.ndarray) -> np.ndarray:
    return np.packbits(bits.reshape(-1, 32, 8), axis=-1, bitorder="little").reshape(-1, 32)


@functools.partial(
    jax.jit, static_argnames=("branching", "depth", "iters", "seed")
)
def _build_voc_device(desc, valid, branching: int, depth: int, iters: int,
                      seed: int):
    """Hierarchical k-majority, fully on device: every level clusters ALL
    groups at once — Hamming distances via ONE [N,256]x[256,G*k] matmul
    (pop(a)+pop(c)-2<a,c>) masked to each descriptor's own group, and
    majority-vote centroid updates via segment-sums. Replaces the reference's
    offline DBoW2 k-means++ training with an MXU-shaped program.

    ``valid`` masks padding rows (inputs are bucketed to power-of-two sizes
    so retraining at different corpus sizes reuses the compiled program)."""
    bits = unpack_bits(desc) * valid[:, None]  # [N,256] f32 in {0,1}
    N = bits.shape[0]
    key = jax.random.PRNGKey(seed)
    group = jnp.zeros(N, jnp.int32)  # hierarchical slot id within the level
    pop_b = bits.sum(1)  # [N]
    level_cents = []

    for level in range(depth):
        G = branching**level
        Gk = G * branching
        # init: k random members per group (segmented top-k of random keys)
        key, k1 = jax.random.split(key)
        r = jax.random.uniform(k1, (N,))
        member = (group[None, :] == jnp.arange(G)[:, None]) & valid[None, :]
        _, init_idx = jax.lax.top_k(jnp.where(member, r[None, :], -1.0),
                                    branching)  # [G,k]
        cents = bits[init_idx.reshape(-1)]  # [Gk,256]
        col_group = jnp.arange(Gk) // branching

        def assign_to(cents):
            inner = bits @ cents.T  # [N,Gk] — the MXU does the Hamming work
            d = pop_b[:, None] + cents.sum(1)[None, :] - 2.0 * inner
            d = jnp.where(col_group[None, :] == group[:, None], d, jnp.inf)
            return jnp.argmin(d, axis=1).astype(jnp.int32)

        def one_iter(cents, _):
            assign = assign_to(cents)
            w = valid.astype(jnp.float32)
            sums = jnp.zeros((Gk, bits.shape[1]), jnp.float32).at[assign].add(
                bits * w[:, None]
            )
            cnts = jnp.zeros((Gk,), jnp.float32).at[assign].add(w)
            new = (sums / jnp.maximum(cnts[:, None], 1.0)) >= 0.5
            # empty cluster keeps its previous centroid
            cents = jnp.where(cnts[:, None] > 0, new.astype(jnp.float32), cents)
            return cents, None

        cents, _ = jax.lax.scan(one_iter, cents, None, length=iters)
        group = assign_to(cents)
        level_cents.append(cents)

    nodes_bits = jnp.concatenate(level_cents, 0)  # level-major
    # pack bits little-order into uint8 (np.packbits(bitorder="little") analog)
    weights = (2 ** jnp.arange(8, dtype=jnp.uint32)).astype(jnp.float32)
    packed = (nodes_bits.reshape(-1, 32, 8) @ weights).astype(jnp.uint8)
    n_real = valid.sum()
    counts = (
        jnp.zeros(branching**depth, jnp.float32)
        .at[group]
        .add(valid.astype(jnp.float32))
        + 1.0
    )
    idf = jnp.log(n_real / counts)
    return packed, idf


def build_vocabulary(
    descriptors: np.ndarray,
    branching: int = 8,
    depth: int = 3,
    iters: int = 8,
    seed: int = 0,
    max_train: int = 32768,
) -> Vocabulary:
    """Hierarchical binary k-majority vocabulary training (one jitted
    program — see _build_voc_device).

    descriptors: [N, 32] uint8 training set (strided down to ``max_train``
    if larger, padded to the next power of two otherwise so recompiles only
    happen per size bucket). Returns a Vocabulary with branching^depth leaf
    words, idf initialized from the training set.
    """
    desc = np.asarray(descriptors)
    if len(desc) > max_train:
        desc = desc[:: int(np.ceil(len(desc) / max_train))][:max_train]
    n = len(desc)
    cap = max(1 << int(np.ceil(np.log2(max(n, branching)))), branching)
    pad = np.zeros((cap - n, desc.shape[1]), np.uint8)
    valid = jnp.asarray(np.arange(cap) < n)
    nodes, idf = _build_voc_device(
        jnp.asarray(np.concatenate([desc, pad], 0)), valid,
        branching=branching, depth=depth, iters=iters, seed=seed,
    )
    return Vocabulary(nodes=nodes, branching=branching, depth=depth, idf=idf)


def save_vocabulary_npz(voc: Vocabulary, path) -> None:
    """Persist a trained vocabulary (the framework's own compact analog of
    the reference's shipped ORBvoc.txt data file, README.md build.sh:28-31)."""
    np.savez_compressed(
        path,
        nodes=np.asarray(voc.nodes),
        idf=np.asarray(voc.idf),
        branching=np.int32(voc.branching),
        depth=np.int32(voc.depth),
        node_valid=(
            np.asarray(voc.node_valid)
            if voc.node_valid is not None
            else np.zeros(0, bool)
        ),
    )


def load_vocabulary_npz(path) -> Vocabulary:
    z = np.load(path)
    nv = z["node_valid"]
    return Vocabulary(
        nodes=jnp.asarray(z["nodes"]),
        branching=int(z["branching"]),
        depth=int(z["depth"]),
        idf=jnp.asarray(z["idf"]),
        node_valid=jnp.asarray(nv) if nv.size else None,
    )


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


@jax.jit
def bow_rows(voc: Vocabulary, desc: jax.Array, valid: jax.Array) -> jax.Array:
    """Batched BoW transform: [B,M,32] descriptors + [B,M] validity ->
    [B,n_words] tf-idf rows in ONE jitted dispatch (the eager per-op path
    costs a host<->device round trip PER PRIMITIVE on remote-attached
    TPUs)."""
    return jax.vmap(lambda d, v: bow_vector(voc, assign_words(voc, d, v)))(
        desc, valid
    )


@jax.jit
def update_bow_rows(
    voc: Vocabulary,
    kf_desc: jax.Array,  # [K,M,32]
    kf_feat_valid: jax.Array,  # [K,M]
    kf_bow: jax.Array,  # [K,n_words]
    slots: jax.Array,  # [B] int32 keyframe slots to (re)compute
) -> jax.Array:
    """Recompute the BoW database rows for ``slots`` — one dispatch total."""
    rows = bow_rows(voc, kf_desc[slots], kf_feat_valid[slots])
    return kf_bow.at[slots].set(rows)


def bow_score(v1: jax.Array, v2: jax.Array) -> jax.Array:
    """DBoW2 L1 score: 1 - 0.5 * |v1 - v2|_1 (ScoringObject.cpp L1Scoring).

    v2 may be [K, n_words] for batched scoring against a database.
    """
    if v2.ndim == 2:
        return 1.0 - 0.5 * jnp.sum(jnp.abs(v1[None, :] - v2), axis=-1)
    return 1.0 - 0.5 * jnp.sum(jnp.abs(v1 - v2))
