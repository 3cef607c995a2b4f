"""Masked, fixed-iteration k-means for instance-feature grouping.

Equivalent of the reference's pure-torch cosine k-means
(`mmdet/models/utils/cluster.py:102` `cluster`, max 5 iterations at `:110`)
and the `group`/`complete` helpers of the DA detectors
(`DAFaster_rcnn.py:198-230`), re-expressed with static shapes:

- the per-sample/per-centroid python loops become one (N, K) distance matrix;
- "fewer samples than k → pad with the top-scoring feature"
  (`complete`, `DAFaster_rcnn.py:200-210`) is a masked select;
- the variable-size branches of `group` collapse into `jnp.where` on the
  (traced) valid count.

The agglomerative `Hierarchical` clusterer in the reference file is dead code
(never called from any live path) and is intentionally not reproduced.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def _cosine_dist(a: jnp.ndarray, b: jnp.ndarray, eps: float = 1e-8):
    """(N, D) x (K, D) → (N, K) cosine distances."""
    an = a / jnp.maximum(jnp.linalg.norm(a, axis=-1, keepdims=True), eps)
    bn = b / jnp.maximum(jnp.linalg.norm(b, axis=-1, keepdims=True), eps)
    return 1.0 - an @ bn.T


def masked_kmeans(feats: jnp.ndarray,
                  mask: jnp.ndarray,
                  k: int,
                  iters: int = 5) -> jnp.ndarray:
    """Cosine k-means over the masked rows of (N, D); returns (K, D) centroids.

    Centroids are initialized from the first k valid rows (wrapping if fewer)
    — deterministic, unlike the reference's `torch.randn` init
    (`cluster.py:99`), which makes early-training grouping noise-dominated.
    Empty clusters keep their previous centroid.
    """
    feats = feats.astype(jnp.float32)
    n, d = feats.shape
    # indices of valid rows, packed first (argsort of ~mask is stable)
    order = jnp.argsort(~mask)
    packed = feats[order]                      # valid rows first
    num_valid = jnp.sum(mask)
    init_idx = jnp.arange(k) % jnp.maximum(num_valid, 1)
    centroids = packed[init_idx]

    def body(_, cents):
        dist = _cosine_dist(feats, cents)                     # (N, K)
        assign = jnp.argmin(dist, axis=-1)
        onehot = jax.nn.one_hot(assign, k) * mask[:, None]    # (N, K)
        counts = onehot.sum(axis=0)                           # (K,)
        sums = onehot.T @ feats                               # (K, D)
        new = sums / jnp.maximum(counts[:, None], 1.0)
        return jnp.where(counts[:, None] > 0, new, cents)

    return jax.lax.fori_loop(0, iters, body, centroids)


def group_representatives(feats: jnp.ndarray,
                          mask: jnp.ndarray,
                          scores: jnp.ndarray,
                          k: int = 16,
                          kmeans_iters: int = 5
                          ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fixed-size (K, D) representative set of a masked feature bucket.

    Semantics of the reference `group` (`DAFaster_rcnn.py:212-230`):
    - more than k valid → k-means centroids;
    - up to k valid → the valid features, padded to k with the
      top-scoring feature (`complete`);
    - none valid → all-invalid output (loss contribution masked away).

    Returns (reps (K, D), rep_valid (K,)).
    """
    feats = feats.astype(jnp.float32)
    n, d = feats.shape
    num_valid = jnp.sum(mask)

    centroids = masked_kmeans(feats, mask, k, kmeans_iters)

    # padded variant: valid rows first, then copies of the best-scoring row
    order = jnp.argsort(~mask)                    # stable: valid first
    packed = feats[order]
    best_idx = jnp.argmax(jnp.where(mask, scores, -jnp.inf))
    best = feats[best_idx]
    slot = jnp.arange(k)
    take_valid = slot < num_valid
    padded = jnp.where(take_valid[:, None], packed[jnp.minimum(slot, n - 1)],
                       best[None, :])

    use_kmeans = num_valid > k
    reps = jnp.where(use_kmeans, centroids, padded)
    rep_valid = jnp.broadcast_to(num_valid > 0, (k,))
    return reps, rep_valid
