"""Skip-gram with negative sampling (SGNS) — the node2vec trainer.

The reference delegates this to gensim ``Word2Vec(walks, size=dims,
window=10, min_count=0, sg=1, workers=8, iter=10)`` whose native C inner
loop runs hogwild SGD over 8 CPU threads (``node2vec/src/main.py:92-101``).
This is the TPU-native replacement, matching gensim-0.13.3 semantics:

  * dynamic windows — per center, the effective window b ~ U{1..window}
  * negative sampling — 5 draws from the unigram^0.75 table over the walk
    corpus (counts of nodes in walks), accidental hits on the true context
    masked out
  * frequent-token subsampling — gensim ``sample=1e-3``: token kept with
    prob (sqrt(f/s)+1)*s/f; sentences are *compacted* (windows span the
    gaps), re-rolled per epoch
  * linear LR decay alpha -> min_alpha over the whole run
  * loss: log sigma(v_c . u_o) + sum_neg log sigma(-v_c . u_n); SGD

Instead of hogwild races we do synchronous minibatch SGD: each step gathers
[B] centers x [2*window] contexts x [neg] negatives, computes the dots on
the MXU, and XLA turns the parameter gradients into segment scatter-adds.
One epoch = one shuffled pass over every (walk, position) center slot, like
gensim's stream.  Embedding = the input table (syn0).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from graphtpu.core.config import SGNSConfig


def corpus_counts(walks: jax.Array, n_nodes: int) -> jax.Array:
    """Token counts over the walk corpus (gensim builds its vocab from the
    walks, not the graph)."""
    flat = walks.reshape(-1)
    return jnp.bincount(
        jnp.where(flat >= 0, flat, n_nodes), length=n_nodes + 1
    )[:n_nodes]


def build_negative_cdf(counts: jax.Array, exponent: float = 0.75) -> jax.Array:
    """Cumulative unigram^0.75 table (gensim's negative-sampling table as a
    searchsorted cdf rather than a 100M-slot array)."""
    w = jnp.power(counts.astype(jnp.float32), exponent)
    return jnp.cumsum(w)


def subsample_and_compact(
    walks: jax.Array, counts: jax.Array, sample: float, key: jax.Array
) -> Tuple[jax.Array, jax.Array]:
    """Drop frequent tokens and compact each walk row (gensim semantics).

    Returns (compacted walks with -1 tail padding, valid-token mask).
    """
    if sample <= 0:
        return walks, walks >= 0
    total = jnp.maximum(counts.sum(), 1)
    freq = counts.astype(jnp.float32) / total
    keep_p = jnp.clip(
        (jnp.sqrt(freq / sample) + 1.0) * sample / jnp.maximum(freq, 1e-12),
        0.0,
        1.0,
    )
    valid = walks >= 0
    tok = jnp.maximum(walks, 0)
    keep = (jax.random.uniform(key, walks.shape) < keep_p[tok]) & valid
    # stable compaction: kept tokens first, original order preserved
    w = walks.shape[1]
    pos = jnp.arange(w)[None, :]
    sort_key = jnp.where(keep, pos, pos + w)
    order = jnp.argsort(sort_key, axis=1)
    compacted = jnp.take_along_axis(jnp.where(keep, walks, -1), order, axis=1)
    return compacted, compacted >= 0


def sgns_loss(
    params: Tuple[jax.Array, jax.Array],
    centers: jax.Array,      # [B]
    contexts: jax.Array,     # [B, W2]
    ctx_mask: jax.Array,     # [B, W2] bool
    negatives: jax.Array,    # [B, W2, N]
) -> jax.Array:
    syn0, syn1 = params
    b = centers.shape[0]
    v = syn0[jnp.maximum(centers, 0)]                  # [B, D]
    u = syn1[jnp.maximum(contexts, 0)]                 # [B, W2, D]
    un = syn1[negatives]                               # [B, W2, N, D]
    pos_logit = jnp.einsum(
        "bd,bwd->bw", v, u, preferred_element_type=jnp.float32
    )
    neg_logit = jnp.einsum(
        "bd,bwnd->bwn", v, un, preferred_element_type=jnp.float32
    )
    # accidental negatives equal to the true context (or the center) are
    # skipped, as gensim does
    neg_mask = (negatives != contexts[..., None]) & (
        negatives != centers[:, None, None]
    )
    m = ctx_mask & (centers >= 0)[:, None]
    pos_l = jax.nn.log_sigmoid(pos_logit) * m
    neg_l = jax.nn.log_sigmoid(-neg_logit) * (m[..., None] & neg_mask)
    # SUM, not mean: combined with the per-row collision normalisation in
    # the update (see train_sgns), one batched step reproduces the
    # magnitude of gensim's sequential per-pair SGD updates.
    return -(pos_l.sum() + neg_l.sum())


def _gather_batch(
    walks: jax.Array,       # [W, L] compacted
    slots: jax.Array,       # [B] flat center slot ids (walk*L + pos)
    window: int,
    key: jax.Array,
):
    wn, ln = walks.shape
    wi, pos = slots // ln, slots % ln
    centers = walks[wi, pos]
    b = jax.random.randint(key, (slots.shape[0],), 1, window + 1)  # dynamic window
    offs = jnp.concatenate(
        [jnp.arange(-window, 0), jnp.arange(1, window + 1)]
    )                                                   # [2w]
    cpos = pos[:, None] + offs[None, :]
    inb = (cpos >= 0) & (cpos < ln) & (jnp.abs(offs)[None, :] <= b[:, None])
    contexts = walks[wi[:, None], jnp.clip(cpos, 0, ln - 1)]
    mask = inb & (contexts >= 0)
    return centers, contexts, mask


def train_sgns(
    walks: jax.Array,
    n_nodes: int,
    cfg: SGNSConfig = SGNSConfig(),
    key: Optional[jax.Array] = None,
    counts: Optional[jax.Array] = None,
) -> Tuple[np.ndarray, np.ndarray]:
    """Train on a [W, L] walk tensor; returns (syn0, syn1) as numpy [V, D].

    Matches the reference training budget: ``cfg.epochs`` passes over every
    center slot (gensim iter=10), LR decaying linearly across the run.
    """
    if key is None:
        key = jax.random.key(cfg.seed)
    wn, ln = walks.shape
    if counts is None:
        counts = corpus_counts(walks, n_nodes)
    neg_cdf = build_negative_cdf(counts, cfg.ns_exponent)

    k_init, k_run = jax.random.split(key)
    # gensim init: syn0 ~ U(-0.5/d, 0.5/d), syn1neg = 0
    syn0 = (
        jax.random.uniform(k_init, (n_nodes, cfg.dim), jnp.float32) - 0.5
    ) / cfg.dim
    syn1 = jnp.zeros((n_nodes, cfg.dim), jnp.float32)

    slots_per_epoch = wn * ln
    # collision normalisation (below) makes per-epoch row movement scale
    # like V/B relative to gensim's sequential SGD, so cap the batch near
    # the vocabulary size to keep small-graph training gensim-equivalent.
    batch = min(cfg.batch_size, slots_per_epoch, max(64, n_nodes))
    steps_per_epoch = slots_per_epoch // batch
    total_steps = max(cfg.epochs * steps_per_epoch, 1)

    grad_fn = jax.grad(sgns_loss)

    @partial(jax.jit, donate_argnums=(0,))
    def run_epoch(params, epoch_idx, ekey):
        k_sub, k_perm, k_steps = jax.random.split(ekey, 3)
        cwalks, _ = subsample_and_compact(walks, counts, cfg.subsample, k_sub)
        perm = jax.random.permutation(k_perm, slots_per_epoch)

        def step(params, it):
            i, kk = it
            k_win, k_neg = jax.random.split(kk)
            slots = jax.lax.dynamic_slice(perm, (i * batch,), (batch,))
            centers, contexts, mask = _gather_batch(cwalks, slots, cfg.window, k_win)
            u = jax.random.uniform(k_neg, (batch, 2 * cfg.window, cfg.negative))
            negs = jnp.searchsorted(
                neg_cdf, u * neg_cdf[-1], side="right"
            ).astype(jnp.int32)
            negs = jnp.minimum(negs, n_nodes - 1)
            gstep = epoch_idx * steps_per_epoch + i
            lr = cfg.alpha - (cfg.alpha - cfg.min_alpha) * gstep / total_steps
            g0, g1 = grad_fn(params, centers, contexts, mask, negs)
            # Collision normalisation: a row hit k times in one batch gets
            # its summed gradient divided by k, so the per-occurrence step
            # matches gensim's sequential update magnitude regardless of
            # batch size / vocabulary size (stability on tiny vocabs).
            c0 = jnp.bincount(
                jnp.where(centers >= 0, centers, n_nodes), length=n_nodes + 1
            )[:n_nodes]
            hits1 = jnp.concatenate(
                [jnp.where(mask, contexts, n_nodes).reshape(-1),
                 negs.reshape(-1)]
            )
            c1 = jnp.bincount(hits1, length=n_nodes + 1)[:n_nodes]
            g0 = g0 / jnp.maximum(c0, 1)[:, None]
            g1 = g1 / jnp.maximum(c1, 1)[:, None]
            syn0, syn1 = params
            return (syn0 - lr * g0, syn1 - lr * g1), None

        keys = jax.random.split(k_steps, steps_per_epoch)
        params, _ = jax.lax.scan(
            step, params, (jnp.arange(steps_per_epoch), keys)
        )
        return params

    params = (syn0, syn1)
    for e in range(cfg.epochs):
        params = run_epoch(params, e, jax.random.fold_in(k_run, e))
    syn0, syn1 = params
    return np.asarray(syn0), np.asarray(syn1)
