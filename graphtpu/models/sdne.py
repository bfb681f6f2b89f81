"""SDNE scaffold autoencoder — JAX/optax port of the reference semantics.

The reference "SDNE" (``SDNE/SDNE.py:66-176``) is a sparse autoencoder on
MNIST used as the SDNE scaffold: net [784,400,100,300,784], ReLU hiddens,
linear output, *embedding = layer-2 pre-activation* (``answer`` =
hidden1 @ w2 + b2, ``SDNE.py:95,170-172``), loss =

    mean(l2_loss(y - y_) / minibatch)                     (SDNE.py:104)
  + 1e-1 * sum l2_loss(all W, b)                          (SDNE.py:106-109)
  + 1e-1 * KL(p1=0.005 || mean(relu(hidden2)))            (SDNE.py:112-122)

with tf.l2_loss(x) = sum(x^2)/2, Adam lr=0.01, minibatch 100, 200k steps.
We reproduce the losses exactly (same constants, same reduction quirks) so
per-layer activations are comparable for parity checks.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from graphtpu.core.config import SDNEConfig


def init_params(cfg: SDNEConfig, key: jax.Array) -> List[Tuple[jax.Array, jax.Array]]:
    """truncated_normal(stddev=0.1) weights, zero biases (SDNE.py:74-84)."""
    params = []
    for i in range(len(cfg.units) - 1):
        key, k = jax.random.split(key)
        w = 0.1 * jax.random.truncated_normal(
            k, -2.0, 2.0, (cfg.units[i], cfg.units[i + 1]), jnp.float32
        )
        b = jnp.zeros((cfg.units[i + 1],), jnp.float32)
        params.append((w, b))
    return params


def forward(params, x: jax.Array) -> Dict[str, jax.Array]:
    """Returns all the reference's named tensors for activation parity."""
    (w1, b1), (w2, b2), (w3, b3), (w4, b4) = params
    hidden1 = jax.nn.relu(x @ w1 + b1)
    answer = hidden1 @ w2 + b2            # the embedding (pre-activation)
    hidden2 = jax.nn.relu(answer)
    hidden3 = jax.nn.relu(hidden2 @ w3 + b3)
    y = hidden3 @ w4 + b4                 # linear output
    return {"hidden1": hidden1, "answer": answer, "hidden2": hidden2,
            "hidden3": hidden3, "y": y}


def _l2(x):
    return jnp.sum(jnp.square(x)) / 2.0  # tf.nn.l2_loss


def loss_fn(params, x: jax.Array, cfg: SDNEConfig):
    acts = forward(params, x)
    recon = _l2(acts["y"] - x) / (1.0 * cfg.minibatch)
    reg1 = sum(_l2(w) + _l2(b) for (w, b) in params)
    p1 = cfg.sparsity_p
    sumq = jnp.mean(acts["hidden2"])
    reg2 = p1 * jnp.log(p1 / (sumq + 1e-8)) + (1.0 - p1) * jnp.log(
        (1.0 - p1) / (1.0 - sumq + 1e-8)
    )
    total = recon + cfg.l2_coeff * reg1 + cfg.kl_coeff * reg2
    return total, {"recon": recon, "reg1": reg1, "reg2": reg2}


def train_sdne(
    x_train: np.ndarray,
    cfg: SDNEConfig = SDNEConfig(),
    steps: int | None = None,
    log_every: int = 0,
):
    """Train; returns (params, embed_fn) with embed_fn(x) = layer-2
    pre-activation (the reference's ``answer``)."""
    steps = cfg.steps if steps is None else steps
    key = jax.random.key(cfg.seed)
    params = init_params(cfg, key)
    opt = optax.adam(cfg.learning_rate)
    opt_state = opt.init(params)
    x_all = jnp.asarray(x_train, jnp.float32)
    n = x_all.shape[0]
    mb = min(cfg.minibatch, n)
    nb = max(n // mb, 1)

    @jax.jit
    def step(params, opt_state, i):
        start = (i % nb) * mb
        xb = jax.lax.dynamic_slice(
            x_all, (start, 0), (mb, x_all.shape[1])
        )
        (l, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, xb, cfg
        )
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, (l, aux)

    for i in range(steps):
        params, opt_state, (l, aux) = step(params, opt_state, i)
        if log_every and i % log_every == 0:
            print(
                f"step {i}, loss {float(l):g}, recon {float(aux['recon']):g}, "
                f"reg1 {float(aux['reg1']):g}, reg2 {float(aux['reg2']):g}"
            )

    def embed(x):
        return np.asarray(forward(params, jnp.asarray(x, jnp.float32))["answer"])

    return params, embed
