import jax
import os
import jax.numpy as jnp
import numpy as np
import pytest

import graphtpu
from graphtpu.core.config import DeepSimConfig, LEConfig, SDNEConfig
from graphtpu.models.sdne import forward, init_params, loss_fn, train_sdne
from graphtpu.models.deepsim import (
    build_sim_table,
    lookup_sim,
    deepsim_loss,
    train_deepsim,
)
from graphtpu.models.lapeigen import (
    knn_heat_affinity,
    laplacian_eigenmaps,
    le_embed_points,
    make_swiss_roll,
)


# ------------------------------------------------------------------ SDNE


def test_sdne_loss_matches_reference_formula():
    """Recompute the three loss terms by hand with tf semantics."""
    cfg = SDNEConfig(units=(6, 5, 4, 5, 6), minibatch=3)
    params = init_params(cfg, jax.random.key(0))
    x = jnp.asarray(np.random.default_rng(0).random((3, 6)).astype(np.float32))
    total, aux = loss_fn(params, x, cfg)
    acts = forward(params, x)
    recon = float(jnp.sum((acts["y"] - x) ** 2) / 2.0 / 3.0)
    np.testing.assert_allclose(float(aux["recon"]), recon, rtol=1e-6)
    reg1 = sum(
        float(jnp.sum(w**2) / 2 + jnp.sum(b**2) / 2) for (w, b) in params
    )
    np.testing.assert_allclose(float(aux["reg1"]), reg1, rtol=1e-6)
    p1 = 0.005
    sumq = float(jnp.mean(acts["hidden2"]))
    reg2 = p1 * np.log(p1 / (sumq + 1e-8)) + (1 - p1) * np.log(
        (1 - p1) / (1 - sumq + 1e-8)
    )
    np.testing.assert_allclose(float(aux["reg2"]), reg2, rtol=1e-5)
    np.testing.assert_allclose(
        float(total), recon + 0.1 * reg1 + 0.1 * reg2, rtol=1e-6
    )


def test_sdne_trains_reconstruction_down():
    rng = np.random.default_rng(0)
    x = rng.random((200, 6)).astype(np.float32)
    cfg = SDNEConfig(units=(6, 8, 3, 8, 6), minibatch=20, learning_rate=0.01)
    params, embed = train_sdne(x, cfg, steps=300)
    emb = embed(x)
    assert emb.shape == (200, 3)
    _, aux0 = loss_fn(init_params(cfg, jax.random.key(cfg.seed)), jnp.asarray(x[:20]), cfg)
    _, aux1 = loss_fn(params, jnp.asarray(x[:20]), cfg)
    assert float(aux1["recon"]) < float(aux0["recon"]) * 0.5


# ---------------------------------------------------------------- DeepSim


def test_sim_table_lookup():
    sims = {0: [(3, 0.5), (1, 0.2)], 2: [(0, 0.9)]}
    table = build_sim_table(sims, n_nodes=4)
    src = jnp.array([0, 0, 2, 1], jnp.int32)
    dst = jnp.array([[3], [2], [0], [3]], jnp.int32)
    got = np.asarray(lookup_sim(table, src, dst))[:, 0]
    # (0,3)=0.5 hit; (0,2) miss -> min sim of 0 = 0.2; (2,0)=0.9;
    # (1,*) empty -> 0.0
    np.testing.assert_allclose(got, [0.5, 0.2, 0.9, 0.0], atol=1e-7)


def test_deepsim_loss_equals_dense_softmax_ce():
    v, d, b, w = 12, 4, 3, 2
    rng = np.random.default_rng(0)
    params = (
        jnp.asarray(rng.normal(size=(v, d)).astype(np.float32)),
        jnp.zeros((d,), jnp.float32),
        jnp.asarray(rng.normal(size=(d, v)).astype(np.float32)),
        jnp.zeros((v,), jnp.float32),
    )
    centers = jnp.asarray(rng.integers(0, v, b).astype(np.int32))
    win = jnp.asarray(rng.integers(0, v, (b, 2 * w + 1)).astype(np.int32))
    vals = jnp.asarray(rng.random((b, 2 * w + 1)).astype(np.float32))
    got = float(deepsim_loss(params, centers, win, vals))
    # dense reference: y[j] = sum of vals at window slots equal to j
    onehot = jax.nn.one_hot(centers, v)
    hidden = jax.nn.relu(onehot @ params[0] + params[1])
    logits = hidden @ params[2] + params[3]
    dense_y = jnp.zeros((b, v))
    for i in range(b):
        for m in range(2 * w + 1):
            dense_y = dense_y.at[i, win[i, m]].add(vals[i, m])
    want = float(
        jnp.mean(-jnp.sum(dense_y * jax.nn.log_softmax(logits, axis=1), axis=1))
    )
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_deepsim_trains(small_random):
    g = small_random
    from graphtpu.walks.walker import simulate_walks
    from graphtpu.simrank.exact import exact_simrank

    sim = np.asarray(exact_simrank(g))
    sim_dict = {
        v: [(int(i), float(sim[v, i])) for i in np.argsort(-sim[v])[:10] if sim[v, i] > 0]
        for v in range(g.n_nodes)
    }
    table = build_sim_table(sim_dict, g.n_nodes)
    walks = np.asarray(
        simulate_walks(g, num_walks=3, walk_length=12, key=jax.random.key(0))
    )
    cfg = DeepSimConfig(dim=16, window=3, minibatch=32)
    seen = []
    emb = train_deepsim(
        walks, table, g.n_nodes, cfg, steps=60,
        checkpoint_every=30, checkpoint_fn=lambda i, e: seen.append(i),
    )
    assert emb.shape == (g.n_nodes, 16)
    # scanned chunks checkpoint at every checkpoint_every boundary with the
    # last completed step index (reference dumps every 1000 iters,
    # DeepSim.py:182-186)
    assert seen == [29, 59]
    assert np.isfinite(emb).all()


# ---------------------------------------------------------------- LE


def test_le_recovers_circle_structure():
    """Points on a circle: LE with kNN graph embeds neighbours nearby."""
    n = 60
    theta = np.linspace(0, 2 * np.pi, n, endpoint=False)
    x = np.stack([np.cos(theta), np.sin(theta)], axis=1).astype(np.float32)
    y, evals = le_embed_points(x, LEConfig(k_neighbors=4, heat_t=1.0, out_dim=2))
    assert y.shape == (n, 2)
    assert (evals > 1e-5).all()
    # consecutive points stay closer than antipodal ones, on average
    d_next = np.linalg.norm(y - np.roll(y, 1, axis=0), axis=1).mean()
    d_far = np.linalg.norm(y - np.roll(y, n // 2, axis=0), axis=1).mean()
    assert d_next < d_far * 0.5


def test_knn_affinity_symmetric():
    x = jnp.asarray(np.random.default_rng(0).random((30, 3)).astype(np.float32))
    w = np.asarray(knn_heat_affinity(x, 5, 2.0))
    np.testing.assert_allclose(w, w.T, atol=1e-7)
    assert (np.diag(w) == 0).all()


def test_swiss_roll_shape():
    x = make_swiss_roll(500)
    assert x.shape == (500, 3)
    # radius grows with angle: points not coplanar
    assert np.linalg.matrix_rank(x - x.mean(0)) == 3


def test_viz_writes_pngs(tmp_path):
    from graphtpu.viz import (
        plot_embedding_2d,
        plot_simrank_neighborhood,
        plot_swiss_roll_3d,
    )

    y = np.random.default_rng(0).random((50, 2))
    p1 = plot_embedding_2d(y, str(tmp_path / "e.png"), color=y[:, 0])
    x = make_swiss_roll(200)
    p2 = plot_swiss_roll_3d(x, str(tmp_path / "s.png"))
    sims = {0: [(1, 0.5), (2, 0.3)], 1: [(2, 0.2)]}
    p3 = plot_simrank_neighborhood(sims, 0, str(tmp_path / "n.png"))
    for p in (p1, p2, p3):
        assert os.path.getsize(p) > 1000
