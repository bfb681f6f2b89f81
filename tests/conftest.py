"""Test harness: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding is validated the way the driver does it — with
``xla_force_host_platform_device_count`` — since only one real TPU chip is
reachable.  These env vars must be set before jax initialises.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# The image's axon TPU plugin overrides the JAX_PLATFORMS env var, so pin
# the platform through the config API (must happen before first backend use).
jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest

import graphtpu  # noqa: E402  (trigger registry setup)


@pytest.fixture(scope="session")
def karate():
    """The karate-club graph (node2vec/graph/karate.edgelist, ids 1..34)."""
    path = "/root/reference/node2vec/graph/karate.edgelist"
    if os.path.exists(path):
        return graphtpu.read_edgelist_graph(path, n_nodes=35)
    # fall back to a deterministic random graph of similar size
    rng = np.random.default_rng(0)
    edges = rng.integers(0, 35, size=(78, 2))
    edges = edges[edges[:, 0] != edges[:, 1]]
    return graphtpu.build_graph(edges, n_nodes=35)


@pytest.fixture(scope="session")
def ring16():
    """A 16-node ring: every node has degree 2; easy closed forms."""
    edges = np.array([[i, (i + 1) % 16] for i in range(16)])
    return graphtpu.build_graph(edges, n_nodes=16)


@pytest.fixture(scope="session")
def small_random():
    """Deterministic 64-node random graph, no isolated nodes."""
    rng = np.random.default_rng(42)
    edges = rng.integers(0, 64, size=(400, 2))
    edges = edges[edges[:, 0] != edges[:, 1]]
    edges = np.concatenate([edges, np.stack([np.arange(64), (np.arange(64) + 1) % 64], 1)])
    return graphtpu.build_graph(edges, n_nodes=64)
