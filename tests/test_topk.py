import jax
import jax.numpy as jnp
import numpy as np

from graphtpu.kernels.topk import (
    topk_rows,
    merge_topk,
    bounded_topk_accumulate,
    bounded_slots_to_topk,
)


def test_topk_rows_with_diag_exclusion():
    s = jnp.array([[0.5, 1.0, 0.2], [0.9, 0.1, 0.8]])
    vals, idx = topk_rows(s, 2, exclude_diag_offset=0)
    np.testing.assert_array_equal(np.asarray(idx), [[1, 2], [0, 2]])


def test_merge_topk():
    va, ia = jnp.array([[3.0, 1.0]]), jnp.array([[5, 7]])
    vb, ib = jnp.array([[2.0, 0.5]]), jnp.array([[9, 11]])
    mv, mi = merge_topk(va, ia, vb, ib, 3)
    np.testing.assert_array_equal(np.asarray(mi), [[5, 9, 7]])


def test_bounded_accumulate_matches_reference_smoke():
    """The FixedCacheMap.java:134-148 main() smoke test, exactly:

    cap=3; put(1,.5) put(2,3) put(3,.1) put(4,8) put(4,8) put(1,.6) put(5,1)
    -> (3,.1) evicted by (4,8); 4 accumulates to 16; 1 accumulates to 1.1;
    (5,1) can't evict min 1.1 -> final {1:1.1, 2:3, 4:16}
    """
    keys = jnp.array([[1, 2, 3, 4, 4, 1, 5]], jnp.int32)
    vals = jnp.array([[0.5, 3.0, 0.1, 8.0, 8.0, 0.6, 1.0]], jnp.float32)
    sk, sv = bounded_topk_accumulate(keys, vals, capacity=3)
    out_v, out_k = bounded_slots_to_topk(sk, sv, 3)
    np.testing.assert_array_equal(np.asarray(out_k)[0], [4, 2, 1])
    np.testing.assert_allclose(np.asarray(out_v)[0], [16.0, 3.0, 1.1])


def test_bounded_accumulate_eviction_requires_strictly_greater():
    # value equal to the min must NOT evict (Java: value > getMinValue())
    keys = jnp.array([[1, 2, 3]], jnp.int32)
    vals = jnp.array([[1.0, 2.0, 1.0]], jnp.float32)
    sk, sv = bounded_topk_accumulate(keys, vals, capacity=2)
    out_v, out_k = bounded_slots_to_topk(sk, sv, 2)
    np.testing.assert_array_equal(np.asarray(out_k)[0], [2, 1])


def test_bounded_accumulate_skips_negative_keys_and_batches():
    keys = jnp.array([[1, -1, 1], [7, 8, -1]], jnp.int32)
    vals = jnp.array([[1.0, 99.0, 2.0], [5.0, 1.0, 99.0]], jnp.float32)
    sk, sv = bounded_topk_accumulate(keys, vals, capacity=4)
    out_v, out_k = bounded_slots_to_topk(sk, sv, 2)
    np.testing.assert_array_equal(np.asarray(out_k), [[1, -1], [7, 8]])
    np.testing.assert_allclose(np.asarray(out_v), [[3.0, 0.0], [5.0, 1.0]])


def test_bounded_accumulate_random_vs_reference_python():
    """Fuzz against a literal python port of FixedCacheMap semantics."""
    rng = np.random.default_rng(0)
    n, cap = 60, 5
    keys = rng.integers(0, 12, size=n)
    vals = rng.random(n).astype(np.float32)

    # reference-semantics oracle
    slots = {}  # key -> val
    for k, v in zip(keys, vals):
        k = int(k)
        if k in slots:
            slots[k] += v
        elif len(slots) < cap:
            slots[k] = float(v)
        else:
            mink = min(slots, key=lambda kk: slots[kk])
            if v > slots[mink]:
                del slots[mink]
                slots[k] = float(v)

    sk, sv = bounded_topk_accumulate(
        jnp.asarray(keys[None, :], jnp.int32),
        jnp.asarray(vals[None, :]),
        capacity=cap,
    )
    got = {
        int(k): float(v)
        for k, v in zip(np.asarray(sk)[0], np.asarray(sv)[0])
        if k >= 0
    }
    assert set(got) == set(slots)
    for k in slots:
        np.testing.assert_allclose(got[k], slots[k], rtol=1e-5)


def test_segment_topk_matches_dense():
    from graphtpu.kernels.topk import segment_topk

    rng = np.random.default_rng(0)
    t, n, v, k = 5, 200, 30, 6
    targets = rng.integers(-1, v, size=(t, n))
    vals = rng.random((t, n)).astype(np.float32)
    got_v, got_i = segment_topk(
        jnp.asarray(targets), jnp.asarray(vals), k, v
    )
    dense = np.zeros((t, v), np.float32)
    for r in range(t):
        for j in range(n):
            if targets[r, j] >= 0:
                dense[r, targets[r, j]] += vals[r, j]
    for r in range(t):
        want_idx = np.argsort(-dense[r])[:k]
        np.testing.assert_allclose(
            np.asarray(got_v)[r], dense[r][want_idx], rtol=1e-5
        )
        # indices must agree where values are distinct
        np.testing.assert_allclose(
            dense[r][np.asarray(got_i)[r]], dense[r][want_idx], rtol=1e-5
        )


def test_segment_topk_padding_and_empty():
    from graphtpu.kernels.topk import segment_topk

    targets = jnp.array([[-1, -1, 2]], jnp.int32)
    vals = jnp.array([[9.0, 9.0, 0.5]], jnp.float32)
    v_out, i_out = segment_topk(targets, vals, 4, 10)
    np.testing.assert_allclose(np.asarray(v_out)[0], [0.5, 0, 0, 0])
    assert list(np.asarray(i_out)[0]) == [2, -1, -1, -1]


def test_segment_sum_1d_matches_bincount():
    from graphtpu.kernels.topk import segment_sum_1d

    rng = np.random.default_rng(0)
    ids = rng.integers(-1, 12, size=500).astype(np.int32)
    vals = rng.random(500).astype(np.float32)
    got = np.asarray(segment_sum_1d(jnp.asarray(ids), jnp.asarray(vals), 12))
    want = np.bincount(
        ids[ids >= 0], weights=vals[ids >= 0], minlength=12
    ).astype(np.float32)
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_pair_topk_by_source_matches_dense():
    from graphtpu.kernels.topk import pair_topk_by_source

    rng = np.random.default_rng(1)
    n, v, k = 4000, 17, 5
    srcs = rng.integers(-1, v, size=n).astype(np.int32)
    tgts = rng.integers(-1, v, size=n).astype(np.int32)
    vals = rng.random(n).astype(np.float32)
    dense = np.zeros((v, v), np.float32)
    ok = (srcs >= 0) & (tgts >= 0)
    np.add.at(dense, (srcs[ok], tgts[ok]), vals[ok])
    gv, gi = pair_topk_by_source(
        jnp.asarray(srcs), jnp.asarray(tgts), jnp.asarray(vals),
        jnp.arange(v, dtype=jnp.int32), k,
    )
    gv, gi = np.asarray(gv), np.asarray(gi)
    for r in range(v):
        order = np.argsort(-dense[r], kind="stable")[:k]
        np.testing.assert_allclose(np.sort(gv[r]), np.sort(dense[r][order]), rtol=1e-4)
        # indices must agree as sets when values are distinct enough
        assert set(gi[r][gv[r] > 0]) <= set(np.where(dense[r] > 0)[0])


def test_pair_topk_by_source_counts_and_subset():
    from graphtpu.kernels.topk import pair_topk_by_source

    srcs = jnp.asarray([2, 2, 5, 5, 5, -1], jnp.int32)
    tgts = jnp.asarray([1, 1, 0, 3, 0, 4], jnp.int32)
    vals = jnp.asarray([1.0, 2.0, 4.0, 1.0, 2.0, 9.0], jnp.float32)
    counts = jnp.asarray([1, 1, 3, 1, 1, 2], jnp.float32)
    gv, gi = pair_topk_by_source(
        srcs, tgts, vals, jnp.asarray([2, 5], jnp.int32), 2, counts=counts
    )
    np.testing.assert_allclose(np.asarray(gv), [[1.0, 0.0], [3.0, 0.5]])
    assert np.asarray(gi).tolist() == [[1, -1], [0, 3]]
