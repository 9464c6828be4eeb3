"""Permutation engine: edge coloring, within-tile routing, multi-tile
routing with slack padding — numpy oracle, Pallas interpret mode."""

import jax.numpy as jnp
import numpy as np
import pytest

from tpu_spmv.kernels import permute


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_edge_coloring_proper(seed):
    rng = np.random.default_rng(seed)
    perm = rng.permutation(128 * 128)
    src_r = perm // 128
    dst_r = np.arange(128 * 128) // 128
    colors = permute.color_bipartite(src_r, dst_r)
    for rows in (src_r, dst_r):
        key = rows * 128 + colors
        assert len(np.unique(key)) == len(key)


def test_edge_coloring_partial_degree():
    """Sparse multigraph (not 128-regular) also colors properly."""
    rng = np.random.default_rng(3)
    src = rng.integers(0, 128, 5000)
    dst = rng.integers(0, 128, 5000)
    # degree cap: thin the edges so every node degree <= 128 (random 5000
    # over 128 nodes averages ~39)
    colors = permute.color_bipartite(src, dst)
    assert len(np.unique(src * 128 + colors)) == len(src)
    assert len(np.unique(dst * 128 + colors)) == len(dst)


def test_tile_permutation_exact():
    rng = np.random.default_rng(4)
    perm = rng.permutation(128 * 128)
    planes = permute.plan_tile_permutation(perm)
    x = jnp.asarray(rng.random((128, 128)), jnp.float32)
    out = permute.apply_tile_permutation(x, planes, interpret=True)
    np.testing.assert_array_equal(
        np.asarray(out), permute.permute_reference(np.asarray(x), perm)
    )


def test_tile_permutation_identity():
    planes = permute.plan_tile_permutation(np.arange(128 * 128))
    x = jnp.asarray(np.random.default_rng(5).random((128, 128)), jnp.float32)
    out = permute.apply_tile_permutation(x, planes, interpret=True)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(x))


@pytest.mark.parametrize("n", [1000, 16384, 60000])
def test_multi_tile_permutation(n):
    rng = np.random.default_rng(6)
    perm = rng.permutation(n)
    plan = permute.plan_permutation(perm)
    x = jnp.asarray(rng.random(n), jnp.float32)
    out = permute.apply_permutation(plan, x, interpret=True)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(x)[perm])


def test_multi_tile_sorted_like_permutation():
    """The SpMV-pipeline shape: segment-sorted -> row-sorted reorder."""
    rng = np.random.default_rng(7)
    n = 100_000
    rows = rng.integers(0, 5000, n)
    seg = rng.integers(0, 400, n)
    seg_order = np.lexsort((rows, seg))
    row_order = np.lexsort((seg, rows))
    # perm taking seg-sorted data into row-sorted data
    inv = np.empty(n, dtype=np.int64)
    inv[seg_order] = np.arange(n)
    perm = inv[row_order]
    plan = permute.plan_permutation(perm)
    x = jnp.asarray(rng.random(n), jnp.float32)
    out = permute.apply_permutation(plan, x, interpret=True)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(x)[perm])


def test_permutation_is_pytree():
    import jax

    plan = permute.plan_permutation(np.random.default_rng(8).permutation(2000))
    leaves, treedef = jax.tree_util.tree_flatten(plan)
    plan2 = jax.tree_util.tree_unflatten(treedef, leaves)
    assert plan2.n == plan.n

def test_b1_fold_alias_invariant():
    """Round-2 engine v2 regression: the b1->a3 fold must use each source
    row's REAL consumer, not invert ``rowsrc`` (idle dest rows self-map
    onto rows that may also be real sources, so rowsrc is not injective).
    A small n relative to the padded tile leaves many idle rows, which is
    exactly the aliasing-prone shape."""
    rng = np.random.default_rng(11)
    for n in (300, 5000, 20000):
        perm = rng.permutation(n)
        plan = permute.plan_permutation(perm)
        x = jnp.asarray(rng.random(n), jnp.float32)
        out = permute.apply_permutation(plan, x, interpret=True)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(x)[perm])


def test_host_planes_out_param():
    """plan_permutation fills host_planes with numpy planes whose a3 is
    already b1-composed — applying (a1, a2, a3, exchange, b2, b3) by hand
    on the host must reproduce the permutation."""
    rng = np.random.default_rng(12)
    n = 9000
    perm = rng.permutation(n)
    hp = {}
    plan = permute.plan_permutation(perm, host_planes=hp)
    assert set(hp) >= {"a1", "a2", "a3", "rowsrc", "b2", "b3"}
    for k in ("a1", "a2", "a3", "b2", "b3"):
        assert isinstance(hp[k], np.ndarray) and hp[k].shape[1:] == (128, 128)
    T, r_p = plan.ntiles, plan.real_per_tile
    x = rng.random(n)
    xf = np.zeros(T * r_p)
    xf[:n] = x
    z = np.zeros((T, 128, 128))
    z.reshape(T, -1)[:, :r_p] = xf.reshape(T, r_p)

    def gather_rows(a, g):           # per-row lane gather
        return np.take_along_axis(a, g, axis=-1)

    z = gather_rows(z, hp["a1"])
    z = np.swapaxes(z, 1, 2)
    z = gather_rows(z, hp["a2"])
    z = np.swapaxes(z, 1, 2)
    z = gather_rows(z, hp["a3"])
    rows = z.reshape(T * 128, 128)[hp["rowsrc"]].reshape(T, 128, 128)
    rows = np.swapaxes(rows, 1, 2)
    rows = gather_rows(rows, hp["b2"])
    rows = np.swapaxes(rows, 1, 2)
    rows = gather_rows(rows, hp["b3"])
    got = rows.reshape(T, -1)[:, :r_p].reshape(-1)[:n]
    np.testing.assert_array_equal(got, x[perm])


def test_two_level_device_false_numpy_leaves(rng):
    """device=False must thread through the two-level path (review r5:
    it used to upload eagerly, defeating the chunked pack's single
    batched device_put); the host plan still applies exactly."""
    import jax

    n = 1_700_000                       # past the single-level cap
    perm = rng.permutation(n)
    plan = permute.plan_permutation_auto(perm, device=False)
    assert type(plan).__name__ == "TwoLevelPlan"
    leaves = jax.tree_util.tree_leaves(plan)
    assert leaves and not any(isinstance(l, jax.Array) for l in leaves)
    x = jnp.asarray(rng.random(n), jnp.float32)
    y = np.asarray(permute.apply_permutation(jax.device_put(plan), x,
                                             interpret=True))
    np.testing.assert_array_equal(y, np.asarray(x)[perm])
