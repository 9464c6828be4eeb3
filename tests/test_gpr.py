"""GPR (gather-permute-reduce) general CSR SpMV: oracle tests across
pattern classes (interpret mode on CPU)."""

import jax.numpy as jnp
import numpy as np
import pytest

from tpu_spmv.kernels import gpr
from tpu_spmv import utils


def _check(mat, **kw):
    packed = gpr.pack_gpr(mat.astype(np.float32), **kw)
    x = jnp.asarray(np.random.default_rng(0).random(mat.shape[1]), jnp.float32)
    y = gpr.spmv_gpr(packed, x, interpret=True)
    ref = mat @ np.asarray(x, np.float64)
    denom = max(np.max(np.abs(ref)), 1e-30)
    rel = np.max(np.abs(np.asarray(y, np.float64) - ref)) / denom
    assert rel < 2e-5, rel
    return packed


CASES = {
    "random": lambda: utils.random_sparse(800, 700, 0.04, seed=95),
    "random_narrow": lambda: utils.random_sparse(4000, 4000, 8 / 4000,
                                                 seed=96),
    "power_law_hubs": lambda: utils.power_law(1500, 1500, 8, seed=97),
    "laplacian": lambda: utils.laplacian_2d(25, 25),
    "banded": lambda: utils.banded(2000, 6, seed=98),
    "rect_wide": lambda: utils.random_sparse(300, 2000, 0.02, seed=99),
    "rect_tall": lambda: utils.random_sparse(2000, 300, 0.02, seed=100),
}


@pytest.mark.parametrize("case", sorted(CASES))
def test_gpr_oracle(case):
    _check(CASES[case]())


def test_gpr_engine_v3_engages():
    # big enough for the v3 qcap ladder to find a feasible coloring; the
    # oracle then runs the v3 kernel (exchange-layout vals, b2-only
    # stage 3, transposed mask-dot) in interpret mode
    mat = utils.random_sparse(40_000, 40_000, 7 / 40_000, seed=102)
    packed = _check(mat)
    assert packed.fused_v3, "v3 router should route this size"
    # SpMM through the v3 stage-2/3 kernel too
    X = jnp.asarray(
        np.random.default_rng(5).random((40_000, 2)), jnp.float32)
    Y = gpr.spmm_gpr(packed, X, interpret=True)
    ref = mat @ np.asarray(X, np.float64)
    rel = np.max(np.abs(np.asarray(Y, np.float64) - ref)) / np.max(
        np.abs(ref))
    assert rel < 2e-5, rel


def test_gpr_engine_v3_off_matches():
    # ENGINE_V3=False must produce the identical result through v2
    mat = utils.random_sparse(40_000, 40_000, 7 / 40_000, seed=103)
    old = gpr.ENGINE_V3
    try:
        gpr.ENGINE_V3 = False
        p2 = _check(mat)
        assert not p2.fused_v3
    finally:
        gpr.ENGINE_V3 = old


def test_gpr_hub_split():
    # round-2: hub rows (>128 entries) split into virtual rows folded
    # back by a tiny segment-sum — NO entries on the COO side path
    packed = _check(CASES["power_law_hubs"]())
    assert packed.nv > 0
    assert packed.hub_owner.shape == (packed.nv,)
    assert packed.side.nnz == 0 and packed.side_gpr is None


def test_gpr_nnz_cap():
    # the cap applies to the MAIN (<=128-per-row) part: 128-wide rows whose
    # total exceeds MAX_NNZ cannot be routed in one plan
    import scipy.sparse as sp

    n = gpr.MAX_NNZ + 128
    rows = np.arange(n, dtype=np.int64) // 128
    cols = np.arange(n, dtype=np.int64) % 128
    m = sp.coo_matrix((np.ones(n, dtype=np.float32), (rows, cols)),
                      shape=(int(rows[-1]) + 1, 128)).tocsr()
    with pytest.raises(ValueError, match="chunk"):
        gpr.pack_gpr(m)


def test_gpr_hub_row_packs():
    # a single row heavier than MAX_NNZ must NOT fail the pack: only its
    # first 128 entries are routed, the tail spills to the side path
    # (ADVICE r1: pack_gpr_chunked isolates such rows into their own chunk)
    import scipy.sparse as sp

    ncol = 2_900_000
    hub_cols = np.arange(gpr.MAX_NNZ + 1000, dtype=np.int64) % ncol
    rows = np.concatenate([np.zeros(len(hub_cols), dtype=np.int64),
                           np.array([1, 2], dtype=np.int64)])
    cols = np.concatenate([hub_cols, np.array([5, 7], dtype=np.int64)])
    m = sp.coo_matrix((np.ones(len(rows), dtype=np.float32), (rows, cols)),
                      shape=(3, ncol)).tocsr()
    m.sum_duplicates()
    A = gpr.pack_gpr(m)
    x = np.random.default_rng(3).random(ncol).astype(np.float32)
    y = np.asarray(gpr.spmv_gpr(A, jnp.asarray(x), interpret=True))
    y_ref = m.astype(np.float64) @ x.astype(np.float64)
    rel = np.max(np.abs(y - y_ref)) / max(np.max(np.abs(y_ref)), 1e-300)
    # the hub row is a single ~2.4M-term f32 dot product: accumulation
    # error alone is ~sqrt(nnz)*eps ~ 2e-4, so the gate scales with it
    assert rel < 1e-3, rel


def test_gpr_supports():
    assert gpr.supports((1000, 1000), 50_000)
    # ncol up to ~10 column blocks is in-envelope (blocked gather)
    assert gpr.supports((1000, 5_000_000), 50_000)
    assert not gpr.supports((1000, 50_000_000), 50_000)
    # nnz is unlimited on the (default) chunked path; the single-pack
    # routing cap applies only to pack_gpr itself
    assert gpr.supports((1000, 1000), 10**7)
    assert not gpr.supports((1000, 1000), 10**7, chunked=False)


def test_gpr_chunked_empty_matrix():
    # 0-row input returns an empty pack (regression: the cut-planning
    # refactor raised IndexError on cuts[0])
    import scipy.sparse as sp

    A = gpr.pack_gpr_chunked(sp.csr_matrix((0, 5), dtype=np.float32))
    assert A.chunks == () and A.row_splits == (0,) and A.nnz == 0


def test_gpr_chunked_balanced_cuts():
    """Chunk cuts recompute the target from REMAINING nnz: ceil(nnz/
    chunk_nnz) blocks of ~equal size, no trailing sliver (a fixed
    per-cut target used to leave a [big, big, 1-tile] tail pack)."""
    mat = utils.random_sparse(1250, 1000, 0.032, seed=101).astype(np.float32)
    nnz = mat.nnz
    A = gpr.pack_gpr_chunked(mat, chunk_nnz=(nnz + 1) // 2)
    assert len(A.chunks) == 2
    sizes = [A.chunks[i].nnz for i in range(len(A.chunks))]
    assert min(sizes) > 0.3 * max(sizes), sizes
    x = jnp.asarray(np.random.default_rng(2).random(1000), jnp.float32)
    y = gpr.spmv_gpr_chunked(A, x, interpret=True)
    ref = mat @ np.asarray(x, np.float64)
    rel = np.max(np.abs(np.asarray(y, np.float64) - ref)) / np.max(np.abs(ref))
    assert rel < 2e-5


def test_gpr_chunked():
    # small on purpose: interpret-mode pallas is Python-per-element and
    # this test runs the pipeline three ways (folded, stub-guard,
    # rehydrated-unfolded) — coverage needs chunk COUNT, not nnz
    mat = utils.random_sparse(1250, 1000, 0.032, seed=101).astype(np.float32)
    A = gpr.pack_gpr_chunked(mat, chunk_nnz=12_000)
    assert len(A.chunks) >= 3
    # uniform chunks share the stage-1 tile fill -> the fold must engage
    assert A.fold is not None
    assert len(A.fold.tile_counts) == len(A.chunks)
    x = jnp.asarray(np.random.default_rng(1).random(1000), jnp.float32)
    y = gpr.spmv_gpr_chunked(A, x, interpret=True)
    ref = mat @ np.asarray(x, np.float64)
    rel = np.max(np.abs(np.asarray(y, np.float64) - ref)) / np.max(np.abs(ref))
    assert rel < 2e-5
    # fold-owning packs keep ONE copy of the stage-1 planes (ADVICE r2):
    # every chunk's gseg/glidx/a2/a3 must be zero-size stubs
    for c in A.chunks:
        assert c.gseg.size == 0 and c.glidx.size == 0
        assert c.plan.a2.shape[1:] == (1, 1) and c.plan.a3.size == 1
    # ... and running a stubbed chunk standalone fails loudly
    with pytest.raises(ValueError, match="ChunkFold"):
        gpr.spmv_gpr(A.chunks[0], x, interpret=True)
    # the unfolded per-chunk path must agree bitwise-closely with itself
    # and with the oracle (guards the fold's composed y permutation);
    # rehydrate the chunks from the fold's planes first
    import dataclasses

    rehydrated = tuple(gpr._chunk_with_fold_s1(A.fold, c, i)
                       for i, c in enumerate(A.chunks))
    y2 = gpr.spmv_gpr_chunked(
        dataclasses.replace(A, fold=None, chunks=rehydrated), x,
        interpret=True)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y2),
                               rtol=1e-6, atol=1e-7)


def test_gpr_chunked_fold_power_law():
    # hub-split virtual rows per chunk must fold through the ONE global
    # segment-sum (owners rebased to global rows, sorted)
    mat = utils.power_law(3000, 3000, 12, seed=7).tocsr().astype(np.float32)
    A = gpr.pack_gpr_chunked(mat, chunk_nnz=15_000)
    assert len(A.chunks) >= 2 and A.fold is not None
    assert A.fold.nv > 0          # power-law hubs -> virtual rows exist
    x = jnp.asarray(np.random.default_rng(2).random(3000), jnp.float32)
    y = gpr.spmv_gpr_chunked(A, x, interpret=True)
    ref = mat @ np.asarray(x, np.float64)
    rel = np.max(np.abs(np.asarray(y, np.float64) - ref)) / np.max(np.abs(ref))
    assert rel < 2e-5


def test_gpr_chunked_fold_checkpoint_roundtrip(tmp_path):
    from tpu_spmv.io import checkpoint

    mat = utils.random_sparse(1500, 1200, 0.03, seed=31).astype(np.float32)
    A = gpr.pack_gpr_chunked(mat, chunk_nnz=20_000)
    assert A.fold is not None
    p = tmp_path / "chunked_fold.npz"
    checkpoint.save_matrix(p, A)
    A2 = checkpoint.load_matrix(p)
    assert A2.fold is not None and A2.fold.rp128 == A.fold.rp128
    x = jnp.asarray(np.random.default_rng(3).random(1200), jnp.float32)
    np.testing.assert_allclose(
        np.asarray(gpr.spmv_gpr_chunked(A2, x, interpret=True)),
        np.asarray(gpr.spmv_gpr_chunked(A, x, interpret=True)),
        rtol=1e-6, atol=1e-7)


def test_gpr_chunked_spmm_fold():
    # SpMM on a fold-owning pack: the chunks carry stage-1 stubs, so
    # spmm_gpr_chunked must rebuild them as fold slices in-jit
    mat = utils.random_sparse(1200, 1000, 0.03, seed=55).astype(np.float32)
    A = gpr.pack_gpr_chunked(mat, chunk_nnz=12_000)
    assert A.fold is not None and all(c.gseg.size == 0 for c in A.chunks)
    X = np.random.default_rng(9).random((1000, 3)).astype(np.float32)
    Y = gpr.spmm_gpr_chunked(A, jnp.asarray(X), interpret=True)
    ref = mat @ X.astype(np.float64)
    rel = np.max(np.abs(np.asarray(Y, np.float64) - ref)) / np.max(np.abs(ref))
    assert rel < 2e-5


def test_gpr_chunked_single_chunk():
    mat = utils.laplacian_2d(15, 15).astype(np.float32)
    A = gpr.pack_gpr_chunked(mat)
    assert len(A.chunks) == 1
    x = jnp.asarray(np.random.default_rng(2).random(mat.shape[1]), jnp.float32)
    y = gpr.spmv_gpr_chunked(A, x, interpret=True)
    np.testing.assert_allclose(
        np.asarray(y, np.float64), mat @ np.asarray(x, np.float64),
        rtol=2e-4, atol=1e-6,
    )


def test_spmm_gpr_oracle():
    # batched-pipeline SpMM across pattern classes (VERDICT r1 item 6)
    for mat in (utils.random_sparse(1200, 1200, 0.006, seed=21),
                utils.power_law(900, 900, 8, seed=22)):
        m = mat.tocsr()
        m.sort_indices()
        g = gpr.pack_gpr(m, dtype=np.float32)
        X = np.random.default_rng(23).random((m.shape[1], 8)).astype(
            np.float32)
        Y = np.asarray(gpr.spmm_gpr(g, jnp.asarray(X), interpret=True))
        ref = m.astype(np.float64) @ X.astype(np.float64)
        rel = np.max(np.abs(Y - ref)) / np.max(np.abs(ref))
        assert rel < 2e-5, rel


def test_gpr_large_ncol_blocked_gather():
    # ncol past one VMEM-resident x2d: the gather runs per column block
    # (VERDICT r1 item 10 done criterion: oracle at ncol=5M, interpret)
    import scipy.sparse as sp

    rng = np.random.default_rng(30)
    nrow, ncol, nnz = 3000, 5_000_000, 40_000
    m = sp.csr_matrix(
        (rng.random(nnz),
         (rng.integers(0, nrow, nnz), rng.integers(0, ncol, nnz))),
        shape=(nrow, ncol))
    m.sum_duplicates()
    assert gpr.supports(m.shape, m.nnz)
    g = gpr.pack_gpr(m, dtype=np.float32)
    assert len(g.col_blocks) >= 2
    x = rng.random(ncol).astype(np.float32)
    y = np.asarray(gpr.spmv_gpr(g, jnp.asarray(x), interpret=True))
    ref = m.astype(np.float64) @ x
    rel = np.max(np.abs(y - ref)) / np.max(np.abs(ref))
    assert rel < 2e-5, rel


def _targets_for(m):
    """Shape targets for a single pack, the way dist.ShardedGPR computes
    per-shard maxima — targets packs keep the legacy COO side path (hub
    splitting is data-dependent and not shape-forceable)."""
    counts = np.diff(m.indptr)
    cls = np.minimum(np.searchsorted(gpr.CLASS_W, counts),
                     len(gpr.CLASS_W) - 1)
    rows_c = np.bincount(cls, minlength=len(gpr.CLASS_W))
    class_T = tuple(
        int(-(-rows_c[c] // (8 * (gpr.LANES // W))))
        for c, W in enumerate(gpr.CLASS_W))
    side_nnz = int(np.maximum(counts - gpr.LANES, 0).sum())
    main_mask = (np.arange(m.nnz) - m.indptr[:-1].repeat(counts)) < gpr.LANES
    segs = m.indices[main_mask] >> 7
    seg_cnt = np.bincount(segs) if len(segs) else np.zeros(1, int)
    NS = max(int((-(-seg_cnt[seg_cnt > 0] // gpr.LANES)).sum()), 1)
    return {"ns8": -(-NS // 8) * 8, "class_T": class_T,
            "side_nnz": side_nnz, "rp": 11264}


def test_spmm_gpr_hub_fallback_no_double_count():
    # regression: the mapped fallback (nrhs > batch cap) already adds the
    # hub-row side contributions inside each SpMV — adding them again in
    # spmm_gpr returned rel err ~0.37 (code-review r2 finding).  Built
    # with shape targets so the pack keeps the COO side path (round-2
    # hub splitting removed it from ordinary packs).
    import scipy.sparse as sp

    rng = np.random.default_rng(41)
    base = utils.random_sparse(400, 400, 0.02, seed=41).tocoo()
    hub_cols = rng.choice(400, 200, replace=False).astype(np.int64)
    rows = np.concatenate([base.row, np.full(200, 3, dtype=np.int64)])
    cols = np.concatenate([base.col, hub_cols])
    vals = np.concatenate([base.data, rng.random(200)])
    m = sp.csr_matrix((vals, (rows, cols)), shape=(400, 400))
    m.sum_duplicates()
    m.sort_indices()
    g = gpr.pack_gpr(m, dtype=np.float32, targets=_targets_for(m),
                     padded_y=True)
    assert g.side.nnz > 0
    X = np.random.default_rng(42).random((400, 17)).astype(np.float32)
    Y = np.asarray(gpr.spmm_gpr(g, jnp.asarray(X), interpret=True))
    ref = m.astype(np.float64) @ X.astype(np.float64)
    rel = np.max(np.abs(Y - ref)) / np.max(np.abs(ref))
    assert rel < 2e-5, rel


def test_gpr_edge_shapes():
    """Degenerate shapes: tiny, all-zero, single row/col, empty leading
    rows, ncol < 128 — every one must pack and match the oracle."""
    import scipy.sparse as sp

    rng = np.random.default_rng(0)
    cases = [
        sp.random(5, 5, 0.5, random_state=1, format="csr"),
        sp.random(1, 300, 0.3, random_state=2, format="csr"),
        sp.random(300, 1, 0.3, random_state=3, format="csr"),
        sp.csr_matrix((7, 9)),
        sp.random(50, 60, 0.01, random_state=4, format="csr"),
        sp.vstack([sp.csr_matrix((40, 500)),
                   sp.random(60, 500, 0.1, random_state=6,
                             format="csr")]).tocsr(),
    ]
    for m in cases:
        m = m.tocsr()
        m.sort_indices()
        A = gpr.pack_gpr(m, dtype=np.float32)
        x = rng.random(m.shape[1]).astype(np.float32)
        y = np.asarray(gpr.spmv_gpr(A, jnp.asarray(x), interpret=True))
        ref = m.astype(np.float64) @ x
        denom = max(np.abs(ref).max(), 1e-30)
        assert np.abs(y - ref).max() / denom < 2e-5, m.shape


def test_gpr_v3_element_repair_widens_envelope():
    # power-law chunks used to fail v3 routing with single-digit residual
    # (r2, block) overflows the row-level repair sweeps cannot clear; the
    # element-level repair (move/swap single elements between blocks of
    # their row's j-window, native/permute_router.cpp) fixes most of
    # them.  Routing is deterministic, so the count is a stable gate.
    mat = utils.power_law(60_000, 60_000, 8, alpha=1.5, seed=6).tocsr()
    mat = mat.astype(np.float32)
    A = gpr.pack_gpr_chunked(mat, chunk_nnz=120_000)
    v3 = [c.fused_v3 for c in A.chunks]
    assert sum(v3) >= len(v3) // 2, v3   # was 0/len before the repair
    x = jnp.asarray(np.random.default_rng(8).random(60_000), jnp.float32)
    y = gpr.spmv_gpr_chunked(A, x, interpret=True)
    ref = mat @ np.asarray(x, np.float64)
    rel = np.max(np.abs(np.asarray(y, np.float64) - ref)) / np.max(np.abs(ref))
    assert rel < 2e-5, rel


def test_gpr_f64_full_precision(rng):
    """float64 packs accumulate in f64 (ADVICE r4: the mask-dot reduce
    used to force a f32 accumulator, silently degrading f64 GPR to f32
    precision).  Gate: the f64 CPU-oracle BASELINE bar, 1e-10."""
    import numpy as np

    from tpu_spmv.kernels import gpr
    from tpu_spmv.utils import random_sparse

    m = random_sparse(3000, 3000, 0.002, seed=3, dtype=np.float64).tocsr()
    gp = gpr.pack_gpr(m, dtype=np.float64)
    assert gp.vals.dtype == jnp.float64
    x = jnp.asarray(rng.random(3000))
    y = np.asarray(gpr.spmv_gpr(gp, x, interpret=True))
    ref = m @ np.asarray(x)
    rel = np.max(np.abs(y - ref)) / np.max(np.abs(ref))
    assert rel < 1e-13, rel              # f32 accumulation would be ~1e-7
