"""Checkpointing of packed formats (PackedELL / GPCSR / chunked / plans):
the expensive packs must round-trip through .npz so re-runs skip packing
(VERDICT r1 item 7)."""

import numpy as np
import jax.numpy as jnp

from tpu_spmv import utils
from tpu_spmv.io import checkpoint
from tpu_spmv.kernels import ell_pallas, gpr
from tpu_spmv.kernels.permute import plan_permutation, apply_permutation


def _rel(y, y_ref):
    return np.max(np.abs(np.asarray(y, np.float64) - y_ref)) / max(
        np.max(np.abs(y_ref)), 1e-300)


def test_packed_ell_roundtrip(tmp_path):
    mat = utils.banded(512, 4, seed=1).tocsr()
    from tpu_spmv.formats import COO, convert

    packed = ell_pallas.pack_ell(
        convert(COO.from_scipy(mat.tocoo()), "ell"))
    p = tmp_path / "psell.npz"
    checkpoint.save_matrix(p, packed)
    packed2 = checkpoint.load_matrix(p)
    assert packed2.shape == packed.shape
    assert packed2.rounds == packed.rounds
    assert packed2.tile_uniform == packed.tile_uniform
    x = jnp.asarray(np.random.default_rng(0).random(mat.shape[1]),
                    jnp.float32)
    y = ell_pallas.spmv_pallas(packed2, x, interpret=True)
    ref = mat.astype(np.float64) @ np.asarray(x, np.float64)
    assert _rel(y, ref) < 2e-5


def test_gpcsr_roundtrip(tmp_path):
    # random pattern with a >128-wide hub row: exercises the nested
    # PermutationPlan, yplan, COO side matrix AND the side_gpr recursion
    rng = np.random.default_rng(2)
    import scipy.sparse as sp

    base = utils.random_sparse(800, 800, 0.01, seed=2).tocoo()
    hub_cols = rng.choice(800, 300, replace=False).astype(np.int64)
    rows = np.concatenate([base.row, np.full(300, 5, dtype=np.int64)])
    cols = np.concatenate([base.col, hub_cols])
    vals = np.concatenate([base.data, rng.random(300)])
    mat = sp.csr_matrix((vals, (rows, cols)), shape=(800, 800))
    mat.sum_duplicates()
    packed = gpr.pack_gpr(mat, dtype=np.float32)
    p = tmp_path / "gpcsr.npz"
    checkpoint.save_matrix(p, packed, extra={"strategy": "gpr"})
    packed2, extra = checkpoint.load_matrix(p, with_extra=True)
    assert extra["strategy"] == "gpr"
    assert packed2.class_tiles == packed.class_tiles
    x = jnp.asarray(rng.random(800), jnp.float32)
    y = gpr.spmv_gpr(packed2, x, interpret=True)
    ref = mat.astype(np.float64) @ np.asarray(x, np.float64)
    assert _rel(y, ref) < 2e-5


def test_gpcsr_chunked_roundtrip(tmp_path):
    mat = utils.random_sparse(600, 600, 0.02, seed=3).tocsr()
    packed = gpr.pack_gpr_chunked(mat, dtype=np.float32, chunk_nnz=3000)
    assert len(packed.chunks) > 1
    p = tmp_path / "chunked.npz"
    checkpoint.save_matrix(p, packed)
    packed2 = checkpoint.load_matrix(p)
    assert packed2.row_splits == packed.row_splits
    x = jnp.asarray(np.random.default_rng(4).random(600), jnp.float32)
    y = gpr.spmv_gpr_chunked(packed2, x, interpret=True)
    ref = mat.astype(np.float64) @ np.asarray(x, np.float64)
    assert _rel(y, ref) < 2e-5


def test_permutation_plan_roundtrip(tmp_path):
    rng = np.random.default_rng(5)
    n = 40_000
    perm = rng.permutation(n)
    plan = plan_permutation(perm)
    p = tmp_path / "plan.npz"
    checkpoint.save_matrix(p, plan)
    plan2 = checkpoint.load_matrix(p)
    assert plan2.n == plan.n
    assert plan2.real_per_tile == plan.real_per_tile
    x = jnp.asarray(rng.random(n), jnp.float32)
    out = apply_permutation(plan2, x, interpret=True)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(x)[perm])


def test_cli_cache_skips_packing(tmp_path, monkeypatch, capsys):
    # second --auto run on the same input must reload the pack, not rebuild
    from tpu_spmv import cli

    argv = ["--synthetic", "laplacian:16", "--auto", "--iters", "3",
            "--cache", str(tmp_path)]
    assert cli.main(argv) == 0
    out1 = capsys.readouterr().out
    assert "cached pack to" in out1
    import tpu_spmv.ops.auto as auto_mod

    def boom(*a, **k):
        raise AssertionError("plan_spmv must not run on a cache hit")

    monkeypatch.setattr(auto_mod, "plan_spmv", boom)
    monkeypatch.setattr(cli, "plan_spmv", boom, raising=False)
    assert cli.main(argv) == 0
    out2 = capsys.readouterr().out
    assert "reloaded" in out2


def test_sdia_roundtrip(tmp_path):
    import jax

    from tpu_spmv import utils
    from tpu_spmv.formats import COO, convert
    from tpu_spmv.kernels import dia_stream
    from tpu_spmv.ops.auto import plan_from_matrix

    mat = utils.banded(700, 3, seed=8)
    dia = convert(COO.from_scipy(mat.tocoo(), dtype=jnp.float32), "dia")
    S = dia_stream.pack_sdia(dia, rb=256)
    p = tmp_path / "sdia.npz"
    checkpoint.save_matrix(p, S, extra={"strategy": "dia_stream"})
    S2, extra = checkpoint.load_matrix(p, with_extra=True)
    assert extra["strategy"] == "dia_stream"
    assert (S2.L, S2.rb, S2.offsets) == (S.L, S.rb, S.offsets)
    # reconstruct the executable plan from the reloaded pack
    plan = plan_from_matrix(S2, "dia_stream")
    x = np.random.default_rng(8).random(700).astype(np.float32)
    y = np.asarray(plan(jnp.asarray(x)))
    ref = mat.astype(np.float64) @ x
    rel = np.max(np.abs(y - ref)) / np.max(np.abs(ref))
    assert rel < 2e-5, rel


def test_stale_checkpoint_raises(tmp_path):
    # a checkpoint written by an older revision may carry fields the
    # current dataclass dropped (e.g. PermutationPlan.b1 pre-fold); the
    # loader must raise the clean "stale" error the CLI cache catches
    import json

    import pytest

    plan = plan_permutation(np.random.default_rng(9).permutation(2000))
    p = tmp_path / "plan.npz"
    checkpoint.save_matrix(p, plan)
    with np.load(p) as z:
        meta = json.loads(bytes(z["__meta__"].tobytes()).decode())
        arrays = {k: z[k] for k in z.files if k != "__meta__"}
    meta["spec"]["fields"]["b1"] = None        # field from the old layout
    np.savez_compressed(
        p, __meta__=np.frombuffer(json.dumps(meta).encode(), dtype=np.uint8),
        **arrays)
    with pytest.raises(ValueError, match="stale checkpoint"):
        checkpoint.load_matrix(p)
