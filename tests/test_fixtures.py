"""Frozen MatrixMarket fixtures driven end-to-end (VERDICT r3 item 7).

``tests/fixtures/bus420*.mtx`` is a checked-in, deterministic SPD
bus-network-like matrix in the three banner variants the reference's
loader handles (`/root/reference/src/mmio.cpp` typecodes): symmetric
real, symmetric pattern, general real (gzipped).  These pin the
L1 -> L4 path (file -> formats -> kernels -> driver, SURVEY §1) against
fixed bytes rather than round-tripped temp files."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

import jax.numpy as jnp

FIX = os.path.join(os.path.dirname(__file__), "fixtures")
BUS = os.path.join(FIX, "bus420.mtx")
BUS_PAT = os.path.join(FIX, "bus420_pattern.mtx")
BUS_GEN = os.path.join(FIX, "bus420_general.mtx.gz")


def _scipy_oracle():
    import scipy.io as sio

    return sio.mmread(BUS).tocsr()


def test_symmetric_fixture_reads_and_expands():
    from tpu_spmv.io.mmio import read_matrix

    coo = read_matrix(BUS)
    A = _scipy_oracle()
    assert coo.shape == (420, 420)
    assert coo.nnz == A.nnz            # symmetric expansion matches scipy
    got = coo.to_scipy().tocsr().astype(np.float64)
    assert abs(got - A).max() < 1e-12


def test_pattern_fixture_fills_ones():
    from tpu_spmv.io.mmio import read_matrix

    coo = read_matrix(BUS_PAT)
    A = _scipy_oracle()
    got = coo.to_scipy().tocsr()
    assert got.nnz == A.nnz
    assert set(np.unique(np.asarray(coo.data))) == {1.0}
    # same sparsity structure
    assert (got != 0).multiply(A != 0).nnz == A.nnz


def test_general_gzip_fixture_matches_symmetric():
    from tpu_spmv.io.mmio import read_matrix

    sym = read_matrix(BUS).to_scipy().tocsr().astype(np.float64)
    gen = read_matrix(BUS_GEN).to_scipy().tocsr().astype(np.float64)
    assert abs(sym - gen).max() < 1e-6     # 6-sigfig frozen values


def test_fixture_spmv_all_formats(rng):
    from tpu_spmv.formats import FORMATS, convert
    from tpu_spmv.io.mmio import read_matrix
    from tpu_spmv.ops.spmv import spmv

    coo = read_matrix(BUS, dtype=jnp.float64)
    A = _scipy_oracle().astype(np.float64)
    x = rng.random(420)
    ref = A @ x
    xd = jnp.asarray(x)
    for name in sorted(FORMATS):
        y = np.asarray(spmv(convert(coo, name), xd))
        rel = np.abs(y - ref).max() / np.abs(ref).max()
        assert rel < 1e-10, f"{name}: rel {rel:.2e} (f64 BASELINE gate)"


def test_fixture_planner_and_cg(rng):
    from tpu_spmv.io.mmio import read_matrix
    from tpu_spmv.ops.auto import plan_spmv
    from tpu_spmv.solvers import cg

    A = _scipy_oracle().astype(np.float32)
    plan = plan_spmv(A, dtype=jnp.float32)
    x = rng.random(420).astype(np.float32)
    ref = _scipy_oracle().astype(np.float64) @ x.astype(np.float64)
    y = np.asarray(plan(jnp.asarray(x)))
    assert np.abs(y - ref).max() / np.abs(ref).max() < 2e-5
    # the fixture is SPD by construction: CG converges
    b = jnp.asarray(rng.random(420), jnp.float32)
    res = cg(plan, b, tol=1e-6, maxiter=2000)
    assert bool(res.converged)


@pytest.mark.parametrize("path", [BUS, BUS_GEN])
def test_cli_end_to_end_on_fixture(path):
    # the reference driver path (main.cpp:18-126): file in, sweep out —
    # exercised in-process via cli.main (subprocess would re-init jax)
    from tpu_spmv.cli import main

    argv = [path, "--formats", "csr,dia,ell", "--iters", "3", "--json"]
    old = sys.argv
    sys.argv = ["tpu_spmv"] + argv
    try:
        import contextlib
        import io as _io

        buf = _io.StringIO()
        with contextlib.redirect_stdout(buf):
            rc = main()
    finally:
        sys.argv = old
    assert rc == 0
    lines = [json.loads(l) for l in buf.getvalue().splitlines()
             if l.startswith("{")]
    fmts = {l["format"].lower() for l in lines if "format" in l}
    assert {"csr", "dia", "ell"} <= fmts
    for l in lines:
        if "rel_err" in l:
            assert l["rel_err"] < 2e-5


# ---------------------------------------------------------------------------
# second frozen fixture (VERDICT r4 item 10): non-symmetric, hub-heavy
# power-law matrix — the GENERAL-pattern complement to bus420's
# symmetric band.  4 hub rows exceed 128 nnz, so the GPR pack's virtual-
# row hub split is exercised against frozen bytes.
# ---------------------------------------------------------------------------

PLAW = os.path.join(FIX, "powerlaw800.mtx")


def _plaw_oracle():
    import scipy.io as sio

    return sio.mmread(PLAW).tocsr()


def test_powerlaw_fixture_reads_nonsymmetric():
    from tpu_spmv.io.mmio import read_matrix

    coo = read_matrix(PLAW)
    A = _plaw_oracle()
    assert coo.shape == (800, 800)
    assert coo.nnz == A.nnz == 7609
    got = coo.to_scipy().tocsr().astype(np.float64)
    assert abs(got - A).max() < 1e-12
    # genuinely non-symmetric (the banner is 'general' and means it)
    assert abs(A - A.T).nnz > 0
    counts = np.diff(A.indptr)
    assert counts.max() > 128          # hub rows force the vrow split


def test_powerlaw_fixture_planner_picks_gpr(rng):
    from tpu_spmv.ops.auto import plan_spmv

    A = _plaw_oracle().astype(np.float32)
    plan = plan_spmv(A, use_pallas=True, dtype=np.float32)
    assert plan.strategy == "gpr"
    x = rng.random(800).astype(np.float32)
    ref = _plaw_oracle().astype(np.float64) @ x.astype(np.float64)
    y = np.asarray(plan(jnp.asarray(x)))
    assert np.abs(y - ref).max() / np.abs(ref).max() < 2e-5


def test_powerlaw_fixture_bicgstab(rng):
    # non-symmetric solve through the fixture: shift to safe dominance
    # (in scipy — power-law rows lack stored diagonals, so the in-format
    # shift_diagonal correctly refuses)
    import scipy.sparse as sp

    from tpu_spmv.formats import COO, convert
    from tpu_spmv.solvers import bicgstab

    host = (_plaw_oracle().astype(np.float64)
            + 50.0 * sp.eye(800, format="csr")).tocsr()
    A = convert(COO.from_scipy(host.tocoo(), dtype=jnp.float64), "csr")
    b = rng.standard_normal(800)
    res = bicgstab(A, jnp.asarray(b), tol=1e-10, maxiter=4000)
    assert bool(res.converged)
    x = np.asarray(res.x)
    assert np.linalg.norm(host @ x - b) / np.linalg.norm(b) < 1e-8


def _run_cli(argv):
    from tpu_spmv.cli import main

    old = sys.argv
    sys.argv = ["tpu_spmv"] + argv
    try:
        import contextlib
        import io as _io

        buf = _io.StringIO()
        with contextlib.redirect_stdout(buf):
            rc = main()
    finally:
        sys.argv = old
    assert rc == 0
    return [json.loads(l) for l in buf.getvalue().splitlines()
            if l.startswith("{")]


def test_cli_sweep_on_powerlaw_fixture():
    """The reference driver path (main.cpp:18-126) on the hub-heavy
    fixture: file in, format sweep out, rel-err gated."""
    lines = _run_cli([PLAW, "--formats", "csr,coo", "--iters", "3",
                      "--json"])
    fmts = {l["format"].lower() for l in lines if "format" in l}
    assert {"csr", "coo"} <= fmts
    for l in lines:
        if "rel_err" in l:
            assert l["rel_err"] < 2e-5


def test_cli_auto_pallas_routes_powerlaw_to_gpr():
    """--auto --pallas plans the hub-heavy general pattern onto GPR
    (the --pallas flag used to be ignored by --auto — r5 fix)."""
    lines = _run_cli([PLAW, "--iters", "3", "--auto", "--pallas",
                      "--json"])
    autos = [l for l in lines if l.get("mode", "").endswith("-AUTO")]
    assert autos and autos[0]["format"] == "GPR"
    assert autos[0]["rel_err"] < 2e-5
