"""CLI driver tests (CPU): argument handling, sweeps, JSON protocol."""

import json

import numpy as np
import pytest

import tpu_spmv as ts
from tpu_spmv.cli import main
from tpu_spmv import utils


@pytest.fixture
def mtx_file(tmp_path):
    path = tmp_path / "fixture.mtx"
    ts.write_matrix(path, ts.COO.from_scipy(utils.laplacian_2d(6, 5)))
    return str(path)


def test_cli_file_sweep(mtx_file, capsys):
    assert main([mtx_file, "--formats", "csr,dia", "--iters", "3"]) == 0
    out = capsys.readouterr().out
    assert "### CSR CPU GFLOPS =" in out
    assert "### DIA CPU GFLOPS =" in out


def test_cli_synthetic_json(capsys):
    assert main(["--synthetic", "laplacian:6", "--formats", "csr",
                 "--iters", "2", "--json"]) == 0
    lines = [l for l in capsys.readouterr().out.splitlines()
             if l.startswith("{")]
    rec = json.loads(lines[-1])
    assert rec["format"] == "CSR"
    assert rec["gflops"] > 0
    assert rec["rel_err"] < 1e-5           # default dtype is float32


def test_cli_auto(capsys):
    assert main(["--synthetic", "banded:200,3", "--auto", "--iters", "2"]) == 0
    out = capsys.readouterr().out
    assert "planner: strategy=dia" in out
    assert "GFLOPS =" in out


def test_cli_spmm(capsys):
    assert main(["--synthetic", "laplacian:5", "--formats", "csr",
                 "--iters", "2", "--spmm", "4"]) == 0
    out = capsys.readouterr().out
    assert "### CSR SPMM4 GFLOPS =" in out


def test_cli_unknown_format():
    with pytest.raises(SystemExit, match="unknown format"):
        main(["--synthetic", "laplacian:4", "--formats", "bogus"])


def test_cli_missing_file():
    with pytest.raises(SystemExit, match="not found"):
        main(["/does/not/exist.mtx"])


def test_cli_bad_synthetic():
    with pytest.raises(SystemExit, match="unknown synthetic"):
        main(["--synthetic", "bogus:1"])


def test_cli_requires_source():
    with pytest.raises(SystemExit):
        main([])


def test_cli_float64(mtx_file, capsys):
    assert main([mtx_file, "--formats", "csr", "--iters", "2",
                 "--dtype", "float64"]) == 0
    out = capsys.readouterr().out
    assert "GFLOPS =" in out


def test_cli_solve_cg(capsys):
    from tpu_spmv.cli import main

    rc = main(["--synthetic", "laplacian:12", "--formats", "csr",
               "--iters", "3", "--no-check", "--solve", "pcg",
               "--tol", "1e-6", "--json"])
    assert rc == 0
    lines = [l for l in capsys.readouterr().out.splitlines() if l.strip()]
    import json as _json

    recs = [_json.loads(l) for l in lines if l.startswith("{")]
    solve = [r for r in recs if r.get("solver") == "pcg"]
    assert solve and solve[0]["converged"] and solve[0]["rel_residual"] < 1e-5


def test_cli_solve_chebcg(capsys):
    from tpu_spmv.cli import main

    rc = main(["--synthetic", "laplacian:12", "--formats", "csr",
               "--iters", "3", "--no-check", "--solve", "chebcg",
               "--tol", "1e-6", "--json"])
    assert rc == 0
    lines = [l for l in capsys.readouterr().out.splitlines() if l.strip()]
    import json as _json

    recs = [_json.loads(l) for l in lines if l.startswith("{")]
    solve = [r for r in recs if r.get("solver") == "chebcg"]
    assert solve and solve[0]["converged"] and solve[0]["rel_residual"] < 1e-5


@pytest.mark.parametrize("solver", ["bicgstab", "gmres"])
def test_cli_solve_nonsym(capsys, solver):
    from tpu_spmv.cli import main

    rc = main(["--synthetic", "laplacian:12", "--formats", "csr",
               "--iters", "3", "--no-check", "--solve", solver,
               "--dtype", "float64", "--tol", "1e-6", "--json"])
    assert rc == 0
    lines = [l for l in capsys.readouterr().out.splitlines() if l.strip()]
    import json as _json

    recs = [_json.loads(l) for l in lines if l.startswith("{")]
    res = [r for r in recs if r.get("solver") == solver]
    assert res and res[0]["converged"] and res[0]["rel_residual"] < 1e-5


def test_cli_solve_power(capsys):
    from tpu_spmv.cli import main

    rc = main(["--synthetic", "laplacian:10", "--formats", "csr",
               "--iters", "3", "--no-check", "--solve", "power", "--json"])
    assert rc == 0
    out = capsys.readouterr().out
    import json as _json

    recs = [_json.loads(l) for l in out.splitlines() if l.startswith("{")]
    pw = [r for r in recs if r.get("solver") == "power"]
    # 2-D Laplacian spectrum tops out just below 8
    assert pw and 6.0 < pw[0]["eigenvalue"] <= 8.0


def test_cli_drops_explosive_formats():
    # a single 50k-entry hub row makes ELL width 50k -> ~120 GiB; the
    # sweep must skip ELL (and keep CSR) instead of allocating it
    import scipy.sparse as sp

    from tpu_spmv.cli import _drop_explosive_formats

    n = 200_000
    hub = sp.coo_matrix(
        (np.ones(50_000), (np.zeros(50_000, np.int64),
                           np.arange(50_000, dtype=np.int64))),
        shape=(n, n))
    kept = _drop_explosive_formats(["csr", "ell", "dia", "coo"], hub, 8)
    assert kept == ["csr", "coo"]   # DIA: 50k diagonals x 200k rows -> out
    # a benign banded matrix keeps everything
    from tpu_spmv import utils

    band = utils.banded(500, bandwidth=3).tocoo()
    assert _drop_explosive_formats(["ell", "dia"], band, 8) == ["ell", "dia"]


def test_cli_solve_lanczos(capsys):
    from tpu_spmv.cli import main

    rc = main(["--synthetic", "laplacian:10", "--formats", "csr",
               "--iters", "3", "--no-check", "--solve", "lanczos",
               "--json"])
    assert rc == 0
    import json as _json

    recs = [_json.loads(l) for l in capsys.readouterr().out.splitlines()
            if l.startswith("{")]
    lz = [r for r in recs if r.get("solver") == "lanczos"]
    # 2-D Laplacian spectrum: (0, 8); grid 10 ends well inside
    assert lz and 0.0 < lz[0]["eigenvalue_min"] < lz[0]["eigenvalue_max"] <= 8.0


def test_cli_solve_sor(capsys):
    from tpu_spmv.cli import main

    rc = main(["--synthetic", "laplacian:10", "--formats", "csr",
               "--iters", "3", "--no-check", "--solve", "sor",
               "--dtype", "float64", "--tol", "1e-8", "--json"])
    assert rc == 0
    import json as _json

    recs = [_json.loads(l) for l in capsys.readouterr().out.splitlines()
            if l.startswith("{")]
    res = [r for r in recs if r.get("solver") == "sor"]
    assert res and res[0]["converged"] and res[0]["rel_residual"] < 1e-7


def test_cli_dist_strategy_forced(capsys):
    """--dist-strategy forces the distributed strategy (r5: the cost
    model otherwise picks); csr_neighbor verifies on the virtual mesh."""
    from tpu_spmv.cli import main

    rc = main(["--synthetic", "random:600,600,40", "--formats", "csr",
               "--iters", "3", "--dist", "8",
               "--dist-strategy", "csr_neighbor", "--json"])
    assert rc == 0
    import json as _json

    recs = [_json.loads(l) for l in capsys.readouterr().out.splitlines()
            if l.startswith("{")]
    dist_recs = [r for r in recs if r.get("mode") == "DIST8"]
    assert dist_recs and dist_recs[0]["strategy"] == "csr_neighbor"
    assert dist_recs[0]["rel_err"] < 2e-5
