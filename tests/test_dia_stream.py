"""Streaming Pallas DIA kernel (kernels/dia_stream.py) + two-level
permutation routing — interpret mode on CPU."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_spmv import COO, convert, utils
from tpu_spmv.kernels import dia_stream
from tpu_spmv.kernels import permute as pm


def _rel(y, ref):
    return np.max(np.abs(np.asarray(y, np.float64) - ref)) / max(
        np.max(np.abs(ref)), 1e-300)


@pytest.mark.parametrize("n,b,rb", [(1000, 3, 256), (5000, 40, 512),
                                    (777, 5, 256)])
def test_sdia_oracle(n, b, rb):
    m = utils.banded(n, b, seed=n)
    dia = convert(COO.from_scipy(m.tocoo(), dtype=jnp.float32), "dia")
    A = dia_stream.pack_sdia(dia, rb=rb)
    x = np.random.default_rng(n).random(n).astype(np.float32)
    y = dia_stream.spmv_sdia(A, jnp.asarray(x), interpret=True)
    assert _rel(y, m.astype(np.float64) @ x) < 2e-5


def test_sdia_chained_padded():
    m = utils.laplacian_2d(32)
    dia = convert(COO.from_scipy(m.tocoo(), dtype=jnp.float32), "dia")
    A = dia_stream.pack_sdia(dia, rb=256)
    x = np.random.default_rng(0).random(1024).astype(np.float32)
    xp = dia_stream.pad_x(A, jnp.asarray(x))
    yp = dia_stream.spmv_sdia_padded(A, xp, interpret=True)
    # pads must stay zero so the chain is closed
    ypn = np.asarray(yp)
    assert np.all(ypn[:A.L] == 0) and np.all(ypn[A.L + 1024:] == 0)
    yp2 = dia_stream.spmv_sdia_padded(A, yp * np.float32(0.125),
                                      interpret=True)
    y2 = np.asarray(dia_stream.unpad_y(A, yp2))
    ref = m.astype(np.float64) @ ((m @ x.astype(np.float64)) * 0.125)
    assert _rel(y2, ref) < 2e-5


def test_sdia_accumulate():
    m = utils.banded(500, 2, seed=9)
    dia = convert(COO.from_scipy(m.tocoo(), dtype=jnp.float32), "dia")
    A = dia_stream.pack_sdia(dia, rb=256)
    rng = np.random.default_rng(9)
    x = rng.random(500).astype(np.float32)
    y0 = rng.random(500).astype(np.float32)
    out = dia_stream.spmv_sdia(A, jnp.asarray(x), jnp.asarray(y0),
                               interpret=True)
    ref = y0.astype(np.float64) + m.astype(np.float64) @ x
    assert _rel(out, ref) < 2e-5


def test_sdia_envelope():
    with pytest.raises(ValueError, match="square"):
        dia = convert(
            COO.from_scipy(utils.random_sparse(40, 60, 0.2, seed=1).tocoo(),
                           dtype=jnp.float32), "dia")
        dia_stream.pack_sdia(dia, rb=256)
    assert not dia_stream.supports_sdia((-300,), (1000, 1000), 256)
    assert dia_stream.supports_sdia((-4096, 0, 4096), (10**6, 10**6))


def test_sdia_transpose():
    # asymmetric banded matrix: transpose must NOT equal the original
    import scipy.sparse as sp

    n = 900
    m = utils.banded(n, 4, seed=3)
    m = (sp.tril(m) + 3 * sp.triu(m, 1)).tocsr()
    dia = convert(COO.from_scipy(m.tocoo(), dtype=jnp.float32), "dia")
    A = dia_stream.pack_sdia(dia, rb=256)
    At = dia_stream.transpose_sdia(A)
    x = np.random.default_rng(4).random(n).astype(np.float32)
    yt = dia_stream.spmv_sdia(At, jnp.asarray(x), interpret=True)
    assert _rel(yt, m.T.astype(np.float64) @ x) < 2e-5
    # involution: (A^T)^T == A (padded layout and all)
    Att = dia_stream.transpose_sdia(At)
    assert Att.offsets == A.offsets and Att.L == A.L
    np.testing.assert_allclose(np.asarray(Att.data), np.asarray(A.data))
    # pad-tile invariant survives the transpose: all-zero outside range
    dT = np.asarray(At.data)
    for d, off in enumerate(At.offsets):
        k = np.arange(At.npad)
        r = k - At.L
        valid = (r >= 0) & (r < n) & (r + off >= 0) & (r + off < n)
        assert np.all(dT[d][~valid] == 0)


def test_sdia_grad():
    import scipy.sparse as sp

    n = 700
    m = utils.banded(n, 3, seed=6)
    m = (sp.tril(m) + 2 * sp.triu(m, 1)).tocsr()
    dia = convert(COO.from_scipy(m.tocoo(), dtype=jnp.float32), "dia")
    A = dia_stream.pack_sdia(dia, rb=256)
    x = jnp.asarray(np.random.default_rng(7).random(n), jnp.float32)

    def loss(Ad, v):
        y = dia_stream.spmv_sdia(Ad, v, interpret=True)
        return 0.5 * jnp.vdot(y, y)

    gA, gx = jax.grad(loss, argnums=(0, 1))(A, x)
    md = m.astype(np.float64)
    y64 = md @ np.asarray(x, np.float64)
    # x_bar = A^T (A x)
    ref_x = md.T @ y64
    assert _rel(gx, ref_x) < 2e-5
    # data_bar[d, L+r] = y[r] * x[r + off] on in-range slots, 0 elsewhere
    gd = np.asarray(gA.data, np.float64)
    xp = np.zeros(A.npad)
    xp[A.L:A.L + n] = np.asarray(x, np.float64)
    gp = np.zeros(A.npad)
    gp[A.L:A.L + n] = y64
    for d, off in enumerate(A.offsets):
        ref_row = gp * np.roll(xp, -off)
        scale = max(np.max(np.abs(ref_row)), 1e-30)
        assert np.max(np.abs(gd[d] - ref_row)) / scale < 2e-5


def test_psdia_detect_and_oracle_poisson():
    g = 32
    m = utils.laplacian_2d(g)
    dia = convert(COO.from_scipy(m.tocoo(), dtype=jnp.float32), "dia")
    assert dia_stream.detect_period(dia) == g
    A = dia_stream.pack_psdia(dia, rb=256)
    assert A.period == g
    x = np.random.default_rng(1).random(g * g).astype(np.float32)
    y = dia_stream.spmv_psdia(A, jnp.asarray(x), interpret=True)
    assert _rel(y, m.astype(np.float64) @ x) < 2e-5
    # materialized data must equal the explicit DIA data exactly
    np.testing.assert_array_equal(np.asarray(A.data), np.asarray(dia.data))


def test_psdia_constant_diagonals_toeplitz():
    import scipy.sparse as sp

    n = 777                       # partial tail tile at rb=256
    m = sp.diags([2.5, -1.0, -1.25], [-3, 0, 2], shape=(n, n),
                 format="csr")
    dia = convert(COO.from_scipy(m.tocoo(), dtype=jnp.float32), "dia")
    assert dia_stream.detect_period(dia) == 1
    A = dia_stream.pack_psdia(dia, rb=256)
    x = np.random.default_rng(2).random(n).astype(np.float32)
    y = dia_stream.spmv_psdia(A, jnp.asarray(x), interpret=True)
    assert _rel(y, m.toarray().astype(np.float64) @ x) < 2e-5


def test_psdia_rejects_nonperiodic():
    m = utils.banded(600, 2, seed=3)
    dia = convert(COO.from_scipy(m.tocoo(), dtype=jnp.float32), "dia")
    assert dia_stream.detect_period(dia) is None
    with pytest.raises(ValueError, match="periodic"):
        dia_stream.pack_psdia(dia, period=100, rb=200)


def test_psdia_chained_padded_and_accumulate():
    g = 32
    n = g * g
    m = utils.laplacian_2d(g)
    dia = convert(COO.from_scipy(m.tocoo(), dtype=jnp.float32), "dia")
    A = dia_stream.pack_psdia(dia, rb=256)
    rng = np.random.default_rng(4)
    x = rng.random(n).astype(np.float32)
    xp = dia_stream.pad_x(A, jnp.asarray(x))
    yp = dia_stream.spmv_psdia_padded(A, xp, interpret=True)
    ypn = np.asarray(yp)
    # the in-kernel row mask must keep every pad slot zero (chain-closed)
    assert np.all(ypn[:A.L] == 0) and np.all(ypn[A.L + n:] == 0)
    yp2 = dia_stream.spmv_psdia_padded(A, yp * np.float32(0.125),
                                       interpret=True)
    ref = m.astype(np.float64) @ ((m @ x.astype(np.float64)) * 0.125)
    assert _rel(dia_stream.unpad_y(A, yp2), ref) < 2e-5
    y0 = rng.random(n).astype(np.float32)
    out = dia_stream.spmv_psdia(A, jnp.asarray(x), jnp.asarray(y0),
                                interpret=True)
    assert _rel(out, y0.astype(np.float64) + m.astype(np.float64) @ x) < 2e-5


def test_psdia_spmm():
    g = 16
    n = g * g
    m = utils.laplacian_2d(g)
    dia = convert(COO.from_scipy(m.tocoo(), dtype=jnp.float32), "dia")
    A = dia_stream.pack_psdia(dia, rb=128)
    X = np.random.default_rng(5).random((n, 5)).astype(np.float32)
    Y = dia_stream.spmm_psdia(A, jnp.asarray(X), interpret=True)
    assert _rel(Y, m.astype(np.float64) @ X) < 2e-5


def test_psdia_3d_stencil():
    # 7-point 3-D Laplacian: period must resolve to g^2 (the middle-dim
    # diagonal has period g^2, so the g candidate must be rejected)
    import scipy.sparse as sp

    g = 8
    T = sp.diags([-np.ones(g - 1), 2 * np.ones(g), -np.ones(g - 1)],
                 [-1, 0, 1])
    m = sp.kronsum(sp.kronsum(T, T), T, format="csr")
    dia = convert(COO.from_scipy(m.tocoo(), dtype=jnp.float32), "dia")
    assert sorted(abs(o) for o in dia.offsets) == [0, 1, 1, g, g, g * g,
                                                   g * g]
    assert dia_stream.detect_period(dia) == g * g
    A = dia_stream.pack_psdia(dia, rb=128)
    x = np.random.default_rng(7).random(g ** 3).astype(np.float32)
    y = dia_stream.spmv_psdia(A, jnp.asarray(x), interpret=True)
    assert _rel(y, m.astype(np.float64) @ x) < 2e-5


def test_psdia_rectangular_grid():
    # non-square grid: period = the minor grid dimension
    nx, ny = 16, 8
    m = utils.laplacian_2d(nx, ny)
    dia = convert(COO.from_scipy(m.tocoo(), dtype=jnp.float32), "dia")
    assert dia_stream.detect_period(dia) == nx
    A = dia_stream.pack_psdia(dia, rb=64)
    x = np.random.default_rng(8).random(nx * ny).astype(np.float32)
    y = dia_stream.spmv_psdia(A, jnp.asarray(x), interpret=True)
    assert _rel(y, m.astype(np.float64) @ x) < 2e-5


def _asym_periodic(g):
    """Asymmetric grid-periodic matrix: Laplacian with doubled upper
    triangle (still period g, no longer A == A^T)."""
    import scipy.sparse as sp

    m = utils.laplacian_2d(g)
    return (sp.tril(m) + 2 * sp.triu(m, 1)).tocsr()


def test_psdia_transpose():
    g = 32
    m = _asym_periodic(g)
    dia = convert(COO.from_scipy(m.tocoo(), dtype=jnp.float32), "dia")
    A = dia_stream.pack_psdia(dia, rb=256)
    At = dia_stream.transpose_psdia(A)
    x = np.random.default_rng(10).random(g * g).astype(np.float32)
    yt = dia_stream.spmv_psdia(At, jnp.asarray(x), interpret=True)
    assert _rel(yt, m.T.astype(np.float64) @ x) < 2e-5
    # involution: (A^T)^T == A
    Att = dia_stream.transpose_psdia(At)
    assert Att.offsets == A.offsets and Att.L == A.L
    np.testing.assert_allclose(np.asarray(Att.pattern),
                               np.asarray(A.pattern))


def test_psdia_grad_wrt_x():
    g = 32
    m = _asym_periodic(g)
    dia = convert(COO.from_scipy(m.tocoo(), dtype=jnp.float32), "dia")
    A = dia_stream.pack_psdia(dia, rb=256)
    x = np.random.default_rng(11).random(g * g).astype(np.float32)

    def loss(v):
        y = dia_stream.spmv_psdia(A, v, interpret=True)
        return 0.5 * jnp.vdot(y, y)

    grad = np.asarray(jax.grad(loss)(jnp.asarray(x)), np.float64)
    ref = m.T.astype(np.float64) @ (m.astype(np.float64) @ x)
    assert np.max(np.abs(grad - ref)) / np.max(np.abs(ref)) < 2e-5


def test_psdia_grad_wrt_pattern():
    import dataclasses

    from tpu_spmv.formats.dia import DIA
    from tpu_spmv.ops.spmv import spmv as xla_spmv

    g = 16
    m = _asym_periodic(g)
    dia = convert(COO.from_scipy(m.tocoo(), dtype=jnp.float32), "dia")
    A = dia_stream.pack_psdia(dia, rb=256)
    x = jnp.asarray(np.random.default_rng(12).random(g * g), jnp.float32)

    def loss(pat):
        A2 = dataclasses.replace(A, pattern=pat)
        y = dia_stream.spmv_psdia(A2, x, interpret=True)
        return 0.5 * jnp.vdot(y, y)

    # reference: the same loss through the (auto-differentiable) XLA DIA
    # kernel on the materialized data
    def ref_loss(pat):
        A2 = dataclasses.replace(A, pattern=pat)
        d2 = DIA(data=A2.data, offsets=A.offsets, shape=A.shape, nnz=A.nnz)
        y = xla_spmv(d2, x)
        return 0.5 * jnp.vdot(y, y)

    gp = np.asarray(jax.grad(loss)(A.pattern), np.float64)
    gr = np.asarray(jax.grad(ref_loss)(A.pattern), np.float64)
    # the custom VJP parameterizes the TILED pattern (per-copy partials);
    # the reference reads only the first period — fold copies to compare
    P, rb = A.period, A.rb
    gp_fold = gp.reshape(gp.shape[0], rb // P, P).sum(axis=1)
    ref_fold = gr[:, :P]
    assert np.all(gr[:, P:] == 0)
    assert (np.max(np.abs(gp_fold - ref_fold))
            / max(np.max(np.abs(ref_fold)), 1e-30)) < 2e-5


def test_spmm_column_split_path():
    # rb > 2h exercises the 3-way column-split SpMM accumulation (small
    # tests use whole-tile halos and fall back to the full-window path)
    g = 64
    n = g * g
    m = utils.laplacian_2d(g)
    dia = convert(COO.from_scipy(m.tocoo(), dtype=jnp.float32), "dia")
    S = dia_stream.pack_sdia(dia, rb=4096)
    PS = dia_stream.pack_psdia(dia, rb=4096)
    from tpu_spmv.kernels.dia_stream import _halo_size

    assert 2 * _halo_size(S.offsets, S.rb) < S.rb  # split path active
    X = np.random.default_rng(9).random((n, 5)).astype(np.float32)
    ref = m.astype(np.float64) @ X
    Y1 = dia_stream.spmm_sdia(S, jnp.asarray(X), interpret=True)
    Y2 = dia_stream.spmm_psdia(PS, jnp.asarray(X), interpret=True)
    assert _rel(Y1, ref) < 2e-5
    assert _rel(Y2, ref) < 2e-5


def test_psdia_checkpoint_roundtrip(tmp_path):
    from tpu_spmv.io import checkpoint

    g = 32
    m = utils.laplacian_2d(g)
    dia = convert(COO.from_scipy(m.tocoo(), dtype=jnp.float32), "dia")
    A = dia_stream.pack_psdia(dia, rb=256)
    p = tmp_path / "psdia.npz"
    checkpoint.save_matrix(p, A)
    A2 = checkpoint.load_matrix(p)
    assert (A2.period, A2.rb, A2.L, A2.offsets) == (A.period, A.rb, A.L,
                                                    A.offsets)
    x = np.random.default_rng(6).random(g * g).astype(np.float32)
    y = dia_stream.spmv_psdia(A2, jnp.asarray(x), interpret=True)
    assert _rel(y, m.astype(np.float64) @ x) < 2e-5


def test_two_level_routing():
    rng = np.random.default_rng(4)
    n = 1_500_000
    perm = rng.permutation(n)
    # auto must return SOME working plan at a size past the old hard cap
    plan = pm.plan_permutation_auto(perm)
    x = jnp.asarray(rng.random(n), jnp.float32)
    out = pm.apply_permutation(plan, x, interpret=True)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(x)[perm])
    # and the two-level router itself must work when forced
    plan2 = pm.plan_permutation_two_level(perm)
    assert isinstance(plan2, pm.TwoLevelPlan)
    out2 = pm.apply_permutation(plan2, x, interpret=True)
    np.testing.assert_array_equal(np.asarray(out2), np.asarray(x)[perm])


def test_two_level_checkpoint_roundtrip(tmp_path):
    from tpu_spmv.io import checkpoint

    rng = np.random.default_rng(5)
    n = 1_200_000
    perm = rng.permutation(n)
    plan = pm.plan_permutation_two_level(perm)
    p = tmp_path / "two_level.npz"
    checkpoint.save_matrix(p, plan)
    plan2 = checkpoint.load_matrix(p)
    assert plan2.n == plan.n
    x = jnp.asarray(rng.random(n), jnp.float32)
    out = pm.apply_permutation(plan2, x, interpret=True)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(x)[perm])


def test_batched_coloring_matches_serial():
    rng = np.random.default_rng(6)
    T, E = 3, 4000
    src = rng.integers(0, 128, (T, E))
    dst = np.stack([rng.permutation(np.arange(E) % 128) for _ in range(T)])
    colors = pm.color_bipartite_tiles(src, dst)
    # proper coloring: no (src, color) or (dst, color) collision per tile
    for t in range(T):
        assert len(set(zip(src[t], colors[t]))) == E
        assert len(set(zip(dst[t], colors[t]))) == E


def test_dead_output_donation_matches_plain():
    # the zero-copy chaining hook (_dead_out): a donated, never-read
    # buffer aliased to the output must not change any result — SpMV and
    # SpMM, SDIA and PSDIA
    sp_mat = utils.laplacian_2d(16)
    dia = convert(COO.from_scipy(sp_mat.tocoo(), dtype=jnp.float32), "dia")
    S = dia_stream.pack_sdia(dia)
    P = dia_stream.pack_psdia(dia, period=16)
    x = jnp.asarray(np.random.default_rng(3).random(256), jnp.float32)
    xs = dia_stream.pad_x(S, x)
    xp = jnp.pad(x, (P.L, P.npad - P.L - 256))
    np.testing.assert_array_equal(
        np.asarray(dia_stream.spmv_sdia_padded(S, xs, jnp.zeros_like(xs),
                                               interpret=True)),
        np.asarray(dia_stream.spmv_sdia_padded(S, xs, interpret=True)))
    np.testing.assert_array_equal(
        np.asarray(dia_stream.spmv_psdia_padded(P, xp, jnp.zeros_like(xp),
                                                interpret=True)),
        np.asarray(dia_stream.spmv_psdia_padded(P, xp, interpret=True)))
    Xt = jnp.stack([xp * (q + 1) for q in range(8)])
    np.testing.assert_array_equal(
        np.asarray(dia_stream.spmm_psdia_padded_t(P, Xt, jnp.zeros_like(Xt),
                                                  interpret=True)),
        np.asarray(dia_stream.spmm_psdia_padded_t(P, Xt, interpret=True)))
    Xs = jnp.stack([xs * (q + 1) for q in range(8)])
    np.testing.assert_array_equal(
        np.asarray(dia_stream.spmm_sdia_padded_t(S, Xs, jnp.zeros_like(Xs),
                                                 interpret=True)),
        np.asarray(dia_stream.spmm_sdia_padded_t(S, Xs, interpret=True)))


def test_time_chained_pingpong_protocol():
    # the even-odd ping-pong chain must apply the step exactly 2x per
    # fori iteration and return a sane per-step time
    from tpu_spmv.bench.harness import time_chained_pingpong

    sp_mat = utils.laplacian_2d(8)
    dia = convert(COO.from_scipy(sp_mat.tocoo(), dtype=jnp.float32), "dia")
    P = dia_stream.pack_psdia(dia, period=8)
    import dataclasses

    Ps = dataclasses.replace(P, pattern=P.pattern * jnp.float32(0.125))
    x = jnp.asarray(np.random.default_rng(4).random(64), jnp.float32)
    xp = jnp.pad(x, (P.L, P.npad - P.L - 64))
    dt = time_chained_pingpong(
        lambda v, dead, A: dia_stream.spmv_psdia_padded(A, v, dead,
                                                        interpret=True),
        xp, iters=2, warm=1, operands=(Ps,))
    assert dt > 0


def test_sdia_mixed_precision_bf16_data():
    # bf16-stored diagonals, f32 vectors/accumulation: output dtype is
    # f32 and the error budget is bf16 rounding of the coefficients
    # (~1e-2 rel) — use random data so rounding actually bites
    import scipy.sparse as sp

    rng = np.random.default_rng(11)
    n, bw = 300, 3
    diags = [rng.standard_normal(n) for _ in range(2 * bw + 1)]
    offs = list(range(-bw, bw + 1))
    m = sp.diags(diags, offs, shape=(n, n), format="csr")
    dia = convert(COO.from_scipy(m.tocoo(), dtype=jnp.float32), "dia")
    S = dia_stream.pack_sdia(dia, data_dtype=jnp.bfloat16)
    assert S.data.dtype == jnp.bfloat16
    x = jnp.asarray(rng.random(n), jnp.float32)
    y = dia_stream.spmv_sdia(S, x, interpret=True)
    assert y.dtype == jnp.float32
    ref = m.astype(np.float64) @ np.asarray(x, np.float64)
    rel = np.max(np.abs(np.asarray(y, np.float64) - ref)) / np.max(np.abs(ref))
    assert rel < 2e-2, rel       # bf16 coefficient rounding budget
    assert rel > 1e-6            # ...and it IS bf16 (not silently f32)
    # full-f32 pack on the same matrix stays at f32 accuracy
    S32 = dia_stream.pack_sdia(dia)
    y32 = dia_stream.spmv_sdia(S32, x, interpret=True)
    rel32 = np.max(np.abs(np.asarray(y32, np.float64) - ref)) / np.max(np.abs(ref))
    assert rel32 < 2e-6
    # SpMM path promotes the same way
    Xt = jnp.stack([dia_stream.pad_x(S, x)] * 8)
    Yt = dia_stream.spmm_sdia_padded_t(S, Xt, interpret=True)
    assert Yt.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(Yt[0][S.L:S.L + n]),
                               np.asarray(y), rtol=1e-6, atol=1e-6)


def test_psdia_3d_laplacian():
    # 7-point 3-D stencil: offsets 0, ±1, ±nz, ±ny·nz — every diagonal
    # periodic with period ny·nz, so the periodic kernel applies exactly
    # as in 2-D (detect_period must find it unaided)
    m = utils.laplacian_3d(10)                      # 1000 rows
    dia = convert(COO.from_scipy(m.tocoo(), dtype=jnp.float32), "dia")
    P = dia_stream.pack_psdia(dia)                  # auto-detect
    assert P.period in (100, 10)                    # ny*nz (or smaller)
    x = jnp.asarray(np.random.default_rng(12).random(1000), jnp.float32)
    y = dia_stream.spmv_psdia(P, x, interpret=True)
    ref = m.astype(np.float64) @ np.asarray(x, np.float64)
    rel = np.max(np.abs(np.asarray(y, np.float64) - ref)) / np.max(np.abs(ref))
    assert rel < 2e-5, rel
