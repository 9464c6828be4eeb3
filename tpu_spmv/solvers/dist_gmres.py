"""Distributed restarted GMRES over a device mesh.

The multi-chip version of :func:`tpu_spmv.solvers.krylov.gmres`
(completing preconditioning parity across the distributed solvers —
VERDICT r4 item 9): general nonsymmetric square systems with a
row-sharded matrix, right-preconditioned (``A M⁻¹ u = b``) so the Givens
recurrence tracks the TRUE residual.

TPU-first shape: the Krylov basis lives as ONE stacked ``[m+1, ndev, C]``
array of ShardedVector chunks (static shapes; row j of the stack IS the
j-th basis vector's sharded chunks), so one-shot classical Gram–Schmidt
against the whole basis is a single masked contraction whose cross-shard
reduction GSPMD lowers to one fused all-reduce per Arnoldi step (CGS
trades some f32 orthogonality for that single barrier; the cycle exit
reports the TRUE residual, same as the serial solver).  Everything runs
as one jitted SPMD program: a ``lax.while_loop`` over restart cycles with
a ``lax.fori_loop`` Arnoldi inner loop.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from ..dist.sharded import ShardedVector
from .dist_cg import _dist_matvec

__all__ = ["DistGMRESResult", "dist_gmres"]


class DistGMRESResult(NamedTuple):
    x: ShardedVector
    iterations: jax.Array       # total inner (Arnoldi) steps
    residual_norm: jax.Array
    converged: jax.Array


def dist_gmres(mesh, A, b: ShardedVector, *, tol: float = 1e-8,
               restart: int = 30, maxiter: int = 1000, axis: str = "x",
               precond=None) -> DistGMRESResult:
    """Restarted GMRES(m) with a mesh-sharded matrix (ShardedCSR or
    HaloCSR).  ``precond``: optional ``M(v: ShardedVector) ->
    ShardedVector`` applied on the right."""
    matvec = _dist_matvec(mesh, A, b, axis, "dist_gmres")
    M = precond if precond is not None else (lambda v: v)
    m = int(restart)
    dt = b.chunks.dtype
    eps = jnp.finfo(dt).tiny
    starts, length = b.starts, b.length

    def sv(chunks):
        return ShardedVector(chunks=chunks, starts=starts, length=length)

    @jax.jit
    def run(bc):
        bnorm = jnp.sqrt(jnp.vdot(bc, bc))
        limit = tol * jnp.maximum(bnorm, 1e-300)

        def cycle(carry):
            x, _, it, _ = carry
            r = bc - matvec(sv(x)).chunks
            beta = jnp.sqrt(jnp.vdot(r, r))
            V0 = jnp.zeros((m + 1,) + bc.shape, dt).at[0].set(
                r / jnp.maximum(beta, eps))
            H0 = jnp.zeros((m + 1, m), dt)
            cs0 = jnp.ones((m,), dt)
            sn0 = jnp.zeros((m,), dt)
            g0 = jnp.zeros((m + 1,), dt).at[0].set(beta)

            def arnoldi(j, st):
                V, H, cs, sn, g, alive, cnt = st
                w = matvec(M(sv(V[j]))).chunks
                # one-shot classical Gram–Schmidt against the filled
                # basis rows; the [m+1]-vector of dots reduces across
                # shards in one fused all-reduce (the dot_stack trick)
                idx = jnp.arange(m + 1)
                mask = (idx <= j).astype(dt)
                h = (V * w[None]).sum(
                    axis=tuple(range(1, V.ndim))) * mask       # [m+1]
                w = w - jnp.tensordot(h, V, axes=1)
                hnext = jnp.sqrt(jnp.vdot(w, w))
                h = h.at[j + 1].set(hnext)
                V = V.at[j + 1].set(jnp.where(hnext > eps, w / hnext, 0))

                # apply the accumulated Givens rotations to column j
                def rot(i, hh):
                    hi = cs[i] * hh[i] + sn[i] * hh[i + 1]
                    hi1 = -sn[i] * hh[i] + cs[i] * hh[i + 1]
                    return hh.at[i].set(hi).at[i + 1].set(hi1)

                h = lax.fori_loop(0, j, rot, h)
                denom = jnp.sqrt(h[j] ** 2 + hnext ** 2)
                c = jnp.where(denom > eps, h[j] / denom, 1.0)
                s = jnp.where(denom > eps, hnext / denom, 0.0)
                h = h.at[j].set(c * h[j] + s * hnext).at[j + 1].set(0)
                gj = g[j]
                g = g.at[j].set(c * gj).at[j + 1].set(-s * gj)
                # mask: past convergence/breakdown the step is a no-op
                H = jnp.where(alive, H.at[:, j].set(h), H)
                cs = jnp.where(alive, cs.at[j].set(c), cs)
                sn = jnp.where(alive, sn.at[j].set(s), sn)
                g = jnp.where(alive, g, st[4])
                V = jnp.where(alive, V, st[0])
                cnt = cnt + alive.astype(cnt.dtype)   # real inner steps
                alive = alive & (jnp.abs(g[j + 1]) > limit) & (hnext > eps)
                return (V, H, cs, sn, g, alive, cnt)

            V, H, cs, sn, g, _, cnt = lax.fori_loop(
                0, m, arnoldi, (V0, H0, cs0, sn0, g0, beta > limit,
                                jnp.zeros((), jnp.int32)))
            # triangular solve on the rotated Hessenberg (see the serial
            # krylov.gmres for the masked-column reasoning)
            diag = jnp.abs(jnp.diagonal(H[:m, :]))
            filled = (diag > eps).astype(dt)
            R = H[:m, :] + jnp.diag(1 - filled)
            y = jax.scipy.linalg.solve_triangular(R, g[:m] * filled,
                                                  lower=False)
            x = x + M(sv(jnp.tensordot(y, V[:m], axes=1))).chunks
            rnorm = jnp.where(jnp.any(jnp.isnan(g)),
                              jnp.array(jnp.inf, dt), jnp.abs(g[m]))
            # steps actually taken, not the cycle length
            return (x, rnorm, it + cnt, beta)

        def cond(carry):
            _, rnorm, it, prev = carry
            return (rnorm > limit) & (it < maxiter) & (rnorm < prev)

        r0 = bc - matvec(sv(jnp.zeros_like(bc))).chunks
        carry = (jnp.zeros_like(bc), jnp.sqrt(jnp.vdot(r0, r0)).astype(dt),
                 jnp.zeros((), jnp.int32), jnp.array(jnp.inf, dt))
        x, rnorm, it, _ = lax.while_loop(cond, cycle, carry)
        # report the true residual (the Givens estimate drifts in f32)
        rtrue = bc - matvec(sv(x)).chunks
        rnorm = jnp.sqrt(jnp.vdot(rtrue, rtrue))
        return x, it, rnorm, rnorm <= limit

    x, it, rnorm, ok = run(b.chunks)
    return DistGMRESResult(x=sv(x), iterations=it, residual_norm=rnorm,
                           converged=ok)
