"""Compact L-BFGS for XLA: two-loop recursion over a fixed-size circular
history + Armijo backtracking linesearch.

This is the from-scratch replacement for the optimiser the reference
delegates to ``varz.torch.minimise_l_bfgs_b`` (scipy's L-BFGS-B; box
constraints are unnecessary here because all bounds are expressed through
the variable-store transforms).

Why not wrap an off-the-shelf zoom-linesearch L-BFGS: the GPAR fit embeds
one optimisation loop *per output layer* inside a single fused XLA program
(16+ instances for the benchmark config), and compile time scales with
graph size.  This implementation keeps the loop body to exactly two
objective evaluations' worth of HLO (one value_and_grad + an
objective-only backtracking loop) plus O(memory) vector maths, compiling
roughly an order of magnitude faster while matching scipy-grade
convergence on GP marginal-likelihood surfaces.

Everything is shape-static and differentiable-free (used inside a
while_loop; gradients of the *result* are not needed — hyperparameter
optimisation is the outermost loop).
"""

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

__all__ = ["lbfgs_minimize"]


class _State(NamedTuple):
    z: jnp.ndarray  # current iterate (d,)
    f: jnp.ndarray  # current value
    g: jnp.ndarray  # current gradient (d,)
    S: jnp.ndarray  # history of steps (M, d)
    Y: jnp.ndarray  # history of grad diffs (M, d)
    rho: jnp.ndarray  # 1 / (s . y) per slot (M,)
    head: jnp.ndarray  # next write slot
    count: jnp.ndarray  # filled slots (<= M)
    it: jnp.ndarray  # iteration counter
    done: jnp.ndarray  # convergence flag


def _two_loop(g, S, Y, rho, head, count, M):
    """Standard two-loop recursion with circular-buffer masking."""

    def newest(i):
        # i = 0 is the most recent pair.
        return (head - 1 - i) % M

    def first(i, carry):
        q, alphas = carry
        j = newest(i)
        valid = i < count
        a = jnp.where(valid, rho[j] * jnp.dot(S[j], q), 0.0)
        q = q - a * Y[j] * valid
        return q, alphas.at[j].set(a)

    q, alphas = lax.fori_loop(
        0, M, first, (g, jnp.zeros(M, dtype=g.dtype))
    )

    # Initial Hessian scaling gamma = (s.y) / (y.y) of the newest pair.
    jn = newest(0)
    have = count > 0
    yy = jnp.dot(Y[jn], Y[jn])
    gamma = jnp.where(have & (yy > 0), 1.0 / (jnp.maximum(rho[jn], 1e-300) * yy), 1.0)
    r = gamma * q

    def second(i, r):
        # Oldest to newest.
        j = (head - count + i) % M
        valid = i < count
        b = jnp.where(valid, rho[j] * jnp.dot(Y[j], r), 0.0)
        return r + S[j] * (alphas[j] - b) * valid

    r = lax.fori_loop(0, M, second, r)
    return -r  # descent direction


def lbfgs_minimize(
    fun,
    z0,
    iters=1000,
    gtol=1e-9,
    ftol=1e-12,
    memory=10,
    max_linesearch=25,
    c1=1e-4,
):
    """Minimise ``fun`` from ``z0``; returns ``(z, f, iterations_used, f0)``
    with ``f0`` the objective at ``z0`` (already evaluated to seed the
    loop; returning it lets fit reports show the NLL *decrease* for free).

    Armijo backtracking (factor 0.5); curvature pairs with
    ``s.y <= 1e-10 |s||y|`` are skipped (standard damped-memory guard so
    the inverse-Hessian approximation stays positive definite without a
    Wolfe linesearch).  Non-finite trial values shrink the step like a
    failed Armijo test, which handles the constraint-transform boundaries.
    """
    d = z0.shape[0]
    M = memory
    dtype = z0.dtype
    value_and_grad = jax.value_and_grad(fun)

    f0, g0 = value_and_grad(z0)
    state0 = _State(
        z=z0,
        f=f0,
        g=g0,
        S=jnp.zeros((M, d), dtype=dtype),
        Y=jnp.zeros((M, d), dtype=dtype),
        rho=jnp.zeros(M, dtype=dtype),
        head=jnp.zeros((), jnp.int32),
        count=jnp.zeros((), jnp.int32),
        it=jnp.zeros((), jnp.int32),
        done=jnp.asarray(False),
    )

    def cond(st):
        return (~st.done) & (st.it < iters)

    def body(st):
        direction = _two_loop(st.g, st.S, st.Y, st.rho, st.head, st.count, M)
        dg = jnp.dot(direction, st.g)
        # Fall back to steepest descent if the direction is not a descent
        # direction (numerical breakdown).
        bad = (~jnp.isfinite(dg)) | (dg >= 0)
        direction = jnp.where(bad, -st.g, direction)
        dg = jnp.where(bad, -jnp.dot(st.g, st.g), dg)

        # First iteration: conservative initial step.
        t0 = jnp.where(
            st.count == 0,
            jnp.minimum(1.0, 1.0 / jnp.maximum(jnp.sum(jnp.abs(st.g)), 1e-12)),
            jnp.ones((), dtype),
        )

        def ls_cond(carry):
            t, f_new, tries = carry
            armijo = f_new <= st.f + c1 * t * dg
            return (~(armijo & jnp.isfinite(f_new))) & (tries < max_linesearch)

        def ls_body(carry):
            t, _, tries = carry
            t = t * 0.5
            return t, fun(st.z + t * direction), tries + 1

        f_try = fun(st.z + t0 * direction)
        t, f_new, tries = lax.while_loop(ls_cond, ls_body, (t0, f_try, 0))
        ls_failed = ~(jnp.isfinite(f_new) & (f_new <= st.f + c1 * t * dg))

        z_new = jnp.where(ls_failed, st.z, st.z + t * direction)
        f_new2, g_new = value_and_grad(z_new)
        f_new2 = jnp.where(ls_failed, st.f, f_new2)
        g_new = jnp.where(ls_failed, st.g, g_new)

        # Curvature update.
        s = z_new - st.z
        y = g_new - st.g
        sy = jnp.dot(s, y)
        good = sy > 1e-10 * jnp.linalg.norm(s) * jnp.linalg.norm(y)
        S = jnp.where(good, st.S.at[st.head].set(s), st.S)
        Y = jnp.where(good, st.Y.at[st.head].set(y), st.Y)
        rho = jnp.where(good, st.rho.at[st.head].set(1.0 / sy), st.rho)
        head = jnp.where(good, (st.head + 1) % M, st.head)
        count = jnp.where(good, jnp.minimum(st.count + 1, M), st.count)

        converged = (
            (jnp.max(jnp.abs(g_new)) <= gtol)
            | (jnp.abs(f_new2 - st.f) <= ftol * (1.0 + jnp.abs(st.f)))
            | ls_failed
        )
        return _State(
            z=z_new,
            f=f_new2,
            g=g_new,
            S=S,
            Y=Y,
            rho=rho,
            head=head,
            count=count,
            it=st.it + 1,
            done=converged,
        )

    st = lax.while_loop(cond, body, state0)

    # Guard against a non-finite end state.
    ok = jnp.isfinite(st.f) & jnp.all(jnp.isfinite(st.z))
    z = jnp.where(ok, st.z, z0)
    f = jnp.where(ok, st.f, f0)
    return z, f, st.it, f0
