"""L-BFGS hyperparameter optimisation over name-filtered latents.

Replaces ``varz.torch.minimise_l_bfgs_b`` (``gpar/regression.py:10,459``).
Box constraints are unnecessary because all bounds are expressed through the
store's transforms (see ``params/store.py``), so plain L-BFGS with a zoom
linesearch (``optax.lbfgs``) matches the reference's observable behaviour.

TPU-native design: the *entire* optimisation loop — objective, gradient,
two-loop recursion, zoom linesearch, convergence test — is one
``lax.while_loop``.  :func:`lbfgs_traced` is the traced building block and
can be embedded inside larger jitted programs (the fused GPAR fit runs all
per-layer optimisations in a single XLA computation);
:func:`minimise_l_bfgs_b` is the standalone driver with the varz-style API.
"""

import jax
import jax.numpy as jnp
from jax import lax

__all__ = ["minimise_l_bfgs_b", "lbfgs_traced", "lbfgs_traced_restarts"]


def lbfgs_traced(fun, z0, iters=1000, gtol=1e-9, memory_size=10):
    """Run L-BFGS as a pure traced computation (embeddable inside larger
    jitted programs — the fused GPAR fit instantiates one per layer).

    Uses the compact from-scratch implementation in ``params/lbfgs.py``
    (two-loop recursion + Armijo backtracking): its loop body costs two
    objective evaluations of HLO, an order of magnitude less graph than a
    zoom-linesearch stack, which keeps whole-fit compile times sane.

    Returns:
        (z_opt, value, iters_used, value0): final iterate (guarded against
        non-finite results — falls back to ``z0``), final objective value,
        the number of iterations taken, and the initial objective value
        (free — the loop seeds from it; fit reports use it to show the
        NLL decrease).
    """
    from .lbfgs import lbfgs_minimize

    return lbfgs_minimize(fun, z0, iters=iters, gtol=gtol, memory=memory_size)


def lbfgs_traced_restarts(
    fun,
    z0,
    key,
    restarts,
    restart_scale=1.0,
    iters=1000,
    gtol=1e-9,
    memory_size=10,
):
    """Multi-start L-BFGS as one traced computation (beyond the reference:
    GP marginal likelihoods are multi-modal in the length scales, and the
    reference offers only single-start fits).

    Runs ``restarts`` optimisations **in parallel with one `vmap`** — the
    TPU executes the whole batch as batched kernels instead of a restart
    loop — from the unperturbed ``z0`` plus ``restarts - 1`` Gaussian
    perturbations of scale ``restart_scale`` *in the unconstrained latent
    space* (multiplicative in natural space for positive variables), and
    returns the best finite optimum ``(z, value, iters_used)``.
    """
    if restarts <= 1:
        return lbfgs_traced(
            fun, z0, iters=iters, gtol=gtol, memory_size=memory_size
        )
    noise = restart_scale * jax.random.normal(
        key, (restarts - 1, z0.shape[0]), dtype=z0.dtype
    )
    z0s = jnp.concatenate([z0[None], z0[None] + noise], axis=0)
    zs, fs, its, f0s = jax.vmap(
        lambda z: lbfgs_traced(
            fun, z, iters=iters, gtol=gtol, memory_size=memory_size
        )
    )(z0s)
    best = jnp.argmin(jnp.where(jnp.isfinite(fs), fs, jnp.inf))
    # f0 of the *unperturbed* init — the reference-comparable starting NLL.
    return zs[best], fs[best], its[best], f0s[0]


def minimise_l_bfgs_b(
    objective,
    vs,
    names=None,
    iters=1000,
    trace=False,
    gtol=1e-9,
    memory_size=10,
    jit=True,
    restarts=1,
    restart_scale=1.0,
    key=None,
):
    """Minimise ``objective(vs)`` over the latents of the name-matched
    variables.

    Args:
        objective: Callable taking a :class:`Vars`-like object and returning
            a scalar (``gpar/regression.py:434-450``).
        vs: :class:`Vars` store; updated in place with the optimum.
        names: Glob pattern or list of patterns selecting variables
            (``names=[f"{pi}/*"]``, ``gpar/regression.py:452-459``).
        iters: Maximum number of L-BFGS iterations (reference tests pass
            ``iters=10``, ``tests/test_regression.py:265``).
        trace: Print per-iteration progress (runs the loop host-side).
        gtol: Infinity-norm gradient tolerance for early stopping.
        restarts: Number of parallel multi-start optimisations (one
            unperturbed + ``restarts - 1`` perturbed inits, vmapped; see
            :func:`lbfgs_traced_restarts`).  Default 1 (reference
            behaviour).
        restart_scale: Std-dev of the latent-space init perturbations.
        key: PRNG key for the perturbations (auto-seeded if omitted).

    Returns:
        float: Final objective value.
    """
    sel = vs.select(names)
    if not sel:
        # Variables are created lazily on first access: evaluate once
        # (eagerly) to instantiate, then reselect.
        f0 = objective(vs)
        sel = vs.select(names)
        if not sel:
            return float(f0)

    z0 = vs.latent_vector(sel)

    def fun(z):
        return jnp.asarray(objective(vs.with_latent_vector(sel, z)))

    if trace:
        if restarts > 1:
            # Silently running single-start when the user asked for a
            # multi-start fit would misattribute a worse optimum to the
            # model rather than the dropped option.
            raise ValueError(
                "trace=True runs the host-side single-start driver; it "
                "does not support restarts>1. Drop trace= or restarts=."
            )
        # optax is only needed for the host-side trace driver; the
        # production paths use the from-scratch lbfgs (params/lbfgs.py),
        # keeping the package's hard dependencies to jax + numpy.
        try:
            import optax
        except ImportError as e:
            raise ImportError(
                "trace=True uses optax's zoom-linesearch L-BFGS for the "
                "host-side per-iteration trace driver, and optax is not "
                "installed. Install the [test] extra (or optax), or drop "
                "trace= to use the built-in fused optimiser."
            ) from e

        opt = optax.lbfgs(memory_size=memory_size)
        value_and_grad = optax.value_and_grad_from_state(fun)

        def step(carry):
            z, state = carry
            value, grad = value_and_grad(z, state=state)
            updates, state = opt.update(
                grad, state, z, value=value, grad=grad, value_fn=fun
            )
            z = optax.apply_updates(z, updates)
            return z, state

        z, state = z0, opt.init(z0)
        step_fn = jax.jit(step) if jit else step
        for it in range(iters):
            z, state = step_fn((z, state))
            value = optax.tree_utils.tree_get(state, "value")
            grad = optax.tree_utils.tree_get(state, "grad")
            print(f"  lbfgs iter {it + 1}: objective {float(value):.6f}")
            if not (jnp.max(jnp.abs(grad)) > gtol) or not jnp.isfinite(value):
                break
        value = optax.tree_utils.tree_get(state, "value")
        ok = jnp.isfinite(value) & jnp.all(jnp.isfinite(z))
        z = jnp.where(ok, z, z0)
        vs.set_latent_vector(sel, z)
        return float(value if ok else fun(z0))

    if restarts > 1 and key is None:
        from ..utils.rng import next_key

        key = next_key()

    def run(z0, key):
        return lbfgs_traced_restarts(
            fun,
            z0,
            key,
            restarts,
            restart_scale=restart_scale,
            iters=iters,
            gtol=gtol,
            memory_size=memory_size,
        )

    if jit:
        run = jax.jit(run)
    z, value, _, _ = run(z0, key)
    vs.set_latent_vector(sel, z)
    return float(value)
