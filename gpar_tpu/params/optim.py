"""L-BFGS hyperparameter optimisation over name-filtered latents.

Replaces ``varz.torch.minimise_l_bfgs_b`` (``gpar/regression.py:10,459``).
Box constraints are unnecessary because all bounds are expressed through the
store's transforms (see ``params/store.py``), so plain L-BFGS with a zoom
linesearch (``optax.lbfgs``) matches the reference's observable behaviour.

TPU-native design: the *entire* optimisation loop — objective, gradient,
two-loop recursion, zoom linesearch, convergence test — is one jitted
``lax.while_loop``, so an L-BFGS fit of a GP layer is a single XLA
computation with no host round-trips per iteration.
"""

import jax
import jax.numpy as jnp
import optax
from jax import lax

__all__ = ["minimise_l_bfgs_b"]


def minimise_l_bfgs_b(
    objective,
    vs,
    names=None,
    iters=1000,
    trace=False,
    gtol=1e-9,
    memory_size=10,
    jit=True,
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

    Returns:
        float: Final objective value.
    """
    sel = vs.select(names)
    # Make sure every selected variable exists (they are created lazily on
    # first access); evaluate once eagerly to instantiate and get f0.
    f0 = objective(vs)
    sel = vs.select(names)
    if not sel:
        return float(f0)

    z0 = vs.latent_vector(sel)

    def fun(z):
        return jnp.asarray(objective(vs.with_latent_vector(sel, z)))

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

    def not_converged(carry):
        _, state = carry
        count = optax.tree_utils.tree_get(state, "count")
        grad = optax.tree_utils.tree_get(state, "grad")
        value = optax.tree_utils.tree_get(state, "value")
        gnorm = jnp.max(jnp.abs(grad))
        # The freshly-initialised state carries value=inf/grad=0; always take
        # the first step.
        return (count < iters) & (
            (count == 0) | ((gnorm > gtol) & jnp.isfinite(value))
        )

    state0 = opt.init(z0)

    if trace:
        z, state = z0, state0
        it = 0
        while bool(not_converged((z, state))) and it < iters:
            z, state = (jax.jit(step) if jit else step)((z, state))
            it += 1
            val = optax.tree_utils.tree_get(state, "value")
            print(f"  lbfgs iter {it}: objective {float(val):.6f}")
    else:

        def run(z0, state0):
            return lax.while_loop(not_converged, step, (z0, state0))

        if jit:
            run = jax.jit(run)
        z, state = run(z0, state0)

    final_value = optax.tree_utils.tree_get(state, "value")
    # Guard against the pathological case where the first step already
    # produced a non-finite value: keep the initial latents then.
    ok = jnp.isfinite(final_value) & jnp.all(jnp.isfinite(z))
    z = jnp.where(ok, z, z0)
    vs.set_latent_vector(sel, z)
    final = jnp.where(ok, final_value, f0)
    return float(final)
