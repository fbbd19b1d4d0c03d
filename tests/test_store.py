"""Variable store + optimiser tests (varz-replacement semantics)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gpar_tpu.params import Vars, minimise_l_bfgs_b

from .util import approx


def test_get_unconstrained():
    vs = Vars()
    v = vs.get(init=1.5, name="a")
    approx(v, 1.5)
    # Cached by name thereafter: a different init is ignored
    # (what makes the lazy model() closures idempotent).
    approx(vs.get(init=99.0, name="a"), 1.5)


def test_bnd_positive_roundtrip():
    vs = Vars()
    v = vs.bnd(init=0.25, name="var")
    approx(v, 0.25, atol=1e-12)
    # The latent is unconstrained; constrained value stays positive.
    vs.set_latent_vector(["var"], jnp.asarray([-40.0]))
    assert float(vs["var"]) > 0


def test_bnd_lower():
    vs = Vars()
    v = vs.bnd(init=1e-2, name="noise", lower=1e-8)
    approx(v, 1e-2, atol=1e-12)
    vs.set_latent_vector(["noise"], jnp.asarray([-100.0]))
    assert float(vs["noise"]) >= 1e-8


def test_bnd_bounded():
    vs = Vars()
    v = vs.bnd(init=1e-2, name="alpha", lower=1e-3, upper=1e3)
    approx(v, 1e-2, atol=1e-10)
    vs.set_latent_vector(["alpha"], jnp.asarray([1e3]))
    assert 1e-3 <= float(vs["alpha"]) <= 1e3


def test_vector_variables():
    vs = Vars()
    init = np.array([0.5, 1.0, 2.0])
    approx(vs.bnd(init=init, name="scales"), init, atol=1e-12)


def test_names_and_contains():
    vs = Vars()
    vs.get(init=1.0, name="0/x")
    vs.bnd(init=1.0, name="1/y")
    assert vs.names == ["0/x", "1/y"]
    assert "0/x" in vs and "2/z" not in vs


def test_select_globs():
    vs = Vars()
    for name in ["0/input/var", "0/noise", "1/input/var", "1/noise"]:
        vs.bnd(init=1.0, name=name)
    assert vs.select(["0/*"]) == ["0/input/var", "0/noise"]
    assert vs.select(["*/noise"]) == ["0/noise", "1/noise"]
    assert vs.select(None) == vs.names


def test_copy_is_independent():
    vs = Vars()
    vs.get(init=1.0, name="a")
    vs2 = vs.copy(detach=True)
    vs2.set_latent_vector(["a"], jnp.asarray([5.0]))
    approx(vs["a"], 1.0)
    approx(vs2["a"], 5.0)


def test_latent_vector_roundtrip():
    vs = Vars()
    vs.get(init=np.array([1.0, 2.0]), name="v")
    vs.bnd(init=3.0, name="s")
    names = vs.names
    z = vs.latent_vector(names)
    assert z.shape == (3,)
    vs.set_latent_vector(names, z + 0.0)
    approx(vs["v"], [1.0, 2.0])


def test_view_overrides():
    vs = Vars()
    vs.bnd(init=2.0, name="a")
    vs.get(init=1.0, name="b")
    view = vs.with_latent_vector(["a"], jnp.asarray([jnp.log(5.0)]))
    approx(view.bnd(init=2.0, name="a"), 5.0, atol=1e-10)
    approx(view.get(init=1.0, name="b"), 1.0)
    # Base store untouched.
    approx(vs["a"], 2.0, atol=1e-12)


def test_minimise_quadratic():
    vs = Vars()
    vs.get(init=5.0, name="x")

    def objective(v):
        x = v.get(init=5.0, name="x")
        return (x - 2.0) ** 2

    val = minimise_l_bfgs_b(objective, vs, names=["x"], iters=100)
    approx(vs["x"], 2.0, atol=1e-5)
    assert val < 1e-8


def test_minimise_respects_name_filter():
    vs = Vars()
    vs.get(init=5.0, name="x")
    vs.get(init=7.0, name="frozen")

    def objective(v):
        x = v.get(init=5.0, name="x")
        y = v.get(init=7.0, name="frozen")
        return (x - 2.0) ** 2 + (y - 1.0) ** 2

    minimise_l_bfgs_b(objective, vs, names=["x"], iters=100)
    approx(vs["x"], 2.0, atol=1e-5)
    approx(vs["frozen"], 7.0)  # untouched


def test_minimise_bounded_variable():
    vs = Vars()

    def objective(v):
        s = v.bnd(init=1.0, name="s")  # positive
        return (s - 0.5) ** 2 + s

    minimise_l_bfgs_b(objective, vs, names=None, iters=200)
    assert float(vs["s"]) > 0  # bound respected by construction


def test_minimise_iters_cap():
    vs = Vars()
    vs.get(init=50.0, name="x")

    def objective(v):
        x = v.get(init=50.0, name="x")
        return jnp.cosh(x / 10.0)

    minimise_l_bfgs_b(objective, vs, names=["x"], iters=2)
    # Not converged in 2 iters but moved.
    assert abs(float(vs["x"])) < 50.0


def test_minimise_creates_missing_variables():
    vs = Vars()

    def objective(v):
        a = v.get(init=3.0, name="a")
        return a**2

    minimise_l_bfgs_b(objective, vs, names=None, iters=50)
    assert "a" in vs
    approx(vs["a"], 0.0, atol=1e-4)


def test_minimise_restarts_escape_local_optimum():
    # A deceptive 1-D objective: a shallow local minimum at the init (0)
    # and a deep, wide Gaussian well at z=6 (global minimum f ~ -1.04).
    # Single-start L-BFGS stays in the local basin; restarts (latent-space
    # perturbations, vmapped) find the global one.
    import jax
    import jax.numpy as jnp

    from gpar_tpu.params.optim import minimise_l_bfgs_b
    from gpar_tpu.params.store import Vars

    def objective(vs):
        z = vs.get(name="z", init=0.0)
        return 0.01 * z**2 - 1.4 * jnp.exp(-((z - 6.0) ** 2) / 4.0)

    vs1 = Vars()
    f1 = minimise_l_bfgs_b(objective, vs1, iters=200)
    assert abs(float(vs1["z"])) < 1.0  # stuck at the local basin
    assert f1 > -0.5

    vs2 = Vars()
    f2 = minimise_l_bfgs_b(
        objective,
        vs2,
        iters=200,
        restarts=16,
        restart_scale=4.0,
        key=jax.random.PRNGKey(0),
    )
    assert f2 < f1 - 0.5
    assert abs(float(vs2["z"]) - 6.0) < 0.5


def test_minimise_restarts_deterministic_with_key():
    import jax

    from gpar_tpu.params.optim import minimise_l_bfgs_b
    from gpar_tpu.params.store import Vars

    def objective(vs):
        z = vs.get(name="z", init=1.0)
        return (z - 3.0) ** 2

    outs = []
    for _ in range(2):
        vs = Vars()
        outs.append(
            minimise_l_bfgs_b(
                objective, vs, iters=50, restarts=4, key=jax.random.PRNGKey(7)
            )
        )
    assert outs[0] == outs[1]


def test_minimise_trace_rejects_restarts():
    import jax
    import pytest

    from gpar_tpu.params.optim import minimise_l_bfgs_b
    from gpar_tpu.params.store import Vars

    def objective(vs):
        return (vs.get(name="z", init=1.0) - 3.0) ** 2

    with pytest.raises(ValueError, match="restarts"):
        minimise_l_bfgs_b(
            objective, Vars(), trace=True, restarts=4, key=jax.random.PRNGKey(0)
        )


def test_snapshot_restore_roundtrip():
    import numpy as np
    import pytest

    from gpar_tpu.params.store import Vars

    vs = Vars()
    vs.bnd(name="0/noise", init=0.1, lower=1e-8)
    vs.get(name="0/lin/const", init=2.0)
    snap = vs.snapshot()

    vs.set_latent_vector(vs.names, np.array([5.0, -3.0]))
    assert float(vs["0/lin/const"]) == -3.0

    vs.restore(snap)
    np.testing.assert_allclose(float(vs["0/noise"]), 0.1, rtol=1e-12)
    np.testing.assert_allclose(float(vs["0/lin/const"]), 2.0, rtol=1e-12)

    # Snapshot is an independent copy: mutating the store afterwards must
    # not corrupt it.
    vs.set_latent_vector(vs.names, np.array([1.0, 1.0]))
    vs.restore(snap)
    np.testing.assert_allclose(float(vs["0/lin/const"]), 2.0, rtol=1e-12)

    with pytest.raises(KeyError, match="unknown"):
        vs.restore({"not/a/name": np.zeros(())})
