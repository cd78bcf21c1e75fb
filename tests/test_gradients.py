"""Gradient correctness through the adaptive loop (the keystone, SURVEY.md §7)."""
import jax
import jax.numpy as jnp
import numpy as np

from localregneuralde_tpu.ode import odesolve


def _f(u, t, p):
    return jnp.tanh(p["w"] @ u + p["b"]) - 0.5 * u


def _setup():
    key = jax.random.PRNGKey(0)
    p = {
        "w": jax.random.normal(key, (4, 4)) * 0.5,
        "b": jnp.zeros(4),
    }
    u0 = jax.random.normal(jax.random.PRNGKey(1), (4,))
    return u0, p


def _loss(u0, p):
    sol = odesolve(
        _f, u0, (0.0, 1.0), p, rtol=1e-6, atol=1e-8,
        max_steps=64, checkpoint_every=8, adjoint="direct",
    )
    return jnp.sum(sol.y_final ** 2)


def test_grad_u0_matches_finite_differences():
    u0, p = _setup()
    g = jax.grad(_loss)(u0, p)
    eps = 1e-3
    for i in range(4):
        e = np.zeros(4)
        e[i] = eps
        fd = (_loss(u0 + e, p) - _loss(u0 - e, p)) / (2 * eps)
        assert abs(float(g[i]) - float(fd)) < 2e-3 * max(1.0, abs(float(fd)))


def test_grad_params_matches_finite_differences():
    u0, p = _setup()
    g = jax.grad(_loss, argnums=1)(u0, p)
    eps = 1e-3
    for idx in [(0, 0), (1, 2), (3, 3)]:
        e = np.zeros((4, 4))
        e[idx] = eps
        fd = (
            _loss(u0, {"w": p["w"] + e, "b": p["b"]})
            - _loss(u0, {"w": p["w"] - e, "b": p["b"]})
        ) / (2 * eps)
        assert abs(float(g["w"][idx]) - float(fd)) < 2e-3 * max(
            1.0, abs(float(fd))
        )


def test_no_gradient_through_controller():
    # dt selection is stop_gradient-fenced: gradients must be finite even
    # when the error estimate sits near the accept boundary.
    u0, p = _setup()
    g = jax.grad(_loss, argnums=(0, 1))(u0, p)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(bool(jnp.isfinite(x).all()) for x in leaves)


def test_grad_of_saveat_outputs():
    u0, p = _setup()

    def loss(u0, p):
        sol = odesolve(
            _f, u0, (0.0, 1.0), p, rtol=1e-5, atol=1e-7,
            saveat=jnp.array([0.3, 0.7, 1.0]), max_steps=64,
            adjoint="direct",
        )
        return jnp.sum(sol.ys[1] ** 2)

    g = jax.grad(loss)(u0, p)
    eps = 1e-3
    e = np.zeros(4)
    e[2] = eps
    fd = (loss(u0 + e, p) - loss(u0 - e, p)) / (2 * eps)
    assert abs(float(g[2]) - float(fd)) < 2e-3 * max(1.0, abs(float(fd)))
