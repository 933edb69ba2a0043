"""Closed-form and finite-difference checks for the perturbed estimators
(SURVEY.md §4: the reference ships no unit tests; these verify the math the
reference only validates statistically)."""

import jax
import jax.numpy as jnp
import numpy as np
from scipy import stats

from pertrenderer_tpu.ops.perturbed import (
    hard_argmax_onehot,
    heaviside,
    log_corrected,
    perturbed_argmax,
    perturbed_heaviside,
    prod_corrected,
)


def test_heaviside_semantics():
    x = jnp.array([-1.0, 0.0, 2.0])
    np.testing.assert_array_equal(np.asarray(heaviside(x)), [0.0, 1.0, 1.0])


def test_perturbed_heaviside_converges_to_gaussian_cdf():
    d = jnp.linspace(-2.0, 2.0, 9).reshape(1, 3, 3, 1)
    sigma = jnp.asarray(0.7)
    out = perturbed_heaviside(d, sigma, jax.random.PRNGKey(0), 4096, "gaussian", True)
    expected = stats.norm.cdf(np.asarray(d) / 0.7)
    np.testing.assert_allclose(np.asarray(out), expected, atol=0.03)


def test_perturbed_heaviside_cauchy_converges_to_arctan():
    d = jnp.linspace(-2.0, 2.0, 9).reshape(1, 3, 3, 1)
    sigma = jnp.asarray(0.5)
    out = perturbed_heaviside(d, sigma, jax.random.PRNGKey(1), 8192, "cauchy", True)
    expected = np.arctan(np.asarray(d) / 0.5) / np.pi + 0.5
    np.testing.assert_allclose(np.asarray(out), expected, atol=0.03)


def test_perturbed_heaviside_deterministic_given_key():
    d = jnp.ones((1, 4, 4, 2)) * 0.3
    k = jax.random.PRNGKey(7)
    a = perturbed_heaviside(d, jnp.asarray(0.5), k, 16, "gaussian", True)
    b = perturbed_heaviside(d, jnp.asarray(0.5), k, 16, "gaussian", True)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    c = perturbed_heaviside(d, jnp.asarray(0.5), jax.random.PRNGKey(8), 16,
                            "gaussian", True)
    assert np.abs(np.asarray(a) - np.asarray(c)).max() > 0


def test_perturbed_heaviside_gradient_matches_gaussian_pdf():
    """The VR score-function gradient estimates d/dd Phi(d/sigma) = pdf."""
    d = jnp.array([[-0.8, -0.2, 0.0, 0.4, 1.2]]).reshape(1, 1, 5, 1)
    sigma = 0.6

    def f(d):
        return jnp.sum(perturbed_heaviside(d, jnp.asarray(sigma),
                                           jax.random.PRNGKey(3), 8192,
                                           "gaussian", True))

    g = np.asarray(jax.grad(f)(d)).ravel()
    expected = stats.norm.pdf(np.asarray(d).ravel() / sigma) / sigma
    np.testing.assert_allclose(g, expected, atol=0.08, rtol=0.15)


def test_grad_sigma_equals_sum_of_grad_d():
    """Reference quirk: sigma's grad is overwritten with sum(grad_d)
    (`/root/reference/randomras/smoothrast.py:55-58`)."""
    d = jnp.linspace(-1, 1, 8).reshape(1, 2, 2, 2)

    def f(d, s):
        return jnp.sum(perturbed_heaviside(d, s, jax.random.PRNGKey(0), 64,
                                           "gaussian", True) * 2.0)

    gd, gs = jax.grad(f, argnums=(0, 1))(d, jnp.asarray(0.5))
    np.testing.assert_allclose(float(gs), float(jnp.sum(gd)), rtol=1e-5)


def test_variance_reduction_reduces_variance():
    d = jnp.full((1, 8, 8, 1), 0.3)

    def grad_for(key, vr):
        f = lambda d: jnp.sum(
            perturbed_heaviside(d, jnp.asarray(0.5), key, 8, "gaussian", vr))
        return np.asarray(jax.grad(f)(d)).ravel()

    keys = [jax.random.PRNGKey(i) for i in range(30)]
    g_vr = np.stack([grad_for(k, True) for k in keys])
    g_wo = np.stack([grad_for(k, False) for k in keys])
    assert g_vr.std(0).mean() < g_wo.std(0).mean()


def test_perturbed_argmax_gumbel_converges_to_softmax():
    z = jnp.array([[[[0.5, -0.2, 0.9, 0.0]]]])
    gamma = 0.3
    out = perturbed_argmax(z, jnp.asarray(gamma), jax.random.PRNGKey(0), 8192,
                           "gumbel", True)
    expected = jax.nn.softmax(z / gamma, axis=-1)
    np.testing.assert_allclose(np.asarray(out), np.asarray(expected), atol=0.03)


def test_perturbed_argmax_rows_sum_to_one():
    z = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 4, 5))
    out = perturbed_argmax(z, jnp.asarray(0.1), jax.random.PRNGKey(1), 32,
                           "gaussian", True)
    np.testing.assert_allclose(np.asarray(out.sum(-1)), 1.0, atol=1e-5)


def test_perturbed_argmax_gradient_two_channel_closed_form():
    """For 2 channels with gaussian noise, P(pick 0) = Phi((z0-z1)/(g*sqrt2));
    d/dz0 = pdf/(g*sqrt2)."""
    z = jnp.array([[[[0.2, -0.1]]]])
    gamma = 0.4

    def f(z):
        w = perturbed_argmax(z, jnp.asarray(gamma), jax.random.PRNGKey(5),
                             16384, "gaussian", True)
        return w[0, 0, 0, 0]

    g = np.asarray(jax.grad(f)(z)).ravel()
    s = gamma * np.sqrt(2.0)
    expected = stats.norm.pdf(0.3 / s) / s
    np.testing.assert_allclose(g[0], expected, atol=0.08, rtol=0.15)
    np.testing.assert_allclose(g[1], -expected, atol=0.08, rtol=0.15)


def test_hard_argmax_onehot_first_wins_ties():
    z = jnp.array([[1.0, 1.0, 0.0]])
    np.testing.assert_array_equal(np.asarray(hard_argmax_onehot(z)),
                                  [[1.0, 0.0, 0.0]])


def test_log_corrected_zero_input_grad():
    g = jax.grad(lambda x: jnp.sum(log_corrected(x)))(jnp.array([0.0, 1.0, 2.0]))
    assert np.isfinite(np.asarray(g)).all()
    np.testing.assert_allclose(np.asarray(g), [0.0, 1.0, 0.5])


def test_prod_corrected_inf_handling():
    x = jnp.asarray(0.5)
    y = jnp.array([1.0, -jnp.inf, 2.0])

    gx, gy = jax.grad(lambda x, y: jnp.sum(
        jnp.where(jnp.isfinite(prod_corrected(x, y)), prod_corrected(x, y), 0.0)
    ), argnums=(0, 1))(x, y)
    assert np.isfinite(float(gx))
    assert np.isfinite(np.asarray(gy)).all()


def test_prod_corrected_value_and_plain_grad():
    x = jnp.asarray(2.0)
    y = jnp.array([1.0, 3.0])
    out = prod_corrected(x, y)
    np.testing.assert_allclose(np.asarray(out), [2.0, 6.0])
    gx, gy = jax.grad(lambda x, y: jnp.sum(prod_corrected(x, y) * jnp.array([1.0, 2.0])),
                      argnums=(0, 1))(x, y)
    np.testing.assert_allclose(float(gx), 1.0 * 1 + 3.0 * 2)
    np.testing.assert_allclose(np.asarray(gy), [2.0, 4.0])


def test_forward_only_families_degrade_to_zero_grads():
    """Uniform/gumbel argmax and logistic heaviside are forward-only; grads
    must come back zero (with a warning) instead of crashing the jit — the
    reference prints and then crashes on the None grad
    (`/root/reference/randomras/smoothagg.py:64-73`)."""
    import warnings

    z = jax.random.normal(jax.random.PRNGKey(0), (1, 2, 2, 4))
    for noise in ("uniform", "gumbel"):
        def f(z, g):
            return jnp.sum(perturbed_argmax(z, g, jax.random.PRNGKey(1), 4,
                                            noise, True))
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            gz, gg = jax.grad(f, argnums=(0, 1))(z, jnp.asarray(0.3))
        np.testing.assert_array_equal(np.asarray(gz), 0.0)
        assert float(gg) == 0.0

    def h(d, s):
        return jnp.sum(perturbed_heaviside(d, s, jax.random.PRNGKey(1), 4,
                                           "logistic", True))
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        gd, gs = jax.grad(h, argnums=(0, 1))(z, jnp.asarray(0.3))
    np.testing.assert_array_equal(np.asarray(gd), 0.0)
    assert float(gs) == 0.0
