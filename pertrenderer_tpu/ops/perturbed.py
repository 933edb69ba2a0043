"""Monte-Carlo perturbed-optimizer estimators with custom VJPs.

The reference's novel math — perturbed Heaviside
(`/root/reference/randomras/smoothrast.py:12-108`) and perturbed argmax
(`/root/reference/randomras/smoothagg.py:10-141`) — rebuilt TPU-first:

  * functional PRNG: explicit `jax.random` keys replace torch global RNG;
  * **no (S, N, H, W, K) noise tensor survives the forward pass** — the
    backward pass *recomputes* the noise from the saved key with a
    `lax.scan` over samples, so memory stays O(input) regardless of S
    (the reference materializes S-times the fragment volume in both
    directions; SURVEY §5 identifies this as the long-axis bottleneck);
  * variance-reduced score-function gradients exactly mirror the reference,
    including its quirks (see notes on `grad_sigma` below);
  * all control flow is static (noise family / S / VR are trace-time
    constants), so XLA fuses sample-loop iterations into tight VPU loops.

Also contains the numerically-corrected primitives ``log_corrected`` and
``prod_corrected`` (`/root/reference/randomras/smoothagg.py:292-337`) that
keep sigma/gamma differentiable through log(0) = -inf terms.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

__all__ = [
    "perturbed_heaviside",
    "perturbed_argmax",
    "log_corrected",
    "prod_corrected",
    "heaviside",
    "hard_argmax_onehot",
]

_CAUCHY_CLAMP = 1e7


def heaviside(x: jnp.ndarray) -> jnp.ndarray:
    """H(x) with H(0) = 1, matching ``torch.heaviside(x, ones)`` as used at
    `/root/reference/randomras/smoothrast.py:33`."""
    return jnp.where(x >= 0, 1.0, 0.0).astype(jnp.float32)


def hard_argmax_onehot(z: jnp.ndarray) -> jnp.ndarray:
    """One-hot of argmax over the last axis (first index wins ties, like
    ``torch.max`` + ``scatter_`` at `/root/reference/randomras/smoothagg.py:37-39`)."""
    idx = jnp.argmax(z, axis=-1)
    return jax.nn.one_hot(idx, z.shape[-1], dtype=jnp.float32)


def _sample_noise(key, shape, noise_type: str):
    """One standard noise sample of ``shape`` for the given family.

    Families match `/root/reference/randomras/smoothrast.py:17-31` and
    `/root/reference/randomras/smoothagg.py:16-32` (Cauchy clamped to ±1e7
    to avoid infs, uniform on [-0.5, 0.5])."""
    if noise_type == "gaussian":
        return jax.random.normal(key, shape)
    if noise_type == "cauchy":
        return jnp.clip(jax.random.cauchy(key, shape), -_CAUCHY_CLAMP, _CAUCHY_CLAMP)
    if noise_type == "logistic":
        return jax.random.logistic(key, shape)
    if noise_type == "gumbel":
        return jax.random.gumbel(key, shape)
    if noise_type == "uniform":
        return jax.random.uniform(key, shape, minval=-0.5, maxval=0.5)
    raise ValueError(f"noise type {noise_type!r} not implemented")


def _score(noise: jnp.ndarray, noise_type: str) -> jnp.ndarray:
    """Score function -∇ log p(z) entering the SFE gradient
    (`/root/reference/randomras/smoothrast.py:45-52`)."""
    if noise_type == "gaussian":
        return noise
    if noise_type == "cauchy":
        return 2.0 * noise / (1.0 + noise * noise)
    raise ValueError(f"gradient for noise type {noise_type!r} not implemented")


# --------------------------------------------------------------------------
# Perturbed Heaviside
# --------------------------------------------------------------------------

def _device_key(key, sample_axis):
    """Under shard_map with the MC-sample mesh axis, give each device its own
    noise stream (SURVEY §2.5: shard S across chips, pmean the sample means)."""
    if sample_axis is None:
        return key
    return jax.random.fold_in(key, jax.lax.axis_index(sample_axis))


def _use_pallas(noise_type: str, need_grad: bool = False) -> bool:
    """Fused Pallas estimator kernels run on TPU; CPU (tests) uses the jnp
    scan fallback.  Gradient kernels exist for gaussian/cauchy (the families
    the reference differentiates, smoothrast.py:45-52, smoothagg.py:50-63)."""
    try:
        on_tpu = jax.default_backend() in ("tpu", "axon")
    except Exception:
        return False
    if not on_tpu:
        return False
    if need_grad:
        return noise_type in ("gaussian", "cauchy")
    return noise_type in ("gaussian", "cauchy", "logistic", "gumbel",
                          "uniform")


def _axis_mean(x, sample_axis):
    return x if sample_axis is None else jax.lax.pmean(x, sample_axis)


@partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def perturbed_heaviside(distances, noise_intensity, key, nb_samples=1,
                        noise_type="gaussian", variance_reduction=True,
                        sample_axis=None):
    """Monte-Carlo smoothed Heaviside: E_Z[H(d + sigma * Z)].

    Forward mirrors `randomHeaviside.forward`
    (`/root/reference/randomras/smoothrast.py:15-37`); the custom backward is
    the variance-reduced score-function estimator of
    `/root/reference/randomras/smoothrast.py:39-59`:

        grad_d   = mean_s[(H(d + sZ_s) - H(d)) * score(Z_s)] / s  *  g
        grad_sig = sum(grad_d)

    Note on ``grad_sigma``: the reference computes a dedicated sigma score at
    smoothrast.py:47 but then *overwrites* it with ``sum(grad_maps * grad_l)``
    at smoothrast.py:58 whenever sigma requires grad (always, given
    SmoothRastBase.sigma).  We reproduce the shipped behavior — the annealing
    controller consumes this value — rather than the dead code.

    Without variance reduction (`randomHeaviside_wovr`, smoothrast.py:61-108)
    the H(d) control variate is dropped.

    With ``sample_axis`` set (a mesh axis name inside shard_map), ``nb_samples``
    is the per-device count and the sample mean is ``pmean``'d across the axis
    — mathematically exact since the estimator is a sample mean.

    On TPU the sample loop runs as a fused Pallas kernel with on-core PRNG
    (ops/perturbed_pallas.py); elsewhere as a lax.scan.
    """
    key = _device_key(key, sample_axis)

    if _use_pallas(noise_type):
        from pertrenderer_tpu.ops.perturbed_pallas import heaviside_mean_pallas

        out = heaviside_mean_pallas(distances, noise_intensity, key,
                                    nb_samples, noise_type)
        return _axis_mean(out, sample_axis)

    def body(acc, s):
        z = _sample_noise(jax.random.fold_in(key, s), distances.shape, noise_type)
        return acc + heaviside(distances + noise_intensity * z), None

    acc, _ = jax.lax.scan(body, jnp.zeros_like(distances),
                          jnp.arange(nb_samples))
    return _axis_mean(acc / nb_samples, sample_axis)


def _ph_fwd(distances, noise_intensity, key, nb_samples, noise_type,
            variance_reduction, sample_axis):
    out = perturbed_heaviside(distances, noise_intensity, key, nb_samples,
                              noise_type, variance_reduction, sample_axis)
    return out, (distances, noise_intensity, key)


def _forward_only_grads(noise_type, x, noise_intensity, what):
    """Zero gradients + a trace-time warning for noise families whose score
    function is not implemented (uniform/gumbel/logistic).  The reference
    prints "noise_type not implemented" and then crashes dereferencing the
    None gradient (`/root/reference/randomras/smoothagg.py:64-73`); we keep
    the warning but degrade gracefully so a jitted program survives."""
    import warnings

    warnings.warn(
        f"{what} backward not implemented for noise type {noise_type!r}; "
        "returning zero gradients (forward-only family)", stacklevel=2)
    return jnp.zeros_like(x), jnp.zeros_like(noise_intensity), None


def _ph_bwd(nb_samples, noise_type, variance_reduction, sample_axis, res, g):
    distances, noise_intensity, key = res
    if noise_type not in ("gaussian", "cauchy"):
        return _forward_only_grads(noise_type, distances, noise_intensity,
                                   "perturbed_heaviside")
    key = _device_key(key, sample_axis)

    if _use_pallas(noise_type, need_grad=True):
        from pertrenderer_tpu.ops.perturbed_pallas import heaviside_coeff_pallas

        coeff = heaviside_coeff_pallas(distances, noise_intensity, key,
                                       nb_samples, noise_type,
                                       variance_reduction)
    else:
        h0 = (heaviside(distances) if variance_reduction
              else jnp.zeros_like(distances))

        def body(acc, s):
            z = _sample_noise(jax.random.fold_in(key, s), distances.shape,
                              noise_type)
            h = heaviside(distances + noise_intensity * z)
            return acc + (h - h0) * _score(z, noise_type), None

        acc, _ = jax.lax.scan(body, jnp.zeros_like(distances),
                              jnp.arange(nb_samples))
        coeff = acc / (nb_samples * noise_intensity)
    coeff = _axis_mean(coeff, sample_axis)
    grad_d = coeff * g
    grad_sigma = jnp.sum(grad_d)
    return grad_d, grad_sigma, None


perturbed_heaviside.defvjp(_ph_fwd, _ph_bwd)


# --------------------------------------------------------------------------
# Perturbed argmax
# --------------------------------------------------------------------------

@partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def perturbed_argmax(z, noise_intensity, key, nb_samples=1,
                     noise_type="gaussian", variance_reduction=True,
                     sample_axis=None):
    """Monte-Carlo smoothed argmax over the last axis:
    E_Z[onehot(argmax(z + gamma * Z))].

    Forward mirrors `randomArgmax.forward`
    (`/root/reference/randomras/smoothagg.py:13-42`); backward is the
    variance-reduced Jacobian estimator of smoothagg.py:44-73:

        grad_z     = mean_s[ <g, w_s - w0> * score(Z_s) ] / gamma
        grad_gamma = mean_s[ sum(g * (w_s - w0) * (phi(Z_s) - 1)) ] / gamma

    with w0 = onehot(argmax(z)) the control variate, phi(Z) = ||Z||^2 for
    gaussian noise (the per-pixel channel norm, smoothagg.py:54) and
    phi(Z) = <score(Z), Z> for cauchy (smoothagg.py:61).  Gumbel and uniform
    noise are forward-only, as in the reference (smoothagg.py:64-67).

    The backward pass recomputes per-sample noise and argmax one-hots from the
    saved key instead of keeping (S, ...) residuals.

    With ``sample_axis`` set, ``nb_samples`` is per-device and sample means
    (forward and backward accumulators) are ``pmean``'d across the mesh axis.

    On TPU the sample loop runs as a fused channel-major Pallas kernel with
    on-core PRNG (ops/perturbed_pallas.py); elsewhere as a lax.scan.
    """
    key = _device_key(key, sample_axis)

    if _use_pallas(noise_type):
        from pertrenderer_tpu.ops.perturbed_pallas import argmax_mean_pallas

        c = z.shape[-1]
        z_cm = jnp.moveaxis(z, -1, 0).reshape(c, -1)
        out = argmax_mean_pallas(z_cm, noise_intensity, key, nb_samples,
                                 noise_type)
        out = jnp.moveaxis(out.reshape((c,) + z.shape[:-1]), 0, -1)
        return _axis_mean(out, sample_axis)

    def body(acc, s):
        noise = _sample_noise(jax.random.fold_in(key, s), z.shape, noise_type)
        w = hard_argmax_onehot(z + noise_intensity * noise)
        return acc + w, None

    acc, _ = jax.lax.scan(body, jnp.zeros_like(z), jnp.arange(nb_samples))
    return _axis_mean(acc / nb_samples, sample_axis)


def _pa_fwd(z, noise_intensity, key, nb_samples, noise_type,
            variance_reduction, sample_axis):
    out = perturbed_argmax(z, noise_intensity, key, nb_samples, noise_type,
                           variance_reduction, sample_axis)
    return out, (z, noise_intensity, key)


def _pa_bwd(nb_samples, noise_type, variance_reduction, sample_axis, res, g):
    z, noise_intensity, key = res
    if noise_type not in ("gaussian", "cauchy"):
        return _forward_only_grads(noise_type, z, noise_intensity,
                                   "perturbed_argmax")
    key = _device_key(key, sample_axis)

    if _use_pallas(noise_type, need_grad=True):
        from pertrenderer_tpu.ops.perturbed_pallas import argmax_grads_pallas

        c = z.shape[-1]
        z_cm = jnp.moveaxis(z, -1, 0).reshape(c, -1)
        g_cm = jnp.moveaxis(g, -1, 0).reshape(c, -1)
        gz_cm, gterm = argmax_grads_pallas(
            z_cm, g_cm, noise_intensity, key, nb_samples, noise_type,
            variance_reduction)
        grad_z = jnp.moveaxis(gz_cm.reshape((c,) + z.shape[:-1]), 0, -1)
        grad_z = _axis_mean(grad_z, sample_axis)
        grad_gamma = _axis_mean(jnp.sum(gterm), sample_axis)
        return grad_z, grad_gamma, None

    w0 = hard_argmax_onehot(z) if variance_reduction else jnp.zeros_like(z)
    # NOTE: the reference's Cauchy branch always subtracts the control variate
    # even in the _wovr variant (smoothagg.py:125-128); we follow the flag.

    def body(carry, s):
        acc_z, acc_g = carry
        noise = _sample_noise(jax.random.fold_in(key, s), z.shape, noise_type)
        w = hard_argmax_onehot(z + noise_intensity * noise)
        diff = w - w0
        score = _score(noise, noise_type)
        dot = jnp.sum(g * diff, axis=-1, keepdims=True)
        acc_z = acc_z + dot * score
        if noise_type == "gaussian":
            phi = jnp.sum(noise * noise, axis=-1, keepdims=True)
        else:
            phi = jnp.sum(score * noise, axis=-1, keepdims=True)
        acc_g = acc_g + jnp.sum(g * diff * (phi - 1.0))
        return (acc_z, acc_g), None

    (acc_z, acc_g), _ = jax.lax.scan(
        body, (jnp.zeros_like(z), jnp.asarray(0.0, z.dtype)),
        jnp.arange(nb_samples))
    grad_z = _axis_mean(acc_z / (nb_samples * noise_intensity), sample_axis)
    grad_gamma = _axis_mean(acc_g / (nb_samples * noise_intensity),
                            sample_axis)
    return grad_z, grad_gamma, None


perturbed_argmax.defvjp(_pa_fwd, _pa_bwd)


# --------------------------------------------------------------------------
# Numerically-corrected primitives
# --------------------------------------------------------------------------

@jax.custom_vjp
def log_corrected(x):
    """log(x) whose backward maps the 1/x = inf case (x = 0) to 0 instead of
    propagating inf * 0 = nan — `/root/reference/randomras/smoothagg.py:292-311`.
    Load-bearing: zero-coverage fragments have prob_map = 0 and log = -inf."""
    return jnp.log(x)


def _logc_fwd(x):
    return jnp.log(x), x


def _logc_bwd(x, g):
    inv = 1.0 / x
    inv = jnp.where(jnp.isinf(inv), 0.0, inv)
    return (inv * g,)


log_corrected.defvjp(_logc_fwd, _logc_bwd)


@jax.custom_vjp
def prod_corrected(x, y):
    """x * y (x scalar-like, y tensor) whose backward zeroes inf/nan terms —
    `/root/reference/randomras/smoothagg.py:314-337`.  Makes gamma/alpha
    differentiable through gamma/alpha * log(prob) when prob = 0."""
    return x * y


def _prodc_fwd(x, y):
    return x * y, (x, y)


def _prodc_bwd(res, g):
    x, y = res
    y_safe = jnp.where(jnp.isinf(y), 0.0, y)
    gx_terms = y_safe * g
    grad_x = jnp.nansum(gx_terms)
    grad_x = jnp.reshape(grad_x, jnp.shape(x)) if jnp.ndim(x) else grad_x
    gy = x * g
    grad_y = jnp.where(jnp.isnan(gy), 0.0, gy)
    return grad_x, grad_y


prod_corrected.defvjp(_prodc_fwd, _prodc_bwd)
