"""Piecewise rational-quadratic spline flows (Durkan et al., Neural Spline
Flows) — full-lattice, jit-safe.

Behavioral reference: /root/reference/StochasticDurationPredictor.py:328-515.
The reference uses boolean mask indexing (`outputs[inside_interval_mask] = ...`)
which has data-dependent shapes; here everything is computed on the full
lattice and combined with ``jnp.where`` — the XLA-native formulation.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

DEFAULT_MIN_BIN_WIDTH = 1e-3
DEFAULT_MIN_BIN_HEIGHT = 1e-3
DEFAULT_MIN_DERIVATIVE = 1e-3


def _searchsorted(bin_locations: jax.Array, inputs: jax.Array, eps: float = 1e-6):
    """Index of the bin containing each input (reference :364-369)."""
    bin_locations = bin_locations.at[..., -1].add(eps)
    idx = jnp.sum(inputs[..., None] >= bin_locations, axis=-1) - 1
    return jnp.clip(idx, 0, bin_locations.shape[-1] - 2)


def rational_quadratic_spline(
    inputs: jax.Array,
    unnormalized_widths: jax.Array,
    unnormalized_heights: jax.Array,
    unnormalized_derivatives: jax.Array,
    inverse: bool = False,
    left: float = 0.0,
    right: float = 1.0,
    bottom: float = 0.0,
    top: float = 1.0,
    min_bin_width: float = DEFAULT_MIN_BIN_WIDTH,
    min_bin_height: float = DEFAULT_MIN_BIN_HEIGHT,
    min_derivative: float = DEFAULT_MIN_DERIVATIVE,
):
    """Monotonic RQ spline on [left,right]->[bottom,top] (reference :416-515).

    inputs: [...]; unnormalized_{widths,heights}: [..., K];
    unnormalized_derivatives: [..., K+1]. Inputs are assumed inside the
    domain (callers clamp); returns (outputs, logabsdet).
    """
    num_bins = unnormalized_widths.shape[-1]

    widths = jax.nn.softmax(unnormalized_widths, axis=-1)
    widths = min_bin_width + (1 - min_bin_width * num_bins) * widths
    cumwidths = jnp.cumsum(widths, axis=-1)
    cumwidths = jnp.pad(cumwidths, [(0, 0)] * (cumwidths.ndim - 1) + [(1, 0)])
    cumwidths = (right - left) * cumwidths + left
    cumwidths = cumwidths.at[..., 0].set(left)
    cumwidths = cumwidths.at[..., -1].set(right)
    widths = cumwidths[..., 1:] - cumwidths[..., :-1]

    derivatives = min_derivative + jax.nn.softplus(unnormalized_derivatives)

    heights = jax.nn.softmax(unnormalized_heights, axis=-1)
    heights = min_bin_height + (1 - min_bin_height * num_bins) * heights
    cumheights = jnp.cumsum(heights, axis=-1)
    cumheights = jnp.pad(cumheights, [(0, 0)] * (cumheights.ndim - 1) + [(1, 0)])
    cumheights = (top - bottom) * cumheights + bottom
    cumheights = cumheights.at[..., 0].set(bottom)
    cumheights = cumheights.at[..., -1].set(top)
    heights = cumheights[..., 1:] - cumheights[..., :-1]

    if inverse:
        bin_idx = _searchsorted(cumheights, inputs)[..., None]
    else:
        bin_idx = _searchsorted(cumwidths, inputs)[..., None]

    def take(a, idx):
        return jnp.take_along_axis(a, idx, axis=-1)[..., 0]

    input_cumwidths = take(cumwidths, bin_idx)
    input_bin_widths = take(widths, bin_idx)
    input_cumheights = take(cumheights, bin_idx)
    delta = heights / widths
    input_delta = take(delta, bin_idx)
    input_derivatives = take(derivatives, bin_idx)
    input_derivatives_p1 = take(derivatives[..., 1:], bin_idx)
    input_heights = take(heights, bin_idx)

    if inverse:
        a = (inputs - input_cumheights) * (
            input_derivatives + input_derivatives_p1 - 2 * input_delta
        ) + input_heights * (input_delta - input_derivatives)
        b = input_heights * input_derivatives - (inputs - input_cumheights) * (
            input_derivatives + input_derivatives_p1 - 2 * input_delta
        )
        c = -input_delta * (inputs - input_cumheights)
        discriminant = b**2 - 4 * a * c
        root = (2 * c) / (-b - jnp.sqrt(jnp.maximum(discriminant, 0.0)))
        outputs = root * input_bin_widths + input_cumwidths
        theta_one_minus_theta = root * (1 - root)
        denominator = input_delta + (
            (input_derivatives + input_derivatives_p1 - 2 * input_delta)
            * theta_one_minus_theta
        )
        derivative_numerator = input_delta**2 * (
            input_derivatives_p1 * root**2
            + 2 * input_delta * theta_one_minus_theta
            + input_derivatives * (1 - root) ** 2
        )
        logabsdet = jnp.log(derivative_numerator) - 2 * jnp.log(denominator)
        return outputs, -logabsdet
    else:
        theta = (inputs - input_cumwidths) / input_bin_widths
        theta_one_minus_theta = theta * (1 - theta)
        numerator = input_heights * (
            input_delta * theta**2 + input_derivatives * theta_one_minus_theta
        )
        denominator = input_delta + (
            (input_derivatives + input_derivatives_p1 - 2 * input_delta)
            * theta_one_minus_theta
        )
        outputs = input_cumheights + numerator / denominator
        derivative_numerator = input_delta**2 * (
            input_derivatives_p1 * theta**2
            + 2 * input_delta * theta_one_minus_theta
            + input_derivatives * (1 - theta) ** 2
        )
        logabsdet = jnp.log(derivative_numerator) - 2 * jnp.log(denominator)
        return outputs, logabsdet


def unconstrained_rational_quadratic_spline(
    inputs: jax.Array,
    unnormalized_widths: jax.Array,
    unnormalized_heights: jax.Array,
    unnormalized_derivatives: jax.Array,
    inverse: bool = False,
    tail_bound: float = 1.0,
    min_bin_width: float = DEFAULT_MIN_BIN_WIDTH,
    min_bin_height: float = DEFAULT_MIN_BIN_HEIGHT,
    min_derivative: float = DEFAULT_MIN_DERIVATIVE,
):
    """Spline inside [-tail_bound, tail_bound], identity (linear tails)
    outside (reference :372-413). Full-lattice jnp.where combination."""
    inside = (inputs >= -tail_bound) & (inputs <= tail_bound)

    # linear-tail boundary derivative constant (reference :391-394)
    constant = np.log(np.expm1(1 - min_derivative))
    pad_shape = [(0, 0)] * (unnormalized_derivatives.ndim - 1) + [(1, 1)]
    ud = jnp.pad(unnormalized_derivatives, pad_shape, constant_values=constant)

    safe_inputs = jnp.clip(inputs, -tail_bound, tail_bound)
    spl_out, spl_logdet = rational_quadratic_spline(
        safe_inputs,
        unnormalized_widths,
        unnormalized_heights,
        ud,
        inverse=inverse,
        left=-tail_bound,
        right=tail_bound,
        bottom=-tail_bound,
        top=tail_bound,
        min_bin_width=min_bin_width,
        min_bin_height=min_bin_height,
        min_derivative=min_derivative,
    )
    outputs = jnp.where(inside, spl_out, inputs)
    logabsdet = jnp.where(inside, spl_logdet, 0.0)
    return outputs, logabsdet


def piecewise_rational_quadratic_transform(
    inputs,
    unnormalized_widths,
    unnormalized_heights,
    unnormalized_derivatives,
    inverse=False,
    tails=None,
    tail_bound=1.0,
    min_bin_width=DEFAULT_MIN_BIN_WIDTH,
    min_bin_height=DEFAULT_MIN_BIN_HEIGHT,
    min_derivative=DEFAULT_MIN_DERIVATIVE,
):
    """Dispatcher mirroring reference :328-361."""
    if tails is None:
        return rational_quadratic_spline(
            inputs,
            unnormalized_widths,
            unnormalized_heights,
            unnormalized_derivatives,
            inverse=inverse,
            min_bin_width=min_bin_width,
            min_bin_height=min_bin_height,
            min_derivative=min_derivative,
        )
    if tails != "linear":
        raise NotImplementedError(f"{tails} tails are not implemented.")
    return unconstrained_rational_quadratic_spline(
        inputs,
        unnormalized_widths,
        unnormalized_heights,
        unnormalized_derivatives,
        inverse=inverse,
        tail_bound=tail_bound,
        min_bin_width=min_bin_width,
        min_bin_height=min_bin_height,
        min_derivative=min_derivative,
    )
