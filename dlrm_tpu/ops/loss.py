"""Binary cross-entropy with clamped logs.

Reproduces the reference's loss exactly (/root/reference/src/train/train.jl:33-41):

    L = mean_i[ -y_i * max(log(x_i), -100) + (y_i - 1) * max(log(1 - x_i), -100) ]

and its hand-written pullback (train.jl:45-71), which — unlike the autodiff of
the clamped forward — uses an epsilon-regularized quotient:

    dx_i = g/B * ((1 - y_i) / (1 - x_i + eps) - y_i / (x_i + eps))
    dy_i = g/B * (log(1 - x_i + eps) - log(x_i + eps))

The reference validated this gradient against PyTorch's ``BCELoss`` backward
(src/validation.jl), so we keep the same formula for fixture parity.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


@jax.custom_vjp
def bce_loss(x: jax.Array, y: jax.Array) -> jax.Array:
    """Clamped-log binary cross entropy; ``x`` = predictions, ``y`` = labels."""
    return _bce_forward(x, y)


def _bce_forward(x, y):
    x = x.astype(jnp.float32)
    y = y.astype(jnp.float32)
    neg100 = jnp.float32(-100.0)
    terms = -y * jnp.maximum(jnp.log(x), neg100) + (y - 1.0) * jnp.maximum(
        jnp.log1p(-x), neg100
    )
    return jnp.mean(terms)


def _bce_fwd(x, y):
    return _bce_forward(x, y), (x, y)


def _bce_bwd(res, g):
    x, y = res
    x = x.astype(jnp.float32)
    y = y.astype(jnp.float32)
    scale = g / x.size
    eps = jnp.finfo(jnp.float32).eps
    c = 1.0 - x + eps
    d = x + eps
    dx = scale * ((1.0 - y) / c - y / d)
    dy = scale * (jnp.log(c) - jnp.log(d))
    return dx, dy


bce_loss.defvjp(_bce_fwd, _bce_bwd)
