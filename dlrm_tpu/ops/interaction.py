"""Dot-product feature interaction (pure-jnp implementation).

The DLRM interaction (/root/reference/src/model/interact.jl): stack the
bottom-MLP output with the pooled embedding vectors into T = (B, F, d) where
``F = num_tables*feature_size/bottom_out + 1``, compute the Gram matrix
Z = T Tᵀ (B, F, F), take the strictly-lower-triangular entries (row-major
(i, j) order with i > j — equal to the reference's column-major upper
triangle, interact.jl:26-31/64-75), and concatenate them after the bottom-MLP
output, optionally zero-padding the tail to a width multiple
(``POST_INTERACTION_PAD_TO_MUL``, model.jl:32 / interact.jl:351-355).

This is the oracle implementation (the analog of the reference's
``dot_interaction_reference``, interact.jl:7-31); the fused Pallas kernel in
``interaction_pallas.py`` is tested against it forward and backward.

TPU notes: the Gram matrix is a batched matmul that XLA maps onto the MXU;
the triangular extraction is a static gather over the flattened (F*F) axis,
which XLA lowers to a cheap take since the indices are compile-time constant.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=None)
def tril_flat_indices(f: int) -> np.ndarray:
    """Flattened indices of the strictly-lower triangle of an (f, f) matrix,
    ordered (1,0), (2,0), (2,1), (3,0), ... — the DLRM pair order."""
    li, lj = np.tril_indices(f, k=-1)
    return (li * f + lj).astype(np.int32)


def stack_features(x: jax.Array, feats: jax.Array) -> jax.Array:
    """Build the interaction input T = (B, F, d).

    ``x``: bottom-MLP output (B, d) with d = bottom_out.
    ``feats``: pooled embeddings (B, T, fs).  When fs != d the embedding block
    is re-chunked into d-wide features (the reference's size math,
    model.jl:220-221, guarantees T*fs % d == 0).
    """
    b, d = x.shape
    emb = feats.reshape(b, -1, d)
    return jnp.concatenate([x[:, None, :], emb], axis=1)


def dot_interaction(x: jax.Array, feats: jax.Array, pad_to: int = 1
                    ) -> jax.Array:
    """Interaction output (B, bottom_out + F(F-1)/2 + padding)."""
    t = stack_features(x, feats)
    b, f, _ = t.shape
    z = jnp.einsum(
        "bfd,bgd->bfg", t, t, preferred_element_type=jnp.float32
    ).astype(t.dtype)
    zflat = z.reshape(b, f * f)[:, tril_flat_indices(f)]
    out = jnp.concatenate([x, zflat], axis=1)
    width = out.shape[1]
    padded = pad_to * ((width + pad_to - 1) // pad_to)
    if padded != width:
        out = jnp.pad(out, ((0, 0), (0, padded - width)))
    return out
