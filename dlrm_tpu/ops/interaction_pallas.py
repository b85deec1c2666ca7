"""Fused Pallas dot-interaction kernel (forward + custom VJP).

TPU-native replacement for the reference's hand-fused per-sample
GEMM + triangular-slice kernel (DotInteraction,
/root/reference/src/model/interact.jl:318-489).  The reference fuses to keep
each sample's Gram matrix in L1/L2 cache; the TPU analog keeps the batch
tile's features in VMEM and never materializes the (B, F, F) Gram matrices
or any (B, P, D) pair tensor in HBM:

  per batch tile (TB samples):
    t      (TB, F, D)   <- one VMEM load
    z      (TB, F, F)   = batched Gram via MXU dot_general (stays in VMEM)
    zflat  (TB, P)      = concat of the F-1 contiguous lane slices
                          z[:, i, :i] (no gathers; Mosaic rejects the
                          (TB,F,F)->(TB,F*F) reshape a selection-matmul
                          would need)
    out    (TB, D+P+pad) = [t[:,0,:] | zflat | zeros]

The backward pass is the mirror image (also a single fused kernel): the
incoming cotangent is split, the pair part is scattered back through Sᵀ,
symmetrized (the dZ + dZᵀ trick the reference fuses in
``triangular_slice_back_fuse_add_transpose_kernel!``, interact.jl:154-173),
and one batched MXU matmul produces dT; the dense cotangent's direct slice
is added to dT[:, 0, :] (the ``sumavx`` accumulation, interact.jl:424-435).

HBM traffic is the theoretical minimum: read F*D, write D+P per sample
forward; read (D+P) + F*D, write F*D backward.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dlrm_tpu.ops.interaction import tril_flat_indices


def _round_up(x: int, m: int) -> int:
    return m * ((x + m - 1) // m)


def _fwd_kernel(t_ref, out_ref, *, f: int, d: int, p: int, width: int):
    # Mosaic note: (TB, F, F) -> (TB, F*F) reshapes are unsupported
    # ("infer-vector-layout: unsupported shape cast"), so the triangular
    # slice is F-1 contiguous lane slices z[:, i, :i] concatenated — the
    # direct analog of the reference's per-row triangular_slice_kernel!
    # (interact.jl:64-75), operating on whole batch tiles per row.
    t = t_ref[:]  # (TB, F, D)
    z = jax.lax.dot_general(
        t, t, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)          # (TB, F, F)
    if width > d + p:
        out_ref[:, d + p:] = jnp.zeros(
            (t.shape[0], width - d - p), out_ref.dtype)
    out_ref[:, :d] = t[:, 0, :].astype(out_ref.dtype)
    off = d
    for i in range(1, f):  # static unroll: F-1 strided row stores
        out_ref[:, off:off + i] = z[:, i, :i].astype(out_ref.dtype)
        off += i


def _bwd_kernel(g_ref, t_ref, dt_ref, dz_scratch, *, f: int, d: int,
                p: int):
    g = g_ref[:].astype(jnp.float32)   # (TB, width)
    t = t_ref[:]                       # (TB, F, D)
    tb = t.shape[0]
    # Rebuild the strictly-lower-triangular dZ row by row from contiguous
    # slices of g, then symmetrize (the fused add-transpose trick,
    # interact.jl:154-173).  Rows are written into a VMEM scratch ref —
    # building it from (TB,1,F) vector pieces would pad each piece to full
    # (8,128) tiles and blow the VMEM budget.
    dz_scratch[:] = jnp.zeros((tb, f, f), jnp.float32)
    off = d
    for i in range(1, f):  # static unroll
        dz_scratch[:, i, :i] = g[:, off:off + i]
        off += i
    dz = dz_scratch[:]                               # (TB, F, F) lower
    dz_sym = dz + jnp.swapaxes(dz, 1, 2)
    # dT[b] = dZ_sym[b] @ T[b]  (batched MXU matmul)
    dt = jax.lax.dot_general(
        dz_sym, t.astype(jnp.float32),
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)          # (TB, F, D)
    # dt[:, 0, :] += g[:, :d] — two stores (Mosaic has no scatter-add).
    dt_ref[:] = dt.astype(dt_ref.dtype)
    dt_ref[:, 0, :] = (dt[:, 0, :] + g[:, :d]).astype(dt_ref.dtype)


def _pick_tile(b: int, cap: int = 256) -> int:
    # Callers pad b to a multiple of 8 first, so this always terminates
    # with a bounded tile; a whole-batch fallback would be a VMEM OOM
    # grenade for a large batch with no small divisor.
    for tb in (256, 128, 64, 32, 16, 8):
        if tb <= cap and b % tb == 0:
            return tb
    raise ValueError(f"batch {b} must be a multiple of 8 (pad first)")


def _pad_batch(x: jax.Array, b: int, bp: int) -> jax.Array:
    if bp == b:
        return x
    return jnp.pad(x, ((0, bp - b),) + ((0, 0),) * (x.ndim - 1))


def _fwd_call(t: jax.Array, pad_to: int, interpret: bool) -> jax.Array:
    b, f, d = t.shape
    p = (f * f - f) // 2
    width = _round_up(d + p, pad_to)
    # Pad ragged batches to a multiple of 8 (zero rows produce zero
    # outputs and are sliced away) so the tile never exceeds the cap.
    bp = _round_up(b, 8)
    t = _pad_batch(t, b, bp)
    tb = _pick_tile(bp)
    kern = functools.partial(_fwd_kernel, f=f, d=d, p=p, width=width)
    out = pl.pallas_call(
        kern,
        grid=(bp // tb,),
        in_specs=[
            pl.BlockSpec((tb, f, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tb, width), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bp, width), t.dtype),
        interpret=interpret,
    )(t)
    return out[:b] if bp != b else out


def _bwd_call(g: jax.Array, t: jax.Array, interpret: bool) -> jax.Array:
    b, f, d = t.shape
    p = (f * f - f) // 2
    width = g.shape[1]
    bp = _round_up(b, 8)
    g = _pad_batch(g, b, bp)
    t = _pad_batch(t, b, bp)
    # Smaller tile than forward: the batched (F,F)@(F,D) matmul pads F to
    # full 128-lane tiles per batch element, so VMEM grows as TB*128*128.
    tb = _pick_tile(bp, cap=64)
    kern = functools.partial(_bwd_kernel, f=f, d=d, p=p)
    dt = pl.pallas_call(
        kern,
        grid=(bp // tb,),
        in_specs=[
            pl.BlockSpec((tb, width), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, f, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tb, f, d), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bp, f, d), t.dtype),
        scratch_shapes=[pltpu.VMEM((tb, f, f), jnp.float32)],
        interpret=interpret,
    )(g, t)
    return dt[:b] if bp != b else dt


def _use_interpret() -> bool:
    return jax.default_backend() != "tpu"


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def fused_interaction_t(t: jax.Array, pad_to: int = 1) -> jax.Array:
    """Fused interaction on the stacked feature tensor T (B, F, D):
    returns (B, D + F(F-1)/2 + pad).  Oracle: ops.interaction.dot_interaction
    applied to (T[:,0,:], T[:,1:,:])."""
    return _fwd_call(t, pad_to, _use_interpret())


def _fi_fwd(t, pad_to):
    return _fwd_call(t, pad_to, _use_interpret()), t


def _fi_bwd(pad_to, t, g):
    del pad_to
    return (_bwd_call(g, t, _use_interpret()),)


fused_interaction_t.defvjp(_fi_fwd, _fi_bwd)


def fused_dot_interaction(x: jax.Array, feats: jax.Array,
                          pad_to: int = 1) -> jax.Array:
    """Drop-in Pallas replacement for ops.interaction.dot_interaction."""
    from dlrm_tpu.ops.interaction import stack_features
    t = stack_features(x, feats)
    return fused_interaction_t(t, pad_to)
