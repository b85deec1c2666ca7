"""Hand-transcribed PyTorch golden test — NO fixture files, NO loaders.

Every other PyTorch-parity check in this repo flows through io/hdf5.py, so
a loader bug (a silently wrong transposition, a stray index shift) would be
invisible: both sides of the comparison would read through the same bug.
This test protects the comparison METHODOLOGY itself, the way the
reference's hand-transcribed test does (/root/reference/test/model/model.jl:
80-283): the weights, inputs, and per-stage outputs below are pasted
in-file as literals, straight from the original Facebook PyTorch DLRM run
the reference transcribed them from.

Conventions captured by the literals (model.jl:100-117):
  * PyTorch Linear weights are (out, in); this framework stores (in, out)
    — each weight is transposed ONCE, visibly, below.
  * PyTorch ids are 0-based; so is this framework — the ids are used
    verbatim (the reference adds 1 for Julia's 1-basing; a stray +-1 here
    breaks the embedding-output stage immediately).
  * Stage outputs are (batch, features) row-major exactly as PyTorch
    prints them (the reference transposes for Julia's column-major).

Model: bottom MLP Dense(5->4, relu); 3 embedding tables of 5 rows x 4;
dot interaction (4 + C(4,2)=6 pairs -> 10); top MLP Dense(10->5, relu) +
Dense(5->1, sigmoid).
"""

import numpy as np
import jax
import jax.numpy as jnp

import dlrm_tpu
from dlrm_tpu.config import DLRMConfig
from dlrm_tpu.models import dlrm as model_lib
from dlrm_tpu.ops.interaction import dot_interaction
from dlrm_tpu.ops.mlp import mlp_apply

# -- inputs (4 samples) -------------------------------------------------------

DENSE_INPUT = np.array([
    [0.03685, 0.2673, 0.34, 0.86827, 0.50025],
    [0.33139, 0.61687, 0.08192, 0.09998, 0.17455],
    [0.26606, 0.43873, 0.05581, 0.8632, 0.01412],
    [0.03511, 0.24039, 0.3384, 0.86125, 0.16903],
], np.float32)

# 0-based PyTorch ids, one column per table — used VERBATIM (no shift)
SPARSE_INPUT = np.array([
    [3, 1, 2],
    [1, 1, 3],
    [4, 2, 1],
    [2, 4, 4],
], np.int32)

# -- weights (PyTorch (out, in) layout, transposed at use sites) --------------

BOT_W = np.array([
    [0.74967, 0.56771, 0.12462, 0.25165, 0.24943],
    [-0.48992, 0.27794, -1.07279, -0.14344, 0.05737],
    [0.03564, 1.2152, -0.50384, -0.19891, -0.05389],
    [0.36123, -0.1329, -0.32115, 0.25878, 0.2262],
], np.float32)
BOT_B = np.array([-0.57597, -0.69637, 0.52599, 0.04786], np.float32)

EMB1 = np.array([
    [1.38703e-01, -3.49615e-02, 2.91594e-01, -2.36776e-01],
    [-1.94420e-01, -2.32488e-01, -2.44200e-01, 3.98621e-01],
    [3.92202e-01, 2.09187e-01, 5.49969e-02, -3.05629e-01],
    [-2.44501e-01, 2.17411e-01, -3.56797e-01, 1.62552e-01],
    [3.02468e-01, -2.25959e-01, 7.72339e-06, -2.31782e-01],
], np.float32)

EMB2 = np.array([
    [-0.22749, 0.15044, -0.25153, -0.03229],
    [-0.08135, -0.43825, 0.26487, -0.36162],
    [-0.22964, -0.23195, -0.07373, 0.34383],
    [0.13122, 0.10117, -0.2659, 0.05052],
    [0.09969, -0.02979, 0.42599, -0.23596],
], np.float32)

EMB3 = np.array([
    [0.24587, -0.03799, 0.22436, 0.06881],
    [0.24136, 0.12974, 0.14533, -0.28756],
    [-0.19309, 0.33247, 0.13907, -0.24246],
    [-0.4414, -0.06371, -0.15425, -0.08834],
    [0.25169, 0.34613, 0.21345, 0.44208],
], np.float32)

TOP1_W = np.array([
    [-0.17529, -0.77823, 0.21247, 0.23766, 0.18327,
     -0.45722, -0.03328, 0.22742, -0.19802, -0.28992],
    [-0.11675, -0.58319, 0.627, 0.08652, 0.20797,
     -0.10146, -0.31713, -0.22506, 0.41106, 0.01268],
    [0.02179, -0.41254, 0.28599, -0.76669, -0.02132,
     0.5079, 0.75233, 0.16296, 0.04205, 0.59095],
    [0.01036, 0.06319, -0.32023, 0.45371, 0.05588,
     -0.12152, 0.23366, 0.12804, 0.30971, 0.01763],
    [0.07816, 0.24648, -0.52729, 0.10986, 0.1919,
     0.32612, 0.14791, 0.10404, 0.05035, -0.2003],
], np.float32)
TOP1_B = np.array([-0.20719, -0.54316, 0.73679, 0.28494, 0.4195],
                  np.float32)

TOP2_W = np.array([[0.15213, -0.12579, -0.69831, -0.9994, -0.20551]],
                  np.float32)
TOP2_B = np.array([1.80363], np.float32)

# -- expected per-stage outputs (PyTorch row-major) ---------------------------

BOTTOM_OUT = np.array([
    [0.0, 0.0, 0.48116, 0.2543],
    [0.10157, 0.0, 1.21686, 0.12463],
    [0.10026, 0.0, 0.86805, 0.29431],
    [0.0, 0.0, 0.46845, 0.18102],
], np.float32)

EMB_OUT = [
    np.array([
        [-2.44501e-01, 2.17411e-01, -3.56797e-01, 1.62552e-01],
        [-1.94420e-01, -2.32488e-01, -2.44200e-01, 3.98621e-01],
        [3.02468e-01, -2.25959e-01, 7.72339e-06, -2.31782e-01],
        [3.92202e-01, 2.09187e-01, 5.49969e-02, -3.05629e-01],
    ], np.float32),
    np.array([
        [-0.08135, -0.43825, 0.26487, -0.36162],
        [-0.08135, -0.43825, 0.26487, -0.36162],
        [-0.22964, -0.23195, -0.07373, 0.34383],
        [0.09969, -0.02979, 0.42599, -0.23596],
    ], np.float32),
    np.array([
        [-0.19309, 0.33247, 0.13907, -0.24246],
        [-0.4414, -0.06371, -0.15425, -0.08834],
        [0.24136, 0.12974, 0.14533, -0.28756],
        [0.25169, 0.34613, 0.21345, 0.44208],
    ], np.float32),
]

# columns 0..3 = bottom output, 4..9 = pair dots in strict-lower-triangle
# row-major order: (e1,x) (e2,x) (e2,e1) (e3,x) (e3,e1) (e3,e2)
INTERACTION_OUT = np.array([
    [0.0, 0.0, 0.48116, 0.2543,
     -0.13034, 0.03548, -0.22868, 0.00526, 0.03046, -0.00548],
    [0.10157, 0.0, 1.21686, 0.12463,
     -0.26723, 0.26898, -0.09113, -0.24355, 0.10308, 0.05492],
    [0.10026, 0.0, 0.86805, 0.29431,
     -0.03788, 0.01416, -0.09674, 0.06572, 0.11034, -0.1951],
    [0.0, 0.0, 0.46845, 0.18102,
     -0.02956, 0.15684, 0.12841, 0.18002, 0.04775, 0.00139],
], np.float32)

FINAL_OUT = np.array([0.77095, 0.73668, 0.7734, 0.69538], np.float32)

# literals carry 5-6 significant digits; stage math in f32 adds ulps
TOL = dict(atol=2e-5, rtol=1e-4)


def _config() -> DLRMConfig:
    return DLRMConfig(
        bottom_mlp_sizes=(5, 4),
        top_mlp_sizes=(5, 1),
        feature_size=4,
        table_sizes=(5, 5, 5),
        packed_tables=False,
    )


def _params():
    # (out, in) -> (in, out): the ONE visible transposition per weight
    return {
        "bottom": [{"w": jnp.asarray(BOT_W.T), "b": jnp.asarray(BOT_B)}],
        "emb": jnp.asarray(np.concatenate([EMB1, EMB2, EMB3], axis=0)),
        "top": [
            {"w": jnp.asarray(TOP1_W.T), "b": jnp.asarray(TOP1_B)},
            {"w": jnp.asarray(TOP2_W.T), "b": jnp.asarray(TOP2_B)},
        ],
    }


def test_golden_stage_by_stage():
    """Bottom MLP, per-table lookups, interaction, and top MLP each match
    the pasted PyTorch stage outputs — no file I/O anywhere in the loop."""
    with jax.default_matmul_precision("highest"):
        params = _params()
        x = mlp_apply(params["bottom"], jnp.asarray(DENSE_INPUT),
                      final="relu")
        np.testing.assert_allclose(np.asarray(x), BOTTOM_OUT, **TOL)

        tables = [EMB1, EMB2, EMB3]
        looked = [np.asarray(tables[t][SPARSE_INPUT[:, t]])
                  for t in range(3)]
        for got, want in zip(looked, EMB_OUT):
            np.testing.assert_array_equal(got, want)  # pure gather: exact

        pooled = jnp.stack([jnp.asarray(l) for l in looked], axis=1)
        z = dot_interaction(jnp.asarray(np.asarray(x)), pooled)
        np.testing.assert_allclose(np.asarray(z), INTERACTION_OUT, **TOL)

        out = mlp_apply(params["top"], z, final="sigmoid")
        np.testing.assert_allclose(np.asarray(out)[:, 0], FINAL_OUT, **TOL)


def test_golden_full_forward():
    """The assembled model's forward() reproduces the PyTorch final output
    AND the staged composition above (guards the model wiring itself)."""
    config = _config()
    with jax.default_matmul_precision("highest"):
        params = _params()
        out = model_lib.forward(params, jnp.asarray(DENSE_INPUT),
                                jnp.asarray(SPARSE_INPUT), config)
        np.testing.assert_allclose(np.asarray(out), FINAL_OUT, **TOL)


def test_golden_interaction_impl_agreement():
    """Every interaction implementation reproduces the golden columns —
    the pair ORDER (strict lower triangle, row-major) is part of the
    PyTorch interop contract, not just the values."""
    from dlrm_tpu.ops.interaction import dot_interaction_pairwise

    with jax.default_matmul_precision("highest"):
        x = jnp.asarray(BOTTOM_OUT)
        pooled = jnp.asarray(np.stack(EMB_OUT, axis=1))
        for impl in (dot_interaction, dot_interaction_pairwise):
            z = impl(x, pooled)
            np.testing.assert_allclose(np.asarray(z), INTERACTION_OUT,
                                       err_msg=impl.__name__, **TOL)
