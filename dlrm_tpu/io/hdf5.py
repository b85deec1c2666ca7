"""PyTorch-exported HDF5 model / fixture I/O.

The reference loads PyTorch-exported models and test inputs from HDF5
(/root/reference/src/data/criteo.jl:436-560) for its cross-framework parity
harness.  Layout of the fixtures (ref/pytorch_reference_{single,multi}.hdf5):

* ``emb_{i}``: (rows, D) embedding tables, natural-sorted order.
* ``bot_l.{j}.weight/bias`` / ``top_l.{j}.weight/bias``: MLP layers with
  PyTorch (out, in) weight layout — transposed here to our (in, out).
* ``input_bot`` (B, 13), ``input_emb_{i}`` ((B,) one-hot or (B*H,) multi-hot,
  0-based), ``labels`` (B, 1).
* per-stage intermediates (``mlp_bottom``, ``output_interaction``,
  ``mlp_top``, ``loss``) and post-one-SGD-step weights (``update_*``).

Multi-hot index vectors are grouped per-sample: sample ``b`` owns
``ids[b*H:(b+1)*H]`` (the reference's column-major ``reshape(vec, :, B)``,
criteo.jl:551-557; verified bit-exact against ``concatenated_result``).
Indices stay 0-based here (the +1 shift at criteo.jl:544-546 is a Julia-ism).
"""

from __future__ import annotations

import re
from typing import Dict, Tuple

import numpy as np

from dlrm_tpu.config import DLRMConfig

try:
    import h5py
except ImportError:  # pragma: no cover
    h5py = None


def _natural_key(s: str):
    return [int(t) if t.isdigit() else t for t in re.split(r"(\d+)", s)]


def _mlp_from_file(f, prefix: str):
    names = sorted((k for k in f.keys() if k.startswith(prefix)),
                   key=_natural_key)
    prefixes = []
    for n in names:
        p = n.rsplit(".", 1)[0]
        if p not in prefixes:
            prefixes.append(p)
    layers = []
    for p in prefixes:
        w = np.asarray(f[f"{p}.weight"]).T.copy()  # (out,in) -> (in,out)
        b = np.asarray(f[f"{p}.bias"])
        layers.append({"w": w, "b": b})
    return layers


def load_params(path: str) -> Tuple[dict, DLRMConfig]:
    """Load a PyTorch-exported model into our parameter pytree + config."""
    assert h5py is not None, "h5py required for HDF5 model loading"
    with h5py.File(path, "r") as f:
        emb_names = sorted((k for k in f.keys() if k.startswith("emb")),
                           key=_natural_key)
        tables = [np.asarray(f[n]) for n in emb_names]
        bottom = _mlp_from_file(f, "bot_")
        top = _mlp_from_file(f, "top_")
        h = int(f.attrs.get("n_hot", 1))  # save_params stamps this
        if "input_emb_0" in f and "labels" in f:
            # fixtures carry no attr; infer from the input shapes
            b = np.asarray(f["labels"]).shape[0]
            h = np.asarray(f["input_emb_0"]).shape[0] // b

    feature_size = tables[0].shape[1]
    num_tables = len(tables)
    # infer interaction padding from the top MLP's input width: the
    # config computes top_input = fs + F(F-1)/2 rounded up to
    # interaction_pad_to, so a file exported from a --pad-to run carries
    # a wider first top layer than the raw width (round-trip would
    # otherwise silently rebuild a mismatched topology)
    raw_top_in = feature_size + (num_tables + 1) * num_tables // 2
    file_top_in = top[0]["w"].shape[0]
    if file_top_in < raw_top_in:
        raise ValueError(
            f"top MLP input width {file_top_in} is smaller than the "
            f"interaction output {raw_top_in} implied by {num_tables} "
            "tables — not a DLRM export this loader understands")
    config = DLRMConfig(
        bottom_mlp_sizes=tuple(l["w"].shape[0] for l in bottom)
        + (bottom[-1]["w"].shape[1],),
        top_mlp_sizes=tuple(l["w"].shape[1] for l in top),
        feature_size=feature_size,
        table_sizes=tuple(t.shape[0] for t in tables),
        n_hot=h,
        # round_up(raw, W) == W for any W >= raw, so the padded width
        # itself serves as the multiple (the model only depends on the
        # resulting width, not on which multiple produced it)
        interaction_pad_to=(file_top_in if file_top_in > raw_top_in
                            else 1),
    )
    from dlrm_tpu.ops import embedding as emb_ops

    stacked = np.concatenate(tables, axis=0)
    del tables  # drop the per-table copies before packing (peak memory)
    params = {
        "bottom": bottom,
        "emb": emb_ops.pack_tables(stacked, config),
        "top": top,
    }
    return params, config


def load_inputs(path: str) -> Dict[str, np.ndarray]:
    """Load fixture inputs: labels (B,), dense (B, 13), sparse ids
    (B, T) one-hot or (B, T, H) multi-hot, all 0-based."""
    assert h5py is not None
    with h5py.File(path, "r") as f:
        labels = np.asarray(f["labels"]).reshape(-1).astype(np.float32)
        dense = np.asarray(f["input_bot"]).astype(np.float32)
        names = sorted((k for k in f.keys() if k.startswith("input_emb")),
                       key=_natural_key)
        b = labels.shape[0]
        cols = []
        multihot = False
        for n in names:
            v = np.asarray(f[n]).astype(np.int32)
            if v.shape[0] > b:
                cols.append(v.reshape(b, -1))  # per-sample grouping
                multihot = True
            else:
                cols.append(v.reshape(b, 1))
        sparse = np.stack(cols, axis=1)  # (B, T, H)
        if not multihot:
            sparse = sparse[:, :, 0]
    return {"labels": labels, "dense": dense, "sparse": sparse}


def load_reference_outputs(path: str) -> Dict[str, np.ndarray]:
    """Per-stage intermediates + post-step weights for parity checks."""
    assert h5py is not None
    out = {}
    with h5py.File(path, "r") as f:
        for k in ("mlp_bottom", "output_interaction", "mlp_top", "loss",
                  "zflat", "concatenated_result"):
            if k in f:
                out[k] = np.asarray(f[k])
        for k in f.keys():
            if k.startswith("update_"):
                out[k] = np.asarray(f[k])
    return out


def save_params(path: str, params: dict, config: DLRMConfig) -> None:
    """Write a model in the same PyTorch-style layout (round-trips with
    load_params; gives the framework an HDF5 export the reference lacks)."""
    from dlrm_tpu.ops import embedding as emb_ops

    assert h5py is not None
    with h5py.File(path, "w") as f:
        # the weight datasets alone cannot encode multi-hot lookup
        # semantics; without this attr a reload would default to n_hot=1
        f.attrs["n_hot"] = config.n_hot
        for i in range(config.num_tables):
            # f32 on disk: HDF5/PyTorch interop has no bfloat16
            f[f"emb_{i}"] = np.asarray(
                emb_ops.get_logical_table(params["emb"], config, i)
            ).astype(np.float32)
        for prefix, layers in (("bot_l", params["bottom"]),
                               ("top_l", params["top"])):
            for j, layer in enumerate(layers):
                f[f"{prefix}.{j}.weight"] = np.asarray(
                    layer["w"]).astype(np.float32).T
                f[f"{prefix}.{j}.bias"] = np.asarray(
                    layer["b"]).astype(np.float32)
