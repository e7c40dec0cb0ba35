"""MagicLeap SuperPoint / SuperGlue weight conversion.

Maps the released checkpoints (``superpoint_v1.pth``,
``superglue_{indoor,outdoor}.pth``) onto the Flax modules in this package.
Key layouts observed from the MagicLeap model definitions hloc wraps
(reference: util/match_extraction.py:91-98):

SuperPoint:  conv{1a..4b}, convPa/convPb, convDa/convDb — plain Conv2d.
SuperGlue:   kenc.encoder.{0,1,3,4,6,7,9}  (Conv1d/BatchNorm1d stacks),
             gnn.layers.{i}.attn.proj.{0,1,2} (q/k/v Conv1d), .attn.merge,
             gnn.layers.{i}.mlp.{0,1,3},
             final_proj, bin_score.

Conv2d (out, in, kh, kw) -> flax (kh, kw, in, out); Conv1d (out, in, 1) ->
Dense kernel (in, out); BatchNorm running stats land in the inference-mode
ConvBNBlock parameters.
"""

from __future__ import annotations

from typing import Dict

import numpy as np


def _conv2d(sd, key):
    return {
        "kernel": np.ascontiguousarray(sd[f"{key}.weight"].transpose(2, 3, 1, 0)),
        "bias": sd[f"{key}.bias"],
    }


def _conv1d_dense(sd, key):
    w = sd[f"{key}.weight"]  # (out, in, 1)
    return {
        "kernel": np.ascontiguousarray(w[:, :, 0].T),
        "bias": sd[f"{key}.bias"],
    }


def _bn(sd, key):
    return {
        "bn_scale": sd[f"{key}.weight"],
        "bn_bias": sd[f"{key}.bias"],
        "bn_mean": sd[f"{key}.running_mean"],
        "bn_var": sd[f"{key}.running_var"],
    }


def convert_superpoint(sd: Dict[str, np.ndarray]) -> Dict:
    """SuperPoint state dict -> {'params': ...} for SuperPointNet."""
    names = [
        "conv1a", "conv1b", "conv2a", "conv2b", "conv3a", "conv3b",
        "conv4a", "conv4b", "convPa", "convPb", "convDa", "convDb",
    ]
    return {"params": {n: _conv2d(sd, n) for n in names}}


def _point_mlp(sd, prefix, seq_indices):
    """Convert a MagicLeap MLP Sequential (conv at i, bn at i+1 except last)
    into PointMLP params.  seq_indices: the Conv1d positions."""
    out = {}
    for li, idx in enumerate(seq_indices):
        conv = _conv1d_dense(sd, f"{prefix}.{idx}")
        last = li == len(seq_indices) - 1
        if last:
            out[f"layers_{li}"] = conv
        else:
            entry = {"conv": conv}
            entry.update(_bn(sd, f"{prefix}.{idx + 1}"))
            out[f"layers_{li}"] = entry
    return out


def _head_perm(d_model: int = 256, num_heads: int = 4) -> np.ndarray:
    """Channel permutation interleaved -> contiguous head layout.

    MagicLeap's attention views the (B, C, N) conv output as (B, Dh, H, N),
    so head h owns channels {d*H + h}.  A (..., Dh, 4) split is hostile to
    TPU layouts (minor dim 4 pads to the 128-lane tile, a 32x memory blowup
    on every q/k/v tensor), so the runtime module uses the standard
    contiguous split {h*Dh + d} and this permutation is folded into the
    q/k/v output channels and the merge input channels at conversion time —
    end-to-end outputs are identical to the released checkpoints.
    """
    dh = d_model // num_heads
    c = np.arange(d_model)
    return (c % dh) * num_heads + (c // dh)


def convert_superglue(sd: Dict[str, np.ndarray], gnn_layers: int = 9) -> Dict:
    """SuperGlue state dict -> params for superglue.match_pair."""
    net = {
        # MLP([3, 32, 64, 128, 256, 256]): convs at Sequential 0,3,6,9,12
        "kenc": _point_mlp(sd, "kenc.encoder", [0, 3, 6, 9, 12]),
        "final_proj": _conv1d_dense(sd, "final_proj"),
    }
    perm = _head_perm()

    def proj(key):
        p = _conv1d_dense(sd, key)
        return {"kernel": p["kernel"][:, perm], "bias": p["bias"][perm]}

    for i in range(2 * gnn_layers):
        l = f"gnn.layers.{i}"
        merge = _conv1d_dense(sd, f"{l}.attn.merge")
        net[f"gnn_{i}"] = {
            "attn": {
                "proj_q": proj(f"{l}.attn.proj.0"),
                "proj_k": proj(f"{l}.attn.proj.1"),
                "proj_v": proj(f"{l}.attn.proj.2"),
                "merge": {
                    "kernel": merge["kernel"][perm, :],
                    "bias": merge["bias"],
                },
            },
            "mlp": _point_mlp(sd, f"{l}.mlp", [0, 3]),
        }
    return {
        "net": {"params": net},
        "bin_score": np.asarray(sd["bin_score"], np.float32).reshape(()),
    }
