"""Torch checkpoint -> JAX parameter conversion.

Converts the reference's released checkpoints (Co3D @224, Re10K @336 —
reference README.md:30, loaded via ``torch.load`` + strict
``load_state_dict`` at demo.py:56-57) into this framework's parameter
pytrees.  The key layout being mapped (observed from the reference modules):

    image_feature_extractor._net.*        DINO ViT (cls_token, pos_embed,
                                          patch_embed.proj, blocks.N.{norm1,
                                          attn.qkv, attn.proj, norm2,
                                          mlp.fc1, mlp.fc2}, norm)
    diffuser.model.*                      denoiser (the reference wires the
                                          denoiser in as diffuser.model,
                                          pose_diffusion_model.py:61):
        time_embed.linear.{0,2}           sinusoidal MLP
        _first                            702 -> 512 input projection
        _trunk.layers.N.{self_attn.in_proj_weight/bias, self_attn.out_proj,
                         linear1, linear2, norm1, norm2}
        _last.{0,1,3}                     MLP head (Linear, LayerNorm, Linear)
    diffuser.{betas, ...}                 schedule buffers (recomputed, not
                                          loaded — validated in tests)

Layout rules: torch Linear weight (out, in) -> flax kernel (in, out);
torch Conv2d (out, in, kh, kw) -> flax (kh, kw, in, out); LayerNorm
weight/bias -> scale/bias.  Packed QKV stays packed (models/layers.py keeps
torch's fused projection exactly to make this a transpose).

Input is a flat ``{key: np.ndarray}`` dict — call
``load_torch_checkpoint(path)`` to produce it from a .pth file.
"""

from __future__ import annotations

from typing import Dict

import numpy as np


def load_torch_checkpoint(path: str) -> Dict[str, np.ndarray]:
    """Load a torch .pth state dict into numpy arrays (CPU, no grad)."""
    import torch

    state = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(state, dict) and "state_dict" in state:
        state = state["state_dict"]
    out = {}
    for k, v in state.items():
        if k.startswith("module."):
            k = k[len("module."):]
        out[k] = v.detach().cpu().numpy()
    return out


def _dense(sd, prefix):
    entry = {"kernel": np.ascontiguousarray(sd[f"{prefix}.weight"].T)}
    if f"{prefix}.bias" in sd:
        entry["bias"] = sd[f"{prefix}.bias"]
    return entry


def _layernorm(sd, prefix):
    return {"scale": sd[f"{prefix}.weight"], "bias": sd[f"{prefix}.bias"]}


def convert_dino_vit(sd: Dict[str, np.ndarray], prefix: str = "") -> Dict:
    """DINO ViT state dict -> VisionTransformer params (no 'params' wrapper)."""
    p = prefix
    params = {
        "cls_token": sd[f"{p}cls_token"],
        "pos_embed": sd[f"{p}pos_embed"],
        "patch_embed": {
            # (out, in, kh, kw) -> (kh, kw, in, out)
            "kernel": np.ascontiguousarray(
                sd[f"{p}patch_embed.proj.weight"].transpose(2, 3, 1, 0)
            ),
            "bias": sd[f"{p}patch_embed.proj.bias"],
        },
        "norm": _layernorm(sd, f"{p}norm"),
    }
    n_blocks = 0
    while f"{p}blocks.{n_blocks}.norm1.weight" in sd:
        n_blocks += 1
    for i in range(n_blocks):
        b = f"{p}blocks.{i}"
        entry = {
            "norm1": _layernorm(sd, f"{b}.norm1"),
            "attn": {
                "qkv": _dense(sd, f"{b}.attn.qkv"),
                "proj": _dense(sd, f"{b}.attn.proj"),
            },
            "norm2": _layernorm(sd, f"{b}.norm2"),
            "mlp": {
                "fc1": _dense(sd, f"{b}.mlp.fc1"),
                "fc2": _dense(sd, f"{b}.mlp.fc2"),
            },
        }
        # DINOv2 LayerScale
        if f"{b}.ls1.gamma" in sd:
            entry["ls1_gamma"] = sd[f"{b}.ls1.gamma"]
            entry["ls2_gamma"] = sd[f"{b}.ls2.gamma"]
        params[f"blocks_{i}"] = entry
    return params


def convert_denoiser(sd: Dict[str, np.ndarray], prefix: str = "diffuser.model.") -> Dict:
    """Reference denoiser state dict -> Denoiser params (no 'params' wrapper)."""
    p = prefix
    params = {
        "time_embed": {
            "linear_0": _dense(sd, f"{p}time_embed.linear.0"),
            "linear_2": _dense(sd, f"{p}time_embed.linear.2"),
        },
        "first": _dense(sd, f"{p}_first"),
        "last": {
            "dense_0": _dense(sd, f"{p}_last.0"),
            "norm_0": _layernorm(sd, f"{p}_last.1"),
            "dense_1": _dense(sd, f"{p}_last.3"),
        },
    }
    trunk = {}
    n_layers = 0
    while f"{p}_trunk.layers.{n_layers}.norm1.weight" in sd:
        n_layers += 1
    for i in range(n_layers):
        l = f"{p}_trunk.layers.{i}"
        trunk[f"layers_{i}"] = {
            "self_attn": {
                "in_proj": {
                    "kernel": np.ascontiguousarray(sd[f"{l}.self_attn.in_proj_weight"].T),
                    "bias": sd[f"{l}.self_attn.in_proj_bias"],
                },
                "out_proj": _dense(sd, f"{l}.self_attn.out_proj"),
            },
            "norm1": _layernorm(sd, f"{l}.norm1"),
            "norm2": _layernorm(sd, f"{l}.norm2"),
            "linear1": _dense(sd, f"{l}.linear1"),
            "linear2": _dense(sd, f"{l}.linear2"),
        }
    params["trunk"] = trunk
    return params


def convert_pose_diffusion_checkpoint(sd: Dict[str, np.ndarray]) -> Dict:
    """Full reference checkpoint -> PoseDiffusionModel params pytree.

    Detects the backbone family from the key layout (ViT: cls_token present;
    ResNet: conv1/bn1 stacks)."""
    p = "image_feature_extractor._net."
    if f"{p}cls_token" in sd:
        net = convert_dino_vit(sd, prefix=p)
    elif f"{p}conv1.weight" in sd:
        from posediffusion_tpu.models.resnet import convert_resnet

        net = convert_resnet({k[len(p):]: v for k, v in sd.items() if k.startswith(p)})
    else:
        raise ValueError("unrecognized feature-extractor checkpoint layout")
    denoiser = convert_denoiser(sd, prefix="diffuser.model.")
    return {
        "extractor": {"params": {"net": net}},
        "denoiser": {"params": denoiser},
    }


def extract_schedule_buffers(sd: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Pull the diffuser's registered schedule buffers for golden testing."""
    names = [
        "betas", "alphas_cumprod", "alphas_cumprod_prev", "sqrt_alphas_cumprod",
        "sqrt_one_minus_alphas_cumprod", "log_one_minus_alphas_cumprod",
        "sqrt_recip_alphas_cumprod", "sqrt_recipm1_alphas_cumprod",
        "posterior_variance", "posterior_log_variance_clipped",
        "posterior_mean_coef1", "posterior_mean_coef2", "p2_loss_weight",
    ]
    return {n: sd[f"diffuser.{n}"] for n in names if f"diffuser.{n}" in sd}
