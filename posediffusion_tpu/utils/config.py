"""YAML config system with Hydra-style dotted overrides.

Replaces the reference's Hydra + OmegaConf layer (reference: demo.py:36,
train.py:33, cfgs/*.yaml; SURVEY.md section 5 "Config / flag system") with a
small dependency-free equivalent that keeps the same UX:

    python demo.py image_folder=samples/apple GGS.enable=False SEED=3

Configs are nested dicts exposed as attribute-accessible ``Config`` nodes;
unknown keys can be injected at runtime (struct mode off, like the reference
does for ``GGS.pose_encoding_type``).  A tiny registry replaces ``_target_``
instantiation: ``build_model(cfg.MODEL)`` maps the reference's config tree
onto :class:`PoseDiffusionConfig`.
"""

from __future__ import annotations

import os
from typing import Any, Dict, List, Optional

import yaml

CFG_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(__file__))), "cfgs")


class Config(dict):
    """Nested dict with attribute access; missing keys raise AttributeError."""

    def __getattr__(self, k):
        try:
            v = self[k]
        except KeyError as e:
            raise AttributeError(k) from e
        return v

    def __setattr__(self, k, v):
        self[k] = _wrap(v)

    def get_path(self, dotted: str, default=None):
        node: Any = self
        for part in dotted.split("."):
            if not isinstance(node, dict) or part not in node:
                return default
            node = node[part]
        return node

    def set_path(self, dotted: str, value):
        parts = dotted.split(".")
        node = self
        for part in parts[:-1]:
            if part not in node or not isinstance(node[part], dict):
                node[part] = Config()
            node = node[part]
        node[parts[-1]] = _wrap(value)

    def to_dict(self) -> Dict:
        return {
            k: (v.to_dict() if isinstance(v, Config) else v) for k, v in self.items()
        }

    def to_yaml(self) -> str:
        return yaml.safe_dump(self.to_dict(), sort_keys=False)


def _wrap(v):
    if isinstance(v, Config):
        return v
    if isinstance(v, dict):
        return Config({k: _wrap(x) for k, x in v.items()})
    if isinstance(v, list):
        return [_wrap(x) for x in v]
    return v


def _parse_value(s: str):
    """Parse an override RHS with YAML scalar semantics (true/1.5/[3,51]/str)."""
    try:
        return yaml.safe_load(s)
    except yaml.YAMLError:
        return s


def load_config(
    name_or_path: str, overrides: Optional[List[str]] = None
) -> Config:
    """Load cfgs/<name>.yaml (or an explicit path) and apply overrides."""
    path = name_or_path
    if not os.path.isfile(path):
        path = os.path.join(CFG_DIR, f"{name_or_path}.yaml")
    with open(path) as f:
        cfg = _wrap(yaml.safe_load(f) or {})
    for ov in overrides or []:
        if "=" not in ov:
            raise ValueError(f"override '{ov}' is not key=value")
        key, value = ov.split("=", 1)
        cfg.set_path(key.strip(), _parse_value(value))
    return cfg


def cli_config(default_name: str, argv: Optional[List[str]] = None) -> Config:
    """Entry-point helper: first arg may be a config name/path; the rest are
    dotted overrides (reference README.md:39 CLI semantics)."""
    import sys

    args = list(sys.argv[1:] if argv is None else argv)
    name = default_name
    if args and "=" not in args[0]:
        name = args.pop(0)
    return load_config(name, args)


# --------------------------------------------------------------------------
# Model construction from the reference-shaped config tree
# --------------------------------------------------------------------------


def build_model_config(model_cfg: Config):
    """Map the reference's MODEL config tree (cfgs/default.yaml:16-40) onto
    PoseDiffusionConfig.  ``_target_`` entries are accepted and ignored — the
    class mapping is fixed (there is exactly one model family)."""
    from posediffusion_tpu.models.pose_diffusion import PoseDiffusionConfig

    tr = model_cfg.get_path("DENOISER.TRANSFORMER", Config())
    diff = model_cfg.get("DIFFUSER", Config())
    extractor = model_cfg.get("IMAGE_FEATURE_EXTRACTOR", Config())

    modelname = extractor.get("modelname", "dino_vits16")
    known = ("dino_vits16", "dino_vitb16", "dinov2_vits14", "resnet50", "resnet101")
    if modelname not in known:
        raise ValueError(f"unsupported backbone {modelname} (known: {known})")
    z_dim = {"dino_vitb16": 768}.get(modelname, 384)
    vit_heads = 12 if modelname == "dino_vitb16" else 6

    return PoseDiffusionConfig(
        pose_encoding_type=model_cfg.get("pose_encoding_type", "absT_quaR_logFL"),
        modelname=modelname,
        freeze_extractor=bool(extractor.get("freeze", False)),
        z_dim=z_dim,
        d_model=tr.get("d_model", 512),
        nhead=tr.get("nhead", 4),
        num_encoder_layers=tr.get("num_encoder_layers", 8),
        dim_feedforward=tr.get("dim_feedforward", 1024),
        dropout=tr.get("dropout", 0.1),
        # TPU-framework extension: bf16 denoiser trunk (train fast path)
        denoiser_dtype=str(tr.get("compute_dtype", "float32")),
        vit_heads=vit_heads,
        # depth/scale_factors/compute_dtype are TPU-framework extensions
        vit_depth=extractor.get("depth", 12),
        scale_factors=tuple(extractor.get("scale_factors", (1.0, 1.0 / 2, 1.0 / 3))),
        compute_dtype=str(extractor.get("compute_dtype", "float32")),
        # fused train-kernel gates + tile knobs (TPU-framework extensions;
        # see experiments/tune_train_kernels.py)
        fused_train_extractor=bool(extractor.get("fused_train", True)),
        vit_train_bchunk=int(extractor.get("train_bchunk", 16)),
        vit_train_mc=int(extractor.get("train_mc", 4)),
        fused_train_denoiser=bool(tr.get("fused_train", True)),
        denoiser_train_bchunk=int(tr.get("train_bchunk", 256)),
        denoiser_train_mc=int(tr.get("train_mc", 32)),
        timesteps=diff.get("timesteps", 100),
        beta_1=diff.get("beta_1", 1e-4),
        beta_T=diff.get("beta_T", 0.1),
        beta_schedule=diff.get("beta_schedule", "custom"),
        objective=diff.get("objective", "pred_noise"),
        loss_type=diff.get("loss_type", "l1"),
    )


def build_model(model_cfg: Config):
    from posediffusion_tpu.models.pose_diffusion import PoseDiffusionModel

    return PoseDiffusionModel(build_model_config(model_cfg))


def build_ggs_config(ggs_cfg: Config):
    from posediffusion_tpu.diffusion.ggs import GGSConfig

    return GGSConfig(
        enable=bool(ggs_cfg.get("enable", True)),
        start_step=int(ggs_cfg.get("start_step", 10)),
        learning_rate=float(ggs_cfg.get("learning_rate", 0.01)),
        iter_num=int(ggs_cfg.get("iter_num", 100)),
        sampson_max=float(ggs_cfg.get("sampson_max", 10)),
        min_matches=int(ggs_cfg.get("min_matches", 10)),
        alpha=float(ggs_cfg.get("alpha", 0.0001)),
        pose_encoding_type=str(
            ggs_cfg.get("pose_encoding_type", "absT_quaR_logFL")
        ),
    )
