from posediffusion_tpu.models.denoiser import Denoiser
from posediffusion_tpu.models.feature_extractor import MultiScaleImageFeatureExtractor
from posediffusion_tpu.models.layers import (
    MLP,
    PoseEmbedding,
    SelfAttention,
    TimeStepEmbedding,
    TransformerEncoder,
    TransformerEncoderLayer,
)
from posediffusion_tpu.models.pose_diffusion import (
    PoseDiffusionConfig,
    PoseDiffusionModel,
)
from posediffusion_tpu.models.vit import VisionTransformer, vit_base, vit_small
