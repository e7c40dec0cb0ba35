from posediffusion_tpu.ops.attention import mha_attention
from posediffusion_tpu.ops.embeddings import (
    harmonic_embedding,
    harmonic_embedding_dim,
    sinusoidal_time_embedding,
)
from posediffusion_tpu.ops.image import (
    IMAGENET_MEAN,
    IMAGENET_STD,
    imagenet_normalize,
    resize_bilinear,
    scale_size,
)
from posediffusion_tpu.ops.ggs_grad import (
    GroupedMatches,
    pack_matches_grouped,
    sampson_loss_and_grad,
)
from posediffusion_tpu.ops.ggs_kernel import ggs_phase_fused
