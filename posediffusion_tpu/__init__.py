"""posediffusion_tpu: a TPU-native JAX framework for diffusion-aided camera
pose estimation, with the capabilities of facebookresearch/PoseDiffusion.

Layout (mirrors SURVEY.md section 7):
    geometry/  pure-jnp geometry core (quaternions, SE3, NDC cameras, epipolar)
    ops/       embeddings, Pallas attention, image ops
    models/    Flax modules: ViT feature extractor, denoiser, composition root
    diffusion/ DDPM schedule, losses, lax.scan sampler, GGS
    data/      Co3D / Re10K readers, dynamic bucketed batch sampler
    matching/  SuperPoint / SuperGlue ports + native RANSAC verification
    parallel/  mesh + sharding helpers (DP/FSDP over TPU slices)
    training/  optimizer schedule, train state, sharded step, checkpoints
    utils/     config system, torch checkpoint converter, seeding
"""

__version__ = "0.1.0"
