from posediffusion_tpu.diffusion.gaussian import (
    DiffusionLoss,
    p_losses,
    p_mean_variance,
    p_sample_loop,
    predict_noise_from_start,
    predict_start_from_noise,
    q_posterior,
    q_sample,
)
from posediffusion_tpu.diffusion.ggs import (
    GGSConfig,
    MatchesData,
    build_cond_fn,
    compute_sampson_loss,
    fused_fits,
    geometry_guided_sampling,
    geometry_guided_sampling_fused,
    make_ggs_cond_fn,
    pack_matches,
    sampson_report,
)
from posediffusion_tpu.diffusion.schedule import (
    DiffusionSchedule,
    cosine_beta_schedule,
    custom_beta_schedule,
    extract,
    linear_beta_schedule,
    make_schedule,
)
