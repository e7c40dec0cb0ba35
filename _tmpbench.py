import time

import jax
import jax.numpy as jnp
import numpy as np

from posediffusion_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()
from posediffusion_tpu.models.feature_extractor import extract_features_fused

N_FRAMES = 20
IMAGE_SIZE = 224
R = 20

from posediffusion_tpu.models.feature_extractor import (
    MultiScaleImageFeatureExtractor,
)

ext = MultiScaleImageFeatureExtractor()
rng = np.random.default_rng(0)
flat = jnp.asarray(
    rng.uniform(size=(N_FRAMES, 3, IMAGE_SIZE, IMAGE_SIZE)).astype(np.float32)
)
params = ext.init(jax.random.PRNGKey(0), flat[:1])


def timed(fn, label):
    @jax.jit
    def chain(params, flat):
        def body(c, _):
            z = fn(params, flat + c * 1e-12)
            return jnp.sum(z), None

        s, _ = jax.lax.scan(body, 0.0, None, length=R)
        return s

    try:
        for _ in range(2):
            jax.device_get(chain(params, flat))
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            jax.device_get(chain(params, flat))
            times.append((time.perf_counter() - t0) / R)
        print(f"[{label}] {float(np.median(times))*1e3:.2f} ms", flush=True)
    except Exception as e:
        print(f"[{label}] FAILED: {str(e)[:300]}", flush=True)


# per-scale cost (eff_chunk scaling active)
for scales, label in [
    ((1.0,), "scale 1.0 only"),
    ((0.5,), "scale 1/2 only"),
    ((1.0 / 3,), "scale 1/3 only"),
    ((1.0, 0.5, 1.0 / 3), "all scales, eff_chunk"),
]:
    timed(
        lambda p, f, s=scales: extract_features_fused(p, f, scale_factors=s),
        label,
    )

z_flax = ext.apply(params, flat)
z = extract_features_fused(params, flat)
rel = jnp.max(jnp.abs(z - z_flax)) / jnp.max(jnp.abs(z_flax))
print("eff_chunk fused-vs-flax feature max relative diff:", float(rel), flush=True)
