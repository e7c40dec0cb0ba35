"""One-time compile probes for the fused INFERENCE kernels.

``PoseDiffusionModel.sample`` routes, by default on TPU, into three Pallas
kernel families: the whole-loop sampler (ops/sampler_kernel.py), the fused
ViT extractor trunk (ops/vit_kernel.py), and the per-step denoiser trunk
(ops/denoiser_kernel.py, used for the conditioned GGS tail).  A Mosaic
compile failure in any of them — most importantly a VMEM budget violation,
which depends on (N, model width, weight residency mode) — must degrade to
the Flax/scan path with a warning, never take down ``demo.py`` / ``test.py``
/ ``bench.py``.  Round 4 shipped exactly that failure: the sampler's
resident-weights mode compile-failed at reference scale and every inference
entry point crashed on the target hardware (BENCH_r04 rc=1), because the
sample path had no equivalent of the train path's ops/train_probe.py guard.

Probes compile-and-run each kernel ONCE per shape/knob configuration with
the production kernel's true VMEM liveness, on synthetic weights:

* sampler: the real (N, d_model, L, T) but only TWO reverse steps
  (``n_cond = T - 2``) — VMEM windows and the scoped stack are step-count
  independent (per-step inputs stream through (1, ...) double-buffered
  windows; resident mode holds the full (L, ...) weight stacks either way);
* ViT trunk: the real (B, n_tokens, width) but depth 2 — the per-layer
  weight windows are double-buffered identically at any depth >= 2;
* denoiser per-step trunk: the real (N, d_model) at full depth (tiny).

Verdicts are cached per configuration (the sampler key includes the
``POSEDIFFUSION_SAMPLER_WEIGHTS`` mode, which changes its VMEM story).
Set ``POSEDIFFUSION_FUSED_SAMPLE_PROBE=on`` to skip probing (trust the
kernels), ``off`` to force the scan/Flax fallback, or ``fail`` to simulate
a kernel compile failure (exercises the fallback in tests without a TPU).

Reference behavior this protects: the reference's inference entry points
cannot compile-fail (plain torch modules, pose_diffusion/demo.py:108,
test.py:212); ours must be no less robust while defaulting to the fused
kernels.
"""

from __future__ import annotations

import concurrent.futures
import functools
import os
import warnings

import numpy as np

_ENV = "POSEDIFFUSION_FUSED_SAMPLE_PROBE"


def _mat(din: int, dout: int, dtype=None):
    import jax.numpy as jnp

    vals = (np.arange(din * dout, dtype=np.float32) % 7.0 - 3.0) * 0.01
    a = jnp.asarray(vals.reshape(din, dout))
    return a.astype(dtype) if dtype is not None else a


def _vec(d: int, val: float):
    import jax.numpy as jnp

    return jnp.full((d,), val, jnp.float32)


def _run_forward_probe(build, label: str) -> bool:
    """Compile-and-run a forward-only kernel probe on a fresh thread.

    The probe is consulted at trace time of a jitted caller; JAX trace state
    is thread-local, so a fresh thread escapes the ambient trace and the
    kernel compiles and RUNS right now (see ops/train_probe.py:_run_probe
    for the full rationale — pallas primitives have no eval rule, so
    ensure_compile_time_eval cannot substitute).
    """
    import jax

    if os.environ.get(_ENV) == "fail":
        exc: Exception = RuntimeError(
            f"simulated fused-sample kernel compile failure ({_ENV}=fail "
            "test hook)"
        )
    else:
        exc = None

    def run_now():
        fn, args = build()
        y = jax.jit(fn)(*args)
        return bool(np.isfinite(np.asarray(y, np.float32)).all())

    try:
        if exc is not None:
            raise exc
        with concurrent.futures.ThreadPoolExecutor(1) as pool:
            ok = pool.submit(run_now).result()
        if not ok:
            warnings.warn(
                f"fused sample kernel probe ({label}): non-finite output; "
                "falling back to the scan/Flax path"
            )
        return ok
    except Exception as e:  # Mosaic compile failure, VMEM OOM, ...
        warnings.warn(
            f"fused sample kernel probe ({label}) failed — falling back to "
            f"the scan/Flax path: {type(e).__name__}: {str(e)[:200]}"
        )
        return False


def _synth_denoiser_variables(
    d_model: int, dff: int, mlp_hidden: int, L: int,
    target_dim: int, n_harmonics: int, z_feat_dim: int,
):
    """A denoiser param pytree with the production shapes and deterministic
    non-constant values (mirrors models/denoiser.Denoiser's tree exactly)."""
    H = target_dim * n_harmonics
    in_dim = 2 * H + target_dim + 128 + z_feat_dim
    trunk = {}
    for i in range(L):
        trunk[f"layers_{i}"] = {
            "norm1": {"scale": _vec(d_model, 1.0), "bias": _vec(d_model, 0.0)},
            "self_attn": {
                "in_proj": {
                    "kernel": _mat(d_model, 3 * d_model),
                    "bias": _vec(3 * d_model, 0.0),
                },
                "out_proj": {
                    "kernel": _mat(d_model, d_model),
                    "bias": _vec(d_model, 0.0),
                },
            },
            "norm2": {"scale": _vec(d_model, 1.0), "bias": _vec(d_model, 0.0)},
            "linear1": {"kernel": _mat(d_model, dff), "bias": _vec(dff, 0.0)},
            "linear2": {"kernel": _mat(dff, d_model), "bias": _vec(d_model, 0.0)},
        }
    params = {
        "first": {"kernel": _mat(in_dim, d_model), "bias": _vec(d_model, 0.0)},
        "time_embed": {
            "linear_0": {"kernel": _mat(256, 128), "bias": _vec(128, 0.0)},
            "linear_2": {"kernel": _mat(128, 128), "bias": _vec(128, 0.0)},
        },
        "trunk": trunk,
        "last": {
            "dense_0": {
                "kernel": _mat(d_model, mlp_hidden),
                "bias": _vec(mlp_hidden, 0.0),
            },
            "norm_0": {
                "scale": _vec(mlp_hidden, 1.0),
                "bias": _vec(mlp_hidden, 0.0),
            },
            "dense_1": {
                "kernel": _mat(mlp_hidden, target_dim),
                "bias": _vec(target_dim, 0.0),
            },
        },
    }
    return {"params": params}


@functools.lru_cache(maxsize=None)
def sampler_loop_ok(
    N: int, d_model: int, dff: int, mlp_hidden: int, nhead: int, L: int,
    target_dim: int, n_harmonics: int, z_dim: int, pivot: bool, T: int,
    weights_mode: str,
) -> bool:
    """Compile-probe ops/sampler_kernel.fused_sample_loop at the real
    (N, widths, L) with TWO reverse steps.

    ``weights_mode`` is the POSEDIFFUSION_SAMPLER_WEIGHTS value in effect —
    part of the cache key because residency changes the kernel's VMEM
    story entirely.  Note the cache also latches the probe-mode env seen
    first (tests flipping envs should call ``sampler_loop_ok.cache_clear()``).
    """
    mode = os.environ.get(_ENV, "")
    if mode == "on":
        return True
    if mode == "off":
        return False

    import jax
    import jax.numpy as jnp

    from posediffusion_tpu.diffusion.schedule import make_schedule
    from posediffusion_tpu.ops.sampler_kernel import fused_sample_loop

    def build():
        variables = _synth_denoiser_variables(
            d_model, dff, mlp_hidden, L, target_dim, n_harmonics,
            z_dim + (1 if pivot else 0),
        )
        schedule = make_schedule(T)
        z = _mat(N, z_dim)[None]  # (1, N, z_dim)

        def fn(zz):
            x, _ = fused_sample_loop(
                variables, schedule, zz, jax.random.PRNGKey(0),
                n_cond=T - 2, nhead=nhead, num_encoder_layers=L,
                pivot_cam_onehot=pivot, target_dim=target_dim,
                n_harmonics=n_harmonics,
            )
            return jnp.sum(x)

        return fn, (z,)

    return _run_forward_probe(
        build,
        f"sampler N={N} d={d_model} L={L} T={T} weights={weights_mode}",
    )


@functools.lru_cache(maxsize=None)
def vit_infer_kernel_ok(
    B: int, n_tok: int, d_model: int, dff: int, nhead: int, chunk: int,
    act_bf16: bool,
) -> bool:
    """Compile-probe ops/vit_kernel.fused_vit_trunk at the real
    (B, n_tokens, width) with depth 2 (weight windows are double-buffered
    identically at any depth >= 2; the (B_pad, N_pad, d) scratch and the
    (N_pad, N_pad) bias window — the VMEM heavies — use the real shapes)."""
    mode = os.environ.get(_ENV, "")
    if mode == "on":
        return True
    if mode == "off":
        return False

    import jax.numpy as jnp

    from posediffusion_tpu.ops.vit_kernel import fused_vit_trunk

    depth = 2

    def build():
        stacks = {
            "g1": jnp.ones((depth, 1, d_model)),
            "b1": jnp.zeros((depth, 1, d_model)),
            "wqkv": jnp.tile(_mat(d_model, 3 * d_model)[None], (depth, 1, 1)),
            "bqkv": jnp.zeros((depth, 1, 3 * d_model)),
            "wproj": jnp.tile(_mat(d_model, d_model)[None], (depth, 1, 1)),
            "bproj": jnp.zeros((depth, 1, d_model)),
            "g2": jnp.ones((depth, 1, d_model)),
            "b2": jnp.zeros((depth, 1, d_model)),
            "wfc1": jnp.tile(_mat(d_model, dff)[None], (depth, 1, 1)),
            "bfc1": jnp.zeros((depth, 1, dff)),
            "wfc2": jnp.tile(_mat(dff, d_model)[None], (depth, 1, 1)),
            "bfc2": jnp.zeros((depth, 1, d_model)),
        }
        stacks = {
            k: (v.astype(jnp.bfloat16) if v.ndim == 3 and v.shape[1] > 1
                else v)
            for k, v in stacks.items()
        }
        x = jnp.tile(_mat(n_tok, d_model)[None], (B, 1, 1))

        def fn(xx):
            return jnp.sum(
                fused_vit_trunk(
                    xx, stacks, nhead=nhead, chunk=min(chunk, B),
                    act_bf16=act_bf16,
                )
            )

        return fn, (x,)

    return _run_forward_probe(
        build, f"vit-infer B={B} n_tok={n_tok} d={d_model}"
    )


@functools.lru_cache(maxsize=None)
def denoiser_step_kernel_ok(
    N: int, d_model: int, dff: int, mlp_hidden: int, nhead: int, L: int,
    target_dim: int, n_harmonics: int, z_dim: int, pivot: bool,
) -> bool:
    """Compile-probe the per-step fused denoiser forward
    (models/denoiser.denoiser_apply_fused -> ops/denoiser_kernel.fused_trunk)
    at the real (N, d_model) and full depth — the kernel is tiny, so the
    full production program is the cheapest true-liveness probe."""
    mode = os.environ.get(_ENV, "")
    if mode == "on":
        return True
    if mode == "off":
        return False

    import jax.numpy as jnp

    from posediffusion_tpu.models.denoiser import denoiser_apply_fused

    def build():
        variables = _synth_denoiser_variables(
            d_model, dff, mlp_hidden, L, target_dim, n_harmonics,
            z_dim + (1 if pivot else 0),
        )
        x = _mat(N, target_dim)[None]
        z = _mat(N, z_dim)[None]
        t = jnp.zeros((1,), jnp.int32)

        def fn(xx):
            return jnp.sum(
                denoiser_apply_fused(
                    variables, xx, t, z, nhead=nhead,
                    num_encoder_layers=L, pivot_cam_onehot=pivot,
                )
            )

        return fn, (x,)

    return _run_forward_probe(build, f"denoiser-step N={N} d={d_model}")
