"""Gaussian diffusion as pure JAX functions over a precomputed schedule pytree.

TPU-native rebuild of the reference's guided_diffusion port
(holo_diffusion/guided_diffusion/gaussian_diffusion.py:112-1043,
losses.py, timestep_sampler.py). Key differences from the reference:

  * the schedule is a frozen pytree (`DiffusionSchedule`) precomputed in
    float64 numpy and stored as float32 device arrays — no object state;
  * ancestral/DDIM sampling loops are `lax.scan`s compiled into ONE XLA
    program (the reference runs 1000 sequential python-loop UNet calls,
    gaussian_diffusion.py:568-643);
  * model is passed as a pure fn `model_fn(x, t) -> out` (params closed over);
  * data layout is channels-last.

HoloDiffusion uses START_X + FIXED_SMALL (diffusion_utils.py:95-96); all four
mean types and the fixed/learned variance types are supported for full parity.
"""
from __future__ import annotations

import math
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

# ---------------------------------------------------------------------------
# Beta schedules (gaussian_diffusion.py:25-71)
# ---------------------------------------------------------------------------


def get_named_beta_schedule(
    schedule_name: str,
    num_diffusion_timesteps: int,
    beta_start_unscaled: float = 1e-4,
    beta_end_unscaled: float = 0.02,
) -> np.ndarray:
    """Named beta schedule, float64 numpy (matches reference numerics)."""
    if schedule_name == "linear":
        scale = 1000.0 / num_diffusion_timesteps
        return np.linspace(
            scale * beta_start_unscaled,
            scale * beta_end_unscaled,
            num_diffusion_timesteps,
            dtype=np.float64,
        )
    if schedule_name == "cosine":
        return betas_for_alpha_bar(
            num_diffusion_timesteps,
            lambda t: math.cos((t + 0.008) / 1.008 * math.pi / 2) ** 2,
        )
    raise NotImplementedError(f"unknown beta schedule: {schedule_name}")


def betas_for_alpha_bar(num_diffusion_timesteps, alpha_bar, max_beta=0.999):
    ts = np.arange(num_diffusion_timesteps, dtype=np.float64)
    t1 = ts / num_diffusion_timesteps
    t2 = (ts + 1) / num_diffusion_timesteps
    ab1 = np.array([alpha_bar(t) for t in t1])
    ab2 = np.array([alpha_bar(t) for t in t2])
    return np.minimum(1 - ab2 / ab1, max_beta)


# ---------------------------------------------------------------------------
# Schedule pytree
# ---------------------------------------------------------------------------

# Model mean types (gaussian_diffusion.py:74-90)
PREVIOUS_X = "PREVIOUS_X"
START_X = "START_X"
EPSILON = "EPSILON"
SCALED_EPSILON_FOR_START_X = "SCALED_EPSILON_FOR_START_X"

# Model var types (gaussian_diffusion.py:93-109)
LEARNED = "LEARNED"
FIXED_SMALL = "FIXED_SMALL"
FIXED_LARGE = "FIXED_LARGE"
LEARNED_RANGE = "LEARNED_RANGE"


@struct.dataclass
class DiffusionSchedule:
    betas: jnp.ndarray
    alphas_cumprod: jnp.ndarray
    alphas_cumprod_prev: jnp.ndarray
    alphas_cumprod_next: jnp.ndarray
    sqrt_alphas_cumprod: jnp.ndarray
    sqrt_one_minus_alphas_cumprod: jnp.ndarray
    log_one_minus_alphas_cumprod: jnp.ndarray
    sqrt_recip_alphas_cumprod: jnp.ndarray
    sqrt_recipm1_alphas_cumprod: jnp.ndarray
    posterior_variance: jnp.ndarray
    posterior_log_variance_clipped: jnp.ndarray
    posterior_mean_coef1: jnp.ndarray
    posterior_mean_coef2: jnp.ndarray
    # fixed-large variance pair (gaussian_diffusion.py:299-305)
    fixed_large_variance: jnp.ndarray
    fixed_large_log_variance: jnp.ndarray
    model_mean_type: str = struct.field(pytree_node=False, default=START_X)
    model_var_type: str = struct.field(pytree_node=False, default=FIXED_SMALL)
    # scale t by 1000/T before the model (gaussian_diffusion.py:417-419);
    # False in all HoloDiffusion configs
    rescale_timesteps: bool = struct.field(pytree_node=False, default=False)

    @property
    def num_timesteps(self) -> int:
        return self.betas.shape[0]


def make_schedule(
    betas: np.ndarray,
    model_mean_type: str = START_X,
    model_var_type: str = FIXED_SMALL,
    rescale_timesteps: bool = False,
    dtype=jnp.float32,
) -> DiffusionSchedule:
    """Precompute all schedule arrays in float64 (gaussian_diffusion.py:150-187)."""
    betas = np.asarray(betas, dtype=np.float64)
    assert betas.ndim == 1 and (betas > 0).all() and (betas <= 1).all()
    alphas = 1.0 - betas
    alphas_cumprod = np.cumprod(alphas, axis=0)
    alphas_cumprod_prev = np.append(1.0, alphas_cumprod[:-1])
    alphas_cumprod_next = np.append(alphas_cumprod[1:], 0.0)

    posterior_variance = betas * (1.0 - alphas_cumprod_prev) / (1.0 - alphas_cumprod)
    posterior_log_variance_clipped = np.log(
        np.append(posterior_variance[1], posterior_variance[1:])
    )
    fixed_large_variance = np.append(posterior_variance[1], betas[1:])

    as_dev = lambda x: jnp.asarray(x, dtype)
    return DiffusionSchedule(
        betas=as_dev(betas),
        alphas_cumprod=as_dev(alphas_cumprod),
        alphas_cumprod_prev=as_dev(alphas_cumprod_prev),
        alphas_cumprod_next=as_dev(alphas_cumprod_next),
        sqrt_alphas_cumprod=as_dev(np.sqrt(alphas_cumprod)),
        sqrt_one_minus_alphas_cumprod=as_dev(np.sqrt(1.0 - alphas_cumprod)),
        log_one_minus_alphas_cumprod=as_dev(np.log(1.0 - alphas_cumprod)),
        sqrt_recip_alphas_cumprod=as_dev(np.sqrt(1.0 / alphas_cumprod)),
        sqrt_recipm1_alphas_cumprod=as_dev(np.sqrt(1.0 / alphas_cumprod - 1)),
        posterior_variance=as_dev(posterior_variance),
        posterior_log_variance_clipped=as_dev(posterior_log_variance_clipped),
        posterior_mean_coef1=as_dev(
            betas * np.sqrt(alphas_cumprod_prev) / (1.0 - alphas_cumprod)
        ),
        posterior_mean_coef2=as_dev(
            (1.0 - alphas_cumprod_prev) * np.sqrt(alphas) / (1.0 - alphas_cumprod)
        ),
        fixed_large_variance=as_dev(fixed_large_variance),
        fixed_large_log_variance=as_dev(np.log(fixed_large_variance)),
        model_mean_type=model_mean_type,
        model_var_type=model_var_type,
        rescale_timesteps=rescale_timesteps,
    )


def _scale_timesteps(sched: "DiffusionSchedule", t):
    if sched.rescale_timesteps:
        return t.astype(jnp.float32) * (1000.0 / sched.num_timesteps)
    return t


def make_named_schedule(
    schedule_name: str = "linear",
    num_steps: int = 1000,
    beta_start_unscaled: float = 1e-4,
    beta_end_unscaled: float = 0.02,
    model_mean_type: str = START_X,
    model_var_type: str = FIXED_SMALL,
) -> DiffusionSchedule:
    """Config-surface equivalent of ImplicitronGaussianDiffusion
    (diffusion_utils.py:89-116)."""
    return make_schedule(
        get_named_beta_schedule(
            schedule_name, num_steps, beta_start_unscaled, beta_end_unscaled
        ),
        model_mean_type=model_mean_type,
        model_var_type=model_var_type,
    )


def _extract(arr: jnp.ndarray, t: jnp.ndarray, ndim) -> jnp.ndarray:
    """arr[t] broadcast to rank `ndim` — or to a full shape if a tuple is
    given (torch _extract_into_tensor expands to the full broadcast shape)."""
    if isinstance(ndim, tuple):
        shape = ndim
        return jnp.broadcast_to(
            arr[t].reshape(t.shape[0], *([1] * (len(shape) - 1))), shape
        )
    return arr[t].reshape(t.shape[0], *([1] * (ndim - 1)))


# ---------------------------------------------------------------------------
# q (forward) process
# ---------------------------------------------------------------------------


def q_mean_variance(sched: DiffusionSchedule, x_start, t):
    mean = _extract(sched.sqrt_alphas_cumprod, t, x_start.ndim) * x_start
    variance = _extract(1.0 - sched.alphas_cumprod, t, x_start.ndim)
    log_variance = _extract(sched.log_one_minus_alphas_cumprod, t, x_start.ndim)
    return mean, variance, log_variance


def q_sample(sched: DiffusionSchedule, x_start, t, noise):
    """Sample q(x_t | x_0) (gaussian_diffusion.py:209-227). noise required —
    explicit PRNG threading instead of torch's global RNG."""
    return (
        _extract(sched.sqrt_alphas_cumprod, t, x_start.ndim) * x_start
        + _extract(sched.sqrt_one_minus_alphas_cumprod, t, x_start.ndim) * noise
    )


def q_posterior_mean_variance(sched: DiffusionSchedule, x_start, x_t, t):
    mean = (
        _extract(sched.posterior_mean_coef1, t, x_t.ndim) * x_start
        + _extract(sched.posterior_mean_coef2, t, x_t.ndim) * x_t
    )
    variance = _extract(sched.posterior_variance, t, x_t.shape)
    log_variance = _extract(sched.posterior_log_variance_clipped, t, x_t.shape)
    return mean, variance, log_variance


# ---------------------------------------------------------------------------
# p (reverse) process
# ---------------------------------------------------------------------------


def predict_xstart_from_eps(sched: DiffusionSchedule, x_t, t, eps):
    return (
        _extract(sched.sqrt_recip_alphas_cumprod, t, x_t.ndim) * x_t
        - _extract(sched.sqrt_recipm1_alphas_cumprod, t, x_t.ndim) * eps
    )


def predict_xstart_from_xprev(sched: DiffusionSchedule, x_t, t, xprev):
    return (
        _extract(1.0 / sched.posterior_mean_coef1, t, x_t.ndim) * xprev
        - _extract(
            sched.posterior_mean_coef2 / sched.posterior_mean_coef1, t, x_t.ndim
        )
        * x_t
    )


def predict_eps_from_xstart(sched: DiffusionSchedule, x_t, t, pred_xstart):
    return (
        _extract(sched.sqrt_recip_alphas_cumprod, t, x_t.ndim) * x_t - pred_xstart
    ) / _extract(sched.sqrt_recipm1_alphas_cumprod, t, x_t.ndim)


def p_mean_variance(
    sched: DiffusionSchedule,
    model_fn: Callable,
    x: jnp.ndarray,
    t: jnp.ndarray,
    clip_denoised: bool = True,
    denoised_fn: Optional[Callable] = None,
):
    """p(x_{t-1} | x_t) mean/variance + pred_xstart
    (gaussian_diffusion.py:253-355). Channels-last: variance split uses the
    LAST axis for LEARNED/LEARNED_RANGE outputs."""
    model_output = model_fn(x, _scale_timesteps(sched, t))

    if sched.model_var_type in (LEARNED, LEARNED_RANGE):
        C = x.shape[-1]
        model_output, model_var_values = jnp.split(model_output, [C], axis=-1)
        if sched.model_var_type == LEARNED:
            model_log_variance = model_var_values
            model_variance = jnp.exp(model_log_variance)
        else:
            min_log = _extract(sched.posterior_log_variance_clipped, t, x.ndim)
            max_log = _extract(jnp.log(sched.betas), t, x.ndim)
            frac = (model_var_values + 1) / 2
            model_log_variance = frac * max_log + (1 - frac) * min_log
            model_variance = jnp.exp(model_log_variance)
    elif sched.model_var_type == FIXED_LARGE:
        model_variance = _extract(sched.fixed_large_variance, t, x.shape)
        model_log_variance = _extract(sched.fixed_large_log_variance, t, x.shape)
    elif sched.model_var_type == FIXED_SMALL:
        model_variance = _extract(sched.posterior_variance, t, x.shape)
        model_log_variance = _extract(sched.posterior_log_variance_clipped, t, x.shape)
    else:
        raise NotImplementedError(sched.model_var_type)

    def process_xstart(x0):
        if denoised_fn is not None:
            x0 = denoised_fn(x0)
        if clip_denoised:
            x0 = jnp.clip(x0, -1.0, 1.0)
        return x0

    if sched.model_mean_type == PREVIOUS_X:
        pred_xstart = process_xstart(
            predict_xstart_from_xprev(sched, x, t, model_output)
        )
        model_mean = model_output
    else:
        if sched.model_mean_type == START_X:
            pred_xstart = process_xstart(model_output)
        elif sched.model_mean_type == SCALED_EPSILON_FOR_START_X:
            pred_xstart = process_xstart(x - model_output)
        elif sched.model_mean_type == EPSILON:
            pred_xstart = process_xstart(
                predict_xstart_from_eps(sched, x, t, model_output)
            )
        else:
            raise NotImplementedError(sched.model_mean_type)
        model_mean, _, _ = q_posterior_mean_variance(sched, pred_xstart, x, t)

    return {
        "mean": model_mean,
        "variance": model_variance,
        "log_variance": model_log_variance,
        "pred_xstart": pred_xstart,
    }


def condition_mean(sched: DiffusionSchedule, cond_fn, p_mean_var, x, t):
    """Sohl-Dickstein-style conditioning (gaussian_diffusion.py:420-436)."""
    gradient = cond_fn(x, t)
    return p_mean_var["mean"] + p_mean_var["variance"] * gradient


def condition_score(sched: DiffusionSchedule, cond_fn, p_mean_var, x, t):
    """Song et al. score conditioning (gaussian_diffusion.py:438-457)."""
    alpha_bar = _extract(sched.alphas_cumprod, t, x.ndim)
    eps = predict_eps_from_xstart(sched, x, t, p_mean_var["pred_xstart"])
    eps = eps - jnp.sqrt(1 - alpha_bar) * cond_fn(x, t)
    out = dict(p_mean_var)
    out["pred_xstart"] = predict_xstart_from_eps(sched, x, t, eps)
    out["mean"], _, _ = q_posterior_mean_variance(
        sched, out["pred_xstart"], x, t
    )
    return out


def p_sample(
    sched: DiffusionSchedule,
    model_fn: Callable,
    x: jnp.ndarray,
    t: jnp.ndarray,
    rng: jax.Array,
    clip_denoised: bool = True,
    denoised_fn: Optional[Callable] = None,
    cond_fn: Optional[Callable] = None,
    noise: Optional[jnp.ndarray] = None,
):
    """One DDPM ancestral step (gaussian_diffusion.py:459-508). `noise`
    overrides the PRNG draw (the reference's pluggable noise_sampler)."""
    out = p_mean_variance(sched, model_fn, x, t, clip_denoised, denoised_fn)
    if noise is None:
        noise = jax.random.normal(rng, x.shape, x.dtype)
    nonzero_mask = (t != 0).astype(x.dtype).reshape(-1, *([1] * (x.ndim - 1)))
    mean = out["mean"]
    if cond_fn is not None:
        mean = mean + out["variance"] * cond_fn(x, t)
    sample = mean + nonzero_mask * jnp.exp(0.5 * out["log_variance"]) * noise
    return {"sample": sample, "pred_xstart": out["pred_xstart"], "noise": noise}


def p_sample_loop(
    sched: DiffusionSchedule,
    model_fn: Callable,
    shape,
    rng: jax.Array,
    noise: Optional[jnp.ndarray] = None,
    clip_denoised: bool = True,
    denoised_fn: Optional[Callable] = None,
    max_iter: Optional[int] = None,
):
    """Full DDPM ancestral sampling compiled as one `lax.scan`
    (vs. the reference's python loop, gaussian_diffusion.py:568-643).

    `max_iter` subsamples the step sequence like the reference's
    p_sample_loop_progressive(max_iter=...) (608-621): run the first
    (max_iter - 1) steps of the schedule tail, then jump to t=0.
    """
    rng, rng_init = jax.random.split(rng)
    x = noise if noise is not None else jax.random.normal(rng_init, shape)
    T = sched.num_timesteps
    if max_iter is None or max_iter >= T:
        ts = jnp.arange(T - 1, -1, -1)
    else:
        ts = jnp.concatenate(
            [jnp.arange(T - 1, T - max_iter, -1), jnp.array([0])]
        )
    step_rngs = jax.random.split(rng, ts.shape[0])

    def body(x, inp):
        t_scalar, step_rng = inp
        t = jnp.full((shape[0],), t_scalar, jnp.int32)
        out = p_sample(
            sched, model_fn, x, t, step_rng, clip_denoised, denoised_fn
        )
        return out["sample"], None

    x, _ = jax.lax.scan(body, x, (ts, step_rngs))
    return x


def p_sample_loop_progressive(
    sched: DiffusionSchedule,
    model_fn: Callable,
    shape,
    rng: jax.Array,
    clip_denoised: bool = True,
    max_iter: Optional[int] = None,
):
    """Python generator over intermediate samples (for the progressive-denoise
    flyaround animation, flyaround.py:224-245). Each step is a jitted
    p_sample; use `p_sample_loop` when only the final sample is needed."""
    rng, rng_init = jax.random.split(rng)
    x = jax.random.normal(rng_init, shape)
    T = sched.num_timesteps
    if max_iter is None or max_iter >= T:
        ts = list(range(T - 1, -1, -1))
    else:
        ts = list(range(T - 1, T - max_iter, -1)) + [0]

    step = jax.jit(
        lambda x, t, r: p_sample(sched, model_fn, x, t, r, clip_denoised)
    )
    for t_scalar in ts:
        rng, step_rng = jax.random.split(rng)
        t = jnp.full((shape[0],), t_scalar, jnp.int32)
        out = step(x, t, step_rng)
        x = out["sample"]
        yield out


# ---------------------------------------------------------------------------
# DDIM (gaussian_diffusion.py:645-815)
# ---------------------------------------------------------------------------


def ddim_sample(
    sched: DiffusionSchedule,
    model_fn: Callable,
    x,
    t,
    rng: jax.Array,
    clip_denoised: bool = True,
    eta: float = 0.0,
    t_prev=None,
):
    """One DDIM step t -> t_prev (gaussian_diffusion.py:645-699).

    t_prev: destination timestep, -1 meaning x_0. Default t-1 (the reference's
    full-trajectory DDIM); a strided subsequence (DDIM paper §4.2 accelerated
    sampling — the reference dropped guided_diffusion's respace.py, this
    implements the same acceleration natively) passes the NEXT member of the
    subsequence."""
    out = p_mean_variance(sched, model_fn, x, t, clip_denoised)
    eps = predict_eps_from_xstart(sched, x, t, out["pred_xstart"])
    alpha_bar = _extract(sched.alphas_cumprod, t, x.ndim)
    if t_prev is None:
        alpha_bar_prev = _extract(sched.alphas_cumprod_prev, t, x.ndim)
    else:
        # concat([1], alphas_cumprod)[tp+1] == alphas_cumprod_prev[tp+1] and
        # == 1.0 at tp == -1: identical to the default when t_prev == t-1
        acp1 = jnp.concatenate(
            [jnp.ones((1,), sched.alphas_cumprod.dtype), sched.alphas_cumprod]
        )
        alpha_bar_prev = _extract(acp1, t_prev + 1, x.ndim)
    sigma = (
        eta
        * jnp.sqrt((1 - alpha_bar_prev) / (1 - alpha_bar))
        * jnp.sqrt(1 - alpha_bar / alpha_bar_prev)
    )
    noise = jax.random.normal(rng, x.shape, x.dtype)
    mean_pred = (
        out["pred_xstart"] * jnp.sqrt(alpha_bar_prev)
        + jnp.sqrt(1 - alpha_bar_prev - sigma**2) * eps
    )
    # no noise into the FINAL state (x_0): t_prev < 0 on a strided
    # subsequence's last step even when t != 0
    last = (t == 0) if t_prev is None else (t_prev < 0)
    nonzero_mask = (~last).astype(x.dtype).reshape(-1, *([1] * (x.ndim - 1)))
    sample = mean_pred + nonzero_mask * sigma * noise
    return {"sample": sample, "pred_xstart": out["pred_xstart"]}


def ddim_reverse_sample(
    sched: DiffusionSchedule, model_fn: Callable, x, t, clip_denoised: bool = True
):
    """Deterministic encode x_t -> x_{t+1} (gaussian_diffusion.py:700-733)."""
    out = p_mean_variance(sched, model_fn, x, t, clip_denoised)
    eps = (
        _extract(sched.sqrt_recip_alphas_cumprod, t, x.ndim) * x
        - out["pred_xstart"]
    ) / _extract(sched.sqrt_recipm1_alphas_cumprod, t, x.ndim)
    alpha_bar_next = _extract(sched.alphas_cumprod_next, t, x.ndim)
    mean_pred = (
        out["pred_xstart"] * jnp.sqrt(alpha_bar_next)
        + jnp.sqrt(1 - alpha_bar_next) * eps
    )
    return {"sample": mean_pred, "pred_xstart": out["pred_xstart"]}


def ddim_sample_loop(
    sched: DiffusionSchedule,
    model_fn: Callable,
    shape,
    rng: jax.Array,
    noise: Optional[jnp.ndarray] = None,
    clip_denoised: bool = True,
    eta: float = 0.0,
    num_steps: Optional[int] = None,
):
    """DDIM sampling as ONE lax.scan. `num_steps` < T runs the DDIM paper's
    accelerated sampler over an evenly-strided timestep subsequence that
    still COVERS the full trajectory T-1 .. 0 (unlike p_sample_loop's
    reference-parity `max_iter`, which truncates); num_steps None/>=T is
    bit-identical to the unstrided loop."""
    import numpy as _np

    rng, rng_init = jax.random.split(rng)
    x = noise if noise is not None else jax.random.normal(rng_init, shape)
    T = sched.num_timesteps
    if num_steps is None or num_steps >= T:
        ts_np = _np.arange(T - 1, -1, -1)
    else:
        # unique descending subsequence T-1 .. 0 (round of a linspace can
        # duplicate neighbours when num_steps ~ T)
        ts_np = _np.unique(
            _np.round(_np.linspace(T - 1, 0, max(num_steps, 2))).astype(
                _np.int64
            )
        )[::-1]
    ts = jnp.asarray(ts_np, jnp.int32)
    tprev = jnp.asarray(
        _np.concatenate([ts_np[1:], [-1]]), jnp.int32
    )
    step_rngs = jax.random.split(rng, ts.shape[0])

    def body(x, inp):
        t_scalar, tp_scalar, step_rng = inp
        t = jnp.full((shape[0],), t_scalar, jnp.int32)
        tp = jnp.full((shape[0],), tp_scalar, jnp.int32)
        out = ddim_sample(
            sched, model_fn, x, t, step_rng, clip_denoised, eta, t_prev=tp
        )
        return out["sample"], None

    x, _ = jax.lax.scan(body, x, (ts, tprev, step_rngs))
    return x


# ---------------------------------------------------------------------------
# Losses (losses.py + gaussian_diffusion.py:817-968)
# ---------------------------------------------------------------------------


def normal_kl(mean1, logvar1, mean2, logvar2):
    """KL between two diagonal gaussians (losses.py:18-45)."""
    return 0.5 * (
        -1.0
        + logvar2
        - logvar1
        + jnp.exp(logvar1 - logvar2)
        + ((mean1 - mean2) ** 2) * jnp.exp(-logvar2)
    )


def approx_standard_normal_cdf(x):
    return 0.5 * (
        1.0 + jnp.tanh(jnp.sqrt(2.0 / jnp.pi) * (x + 0.044715 * x**3))
    )


def discretized_gaussian_log_likelihood(x, means, log_scales):
    """Log-likelihood of a discretized (255-bin) gaussian (losses.py:56-83)."""
    centered_x = x - means
    inv_stdv = jnp.exp(-log_scales)
    plus_in = inv_stdv * (centered_x + 1.0 / 255.0)
    cdf_plus = approx_standard_normal_cdf(plus_in)
    min_in = inv_stdv * (centered_x - 1.0 / 255.0)
    cdf_min = approx_standard_normal_cdf(min_in)
    log_cdf_plus = jnp.log(jnp.maximum(cdf_plus, 1e-12))
    log_one_minus_cdf_min = jnp.log(jnp.maximum(1.0 - cdf_min, 1e-12))
    cdf_delta = cdf_plus - cdf_min
    return jnp.where(
        x < -0.999,
        log_cdf_plus,
        jnp.where(
            x > 0.999,
            log_one_minus_cdf_min,
            jnp.log(jnp.maximum(cdf_delta, 1e-12)),
        ),
    )


def mean_flat(x):
    return jnp.mean(x, axis=tuple(range(1, x.ndim)))


def huber(x, y, beta: float = 0.1):
    """Smooth-L1 with beta (gaussian_diffusion.py `_huber` equivalent)."""
    diff = x - y
    abs_diff = jnp.abs(diff)
    return jnp.where(abs_diff < beta, 0.5 * diff**2 / beta, abs_diff - 0.5 * beta)


def vb_terms_bpd(sched: DiffusionSchedule, model_fn, x_start, x_t, t, clip_denoised=True):
    """Variational-bound term at one t, bits/dim (gaussian_diffusion.py:817-850)."""
    true_mean, _, true_log_var = q_posterior_mean_variance(sched, x_start, x_t, t)
    out = p_mean_variance(sched, model_fn, x_t, t, clip_denoised)
    kl = normal_kl(true_mean, true_log_var, out["mean"], out["log_variance"])
    kl = mean_flat(kl) / jnp.log(2.0)
    decoder_nll = -discretized_gaussian_log_likelihood(
        x_start, out["mean"], 0.5 * out["log_variance"]
    )
    decoder_nll = mean_flat(decoder_nll) / jnp.log(2.0)
    output = jnp.where(t == 0, decoder_nll, kl)
    return {"output": output, "pred_xstart": out["pred_xstart"]}


def training_losses(
    sched: DiffusionSchedule,
    model_fn,
    x_start,
    t,
    noise,
    loss_type: str = "MSE",
    huber_beta: float = 0.1,
):
    """Voxel-space diffusion losses (gaussian_diffusion.py:852-968). Exposed
    for parity — HoloDiffusion's actual supervision is photometric (see
    holo_model.py)."""
    x_t = q_sample(sched, x_start, t, noise)
    if loss_type in ("KL", "RESCALED_KL"):
        out = vb_terms_bpd(sched, model_fn, x_start, x_t, t, clip_denoised=False)
        loss = out["output"]
        if loss_type == "RESCALED_KL":
            loss = loss * sched.num_timesteps
        return {"loss": loss}

    model_output = model_fn(x_t, _scale_timesteps(sched, t))
    target = {
        PREVIOUS_X: q_posterior_mean_variance(sched, x_start, x_t, t)[0],
        START_X: x_start,
        EPSILON: noise,
        SCALED_EPSILON_FOR_START_X: x_t - x_start,
    }[sched.model_mean_type]
    if loss_type == "HUBER":
        loss = mean_flat(huber(target, model_output, huber_beta))
    else:
        loss = mean_flat((target - model_output) ** 2)
    return {"loss": loss, "model_output": model_output, "x_t": x_t}


def calc_bpd_loop(sched: DiffusionSchedule, model_fn, x_start, rng, clip_denoised=True):
    """Total bits/dim over all timesteps via lax.scan
    (gaussian_diffusion.py:988-1043)."""
    B = x_start.shape[0]
    ts = jnp.arange(sched.num_timesteps - 1, -1, -1)
    rngs = jax.random.split(rng, ts.shape[0])

    def body(carry, inp):
        t_scalar, step_rng = inp
        t = jnp.full((B,), t_scalar, jnp.int32)
        noise = jax.random.normal(step_rng, x_start.shape)
        x_t = q_sample(sched, x_start, t, noise)
        out = vb_terms_bpd(sched, model_fn, x_start, x_t, t, clip_denoised)
        eps = predict_eps_from_xstart(sched, x_t, t, out["pred_xstart"])
        return carry + out["output"], (out["output"], mean_flat((eps - noise) ** 2))

    total, (vb, mse) = jax.lax.scan(body, jnp.zeros((B,)), (ts, rngs))
    prior_mean, _, prior_logvar = q_mean_variance(
        sched, x_start, jnp.full((B,), sched.num_timesteps - 1, jnp.int32)
    )
    prior_bpd = mean_flat(
        normal_kl(prior_mean, prior_logvar, jnp.zeros_like(prior_mean), jnp.zeros_like(prior_logvar))
    ) / jnp.log(2.0)
    return {
        "total_bpd": total + prior_bpd,
        "prior_bpd": prior_bpd,
        "vb": vb.T,
        "mse": mse.T,
    }


# ---------------------------------------------------------------------------
# Timestep samplers (timestep_sampler.py)
# ---------------------------------------------------------------------------


def uniform_sample_timesteps(sched: DiffusionSchedule, batch: int, rng: jax.Array):
    """UniformSampler (timestep_sampler.py:67-73): t ~ U[0, T); weights = 1/p."""
    t = jax.random.randint(rng, (batch,), 0, sched.num_timesteps)
    weights = jnp.ones((batch,), jnp.float32)
    return t, weights


@struct.dataclass
class LossSecondMomentState:
    """State for LossSecondMomentResampler (timestep_sampler.py:130-160).

    A replicated ring buffer of per-timestep loss histories. The reference
    syncs ranks with dist.all_gather (timestep_sampler.py:89-110); here the
    update runs identically on every device inside the SPMD program after a
    `lax.all_gather` of (t, loss) pairs — see `parallel/collectives.py`.
    """

    loss_history: jnp.ndarray  # (T, history)
    loss_counts: jnp.ndarray  # (T,) int32

    @classmethod
    def create(cls, num_timesteps: int, history_per_term: int = 10):
        return cls(
            loss_history=jnp.zeros((num_timesteps, history_per_term)),
            loss_counts=jnp.zeros((num_timesteps,), jnp.int32),
        )


def loss_aware_weights(
    state: LossSecondMomentState, uniform_prob: float = 0.001
) -> jnp.ndarray:
    """sqrt-second-moment weights with uniform mixing (timestep_sampler.py:141-152)."""
    T, H = state.loss_history.shape
    warmed_up = jnp.all(state.loss_counts == H)
    w = jnp.sqrt(jnp.mean(state.loss_history**2, axis=-1))
    w = w / jnp.maximum(jnp.sum(w), 1e-12)
    w = w * (1 - uniform_prob) + uniform_prob / T
    return jnp.where(warmed_up, w, jnp.full((T,), 1.0 / T))


def loss_aware_sample_timesteps(
    sched: DiffusionSchedule,
    state: LossSecondMomentState,
    batch: int,
    rng: jax.Array,
):
    w = loss_aware_weights(state)
    t = jax.random.categorical(rng, jnp.log(w + 1e-20), shape=(batch,))
    weights = 1.0 / (sched.num_timesteps * w[t])
    return t, weights


def loss_aware_update(
    state: LossSecondMomentState,
    ts: jnp.ndarray,
    losses: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
) -> LossSecondMomentState:
    """Insert (t, loss) pairs into the ring buffer. `ts`/`losses` should be the
    all-gathered global batch so every replica applies the same update
    (deterministic replicated update, timestep_sampler.py:112-127).

    mask: optional (K,) bool — entries with mask=False are skipped (static
    scan length, masked carry update). Used to withhold credit for the
    bootstrap timestep on steps where the bootstrap branch was not selected.
    """
    T, H = state.loss_history.shape
    if mask is None:
        mask = jnp.ones(ts.shape, bool)

    def insert(carry, inp):
        hist, counts = carry
        t, loss, valid = inp
        cnt = counts[t]
        # ring-buffer shift when full, else append at cnt
        row = hist[t]
        shifted = jnp.concatenate([row[1:], jnp.array([loss])])
        appended = row.at[jnp.minimum(cnt, H - 1)].set(loss)
        new_row = jnp.where(cnt == H, shifted, appended)
        hist = hist.at[t].set(jnp.where(valid, new_row, row))
        counts = counts.at[t].set(jnp.where(valid, jnp.minimum(cnt + 1, H), cnt))
        return (hist, counts), None

    (hist, counts), _ = jax.lax.scan(
        insert, (state.loss_history, state.loss_counts), (ts, losses, mask)
    )
    return LossSecondMomentState(loss_history=hist, loss_counts=counts)


def update_ema(ema_params, params, rate: float = 0.9999):
    """EMA of parameters (nn.py:61-71 `update_ema`): ema <- ema*rate +
    (1-rate)*params. Exposed for parity; the release training does not use
    EMA."""
    return jax.tree.map(lambda e, p: e * rate + (1.0 - rate) * p, ema_params, params)


def create_named_schedule_sampler(name: str, sched: DiffusionSchedule):
    """Name-based timestep-sampler factory (timestep_sampler.py:14-26).

    Returns (sample_fn(batch, rng[, state]) -> (t, weights), initial_state);
    state is None for "uniform", a LossSecondMomentState for
    "loss-second-moment" (update it with `loss_aware_update` on the
    all-gathered per-t losses).
    """
    if name == "uniform":
        return (
            lambda batch, rng, state=None: uniform_sample_timesteps(
                sched, batch, rng
            ),
            None,
        )
    if name == "loss-second-moment":
        state0 = LossSecondMomentState.create(sched.num_timesteps)
        return (
            lambda batch, rng, state: loss_aware_sample_timesteps(
                sched, state, batch, rng
            ),
            state0,
        )
    raise NotImplementedError(f"unknown schedule sampler: {name}")


_SCHEDULE_CONFIG_KEYS = (
    "schedule_name",
    "num_steps",
    "beta_start_unscaled",
    "beta_end_unscaled",
    "model_mean_type",
    "model_var_type",
)


def make_named_schedule_from_config(diffusion_args) -> "DiffusionSchedule":
    """Build a DiffusionSchedule from the model's `diffusion_args` dict,
    ignoring non-schedule keys (e.g. `schedule_sampler_type`,
    diffusion_utils.py:97)."""
    return make_named_schedule(
        **{
            k: v
            for k, v in (diffusion_args or {}).items()
            if k in _SCHEDULE_CONFIG_KEYS
        }
    )
