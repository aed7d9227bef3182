"""Normalizing flows for SMC preconditioning (pure JAX + optax).

The reference delegates to pocoMC, whose preconditioner is a normalizing
flow trained on the current particle population (src/mcmc.py:752-819 wraps
it; the flow itself lives in the external package).  This is a from-scratch
RealNVP: alternating-mask affine coupling layers with small MLP
conditioners, plus a moment-matching affine pre-layer so training starts
from whitened data.

API (all pure functions over a parameter pytree):

- :func:`init_flow`     -- parameters for ``ndim`` inputs
- :func:`flow_forward`  -- data -> latent, with log |det dz/du|
- :func:`flow_inverse`  -- latent -> data, with log |det du/dz|
- :func:`flow_logprob`  -- log q(u) under the flow
- :func:`fit_flow`      -- weighted maximum likelihood with Adam (jitted scan)
- :func:`fit_flow_dynamic` -- same fit with a TRACED step budget, for
  callers that fuse the fit into a larger jitted program (the SMC loop)

Conventions: ``forward`` maps data ``u`` to latent ``z`` trained toward
N(0, I); coupling scales are tanh-bounded for stability.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax import lax


class FlowConfig(NamedTuple):
    n_layers: int = 6
    hidden: int = 64
    # tanh bound on per-layer log-scales: with weight decay this prevents
    # the flow from collapsing probability mass onto the training points
    max_log_scale: float = 1.0
    weight_decay: float = 1e-2
    # coupling transform: "rqs" (monotonic rational-quadratic splines, the
    # neural-spline-flow family pocoMC's preconditioner defaults to; more
    # expressive on non-Gaussian populations) or "affine" (RealNVP)
    coupling: str = "rqs"
    rqs_bins: int = 8
    rqs_bound: float = 5.0  # spline support [-B, B]; identity tails outside


def _mlp_init(rng, sizes, np_dtype):
    """He-normal MLP init in HOST numpy: building parameters with eager
    jax.random ops costs one remote XLA compile per op/shape on some
    runtimes (measured: 7.6 s of init_flow before this was host-side)."""
    params = []
    for din, dout in zip(sizes[:-1], sizes[1:]):
        w = (rng.standard_normal((din, dout)) * np.sqrt(2.0 / din)).astype(
            np_dtype
        )
        params.append({"w": w, "b": np.zeros((dout,), np_dtype)})
    # zero-init the last layer: the flow starts as the identity
    params[-1]["w"] = np.zeros_like(params[-1]["w"])
    return params


def _mlp_apply(params, x):
    for i, layer in enumerate(params):
        x = x @ layer["w"] + layer["b"]
        if i < len(params) - 1:
            x = jax.nn.gelu(x)
    return x


def _conditioner_width(ndim: int, config: FlowConfig) -> int:
    if config.coupling == "rqs":
        return ndim * (3 * config.rqs_bins + 1)
    return 2 * ndim


def init_flow(key, ndim: int, config: FlowConfig = FlowConfig(), dtype=jnp.float32):
    """Initialize flow parameters (identity transform at init).

    Deterministic in ``key`` (the key data seeds a host RNG); all arrays are
    built in numpy and uploaded with ``jnp.asarray`` -- zero XLA compiles.
    """
    if config.coupling not in ("rqs", "affine"):
        # a typo'd coupling kind would otherwise silently select the
        # affine branch (_conditioner_width/_coupling test only == "rqs")
        raise ValueError(
            f"unknown coupling {config.coupling!r}: use 'rqs' or 'affine'"
        )
    np_dtype = np.dtype(jnp.dtype(dtype).name)
    seed = np.asarray(jax.random.key_data(key)).astype(np.uint32).ravel()
    rng = np.random.default_rng(seed.tolist())
    out_dim = _conditioner_width(ndim, config)
    layers = []
    for _ in range(config.n_layers):
        # NOTE: the alternating binary mask is NOT a parameter -- it is
        # recomputed inside _coupling.  (A trainable mask leaf silently
        # breaks the triangular-Jacobian logdet once the optimizer -- or
        # AdamW weight decay -- moves it off exactly 0/1.)
        layers.append({
            "mlp": _mlp_init(
                rng, [ndim, config.hidden, config.hidden, out_dim], np_dtype
            ),
        })
    host = {
        "layers": layers,
        # affine pre-layer (data whitening); set by fit_flow
        "pre_mean": np.zeros((ndim,), np_dtype),
        "pre_log_scale": np.zeros((ndim,), np_dtype),
    }
    return jax.tree.map(jnp.asarray, host)


def _layer_mask(i: int, ndim: int, dtype):
    return (((jnp.arange(ndim) + i) % 2) == 0).astype(dtype)


# --------------------------------------------------------------- RQS splines

_MIN_BIN = 1e-3
_SOFTPLUS_INV_1 = 0.5413248546129181  # softplus(x) = 1


def _rqs_transform(x, raw, config: FlowConfig, inverse: bool):
    """Monotonic rational-quadratic spline (Durkan et al., NSF).

    ``x`` (..., d), ``raw`` (..., d, 3K+1).  Identity outside [-B, B]
    (boundary derivatives pinned to 1); zero raw parameters give the exact
    identity, matching the zero-initialized conditioner.
    Returns (y, per-element logdet).
    """
    k_bins = config.rqs_bins
    b = config.rqs_bound
    raw_w = raw[..., :k_bins]
    raw_h = raw[..., k_bins : 2 * k_bins]
    raw_d = raw[..., 2 * k_bins :]  # (K+1)

    widths = jax.nn.softmax(raw_w, axis=-1)
    widths = _MIN_BIN + (1 - _MIN_BIN * k_bins) * widths
    heights = jax.nn.softmax(raw_h, axis=-1)
    heights = _MIN_BIN + (1 - _MIN_BIN * k_bins) * heights
    derivs = jax.nn.softplus(raw_d + _SOFTPLUS_INV_1)
    # pin boundary derivatives to 1 for C1 identity tails
    ones = jnp.ones_like(derivs[..., :1])
    derivs = jnp.concatenate([ones, derivs[..., 1:-1], ones], axis=-1)

    cum_w = jnp.concatenate(
        [jnp.zeros_like(widths[..., :1]), jnp.cumsum(widths, axis=-1)], axis=-1
    ) * (2 * b) - b
    cum_h = jnp.concatenate(
        [jnp.zeros_like(heights[..., :1]), jnp.cumsum(heights, axis=-1)], axis=-1
    ) * (2 * b) - b

    inside = (x > -b) & (x < b)
    x_safe = jnp.clip(x, -b + 1e-6, b - 1e-6)
    grid = cum_h if inverse else cum_w
    # bin index via comparison sum (K is small; avoids searchsorted)
    idx = jnp.sum(
        (x_safe[..., None] >= grid[..., 1:-1]).astype(jnp.int32), axis=-1
    )

    def take(a):
        return jnp.take_along_axis(a, idx[..., None], axis=-1)[..., 0]

    w_k = take(widths) * (2 * b)
    h_k = take(heights) * (2 * b)
    x_k = take(cum_w[..., :-1])
    y_k = take(cum_h[..., :-1])
    d_k = take(derivs[..., :-1])
    d_k1 = take(derivs[..., 1:])
    s_k = h_k / w_k

    if not inverse:
        xi = (x_safe - x_k) / w_k
        xi1m = xi * (1 - xi)
        denom = s_k + (d_k1 + d_k - 2 * s_k) * xi1m
        y = y_k + h_k * (s_k * xi**2 + d_k * xi1m) / denom
        deriv = (
            s_k**2 * (d_k1 * xi**2 + 2 * s_k * xi1m + d_k * (1 - xi) ** 2)
        ) / denom**2
        out = jnp.where(inside, y, x)
        logdet = jnp.where(inside, jnp.log(deriv), 0.0)
        return out, logdet

    # inverse: solve the quadratic a xi^2 + b xi + c = 0 for xi
    y_rel = x_safe - y_k
    a_q = h_k * (s_k - d_k) + y_rel * (d_k1 + d_k - 2 * s_k)
    b_q = h_k * d_k - y_rel * (d_k1 + d_k - 2 * s_k)
    c_q = -s_k * y_rel
    disc = jnp.maximum(b_q**2 - 4 * a_q * c_q, 0.0)
    xi = 2 * c_q / (-b_q - jnp.sqrt(disc))
    xi = jnp.clip(xi, 0.0, 1.0)
    xi1m = xi * (1 - xi)
    denom = s_k + (d_k1 + d_k - 2 * s_k) * xi1m
    deriv = (
        s_k**2 * (d_k1 * xi**2 + 2 * s_k * xi1m + d_k * (1 - xi) ** 2)
    ) / denom**2
    out = jnp.where(inside, x_k + xi * w_k, x)
    logdet = jnp.where(inside, -jnp.log(deriv), 0.0)
    return out, logdet


def _coupling(layer, i, u, config: FlowConfig, inverse: bool):
    ndim = u.shape[-1]
    mask = _layer_mask(i, ndim, u.dtype)
    h = _mlp_apply(layer["mlp"], u * mask)
    if config.coupling == "rqs":
        raw = h.reshape(*u.shape, 3 * config.rqs_bins + 1)
        y, logdet_elem = _rqs_transform(u, raw, config, inverse)
        out = jnp.where(mask > 0, u, y)
        logdet = jnp.sum(logdet_elem * (1 - mask), axis=-1)
        return out, logdet
    raw_s, t = h[..., :ndim], h[..., ndim:]
    s = config.max_log_scale * jnp.tanh(raw_s / config.max_log_scale)
    s = s * (1 - mask)
    t = t * (1 - mask)
    if inverse:
        out = (u - t) * jnp.exp(-s)
        logdet = -jnp.sum(s, axis=-1)
    else:
        out = u * jnp.exp(s) + t
        logdet = jnp.sum(s, axis=-1)
    return out, logdet


@partial(jax.jit, static_argnames=("config",))
def flow_forward(params, u, config: FlowConfig = FlowConfig()):
    """Data -> latent. Returns (z, log|det dz/du|); u (b, d)."""
    scale = jnp.exp(-params["pre_log_scale"])
    x = (u - params["pre_mean"]) * scale
    logdet = jnp.sum(-params["pre_log_scale"]) * jnp.ones(
        u.shape[0], dtype=u.dtype
    )
    for i, layer in enumerate(params["layers"]):
        x, ld = _coupling(layer, i, x, config, inverse=False)
        logdet = logdet + ld
    return x, logdet


@partial(jax.jit, static_argnames=("config",))
def flow_inverse(params, z, config: FlowConfig = FlowConfig()):
    """Latent -> data. Returns (u, log|det du/dz|); z (b, d)."""
    x = z
    logdet = jnp.zeros(z.shape[0], dtype=z.dtype)
    n_layers = len(params["layers"])
    for i, layer in zip(
        reversed(range(n_layers)), reversed(params["layers"])
    ):
        x, ld = _coupling(layer, i, x, config, inverse=True)
        logdet = logdet + ld
    u = x * jnp.exp(params["pre_log_scale"]) + params["pre_mean"]
    logdet = logdet + jnp.sum(params["pre_log_scale"])
    return u, logdet


def flow_logprob(params, u, config: FlowConfig = FlowConfig()):
    """log q(u) = log N(z; 0, I) + log|det dz/du|."""
    z, logdet = flow_forward(params, u, config)
    d = u.shape[-1]
    log_n = -0.5 * jnp.sum(z**2, axis=-1) - 0.5 * d * jnp.log(2.0 * jnp.pi)
    return log_n + logdet


def _whiten_and_normalize(params, u, weights):
    """Normalized weights + params with the pre-layer set from the weighted
    moments (the shared preamble of every flow fit)."""
    w = weights / jnp.sum(weights)
    mean = jnp.sum(w[:, None] * u, axis=0)
    var = jnp.sum(w[:, None] * (u - mean) ** 2, axis=0)
    params = dict(params)
    params["pre_mean"] = mean
    params["pre_log_scale"] = 0.5 * jnp.log(var + 1e-12)
    return params, w


def _make_adam_step(u, w, config: FlowConfig, lr: float):
    """(opt, adam_step) for a weighted max-likelihood fit on ``u``."""
    # weight decay must not touch the frozen pre-layer: adamw decays ALL
    # parameters even when their gradients are zeroed
    def decay_mask(p):
        return {
            "layers": jax.tree.map(lambda _: True, p["layers"]),
            "pre_mean": False,
            "pre_log_scale": False,
        }

    opt = optax.adamw(lr, weight_decay=config.weight_decay, mask=decay_mask)

    def loss_fn(p):
        return -jnp.sum(w * flow_logprob(p, u, config))

    def adam_step(p, s):
        loss, grads = jax.value_and_grad(loss_fn)(p)
        # Freeze the whitening pre-layer: it is set from the data moments
        # above.  Letting the optimizer move pre_log_scale gives the model an
        # unbounded logdet term -- the tanh-bounded couplings then overfit
        # spikes onto the training points (observed: avg logprob blowing past
        # the true entropy).  With it frozen the total logdet is bounded by
        # n_layers * max_log_scale.
        grads["pre_mean"] = jnp.zeros_like(grads["pre_mean"])
        grads["pre_log_scale"] = jnp.zeros_like(grads["pre_log_scale"])
        updates, s = opt.update(grads, s, p)
        p = optax.apply_updates(p, updates)
        return p, s, loss

    return opt, adam_step


def fit_flow_dynamic(
    params,
    u: jnp.ndarray,
    weights: jnp.ndarray,
    steps,
    *,
    config: FlowConfig = FlowConfig(),
    lr: float = 1e-3,
    patience: int = 0,
):
    """:func:`fit_flow` body with a TRACEABLE step budget.

    ``steps`` may be a traced int32 scalar, so one compiled program serves
    every budget -- the SMC loop fuses this into its per-iteration device
    program and shares it between the cold first fit and the shorter
    warm-started refits (a static ``steps`` would compile each budget
    separately; a fresh-process SMC run paid one extra multi-second remote
    compile exactly for that).  Early stopping runs with ``patience > 0``
    as in :func:`fit_flow`; ``patience <= 0`` disables it (the loop always
    runs ``steps`` iterations).  NOT jitted itself: call it inside a jitted
    caller (or use :func:`fit_flow`, which wraps it).
    """
    params, w = _whiten_and_normalize(params, u, weights)
    opt, adam_step = _make_adam_step(u, w, config, lr)
    # clamp a zero/negative traced budget to one step: a 0-step loop would
    # return the large-finite sentinel as the "loss" (polluting the SMC
    # per-iteration stats) and, in the static wrapper, crash on losses[-1]
    steps = jnp.maximum(jnp.asarray(steps, jnp.int32), 1)
    opt_state = opt.init(params)

    # large FINITE sentinel: with +inf, `best - tol*|best|` is inf-inf = NaN
    # and the first step would never count as an improvement
    big = jnp.asarray(jnp.finfo(u.dtype).max / 8, u.dtype)

    def cond(carry):
        _, _, i, _, since, _ = carry
        keep = i < steps
        if patience > 0:
            keep &= since < patience
        return keep

    def body(carry):
        p, s, i, best, since, best_p = carry
        # adam_step's loss is evaluated at the PRE-update p, so p (not the
        # updated params) is the candidate best; returning the best-seen
        # params rather than the last ones means the patience window's
        # post-plateau drift is never shipped to the caller
        p_new, s, loss = adam_step(p, s)
        take = loss < best
        best_p = jax.tree_util.tree_map(
            lambda b, c: jnp.where(take, c, b), best_p, p
        )
        improved = loss < best - 1e-3 * jnp.abs(best)
        best = jnp.minimum(best, loss)
        since = jnp.where(improved, 0, since + 1)
        return p_new, s, i + 1, best, since, best_p

    _, _, _, best, _, best_params = lax.while_loop(
        cond, body, (params, opt_state, jnp.asarray(0, jnp.int32), big,
                     jnp.asarray(0, jnp.int32), params)
    )
    return best_params, best


@partial(jax.jit, static_argnames=("config", "steps", "patience"))
def fit_flow(
    params,
    u: jnp.ndarray,
    weights: jnp.ndarray,
    key: jax.Array,
    *,
    config: FlowConfig = FlowConfig(),
    steps: int = 300,
    lr: float = 1e-3,
    patience: int = 0,
):
    """Weighted maximum-likelihood fit on samples ``u`` (b, d).

    Re-initializes the whitening pre-layer from the weighted moments, then
    runs up to ``steps`` full-batch Adam iterations.  With ``patience > 0``
    the loop stops early (``lax.while_loop``) once the loss has not
    improved on its best by more than 0.1% of |best| for ``patience``
    consecutive steps -- warm-started refits inside the SMC loop plateau
    quickly, and steps after the plateau are pure waste.  Returns
    (params, final_loss).

    ``key`` is currently UNUSED -- the fit is deterministic (full-batch
    gradients, no dropout/minibatching); the parameter is kept so callers
    don't churn if stochastic fitting (minibatch Adam) is ever added.
    """
    if steps < 1:
        # a 0-step scan would crash on losses[-1]; a fit that runs no
        # steps is a caller bug, so fail loudly at the API boundary
        raise ValueError(f"steps must be >= 1, got {steps}")
    if patience <= 0:
        # exact fixed-length schedule: a scan keeps the historical
        # "final_loss is the LAST step's loss" contract (the while_loop
        # path returns the BEST loss instead)
        params, w = _whiten_and_normalize(params, u, weights)
        opt, adam_step = _make_adam_step(u, w, config, lr)
        opt_state = opt.init(params)

        def step(carry, _):
            p, s = carry
            p, s, loss = adam_step(p, s)
            return (p, s), loss

        (params, _), losses = lax.scan(
            step, (params, opt_state), None, length=steps
        )
        return params, losses[-1]

    return fit_flow_dynamic(
        params, u, weights, steps, config=config, lr=lr, patience=patience
    )
