"""Parametric action distributions in pure JAX.

Capability parity with /root/reference/common/parametric_distribution.py
(categorical :83, multi-categorical :100, tanh-transformed normal with
boundary-corrected log_prob :124-203, clipped-identity normal :205-240,
deterministic-tanh :242, joint/Tuple via blockwise concat :252-275, action
space dispatch :293-332, safe_exp/softplus std transforms :335-365). There is
no TFP dependency: each distribution is a stateless object whose methods are
pure functions of the parameter tensor, so everything traces cleanly under
``jit``/``vmap`` and differentiates where the reference is differentiable
(including reparameterized sampling for the tanh-normal, used by SAC).
"""

import abc
import dataclasses
import math
from typing import Any, Callable, Sequence

import jax
import jax.numpy as jnp
from jax.scipy.stats import norm as _norm

_HALF_LOG_2PI_E = 0.5 * math.log(2.0 * math.pi * math.e)


class ParametricDistribution(abc.ABC):
    """Maps actor-network parameter vectors to a distribution over actions."""

    def __init__(self, param_size: int, reparametrizable: bool):
        self._param_size = param_size
        self._reparametrizable = reparametrizable

    @property
    def param_size(self) -> int:
        return self._param_size

    @property
    def reparametrizable(self) -> bool:
        return self._reparametrizable

    @abc.abstractmethod
    def sample(self, parameters, key):
        """Draws an action sample; differentiable iff reparametrizable."""

    @abc.abstractmethod
    def log_prob(self, parameters, actions):
        """Log-probability of ``actions`` (event dims reduced)."""

    @abc.abstractmethod
    def entropy(self, parameters, key=None):
        """Entropy (may be a single-sample estimate; see tanh variants)."""

    @abc.abstractmethod
    def kl_divergence(self, parameters_a, parameters_b):
        """KL(a || b), event dims reduced."""

    @abc.abstractmethod
    def mode(self, parameters):
        """Deterministic action (used for deterministic/eval inference)."""


class CategoricalDistribution(ParametricDistribution):
    """Single discrete action from logits."""

    def __init__(self, n_actions: int, dtype=jnp.int32):
        super().__init__(param_size=n_actions, reparametrizable=False)
        self._dtype = dtype

    def sample(self, parameters, key):
        return jax.random.categorical(key, parameters).astype(self._dtype)

    def log_prob(self, parameters, actions):
        logp = jax.nn.log_softmax(parameters)
        return jnp.take_along_axis(
            logp, actions[..., None].astype(jnp.int32), axis=-1
        ).squeeze(-1)

    def entropy(self, parameters, key=None):
        logp = jax.nn.log_softmax(parameters)
        return -jnp.sum(jnp.exp(logp) * logp, axis=-1)

    def kl_divergence(self, parameters_a, parameters_b):
        logp_a = jax.nn.log_softmax(parameters_a)
        logp_b = jax.nn.log_softmax(parameters_b)
        return jnp.sum(jnp.exp(logp_a) * (logp_a - logp_b), axis=-1)

    def mode(self, parameters):
        return jnp.argmax(parameters, axis=-1).astype(self._dtype)


class MultiCategoricalDistribution(ParametricDistribution):
    """Independent categoricals over ``n_dimensions`` action dims."""

    def __init__(self, n_dimensions: int, n_actions_per_dim: int,
                 dtype=jnp.int32):
        super().__init__(
            param_size=n_dimensions * n_actions_per_dim,
            reparametrizable=False,
        )
        self._n_dimensions = n_dimensions
        self._n_actions_per_dim = n_actions_per_dim
        self._dtype = dtype

    def _logits(self, parameters):
        return parameters.reshape(
            parameters.shape[:-1]
            + (self._n_dimensions, self._n_actions_per_dim)
        )

    def sample(self, parameters, key):
        return jax.random.categorical(key, self._logits(parameters)).astype(
            self._dtype
        )

    def log_prob(self, parameters, actions):
        logp = jax.nn.log_softmax(self._logits(parameters))
        per_dim = jnp.take_along_axis(
            logp, actions[..., None].astype(jnp.int32), axis=-1
        ).squeeze(-1)
        return jnp.sum(per_dim, axis=-1)

    def entropy(self, parameters, key=None):
        logp = jax.nn.log_softmax(self._logits(parameters))
        return -jnp.sum(jnp.exp(logp) * logp, axis=(-2, -1))

    def kl_divergence(self, parameters_a, parameters_b):
        logp_a = jax.nn.log_softmax(self._logits(parameters_a))
        logp_b = jax.nn.log_softmax(self._logits(parameters_b))
        return jnp.sum(jnp.exp(logp_a) * (logp_a - logp_b), axis=(-2, -1))

    def mode(self, parameters):
        return jnp.argmax(self._logits(parameters), axis=-1).astype(
            self._dtype
        )


@jax.custom_jvp
def safe_exp(x):
    """exp with clipped forward value but full-range gradient dy*exp(clip(x))."""
    return jnp.exp(jnp.clip(x, -15.0, 15.0))


@safe_exp.defjvp
def _safe_exp_jvp(primals, tangents):
    (x,), (dx,) = primals, tangents
    e = jnp.exp(jnp.clip(x, -15.0, 15.0))
    return e, dx * e


def softplus_default_std_fn(scale):
    return jax.nn.softplus(scale) + 1e-3


def safe_exp_std_fn(std_for_zero_param: float, min_std: float):
    std_shift = math.log(std_for_zero_param - min_std)
    return lambda scale: safe_exp(scale + std_shift) + min_std


def _softplus_inverse(y: float) -> float:
    return math.log(math.expm1(y))


def softplus_std_fn(std_for_zero_param: float, min_std: float):
    std_shift = _softplus_inverse(std_for_zero_param - min_std)
    return lambda scale: jax.nn.softplus(scale + std_shift) + min_std


def _tanh_forward_log_det_jacobian(x):
    # log|d tanh(x)/dx| = log(1 - tanh(x)^2) = 2*(log 2 - x - softplus(-2x)).
    return 2.0 * (math.log(2.0) - x - jax.nn.softplus(-2.0 * x))


def _atanh(y):
    return 0.5 * (jnp.log1p(y) - jnp.log1p(-y))


class NormalTanhDistribution(ParametricDistribution):
    """Diagonal normal squashed by tanh; boundary-corrected log_prob.

    Outside ``[-threshold, threshold]`` the log_prob is the log *average*
    density of the corresponding tail, keeping it finite and differentiable
    w.r.t. the parameters (matching the reference's
    TanhTransformedDistribution, parametric_distribution.py:124-177).
    """

    def __init__(self, num_actions: int,
                 gaussian_std_fn: Callable = softplus_default_std_fn,
                 threshold: float = 0.999):
        super().__init__(param_size=2 * num_actions, reparametrizable=True)
        self._std_fn = gaussian_std_fn
        self._threshold = threshold

    def _loc_scale(self, parameters):
        loc, scale = jnp.split(parameters, 2, axis=-1)
        return loc, self._std_fn(scale)

    def sample(self, parameters, key):
        loc, scale = self._loc_scale(parameters)
        eps = jax.random.normal(key, loc.shape, loc.dtype)
        return jnp.tanh(loc + scale * eps)

    def _per_dim_log_prob(self, loc, scale, event):
        threshold = self._threshold
        event = jnp.clip(event, -threshold, threshold)
        x = _atanh(event)
        in_log_prob = _norm.logpdf(
            x, loc, scale
        ) - _tanh_forward_log_det_jacobian(x)

        inverse_threshold = _atanh(jnp.asarray(threshold))
        log_epsilon = math.log(1.0 - threshold)
        # log(average pdf) over the tail beyond the clipping threshold:
        # log P(X <= -t) resp. log P(X >= t), minus log(1 - threshold).
        # For X ~ N(loc, scale): P(X >= t) = Phi((loc - t)/scale).
        log_prob_left = (
            _norm.logcdf(-inverse_threshold, loc, scale) - log_epsilon
        )
        log_prob_right = (
            _norm.logcdf(-inverse_threshold, -loc, scale) - log_epsilon
        )
        return jnp.where(
            event <= -threshold,
            log_prob_left,
            jnp.where(event >= threshold, log_prob_right, in_log_prob),
        )

    def log_prob(self, parameters, actions):
        loc, scale = self._loc_scale(parameters)
        return jnp.sum(self._per_dim_log_prob(loc, scale, actions), axis=-1)

    def entropy(self, parameters, key=None):
        if key is None:
            raise ValueError(
                "NormalTanhDistribution entropy is a single-sample estimate "
                "and needs a PRNG key."
            )
        loc, scale = self._loc_scale(parameters)
        base_entropy = _HALF_LOG_2PI_E + jnp.log(scale)
        x = loc + scale * jax.random.normal(key, loc.shape, loc.dtype)
        return jnp.sum(
            base_entropy + _tanh_forward_log_det_jacobian(x), axis=-1
        )

    def kl_divergence(self, parameters_a, parameters_b):
        # KL between the base normals (the tanh bijector cancels), as in the
        # reference's registered KL for TanhTransformedDistribution.
        loc_a, scale_a = self._loc_scale(parameters_a)
        loc_b, scale_b = self._loc_scale(parameters_b)
        return jnp.sum(
            _normal_kl(loc_a, scale_a, loc_b, scale_b), axis=-1
        )

    def mode(self, parameters):
        loc, _ = self._loc_scale(parameters)
        return jnp.tanh(loc)


def _normal_kl(loc_a, scale_a, loc_b, scale_b):
    var_ratio = jnp.square(scale_a / scale_b)
    return 0.5 * (
        var_ratio
        + jnp.square((loc_a - loc_b) / scale_b)
        - 1.0
        - jnp.log(var_ratio)
    )


class NormalClippedDistribution(ParametricDistribution):
    """Diagonal normal whose *samples* are clipped to [-1, 1].

    The log_prob/entropy are those of the unclipped normal (the reference's
    ClippedIdentity deliberately keeps Identity's log-det-jacobian,
    parametric_distribution.py:205-240).
    """

    def __init__(self, num_actions: int,
                 gaussian_std_fn: Callable = softplus_default_std_fn):
        super().__init__(param_size=2 * num_actions, reparametrizable=True)
        self._std_fn = gaussian_std_fn

    def _loc_scale(self, parameters):
        loc, scale = jnp.split(parameters, 2, axis=-1)
        return loc, self._std_fn(scale)

    def sample(self, parameters, key):
        loc, scale = self._loc_scale(parameters)
        eps = jax.random.normal(key, loc.shape, loc.dtype)
        return jnp.clip(loc + scale * eps, -1.0, 1.0)

    def log_prob(self, parameters, actions):
        loc, scale = self._loc_scale(parameters)
        return jnp.sum(_norm.logpdf(actions, loc, scale), axis=-1)

    def entropy(self, parameters, key=None):
        _, scale = self._loc_scale(parameters)
        return jnp.sum(_HALF_LOG_2PI_E + jnp.log(scale), axis=-1)

    def kl_divergence(self, parameters_a, parameters_b):
        loc_a, scale_a = self._loc_scale(parameters_a)
        loc_b, scale_b = self._loc_scale(parameters_b)
        return jnp.sum(_normal_kl(loc_a, scale_a, loc_b, scale_b), axis=-1)

    def mode(self, parameters):
        loc, _ = self._loc_scale(parameters)
        return jnp.clip(loc, -1.0, 1.0)


class DeterministicTanhDistribution(ParametricDistribution):
    """tanh(parameters); used for deterministic continuous policies."""

    def __init__(self, num_actions: int):
        super().__init__(param_size=num_actions, reparametrizable=True)

    def sample(self, parameters, key):
        del key
        return jnp.tanh(parameters)

    def log_prob(self, parameters, actions):
        raise NotImplementedError(
            "Deterministic distribution has no density."
        )

    def entropy(self, parameters, key=None):
        return jnp.zeros(parameters.shape[:-1], parameters.dtype)

    def kl_divergence(self, parameters_a, parameters_b):
        raise NotImplementedError

    def mode(self, parameters):
        return jnp.tanh(parameters)


class JointDistribution(ParametricDistribution):
    """Concatenation of independent sub-distributions (gym Tuple spaces).

    Actions are concatenated along the last axis in ``dtype_override`` —
    matching tfd.Blockwise in the reference (:252-275). Discrete sub-actions
    occupy one slot each.
    """

    def __init__(self, distributions: Sequence[ParametricDistribution],
                 dtype_override=jnp.float32):
        super().__init__(
            param_size=sum(d.param_size for d in distributions),
            reparametrizable=all(d.reparametrizable for d in distributions),
        )
        self._dists = list(distributions)
        self._dtype = dtype_override

    def _action_width(self, dist: ParametricDistribution) -> int:
        if isinstance(dist, CategoricalDistribution):
            return 1
        if isinstance(dist, MultiCategoricalDistribution):
            return dist._n_dimensions
        return dist.param_size // 2 if dist.reparametrizable else dist.param_size

    def _split_params(self, parameters):
        splits, start = [], 0
        for d in self._dists:
            splits.append(parameters[..., start:start + d.param_size])
            start += d.param_size
        return splits

    def _split_actions(self, actions):
        widths = [self._action_width(d) for d in self._dists]
        splits = []
        start = 0
        for w in widths:
            splits.append(actions[..., start:start + w])
            start += w
        return splits

    def sample(self, parameters, key):
        keys = jax.random.split(key, len(self._dists))
        samples = []
        for dist, params, k in zip(
            self._dists, self._split_params(parameters), keys
        ):
            s = dist.sample(params, k)
            if s.ndim == params.ndim - 1:
                s = s[..., None]
            samples.append(s.astype(self._dtype))
        return jnp.concatenate(samples, axis=-1)

    def log_prob(self, parameters, actions):
        total = 0.0
        for dist, params, act in zip(
            self._dists,
            self._split_params(parameters),
            self._split_actions(actions),
        ):
            if isinstance(dist, CategoricalDistribution):
                act = act.squeeze(-1)
            total = total + dist.log_prob(params, act)
        return total

    def entropy(self, parameters, key=None):
        keys = (
            jax.random.split(key, len(self._dists))
            if key is not None
            else [None] * len(self._dists)
        )
        total = 0.0
        for dist, params, k in zip(
            self._dists, self._split_params(parameters), keys
        ):
            total = total + dist.entropy(params, k)
        return total

    def kl_divergence(self, parameters_a, parameters_b):
        total = 0.0
        for dist, pa, pb in zip(
            self._dists,
            self._split_params(parameters_a),
            self._split_params(parameters_b),
        ):
            total = total + dist.kl_divergence(pa, pb)
        return total

    def mode(self, parameters):
        modes = []
        for dist, params in zip(self._dists, self._split_params(parameters)):
            m = dist.mode(params)
            if m.ndim == params.ndim - 1:
                m = m[..., None]
            modes.append(m.astype(self._dtype))
        return jnp.concatenate(modes, axis=-1)


@dataclasses.dataclass
class ContinuousDistributionConfig:
    """Mirrors the reference's ContinuousDistributionConfig (:345-412)."""

    gaussian_std_fn: Callable = softplus_default_std_fn
    postprocessor: str = "Tanh"
    min_gaussian_std: float = 1e-3


def continuous_action_config(
    action_min_gaussian_std: float = 1e-3,
    action_gaussian_std_fn: str = "softplus",
    action_std_for_zero_param: float = 1.0,
    action_postprocessor: str = "Tanh",
) -> ContinuousDistributionConfig:
    config = ContinuousDistributionConfig()
    config.min_gaussian_std = float(action_min_gaussian_std)
    if action_gaussian_std_fn == "safe_exp":
        config.gaussian_std_fn = safe_exp_std_fn(
            action_std_for_zero_param, config.min_gaussian_std
        )
    elif action_gaussian_std_fn == "softplus":
        config.gaussian_std_fn = softplus_std_fn(
            action_std_for_zero_param, config.min_gaussian_std
        )
    else:
        raise ValueError(
            "action_gaussian_std_fn supports safe_exp and softplus, got: "
            f"{action_gaussian_std_fn}"
        )
    config.postprocessor = action_postprocessor
    return config


def get_parametric_distribution_for_action_space(
    action_space, continuous_config: ContinuousDistributionConfig = None
) -> ParametricDistribution:
    """Dispatch on a gymnasium space: Discrete/MultiDiscrete/Box/Tuple."""
    import gymnasium as gym

    if isinstance(action_space, gym.spaces.Discrete):
        return CategoricalDistribution(int(action_space.n))
    if isinstance(action_space, gym.spaces.MultiDiscrete):
        nvec = list(action_space.nvec)
        if min(nvec) != max(nvec):
            raise ValueError(f"space nvec must be constant: {nvec}")
        return MultiCategoricalDistribution(len(nvec), int(nvec[0]))
    if isinstance(action_space, gym.spaces.Box):
        assert len(action_space.shape) == 1, action_space.shape
        if any(l != -1 for l in action_space.low) or any(
            h != 1 for h in action_space.high
        ):
            raise ValueError(
                "Only actions bounded to [-1, 1] are supported; wrap the env "
                "with UniformBoundActionSpaceWrapper."
            )
        if continuous_config is None:
            continuous_config = ContinuousDistributionConfig()
        if continuous_config.postprocessor == "Tanh":
            return NormalTanhDistribution(
                action_space.shape[0],
                gaussian_std_fn=continuous_config.gaussian_std_fn,
            )
        if continuous_config.postprocessor == "ClippedIdentity":
            return NormalClippedDistribution(
                action_space.shape[0],
                gaussian_std_fn=continuous_config.gaussian_std_fn,
            )
        raise ValueError(
            f"Postprocessor {continuous_config.postprocessor} not supported."
        )
    if isinstance(action_space, gym.spaces.Tuple):
        return JointDistribution(
            [
                get_parametric_distribution_for_action_space(
                    sub, continuous_config
                )
                for sub in action_space.spaces
            ]
        )
    raise ValueError(f"Unsupported action space {action_space}")
