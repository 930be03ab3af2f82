"""Running mean/std trackers as pure state-transition functions.

Capability parity with
/root/reference/agents/policy_gradient/modules/running_statistics.py:
``EMAMeanStd`` (:74-156), ``AverageMeanStd`` (Welford batch updates,
:184-342), ``FixedMeanStd`` (:345-382) and ``TwoLevelAverageMeanStd`` (the
two-level buffer that recovers ~40 mantissa bits from float32, :385-469).

The reference's cross-replica aggregation tricks (SUM/MEAN variable
aggregation + replica divisions) disappear: in the global-array SPMD design
the update sees the *global* batch, so plain reductions are already correct
on any mesh.

Each tracker is a stateless object: ``init_state(size) -> state`` and
``update(state, data) -> state`` with ``mean_std(state) -> (mean, std)``;
``data`` is ``[..., size]`` and reduced over all leading dims.
"""

from typing import NamedTuple, Tuple

import jax.numpy as jnp


class MeanStd:
    """Base: normalize/unnormalize in terms of mean_std(state)."""

    def init_state(self, size: int):
        raise NotImplementedError

    def update(self, state, data):
        raise NotImplementedError

    def mean_std(self, state) -> Tuple[jnp.ndarray, jnp.ndarray]:
        raise NotImplementedError

    def normalize(self, state, x):
        mean, std = self.mean_std(state)
        return (x - mean) / std

    def unnormalize(self, state, x):
        mean, std = self.mean_std(state)
        return std * x + mean


class EMAState(NamedTuple):
    first_moment: jnp.ndarray
    second_moment: jnp.ndarray


class EMAMeanStd(MeanStd):
    """Exponential moving average of the first two (uncentered) moments."""

    def __init__(self, beta=1e-2, std_min_value=1e-6, std_max_value=1e6):
        self._beta = beta
        self._std_min = std_min_value
        self._std_max = std_max_value

    def init_state(self, size: int) -> EMAState:
        return EMAState(
            first_moment=jnp.zeros((size,), jnp.float32),
            second_moment=jnp.ones((size,), jnp.float32),
        )

    def update(self, state: EMAState, data) -> EMAState:
        data = jnp.asarray(data, jnp.float32)
        reduce_dims = tuple(range(data.ndim - 1))
        batch_m1 = jnp.mean(data, axis=reduce_dims)
        batch_m2 = jnp.mean(jnp.square(data), axis=reduce_dims)
        return EMAState(
            first_moment=state.first_moment
            + self._beta * (batch_m1 - state.first_moment),
            second_moment=state.second_moment
            + self._beta * (batch_m2 - state.second_moment),
        )

    def mean_std(self, state: EMAState):
        var = state.second_moment - jnp.square(state.first_moment)
        std = jnp.clip(jnp.sqrt(var), self._std_min, self._std_max)
        return state.first_moment, std


def merge_means(mu1, mu2, n1, n2):
    total = n1 + n2
    return (n1 * mu1 + n2 * mu2) / total


def merge_summed_variances(v1, v2, mu1, mu2, merged_mean, n1, n2):
    return (
        v1
        + n1 * jnp.square(mu1 - merged_mean)
        + v2
        + n2 * jnp.square(mu2 - merged_mean)
    )


class AverageState(NamedTuple):
    observation_count: jnp.ndarray  # f32[size]
    update_count: jnp.ndarray  # i32[]
    mean: jnp.ndarray  # f32[size]
    summed_variance: jnp.ndarray  # f32[size]


class AverageMeanStd(MeanStd):
    """Welford-style running mean/std over all past samples."""

    def __init__(self, std_min_value=1e-6, std_max_value=1e6):
        self._std_min = std_min_value
        self._std_max = std_max_value

    def init_state(self, size: int) -> AverageState:
        return AverageState(
            observation_count=jnp.zeros((size,), jnp.float32),
            update_count=jnp.zeros((), jnp.int32),
            mean=jnp.zeros((size,), jnp.float32),
            summed_variance=jnp.zeros((size,), jnp.float32),
        )

    def update(self, state: AverageState, data) -> AverageState:
        data = jnp.asarray(data, jnp.float32)
        reduce_dims = tuple(range(data.ndim - 1))
        count = jnp.sum(jnp.ones_like(data), axis=reduce_dims)
        observation_count = state.observation_count + count

        diff_to_old_mean = data - state.mean
        mean_update = (
            jnp.sum(diff_to_old_mean, axis=reduce_dims) / observation_count
        )
        mean = state.mean + mean_update

        diff_to_new_mean = data - mean
        variance_update = jnp.sum(
            diff_to_old_mean * diff_to_new_mean, axis=reduce_dims
        )
        return AverageState(
            observation_count=observation_count,
            update_count=state.update_count + 1,
            mean=mean,
            summed_variance=state.summed_variance + variance_update,
        )

    def merge(self, state: AverageState, other: AverageState, alpha=1.0):
        """Merge ``other`` into ``state``; alpha=0 is a no-op (lax-friendly)."""
        new_mean = merge_means(
            state.mean, other.mean,
            state.observation_count, other.observation_count,
        )
        new_sv = merge_summed_variances(
            state.summed_variance, other.summed_variance,
            state.mean, other.mean, new_mean,
            state.observation_count, other.observation_count,
        )
        return AverageState(
            observation_count=state.observation_count
            + alpha * other.observation_count,
            update_count=state.update_count + 1,
            mean=alpha * new_mean + (1.0 - alpha) * state.mean,
            summed_variance=alpha * new_sv
            + (1.0 - alpha) * state.summed_variance,
        )

    def reset(self, state: AverageState, alpha=1.0):
        return AverageState(
            observation_count=(1.0 - alpha) * state.observation_count,
            update_count=((1.0 - alpha) * state.update_count).astype(
                jnp.int32
            ),
            mean=(1.0 - alpha) * state.mean,
            summed_variance=(1.0 - alpha) * state.summed_variance,
        )

    def mean_std(self, state: AverageState):
        # Clipping guarantees an initial std of one (reference :327-337).
        minval = self._std_min * self._std_min
        eff_var = jnp.maximum(minval, state.summed_variance)
        eff_count = jnp.maximum(minval, state.observation_count)
        std = jnp.clip(
            jnp.sqrt(eff_var / eff_count), self._std_min, self._std_max
        )
        return state.mean, std


class FixedMeanStd(MeanStd):
    def __init__(self, mean=0.0, std=1.0):
        self._mean = mean
        self._std = std
        self._size = None

    def init_state(self, size: int):
        self._size = size
        return ()

    def update(self, state, data):
        return state

    def mean_std(self, state):
        vec = jnp.ones((self._size,), jnp.float32)
        return self._mean * vec, self._std * vec


class TwoLevelState(NamedTuple):
    upper: AverageState
    buffer: AverageState


class TwoLevelAverageMeanStd(MeanStd):
    """AverageMeanStd with a periodically-flushed buffer level for precision."""

    def __init__(self, std_min_value=1e-6, std_max_value=1e6, buffer_size=1e5):
        self._std_min = std_min_value
        self._std_max = std_max_value
        self._buffer_size = int(buffer_size)
        self._inner = AverageMeanStd(0.0, float("inf"))

    def init_state(self, size: int) -> TwoLevelState:
        return TwoLevelState(
            upper=self._inner.init_state(size),
            buffer=self._inner.init_state(size),
        )

    def update(self, state: TwoLevelState, data) -> TwoLevelState:
        buffer = self._inner.update(state.buffer, data)
        flush = (buffer.update_count >= self._buffer_size).astype(jnp.float32)
        upper = self._inner.merge(state.upper, buffer, alpha=flush)
        buffer = self._inner.reset(buffer, alpha=flush)
        return TwoLevelState(upper=upper, buffer=buffer)

    def mean_std(self, state: TwoLevelState):
        upper, buffer = state.upper, state.buffer
        total_count = upper.observation_count + buffer.observation_count
        merged_mean = merge_means(
            upper.mean, buffer.mean,
            upper.observation_count, buffer.observation_count,
        )
        merged_sv = merge_summed_variances(
            upper.summed_variance, buffer.summed_variance,
            upper.mean, buffer.mean, merged_mean,
            upper.observation_count, buffer.observation_count,
        )
        merged_sv = jnp.maximum(0.0, merged_sv)
        safe_total = jnp.maximum(total_count, 1.0)
        std = jnp.sqrt(merged_sv / safe_total)
        empty = total_count == 0.0
        mean = jnp.where(empty, jnp.zeros_like(merged_mean), merged_mean)
        std = jnp.where(empty, jnp.ones_like(std), std)
        std = jnp.clip(std, self._std_min, self._std_max)
        return mean, std
