"""Prioritized replay + hindsight experience replay, fully on device.

Behavioral parity with /root/reference/common/utils.py:
- ``PrioritizedReplay`` (:260-371): FIFO wrap-around insertion, priority^exp
  categorical sampling, importance weights ``((1/limit)/p[i])^beta``
  normalized by their max, and ``update_priorities``. The reference keeps the
  buffer in host tf.Variables mutated from a single thread; here the buffer
  is a pytree of device arrays in the train state, insert is a
  ``dynamic_update_slice``-style scatter, and sampling is a masked
  categorical draw — all inside ``jit``, so off-policy agents keep the
  fused rollout→insert→sample→train step on device. Sharding over a mesh
  axis shards items (parallel/dp.py path rules treat ``replay/*`` leaves as
  item-sharded).
- ``HindsightExperienceReplay`` (:373-458): 'future'-strategy goal
  substitution with probability p inside the sampled window, reward
  recomputation via ``compute_reward_fn``, and subsampling windows into
  unrolls of ``unroll_length + 1``.

For Atari-cloud-scale buffers (~85 GB, SURVEY §7 "hard parts") the shipped
host-RAM backend is ``replay_host.py`` (numpy ring + prefetch thread
overlapping gather with H2D); the API (init/insert/sample/update_priorities
as pure state transitions) is shared between backends.
"""

from typing import Any, Callable, NamedTuple, Tuple

import jax
import jax.numpy as jnp

from seed_rl_tpu.utils import debug_asserts


class ReplayState(NamedTuple):
    buffer: Any  # pytree, leaves [size, ...]
    priorities: jnp.ndarray  # f32[size]
    insert_index: jnp.ndarray  # i32[] next slot (mod size)
    num_inserted: jnp.ndarray  # i32[] total items inserted, capped at size+1
    # num_inserted saturates at `size` once full (avoids int32 overflow on
    # multi-billion-insert runs; only min(num_inserted, size) is ever used).


class PrioritizedReplay:
    def __init__(self, size: int, importance_sampling_exponent: float):
        self.size = size
        self.importance_sampling_exponent = importance_sampling_exponent

    def init_state(self, example_item) -> ReplayState:
        """``example_item``: pytree of one item (no leading batch dim).

        Multi-axis item leaves (frames, q-value sequences, …) are stored
        flattened to ``[size, prod(item_shape)]``. 2D row-major arrays are
        layout-neutral: XLA's layout assignment otherwise propagates a
        consumer-friendly (e.g. conv-input) tiled layout through the sample
        gather onto the whole buffer, and every sample then relayouts the
        full buffer — measured at 183 ms per step on a 437 MB frame buffer
        (TPU v5e) vs 0.05 ms for the same gather on the flat layout.
        """
        self._item_shapes = jax.tree.map(jnp.shape, example_item)
        buffer = jax.tree.map(
            lambda x: jnp.zeros(
                (self.size, int(jnp.size(x)))
                if jnp.ndim(x) >= 2
                else (self.size,) + jnp.shape(x),
                jnp.asarray(x).dtype,
            ),
            example_item,
        )
        return ReplayState(
            buffer=buffer,
            priorities=jnp.zeros((self.size,), jnp.float32),
            insert_index=jnp.zeros((), jnp.int32),
            num_inserted=jnp.zeros((), jnp.int32),
        )

    def _flatten_batch(self, values):
        """Leaves [n, *item_shape] -> [n, flat] (multi-axis items only)."""
        return jax.tree.map(
            lambda v: v.reshape((v.shape[0], -1)) if v.ndim >= 3 else v,
            values,
        )

    def _unflatten_batch(self, batch_values):
        """Inverse of ``_flatten_batch`` using the recorded item shapes."""
        return jax.tree.map(
            lambda v, s: v.reshape((v.shape[0],) + s) if len(s) >= 2 else v,
            batch_values,
            self._item_shapes,
        )

    def insert(
        self, state: ReplayState, values, priorities
    ) -> Tuple[ReplayState, jnp.ndarray]:
        """FIFO insert of a batch; returns (state, inserted indices).

        Ring slots are consecutive, so when the batch does not wrap the
        write is a ``dynamic_update_slice`` — measured 40x faster than a
        row scatter on the wide flat frame buffer (9.8 ms vs 388 ms for
        256 x 834 KB rows on TPU v5e; XLA lowers the scatter to a
        per-row-indexed loop, the slice to a bulk copy). Wraparound falls
        back to the scatter; with ``size % insert_batch == 0`` (both fused
        learners) the fast path is taken every step.
        """
        batch = jnp.shape(priorities)[0]
        start = state.insert_index
        # Contract (SURVEY §5, --debug_asserts): NaN/negative priorities
        # would silently poison the categorical sampler downstream.
        debug_asserts.check(
            jnp.all(jnp.isfinite(jnp.asarray(priorities, jnp.float32)))
            & jnp.all(jnp.asarray(priorities, jnp.float32) >= 0.0),
            "replay.insert: priorities must be finite and >= 0",
        )
        debug_asserts.check(
            (start >= 0) & (start < self.size),
            "replay.insert: insert_index out of ring bounds",
        )
        indices = (
            start + jnp.arange(batch, dtype=jnp.int32)
        ) % self.size
        flat_values = self._flatten_batch(values)

        def contiguous_write(buffer, vals):
            return jax.tree.map(
                lambda b, v: jax.lax.dynamic_update_slice(
                    b, v, (start,) + (jnp.int32(0),) * (b.ndim - 1)
                ),
                buffer,
                vals,
            )

        def wrapping_write(buffer, vals):
            return jax.tree.map(
                lambda b, v: b.at[indices].set(v, unique_indices=True),
                buffer,
                vals,
            )

        buffer = jax.lax.cond(
            start + batch <= self.size,
            contiguous_write,
            wrapping_write,
            state.buffer,
            flat_values,
        )
        new_state = ReplayState(
            buffer=buffer,
            priorities=state.priorities.at[indices].set(
                jnp.asarray(priorities, jnp.float32)
            ),
            insert_index=(state.insert_index + batch) % self.size,
            num_inserted=jnp.minimum(
                state.num_inserted + batch, self.size
            ),
        )
        return new_state, indices

    def sample(
        self,
        state: ReplayState,
        rng,
        num_samples: int,
        priority_exp: float,
    ):
        """Returns (indices i32[n], weights f32[n], items pytree[n, ...])."""
        limit = jnp.minimum(state.num_inserted, self.size)
        # Contract: sampling an empty buffer silently clamps to slot 0 and
        # trains on zeros (reference asserts host-side, utils.py:321).
        debug_asserts.check(
            limit > 0, "replay.sample: buffer is empty"
        )
        valid = jnp.arange(self.size) < limit
        if priority_exp == 0:
            indices = jax.random.randint(
                rng, (num_samples,), 0, jnp.maximum(limit, 1)
            )
            weights = jnp.ones((num_samples,), jnp.float32)
        else:
            logits = priority_exp * jnp.log(
                jnp.maximum(state.priorities, 1e-30)
            )
            logits = jnp.where(valid, logits, -jnp.inf)
            indices = jax.random.categorical(
                rng, logits, shape=(num_samples,)
            )
            log_probs = jax.nn.log_softmax(logits)
            probs = jnp.exp(log_probs[indices])
            weights = (
                (1.0 / jnp.maximum(limit.astype(jnp.float32), 1.0)) / probs
            ) ** self.importance_sampling_exponent
            weights = weights / jnp.max(weights)
        items = self._unflatten_batch(
            jax.tree.map(lambda b: b[indices], state.buffer)
        )
        return indices.astype(jnp.int32), weights, items

    def update_priorities(
        self, state: ReplayState, indices, priorities
    ) -> ReplayState:
        return state._replace(
            priorities=state.priorities.at[indices].set(
                jnp.asarray(priorities, jnp.float32)
            )
        )


class HindsightExperienceReplay(PrioritizedReplay):
    """Future-strategy HER over windows with dict observations.

    Items must be structures with ``env_outputs.observation`` dicts
    containing ``achieved_goal`` and ``desired_goal``, stored item-major
    ``[window, ...]`` per slot; sampling relabels goals and subsamples
    ``unroll_length + 1``-step unrolls.
    """

    def __init__(
        self,
        size: int,
        importance_sampling_exponent: float,
        compute_reward_fn: Callable,
        unroll_length: int,
        substitution_probability: float,
    ):
        super().__init__(size, importance_sampling_exponent)
        self.compute_reward_fn = compute_reward_fn
        self.unroll_length = unroll_length
        self.substitution_probability = substitution_probability

    def sample(self, state, rng, num_samples, priority_exp):
        base_rng, goal_rng, mask_rng, begin_rng = jax.random.split(rng, 4)
        indices, weights, sampled = super().sample(
            state, base_rng, num_samples, priority_exp
        )

        env_outputs = sampled.env_outputs
        observation = dict(env_outputs.observation)
        achieved = observation["achieved_goal"]
        desired = observation["desired_goal"]
        batch_size, time_horizon = achieved.shape[:2]

        def compute_goal_reward(desired_goal):
            # reward[b, t] is for the transition t-1 -> t; the value at t=0 is
            # a placeholder (filtered below by the done mask convention).
            goal_reward = self.compute_reward_fn(
                achieved_goal=achieved[:, 1:],
                desired_goal=desired_goal[:, :-1],
            )
            return jnp.concatenate(
                [jnp.zeros_like(goal_reward[:, :1]), goal_reward], axis=1
            )

        old_goal_reward = compute_goal_reward(desired)

        # Future-strategy goal index: uniform in (t, time_horizon).
        t_range = jnp.arange(time_horizon)
        low = jnp.minimum(t_range + 1, time_horizon - 1)
        u = jax.random.uniform(goal_rng, (batch_size, time_horizon))
        goal_ind = (low + u * (time_horizon - low)).astype(jnp.int32)
        goal_ind = jnp.clip(goal_ind, 0, time_horizon - 1)
        substituted_goal = jnp.take_along_axis(
            achieved, goal_ind[..., None], axis=1
        )

        mask = (
            jax.random.uniform(mask_rng, (batch_size, time_horizon))
            < self.substitution_probability
        ).astype(desired.dtype)
        # No substitution for the last state of an episode (no next state
        # stored for it).
        mask = mask * (~env_outputs.done).astype(desired.dtype)
        mask = mask[..., None]
        observation["desired_goal"] = (
            mask * substituted_goal + (1 - mask) * desired
        )

        new_goal_reward = compute_goal_reward(observation["desired_goal"])
        new_reward = env_outputs.reward + (
            new_goal_reward - old_goal_reward
        ) * (~env_outputs.done).astype(jnp.float32)
        sampled = sampled._replace(
            env_outputs=env_outputs._replace(
                observation=observation, reward=new_reward
            )
        )

        # Subsample unroll_length+1 windows.
        assert time_horizon >= self.unroll_length + 1
        begin = jax.random.randint(
            begin_rng, (batch_size,), 0, time_horizon - self.unroll_length
        )
        window = begin[:, None] + jnp.arange(self.unroll_length + 1)[None, :]

        def subsample(t):
            if t.ndim < 2 or t.shape[1] != time_horizon:
                return t
            idx = window.reshape(window.shape + (1,) * (t.ndim - 2))
            return jnp.take_along_axis(t, idx, axis=1)

        has_state = hasattr(sampled, "agent_state")
        agent_state = sampled.agent_state if has_state else None
        sampled = jax.tree.map(subsample, sampled)
        if has_state:
            sampled = sampled._replace(agent_state=agent_state)
        return indices, weights, sampled
