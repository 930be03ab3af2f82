"""Atari network family: conv torso, frame stacking, dueling LSTM DQN.

Capability parity with /root/reference/atari/networks.py:
- conv stack 32x8s4 / 64x4s2 / 64x3s1 + Dense 512 (networks.py:232-240),
- torso appends reward + one-hot prev_action to the conv features (:268-276),
- dueling value/advantage heads with hidden 512, bias-free advantage head,
  mean-centered advantages (:242-252, 278-289),
- LSTM(512) core with done-masked reset (:176-218),
- frame stacking with done masking (:57-173). The reference bit-packs the
  last 3 uint8 frames into an int32 per pixel to cut gRPC transfer cost; on
  device there is no wire, so the stacking state is simply the last
  ``stack_size-1`` uint8 frames carried in the agent state.

TPU structure: every net exposes BOTH a step path (``__call__`` on [B]
inputs, used by the rollout scan) and a time-major training path
(``unroll_time_major`` on [T, B] inputs). The training path folds the conv
torso and the heads over T*B — one giant MXU-friendly batch — and scans
only the small LSTM cell over time (the only genuinely sequential part).
Both paths share parameters by construction: the core is a single
``nn.scan``-wrapped module, and the step path is a length-1 scan.

Compute dtype is configurable: conv/matmul in bfloat16 hits the MXU at full
rate; heads and Q-values stay float32.
"""

from typing import Any, NamedTuple, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from seed_rl_tpu.models.core import lstm_initial_state, reset_state_where_done
from seed_rl_tpu.types import QAgentOutput


class AtariConvTorso(nn.Module):
    """Nature-DQN conv stack + Dense(512). Input: [B, H, W, C] in [0, 255].

    Folding the 1/255 pixel scaling into the first conv's epilogue was
    benchmarked and measured slower on TPU v5e (the astype/255 pass fuses
    into one HBM sweep already; the epilogue variant disturbed XLA's conv
    lowering), so the straightforward form below stands.
    """

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = x.astype(self.dtype) / 255.0
        for features, kernel, stride in ((32, 8, 4), (64, 4, 2), (64, 3, 1)):
            x = nn.relu(
                nn.Conv(
                    features,
                    (kernel, kernel),
                    strides=(stride, stride),
                    padding="VALID",
                    dtype=self.dtype,
                )(x)
            )
        x = x.reshape(x.shape[:-3] + (-1,))
        x = nn.relu(nn.Dense(512, dtype=self.dtype)(x))
        return x.astype(jnp.float32)


def initial_frame_stacking_state(
    stack_size: int, batch_size: int, frame_shape: Tuple[int, int]
):
    """Zero uint8 history of the last stack_size-1 frames."""
    if stack_size == 1:
        return ()
    h, w = frame_shape
    return jnp.zeros((batch_size, h, w, stack_size - 1), jnp.uint8)


def stack_frame(observation, frame_state, done, stack_size: int):
    """Single-step frame stacking with done-masked history reset.

    Args:
      observation: uint8[B, H, W, 1] current frame.
      frame_state: uint8[B, H, W, stack_size-1] previous frames
        (oldest..newest) or () when stack_size == 1.
      done: bool[B].
      stack_size: number of frames in the stack.

    Returns:
      (stacked uint8[B, H, W, stack_size] oldest..newest, new frame_state).
    """
    if stack_size == 1:
        return observation, ()
    zero_state = jnp.zeros_like(frame_state)
    frame_state = reset_state_where_done(done, frame_state, zero_state)
    stacked = jnp.concatenate([frame_state, observation], axis=-1)
    return stacked, stacked[..., 1:]


def stack_frames_time_major(observation, frame_state, done, stack_size: int):
    """Frame stacking over a [T, B, H, W, 1] unroll, vectorized over time.

    Channel ``j`` (oldest..newest) of ``stacked[t]`` is ``obs[t - a]`` with
    age ``a = stack_size-1-j``, zeroed if any episode boundary occurred in
    steps ``t-a+1 .. t`` (done-masked history reset, exactly the semantics of
    scanning ``stack_frame`` over time). Frames older than the unroll come
    from ``frame_state`` and are additionally killed by any done in
    ``0 .. t``. Expressed as shifted slices of one time-padded frame buffer
    with cumulative-done masks: no sequential scan, and the masked
    concatenate fuses into the consumer's input pipeline.

    Returns (stacked uint8[T, B, H, W, stack_size], final frame_state).
    """
    if stack_size == 1:
        return observation, ()

    t_len = observation.shape[0]
    s = stack_size
    # History frames as pseudo-observations at t = -(s-1) .. -1.
    hist = jnp.moveaxis(frame_state, -1, 0)[..., None]
    frames = jnp.concatenate([hist, observation], axis=0)  # [T+s-1, B, ...]
    cum = jnp.cumsum(done.astype(jnp.int32), axis=0)  # [T, B]
    # cum_pad[s-1 + t] = cum[t]; indices < s-1 (t < 0) read 0.
    cum_pad = jnp.concatenate(
        [jnp.zeros((s - 1,) + done.shape[1:], jnp.int32), cum], axis=0
    )
    parts = []
    for j in range(s):
        age = s - 1 - j
        sl = jax.lax.slice_in_dim(frames, j, j + t_len, axis=0)
        if age == 0:
            parts.append(sl)
            continue
        # Survives iff no done in (t-age, t]: cum[t] - cum[t-age] == 0.
        alive = cum_pad[s - 1 : s - 1 + t_len] == cum_pad[j : j + t_len]
        parts.append(sl * alive[..., None, None, None].astype(sl.dtype))
    stacked = jnp.concatenate(parts, axis=-1)
    return stacked, stacked[-1][..., 1:]


class AgentState(NamedTuple):
    """Atari agent state: recurrent core + frame-stacking history."""

    core_state: Any
    frame_stacking_state: Any


class _LSTMCoreStep(nn.Module):
    """(carry, (x, done)) -> (carry, out): done-masked reset + LSTM cell."""

    lstm_size: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, carry, xs):
        x, done = xs
        core_state = reset_state_where_done(
            done, carry, lstm_initial_state((self.lstm_size,), done.shape[0])
        )
        new_core, out = nn.OptimizedLSTMCell(
            self.lstm_size, dtype=self.dtype, name="lstm"
        )(core_state[0], x)
        return (new_core,), jnp.asarray(out, jnp.float32)


def _scanned_core(lstm_size: int, name: str, dtype=jnp.float32):
    """Time-scanned LSTM core; step path calls it with T == 1."""
    return nn.scan(
        _LSTMCoreStep,
        variable_broadcast="params",
        split_rngs={"params": False},
        in_axes=0,
        out_axes=0,
    )(lstm_size, dtype=dtype, name=name)


def _fold_time(fn, x):
    """Apply ``fn`` with [T, B] folded into one batch dim.

    Feeding [T, B, ...] straight into nn.Conv (which accepts leading batch
    dims) was benchmarked ~3% slower than this explicit fold on TPU v5e,
    so the fold stands.

    The optimization barrier pins the fold to the pre-cast (uint8) frames:
    without it XLA hoists the torso's ``astype/255`` above the reshape and
    then relays out the resulting bf16 stack twice (a copy + a reshape of
    4x the bytes, ~14ms/step at bench shapes — traced on TPU v5e). With the
    barrier the relayout happens on uint8 and the convert fuses into the
    first conv's input pipeline (+5% end-to-end on bench.py).
    """
    t, b = x.shape[:2]
    folded = jax.lax.optimization_barrier(x.reshape((t * b,) + x.shape[2:]))
    out = fn(folded)
    return out.reshape((t, b) + out.shape[1:])


class DuelingLSTMDQNNet(nn.Module):
    """Dueling LSTM DQN (R2D2). Step-level: [B] inputs -> (QAgentOutput, state).

    The greedy action is part of the output; epsilon-greedy exploration is
    applied by the R2D2 agent wrapper (the reference applies it in the
    learner's inference fn, agents/r2d2/learner.py:151-177).
    """

    num_actions: int
    frame_shape: Tuple[int, int] = (84, 84)
    stack_size: int = 4
    lstm_size: int = 512
    dtype: jnp.dtype = jnp.float32
    # LSTM compute dtype; keep float32 for Q-learning numerics unless a
    # throughput bench shows bf16 is safe for the workload.
    core_dtype: jnp.dtype = jnp.float32

    @property
    def stateless(self) -> bool:
        return False

    def initial_state(self, batch_size: int) -> AgentState:
        return AgentState(
            core_state=lstm_initial_state((self.lstm_size,), batch_size),
            frame_stacking_state=initial_frame_stacking_state(
                self.stack_size, batch_size, self.frame_shape
            ),
        )

    def setup(self):
        self.torso = AtariConvTorso(dtype=self.dtype, name="torso")
        self.core = _scanned_core(self.lstm_size, "core", self.core_dtype)
        self.hidden_value = nn.Dense(512, name="hidden_value")
        self.value_head = nn.Dense(1, name="value_head")
        self.hidden_advantage = nn.Dense(512, name="hidden_advantage")
        self.advantage_head = nn.Dense(
            self.num_actions, use_bias=False, name="advantage_head"
        )

    def _heads(self, core_out):
        value = self.value_head(nn.relu(self.hidden_value(core_out)))
        advantage = self.advantage_head(
            nn.relu(self.hidden_advantage(core_out))
        )
        advantage = advantage - jnp.mean(advantage, axis=-1, keepdims=True)
        q_values = value + advantage
        action = jnp.argmax(q_values, axis=-1).astype(jnp.int32)
        return QAgentOutput(action, q_values)

    def _torso_with_extras(self, prev_action, env_output, stacked):
        conv_out = self.torso(stacked)
        return jnp.concatenate(
            [
                conv_out,
                env_output.reward[..., None],
                jax.nn.one_hot(prev_action, self.num_actions),
            ],
            axis=-1,
        )

    def __call__(self, prev_action, env_output, agent_state):
        done = env_output.done
        stacked, frame_state = stack_frame(
            env_output.observation,
            agent_state.frame_stacking_state,
            done,
            self.stack_size,
        )
        torso_out = self._torso_with_extras(prev_action, env_output, stacked)
        core, out = self.core(
            agent_state.core_state, (torso_out[None], done[None])
        )
        output = self._heads(out[0])
        return output, AgentState(
            core_state=core, frame_stacking_state=frame_state
        )

    def unroll_time_major(self, prev_actions, env_outputs, agent_state):
        """[T, B] training path: folded torso/heads, scanned core."""
        done = env_outputs.done
        stacked, frame_state = stack_frames_time_major(
            env_outputs.observation,
            agent_state.frame_stacking_state,
            done,
            self.stack_size,
        )
        conv_out = _fold_time(self.torso, stacked)
        torso_out = jnp.concatenate(
            [
                conv_out,
                env_outputs.reward[..., None],
                jax.nn.one_hot(prev_actions, self.num_actions),
            ],
            axis=-1,
        )
        core, out = self.core(agent_state.core_state, (torso_out, done))
        output = self._heads(out)
        return output, AgentState(
            core_state=core, frame_stacking_state=frame_state
        )


class AtariPolicyNet(nn.Module):
    """Conv (+ optional LSTM) policy/value net for Atari V-trace / PPO.

    Matches the capability of the reference's V-trace Atari setup (conv torso
    shared with DuelingLSTMDQNNet, policy-logits + baseline heads).
    """

    parametric_distribution_param_size: int
    frame_shape: Tuple[int, int] = (84, 84)
    stack_size: int = 4
    lstm_size: int = 0  # 0 = feed-forward
    dtype: jnp.dtype = jnp.float32
    core_dtype: jnp.dtype = jnp.float32

    @property
    def stateless(self) -> bool:
        # Frame stacking is stateful, so only stack_size == 1 and no LSTM is
        # truly stateless.
        return self.lstm_size == 0 and self.stack_size == 1

    def initial_state(self, batch_size: int):
        core = (
            lstm_initial_state((self.lstm_size,), batch_size)
            if self.lstm_size
            else ()
        )
        return AgentState(
            core_state=core,
            frame_stacking_state=initial_frame_stacking_state(
                self.stack_size, batch_size, self.frame_shape
            ),
        )

    def setup(self):
        self.torso = AtariConvTorso(dtype=self.dtype, name="torso")
        if self.lstm_size:
            self.core = _scanned_core(self.lstm_size, "core", self.core_dtype)
        self.policy_head = nn.Dense(
            self.parametric_distribution_param_size, name="policy_logits"
        )
        self.baseline_head = nn.Dense(1, name="baseline")

    def _heads(self, x):
        policy_params = self.policy_head(x)
        baseline = jnp.squeeze(self.baseline_head(x), axis=-1)
        return policy_params, baseline

    def __call__(self, prev_action, env_output, agent_state):
        del prev_action
        done = env_output.done
        stacked, frame_state = stack_frame(
            env_output.observation,
            agent_state.frame_stacking_state,
            done,
            self.stack_size,
        ) if self.stack_size > 1 else (env_output.observation, ())
        x = self.torso(stacked)
        if self.lstm_size:
            core, out = self.core(
                agent_state.core_state, (x[None], done[None])
            )
            x = out[0]
        else:
            core = ()
        policy_params, baseline = self._heads(x)
        return (policy_params, baseline), AgentState(
            core_state=core, frame_stacking_state=frame_state
        )

    def unroll_time_major(self, prev_actions, env_outputs, agent_state):
        """[T, B] training path: folded torso/heads, scanned core."""
        del prev_actions
        done = env_outputs.done
        if self.stack_size > 1:
            stacked, frame_state = stack_frames_time_major(
                env_outputs.observation,
                agent_state.frame_stacking_state,
                done,
                self.stack_size,
            )
        else:
            stacked, frame_state = env_outputs.observation, ()
        x = _fold_time(self.torso, stacked)
        if self.lstm_size:
            core, x = self.core(agent_state.core_state, (x, done))
        else:
            core = ()
        policy_params, baseline = self._heads(x)
        return (policy_params, baseline), AgentState(
            core_state=core, frame_stacking_state=frame_state
        )
