"""Per-env episode accounting, fully on device.

Equivalent of the reference's ``env_infos`` aggregator + info_queue pattern
(agents/vtrace/learner.py:373-378: per-env frame/return/raw-return
accumulators reset on done, completed episodes pushed to a queue for
logging). Here the accumulators ride in the training carry and completed
episodes are reduced to windowed sums inside the jitted step — no host
round-trip per episode.
"""

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from seed_rl_tpu.types import EnvOutput


class EpisodeStatsState(NamedTuple):
    return_acc: jnp.ndarray  # f32[B] running episode return
    # Windowed sums over completed episodes (reset by the caller when logged).
    num_episodes: jnp.ndarray  # f32[]
    sum_return: jnp.ndarray  # f32[]
    sum_length: jnp.ndarray  # f32[]


def init(num_envs: int) -> EpisodeStatsState:
    return EpisodeStatsState(
        return_acc=jnp.zeros((num_envs,), jnp.float32),
        num_episodes=jnp.zeros((), jnp.float32),
        sum_return=jnp.zeros((), jnp.float32),
        sum_length=jnp.zeros((), jnp.float32),
    )


def update(
    state: EpisodeStatsState, env_outputs: EnvOutput
) -> EpisodeStatsState:
    """Consume a time-major [T, B] EnvOutput block of NEW timesteps.

    The block must contain each env step exactly once (pass
    ``unroll.timesteps.env_output`` sliced to the new steps, i.e. excluding
    the overlap prefix).
    """

    def step(carry, out):
        return_acc, num_ep, sum_ret, sum_len = carry
        return_acc = return_acc + out.reward
        done_f = out.done.astype(jnp.float32)
        num_ep = num_ep + jnp.sum(done_f)
        sum_ret = sum_ret + jnp.sum(done_f * return_acc)
        sum_len = sum_len + jnp.sum(
            done_f * out.episode_step.astype(jnp.float32)
        )
        return_acc = jnp.where(out.done, 0.0, return_acc)
        return (return_acc, num_ep, sum_ret, sum_len), None

    (return_acc, num_ep, sum_ret, sum_len), _ = jax.lax.scan(
        step,
        (
            state.return_acc,
            state.num_episodes,
            state.sum_return,
            state.sum_length,
        ),
        env_outputs,
    )
    return EpisodeStatsState(return_acc, num_ep, sum_ret, sum_len)


def reset_window(state: EpisodeStatsState) -> EpisodeStatsState:
    """Clear the completed-episode window (keep per-env accumulators)."""
    return EpisodeStatsState(
        return_acc=state.return_acc,
        num_episodes=jnp.zeros((), jnp.float32),
        sum_return=jnp.zeros((), jnp.float32),
        sum_length=jnp.zeros((), jnp.float32),
    )
