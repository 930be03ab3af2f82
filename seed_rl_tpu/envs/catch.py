"""Catch: a REAL visual-control environment that runs entirely on device.

The architecture's north star (SURVEY §0/§7) is envs living inside the
jitted rollout; ``SyntheticAtariEnv`` exercises that shape but carries no
visual credit-assignment signal. Catch (the classic bsuite task, scaled to
Atari-shaped frames) does: a ball falls one row per step from a random
column, a paddle on the bottom row moves left/stay/right, and the agent is
rewarded +1/-1 when the ball lands on/off the paddle — the policy must
READ the pixels to act. Rendering, dynamics and resets are pure JAX
(``lax``-friendly, static shapes), so thousands of envs advance in
lockstep inside the rollout scan and a conv+LSTM policy can demonstrate a
real visual learning curve with zero host dependencies (no ALE needed).

Grid ``rows x cols`` logical cells are rendered as ``cell_pixels`` square
blocks into a ``[rows*cell, cols*cell, 1]`` uint8 frame (defaults give
84x84, the Atari shape). An episode is ``balls_per_episode`` consecutive
drops; optimal return = +balls_per_episode, random ~ -balls/3.
"""

from typing import NamedTuple, Tuple

import gymnasium as gym
import jax
import jax.numpy as jnp
import numpy as np

from seed_rl_tpu.envs.core import JaxEnv, StepResult


class CatchState(NamedTuple):
    ball_row: jnp.ndarray  # i32[] 0 = top
    ball_col: jnp.ndarray  # i32[]
    paddle_col: jnp.ndarray  # i32[]
    balls_done: jnp.ndarray  # i32[] balls resolved this episode
    rng: jnp.ndarray  # PRNG key for ball spawns


class CatchEnv(JaxEnv):
    """bsuite-style Catch at Atari frame scale, fully on device."""

    def __init__(
        self,
        rows: int = 12,
        cols: int = 12,
        cell_pixels: int = 7,
        balls_per_episode: int = 5,
    ):
        self.rows = rows
        self.cols = cols
        self.cell_pixels = cell_pixels
        self.balls_per_episode = balls_per_episode
        self.num_actions = 3  # left, stay, right
        self._action_space = gym.spaces.Discrete(3)

    def observation_spec(self):
        h = self.rows * self.cell_pixels
        w = self.cols * self.cell_pixels
        return jax.ShapeDtypeStruct((h, w, 1), jnp.uint8)

    @property
    def action_space(self):
        return self._action_space

    def _obs(self, state: CatchState):
        grid = jnp.zeros((self.rows, self.cols), jnp.uint8)
        grid = grid.at[state.ball_row, state.ball_col].set(255)
        grid = grid.at[self.rows - 1, state.paddle_col].set(255)
        frame = jnp.repeat(
            jnp.repeat(grid, self.cell_pixels, axis=0),
            self.cell_pixels,
            axis=1,
        )
        return frame[..., None]

    def _spawn(self, rng):
        rng, col_rng = jax.random.split(rng)
        ball_col = jax.random.randint(col_rng, (), 0, self.cols)
        return rng, ball_col

    def reset(self, rng):
        rng, ball_col = self._spawn(rng)
        state = CatchState(
            ball_row=jnp.zeros((), jnp.int32),
            ball_col=ball_col,
            paddle_col=jnp.asarray(self.cols // 2, jnp.int32),
            balls_done=jnp.zeros((), jnp.int32),
            rng=rng,
        )
        return state, self._obs(state)

    def step(self, state: CatchState, action):
        # action: 0 = left, 1 = stay, 2 = right.
        paddle_col = jnp.clip(
            state.paddle_col + action.astype(jnp.int32) - 1,
            0,
            self.cols - 1,
        )
        ball_row = state.ball_row + 1
        landed = ball_row >= self.rows - 1
        caught = landed & (state.ball_col == paddle_col)
        reward = jnp.where(
            landed, jnp.where(caught, 1.0, -1.0), 0.0
        ).astype(jnp.float32)

        balls_done = state.balls_done + landed.astype(jnp.int32)
        terminated = balls_done >= self.balls_per_episode

        # Next ball (only materializes when the current one landed).
        rng, new_col = self._spawn(state.rng)
        new_state = CatchState(
            ball_row=jnp.where(landed, 0, ball_row),
            ball_col=jnp.where(landed, new_col, state.ball_col),
            paddle_col=paddle_col,
            balls_done=balls_done,
            rng=jnp.where(landed, rng, state.rng),
        )
        return StepResult(
            state=new_state,
            observation=self._obs(new_state),
            reward=reward,
            terminated=terminated,
            abandoned=jnp.zeros((), bool),
        )


class ContinuousCatchState(NamedTuple):
    ball_row: jnp.ndarray  # i32[]
    ball_col: jnp.ndarray  # i32[]
    paddle_pos: jnp.ndarray  # f32[] in [0, cols-1]
    balls_done: jnp.ndarray  # i32[]
    rng: jnp.ndarray


class ContinuousCatchEnv(CatchEnv):
    """Catch with a continuous paddle-velocity action — the SAC variant.

    The fourth-agent visual-curve environment (SAC is continuous-control;
    the discrete CatchEnv serves V-trace/R2D2/PPO): action is a
    Box(-1, 1, (1,)) paddle velocity, the paddle position is a float
    moving up to ``max_speed`` cells per step, and a ball is caught when
    the paddle center is within ``catch_radius`` cells of the ball column
    at landing. Rendering (paddle at the rounded cell) and episode
    structure are identical to CatchEnv, so curves are comparable across
    the four agents.
    """

    def __init__(
        self,
        rows: int = 12,
        cols: int = 12,
        cell_pixels: int = 7,
        balls_per_episode: int = 5,
        max_speed: float = 1.5,
        catch_radius: float = 0.75,
    ):
        super().__init__(rows, cols, cell_pixels, balls_per_episode)
        self.max_speed = max_speed
        self.catch_radius = catch_radius
        self._action_space = gym.spaces.Box(-1.0, 1.0, (1,), np.float32)

    def _obs_continuous(self, state: ContinuousCatchState):
        cell = jnp.round(state.paddle_pos).astype(jnp.int32)
        discrete = CatchState(
            ball_row=state.ball_row,
            ball_col=state.ball_col,
            paddle_col=jnp.clip(cell, 0, self.cols - 1),
            balls_done=state.balls_done,
            rng=state.rng,
        )
        return self._obs(discrete)

    def reset(self, rng):
        rng, ball_col = self._spawn(rng)
        state = ContinuousCatchState(
            ball_row=jnp.zeros((), jnp.int32),
            ball_col=ball_col,
            paddle_pos=jnp.asarray((self.cols - 1) / 2.0, jnp.float32),
            balls_done=jnp.zeros((), jnp.int32),
            rng=rng,
        )
        return state, self._obs_continuous(state)

    def step(self, state: ContinuousCatchState, action):
        velocity = jnp.clip(
            jnp.asarray(action, jnp.float32).reshape(()), -1.0, 1.0
        )
        paddle_pos = jnp.clip(
            state.paddle_pos + velocity * self.max_speed,
            0.0,
            float(self.cols - 1),
        )
        ball_row = state.ball_row + 1
        landed = ball_row >= self.rows - 1
        caught = landed & (
            jnp.abs(state.ball_col.astype(jnp.float32) - paddle_pos)
            <= self.catch_radius
        )
        reward = jnp.where(
            landed, jnp.where(caught, 1.0, -1.0), 0.0
        ).astype(jnp.float32)
        balls_done = state.balls_done + landed.astype(jnp.int32)
        terminated = balls_done >= self.balls_per_episode
        rng, new_col = self._spawn(state.rng)
        new_state = ContinuousCatchState(
            ball_row=jnp.where(landed, 0, ball_row),
            ball_col=jnp.where(landed, new_col, state.ball_col),
            paddle_pos=paddle_pos,
            balls_done=balls_done,
            rng=jnp.where(landed, rng, state.rng),
        )
        return StepResult(
            state=new_state,
            observation=self._obs_continuous(new_state),
            reward=reward,
            terminated=terminated,
            abandoned=jnp.zeros((), bool),
        )
