"""Remote-actor fleets for the off-policy agents (R2D2/SAC).

Mirrors the reference's R2D2/SAC learner deployment shape
(/root/reference/agents/r2d2/learner.py:765-822, sac/learner.py:539-556 +
gcp/train_atari.sh worker fleets): external actor processes/threads step
envs against the learner's socket server; the learner applies per-env
epsilons BY ENV ID, stores burn-in-overlapped unrolls of training envs
only, and trains from host-RAM replay under the replay-ratio contract.

Also pins the exact per-env episode accounting (reference env_infos
Aggregator keyed by env_id, vtrace learner.py:373-378): every env carries a
distinct per-step reward, so any slot/env mixing in the learner-side
accumulators would produce returns that exist for no env.
"""

import os
import subprocess
import sys
import threading
import uuid

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from seed_rl_tpu.types import EnvOutput


def _sock_path():
    return f"/tmp/seed_rl_tpu_test_{uuid.uuid4().hex[:8]}.sock"


class _RewardScriptedEnvGroup:
    """Batched env: env with global id e pays reward (e+1) per step,
    episodes of length 5 — per-env returns are 5*(e+1), so exact env-keyed
    accounting is distinguishable from any mixed/slot-keyed scheme."""

    def __init__(self, num_envs, env_id_offset, obs_dim=3):
        self.num_envs = num_envs
        self.offset = env_id_offset
        self.obs_dim = obs_dim
        self.t = np.zeros(num_envs, np.int32)

    def reset(self):
        self.t[:] = 0
        return self._output(np.zeros(self.num_envs, np.float32))

    def _output(self, reward):
        obs = np.tile(
            self.t[:, None].astype(np.float32), (1, self.obs_dim)
        )
        done = self.t >= 5
        out = EnvOutput(
            reward=reward,
            done=done.copy(),
            observation=obs,
            abandoned=np.zeros(self.num_envs, bool),
            episode_step=self.t.copy(),
        )
        self.t[done] = 0
        return out

    def step(self, actions):
        self.t += 1
        reward = (
            np.arange(self.num_envs, dtype=np.float32) + self.offset + 1.0
        )
        return self._output(reward)

    def close(self):
        pass


def test_remote_r2d2_fleet_exact_episode_stats():
    """R2D2 served to a 2-thread actor fleet over the socket transport:
    trains from replay, applies the epsilon ladder by env id, excludes the
    eval env's experience, and keeps EXACT per-env episode returns."""
    from seed_rl_tpu.agents import r2d2
    from seed_rl_tpu.models.dueling_mlp import VectorDuelingDQNNet
    from seed_rl_tpu.remote import (
        run_actor,
        run_remote_offpolicy_learner,
    )
    from seed_rl_tpu.replay_host import HostReplayBuffer

    num_envs, num_training, unroll_length, burn_in = 4, 3, 5, 2
    path = _sock_path()

    net = VectorDuelingDQNNet(num_actions=4, mlp_sizes=(16,), lstm_size=8,
                              hidden_size=8)
    epsilons = jnp.concatenate(
        [
            r2d2.training_env_epsilons(num_training),
            jnp.full((num_envs - num_training,), 1e-3),
        ]
    )
    agent = r2d2.R2D2Agent(net, epsilons)
    config = r2d2.R2D2Config(
        n_steps=2,
        burn_in=burn_in,
        replay_buffer_size=64,
        replay_buffer_min_size=2,
        batch_size=2,
        update_target_every_n_step=10,
        num_eval_envs=0,  # eval filtering happens by env id upstream
    )
    replay_ratio = 1.0
    insertion_batch = max(1, int(round(config.batch_size / replay_ratio)))
    learner = r2d2.R2D2HostLearner(
        agent, config, optax.adam(1e-3), insertion_batch, unroll_length
    )
    replay = HostReplayBuffer(
        config.replay_buffer_size, config.importance_sampling_exponent
    )

    obs_spec = jax.ShapeDtypeStruct((3,), np.float32)
    actors = [
        threading.Thread(
            target=run_actor,
            args=(
                lambda off=off: _RewardScriptedEnvGroup(2, off),
                path,
            ),
            kwargs=dict(num_steps=400, env_id_offset=off),
            daemon=True,
        )
        for off in (0, 2)
    ]
    for t in actors:
        t.start()

    sink = {}
    state = run_remote_offpolicy_learner(
        agent,
        learner,
        replay,
        obs_spec,
        path,
        total_environment_frames=60,
        unroll_length=unroll_length,
        num_envs=num_envs,
        replay_ratio=replay_ratio,
        replay_buffer_min_size=config.replay_buffer_min_size,
        example_action=np.zeros((), np.int32),
        num_training_envs=num_training,
        num_overlapping_steps=burn_in,
        unroll_timeout=60.0,
        stats_sink=sink,
    )
    for t in actors:
        t.join(timeout=30)

    # Training ran from replay under the replay-ratio contract.
    assert int(state.step) > 0
    assert replay.num_inserted >= config.replay_buffer_min_size

    # Exact per-env accounting: env e's every completed episode return is
    # exactly 5*(e+1); any slot-mixing would yield values in no env's set.
    ep = sink["episodes"]
    recorded_train = {
        e: list(v) for e, v in ep.completed_returns.items() if v
    }
    assert recorded_train, "no training episodes recorded"
    for e, returns in recorded_train.items():
        assert e < num_training
        np.testing.assert_allclose(returns, 5.0 * (e + 1))

    # The eval env's experience was excluded from replay but its episodes
    # are accounted (reference r2d2 learner.py:793-803 + eval actors).
    ev = sink["eval_episodes"]
    for e, returns in ev.completed_returns.items():
        assert e >= num_training
        np.testing.assert_allclose(list(returns), 5.0 * (e + 1))


class _ContinuousScriptedEnvGroup:
    """Continuous-action batched env for remote SAC (2-dim actions)."""

    def __init__(self, num_envs, obs_dim=3, act_dim=2):
        self.num_envs = num_envs
        self.obs_dim = obs_dim
        self.act_dim = act_dim
        self.t = np.zeros(num_envs, np.int32)

    def reset(self):
        self.t[:] = 0
        return self._output(np.zeros(self.num_envs, np.float32))

    def _output(self, reward):
        obs = np.tile(
            self.t[:, None].astype(np.float32), (1, self.obs_dim)
        )
        done = self.t >= 4
        out = EnvOutput(
            reward=reward,
            done=done.copy(),
            observation=obs,
            abandoned=np.zeros(self.num_envs, bool),
            episode_step=self.t.copy(),
        )
        self.t[done] = 0
        return out

    def step(self, actions):
        assert actions.shape == (self.num_envs, self.act_dim), actions.shape
        self.t += 1
        return self._output(np.ones(self.num_envs, np.float32))

    def close(self):
        pass


def test_remote_sac_learner_with_actor_threads():
    """SAC served to an external actor fleet: continuous actions over the
    wire, uniform host-RAM replay, replay-ratio 4 training cadence
    (reference sac/learner.py:539-556)."""
    from seed_rl_tpu import distributions as pd
    from seed_rl_tpu.agents import sac
    from seed_rl_tpu.models.sac_nets import ActorCriticMLP
    from seed_rl_tpu.remote import (
        run_actor,
        run_remote_offpolicy_learner,
    )
    from seed_rl_tpu.replay_host import HostReplayBuffer

    num_envs, unroll_length, act_dim = 2, 4, 2
    path = _sock_path()

    dist = pd.NormalTanhDistribution(act_dim)
    net = ActorCriticMLP(
        parametric_distribution_param_size=dist.param_size,
        n_critics=2,
        mlp_sizes=(16,),
    )
    # normalize_observations exercises the on_unroll stats fold and the
    # inference-params refresh that must follow it in the remote loop.
    agent = sac.SACAgent(net, dist, normalize_observations=True)
    config = sac.SACConfig(
        batch_size=2,
        replay_buffer_size=64,
        replay_buffer_min_size=2,
        unroll_length=unroll_length,
        polyak=0.99,
    )
    replay_ratio = 4.0
    insertion_batch = max(1, int(round(config.batch_size / replay_ratio)))
    learner = sac.SACHostLearner(
        agent, config, optax.adam(1e-3), insertion_batch, unroll_length
    )
    replay = HostReplayBuffer(
        config.replay_buffer_size, importance_sampling_exponent=0.0
    )

    obs_spec = jax.ShapeDtypeStruct((3,), np.float32)
    actor = threading.Thread(
        target=run_actor,
        args=(lambda: _ContinuousScriptedEnvGroup(num_envs), path),
        kwargs=dict(num_steps=300),
        daemon=True,
    )
    actor.start()

    sink = {}
    state = run_remote_offpolicy_learner(
        agent,
        learner,
        replay,
        obs_spec,
        path,
        total_environment_frames=6 * unroll_length * insertion_batch,
        unroll_length=unroll_length,
        num_envs=num_envs,
        replay_ratio=replay_ratio,
        replay_buffer_min_size=config.replay_buffer_min_size,
        example_action=np.zeros((act_dim,), np.float32),
        unroll_timeout=60.0,
        stats_sink=sink,
    )
    actor.join(timeout=30)

    assert int(state.step) > 0
    assert replay.num_inserted >= config.replay_buffer_min_size
    ep = sink["episodes"]
    for _, returns in ep.completed_returns.items():
        np.testing.assert_allclose(list(returns), 4.0)


def test_remote_r2d2_fleet_actor_processes():
    """Reference deployment shape for R2D2 over the wire (mirrors
    test_transport.py::test_remote_learner_with_actor_processes): learner
    process (this one) serves epsilon-greedy inference + replay training;
    two external `--run_mode=actor --agent=r2d2` processes step
    synthetic-Atari host envs via the CLI."""
    import dataclasses as _dc

    from seed_rl_tpu.agents import r2d2
    from seed_rl_tpu.models.atari import DuelingLSTMDQNNet
    from seed_rl_tpu.remote import run_remote_offpolicy_learner
    from seed_rl_tpu.replay_host import HostReplayBuffer

    num_envs = 8  # 2 actor processes x 4 envs
    unroll_length, burn_in = 5, 2
    path = _sock_path()
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    actor_env = {
        **os.environ,
        "JAX_PLATFORMS": "cpu",
        "PYTHONPATH": repo_root,
    }

    net = DuelingLSTMDQNNet(
        num_actions=18, frame_shape=(84, 84), stack_size=2, lstm_size=16
    )
    agent = r2d2.R2D2Agent(net, r2d2.training_env_epsilons(num_envs))
    config = r2d2.R2D2Config(
        n_steps=2,
        burn_in=burn_in,
        replay_buffer_size=32,
        replay_buffer_min_size=2,
        batch_size=2,
        update_target_every_n_step=50,
        num_eval_envs=0,
    )
    replay_ratio = 1.0
    insertion_batch = max(1, int(round(config.batch_size / replay_ratio)))
    learner = r2d2.R2D2HostLearner(
        agent, config, optax.adam(1e-3), insertion_batch, unroll_length
    )
    replay = HostReplayBuffer(
        config.replay_buffer_size, config.importance_sampling_exponent
    )
    obs_spec = jax.ShapeDtypeStruct((84, 84, 1), np.uint8)

    procs = [
        subprocess.Popen(
            [
                sys.executable, "-m", "seed_rl_tpu.train",
                "--run_mode=actor", "--agent=r2d2",
                "--env=synthetic_atari_host", "--num_envs=4",
                f"--server_address={path}",
                f"--env_id_offset={4 * p}",
                "--num_actor_steps=200",
            ],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            cwd=repo_root,
            env=actor_env,
        )
        for p in range(2)
    ]
    try:
        state = run_remote_offpolicy_learner(
            agent,
            learner,
            replay,
            obs_spec,
            path,
            total_environment_frames=4 * unroll_length * insertion_batch,
            unroll_length=unroll_length,
            num_envs=num_envs,
            replay_ratio=replay_ratio,
            replay_buffer_min_size=config.replay_buffer_min_size,
            example_action=np.zeros((), np.int32),
            num_overlapping_steps=burn_in,
            unroll_timeout=120.0,
        )
        assert int(state.step) > 0
        assert replay.num_inserted >= config.replay_buffer_min_size
    finally:
        for p in procs:
            try:
                p.kill()
            except OSError:
                pass
    for p in procs:
        p.wait(timeout=30)


def test_remote_ppo_learner_with_actor_threads():
    """PPO served to external actors (reference policy_gradient
    learner.py:1114-1121): the learner runs the full epochs/minibatch pass
    on each streamed batch of unrolls and keeps exact per-env episode
    stats."""
    import optax

    from seed_rl_tpu import distributions as pd
    from seed_rl_tpu.agent import PolicyAgent
    from seed_rl_tpu.agents.ppo import policy_losses
    from seed_rl_tpu.agents.ppo.generalized_onpolicy_loss import (
        GeneralizedOnPolicyLoss,
    )
    from seed_rl_tpu.agents.ppo.learner import PPOConfig, PPOLearner
    from seed_rl_tpu.agents.ppo.policy_regularizers import (
        KLPolicyRegularizer,
    )
    from seed_rl_tpu.models import MLPPolicyNetwork
    from seed_rl_tpu.ops.advantages import GAE
    from seed_rl_tpu.ops.popart import PopArt
    from seed_rl_tpu.ops.running_statistics import AverageMeanStd
    from seed_rl_tpu.remote import (
        SpecHostEnv,
        run_actor,
        run_remote_learner,
    )
    from seed_rl_tpu.rollout_host import HostRolloutEngine

    num_envs, unroll_length = 4, 4
    path = _sock_path()

    import gymnasium as gym

    dist = pd.CategoricalDistribution(4)
    net = MLPPolicyNetwork(
        parametric_distribution_param_size=dist.param_size, mlp_sizes=(16,)
    )
    agent = PolicyAgent(net, dist)
    loss = GeneralizedOnPolicyLoss(
        agent=agent,
        reward_normalizer=PopArt(AverageMeanStd(), compensate=False),
        parametric_action_distribution=dist,
        advantage_estimator=GAE(lambda_=0.95),
        policy_loss=policy_losses.ppo(epsilon=0.2),
        discount_factor=0.99,
        regularizer=KLPolicyRegularizer(entropy=0.01),
        baseline_cost=1.0,
    )
    obs_spec = jax.ShapeDtypeStruct((3,), np.float32)
    spec_env = SpecHostEnv(obs_spec, gym.spaces.Discrete(4), num_envs)
    engine = HostRolloutEngine(spec_env, agent, unroll_length)
    learner = PPOLearner(
        engine, agent, loss,
        PPOConfig(epochs_per_step=2, batch_mode="shuffle",
                  batches_per_step=2),
        optax.adam(1e-3),
    )

    actors = [
        threading.Thread(
            target=run_actor,
            args=(lambda off=off: _RewardScriptedEnvGroup(2, off), path),
            kwargs=dict(num_steps=200, env_id_offset=off),
            daemon=True,
        )
        for off in (0, 2)
    ]
    for t in actors:
        t.start()

    sink = {}
    state = run_remote_learner(
        agent,
        learner,
        obs_spec,
        path,
        total_environment_frames=num_envs * unroll_length * 4,
        unroll_length=unroll_length,
        num_envs=num_envs,
        stats_sink=sink,
    )
    for t in actors:
        t.join(timeout=30)

    assert int(state.step) == 4
    ep = sink["episodes"]
    for e, returns in ep.completed_returns.items():
        np.testing.assert_allclose(list(returns), 5.0 * (e + 1))
