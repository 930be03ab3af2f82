"""End-to-end PPO learner tests: learning on ToyEnv + batch-mode coverage.

Exercises the full HalfCheetah-style composition (mujoco/gin/ppo.gin):
GAE + PPO epsilon loss + PopArt(AverageMeanStd, no compensation) + input
normalization + clipping + orthogonal init + free-std tanh policy, in
``split`` batch mode with multiple epochs — but on ToyEnv so it runs on CPU
in seconds.
"""

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from seed_rl_tpu import distributions as pd
from seed_rl_tpu.agents.ppo import policy_losses
from seed_rl_tpu.agents.ppo.continuous_control_agent import (
    ContinuousControlNet,
    NormalizingPolicyAgent,
)
from seed_rl_tpu.agents.ppo.generalized_onpolicy_loss import (
    GeneralizedOnPolicyLoss,
)
from seed_rl_tpu.agents.ppo.input_normalization import InputNormalization
from seed_rl_tpu.agents.ppo.learner import PPOConfig, PPOLearner
from seed_rl_tpu.agents.ppo.policy_regularizers import KLPolicyRegularizer
from seed_rl_tpu.envs import BatchedEnv, ToyEnv
from seed_rl_tpu.ops.advantages import GAE
from seed_rl_tpu.ops.popart import PopArt
from seed_rl_tpu.ops.running_statistics import AverageMeanStd
from seed_rl_tpu.rollout import RolloutEngine
from seed_rl_tpu.utils import episode_stats


def _make_ppo_learner(
    num_envs=32,
    unroll_length=8,
    batch_mode="split",
    epochs_per_step=4,
    batches_per_step=4,
    rnn_layers=0,
    policy_loss=None,
    input_norm=True,
):
    env = BatchedEnv(ToyEnv(horizon=3), num_envs)
    dist = pd.NormalTanhDistribution(
        3, gaussian_std_fn=pd.safe_exp_std_fn(1.0, 1e-3)
    )
    net = ContinuousControlNet(
        parametric_distribution_param_size=dist.param_size,
        num_layers_policy=2,
        num_layers_value=2,
        num_units_policy=32,
        num_units_value=32,
        num_layers_rnn=rnn_layers,
        num_units_rnn=16,
        activation=jnp.tanh,
        kernel_init_gain=float(np.sqrt(2.0)),
        last_kernel_init_policy_gain=0.01,
        last_kernel_init_value_gain=1.0,
        std_independent_of_input=True,
    )
    agent = NormalizingPolicyAgent(
        net,
        dist,
        input_normalization=(
            InputNormalization(AverageMeanStd(), input_size=4)
            if input_norm
            else None
        ),
        input_clipping=10.0 if input_norm else None,
    )
    loss = GeneralizedOnPolicyLoss(
        agent=agent,
        reward_normalizer=PopArt(AverageMeanStd(), compensate=False),
        parametric_action_distribution=dist,
        advantage_estimator=GAE(lambda_=0.95),
        policy_loss=policy_loss or policy_losses.ppo(epsilon=0.2),
        discount_factor=0.9,
        regularizer=KLPolicyRegularizer(entropy=0.0),
        baseline_cost=1.0,
    )
    engine = RolloutEngine(env, agent, unroll_length)
    config = PPOConfig(
        epochs_per_step=epochs_per_step,
        batch_mode=batch_mode,
        batches_per_step=batches_per_step,
    )
    optimizer = optax.chain(
        optax.clip_by_global_norm(0.5), optax.adam(3e-3)
    )
    return PPOLearner(engine, agent, loss, config, optimizer)


def _mean_return(state):
    n = float(state.stats.num_episodes)
    assert n > 0
    return float(state.stats.sum_return) / n


def test_ppo_learns_toy_env_split_mode():
    learner = _make_ppo_learner()
    state = jax.jit(learner.init)(jax.random.PRNGKey(0))
    run = jax.jit(lambda s: learner.train_many(s, 20))
    state, _ = run(state)
    early = _mean_return(state)
    state = state._replace(stats=episode_stats.reset_window(state.stats))
    for _ in range(5):
        state, metrics = run(state)
    late = _mean_return(state)
    assert late > early + 1.0, (early, late)
    assert late > -2.0, late
    assert np.isfinite(
        float(metrics["GeneralizedOnPolicyLoss/total_loss"])
    )


@pytest.mark.parametrize(
    "batch_mode", ["repeat", "shuffle", "split_with_advantage_recomputation"]
)
def test_ppo_batch_modes_run(batch_mode):
    learner = _make_ppo_learner(
        num_envs=8,
        unroll_length=4,
        batch_mode=batch_mode,
        epochs_per_step=2,
        batches_per_step=2,
    )
    state = jax.jit(learner.init)(jax.random.PRNGKey(0))
    state, metrics = jax.jit(learner.train_step)(state)
    assert int(state.step) == 1
    assert np.isfinite(
        float(metrics["GeneralizedOnPolicyLoss/total_loss"])
    )


def test_ppo_recurrent_shuffle_mode():
    learner = _make_ppo_learner(
        num_envs=8,
        unroll_length=4,
        batch_mode="shuffle",
        epochs_per_step=2,
        batches_per_step=2,
        rnn_layers=1,
        input_norm=False,
    )
    state = jax.jit(learner.init)(jax.random.PRNGKey(0))
    state, metrics = jax.jit(learner.train_step)(state)
    assert np.isfinite(
        float(metrics["GeneralizedOnPolicyLoss/total_loss"])
    )


@pytest.mark.parametrize(
    "loss_factory",
    [
        lambda: policy_losses.pg(),
        lambda: policy_losses.vtrace_is(max_importance_weight=1.0),
        lambda: policy_losses.awr(beta=1.0, w_max=20.0),
        lambda: policy_losses.vmpo(e_n=0.1),
    ],
    ids=["pg", "vtrace", "awr", "vmpo"],
)
def test_ppo_policy_loss_variants_run(loss_factory):
    learner = _make_ppo_learner(
        num_envs=8,
        unroll_length=4,
        epochs_per_step=1,
        batches_per_step=1,
        policy_loss=loss_factory(),
    )
    state = jax.jit(learner.init)(jax.random.PRNGKey(0))
    state, metrics = jax.jit(learner.train_step)(state)
    assert np.isfinite(
        float(metrics["GeneralizedOnPolicyLoss/total_loss"])
    )


def test_ppo_obs_normalization_stats_update():
    learner = _make_ppo_learner(num_envs=8, unroll_length=4,
                                epochs_per_step=1, batches_per_step=1)
    state = jax.jit(learner.init)(jax.random.PRNGKey(0))
    assert float(jnp.sum(state.obs_norm.observation_count)) == 0
    state, _ = jax.jit(learner.train_step)(state)
    # (T+1) * B observations tracked per dim.
    assert float(state.obs_norm.observation_count[0]) == 5 * 8


def _make_discrete_ppo_learner(policy_loss, epochs_per_step=2,
                               batches_per_step=2):
    """Discrete PPO family: PolicyAgent + MLPAndLSTM (the DmLab PPO shape,
    reference mujoco/ppo_main.py gin seams with discrete nets)."""
    from seed_rl_tpu.agent import PolicyAgent
    from seed_rl_tpu.envs import DiscreteMatchEnv
    from seed_rl_tpu.models import MLPAndLSTM

    env = BatchedEnv(DiscreteMatchEnv(n_actions=4), 16)
    dist = pd.CategoricalDistribution(4)
    net = MLPAndLSTM(
        parametric_distribution_param_size=dist.param_size,
        mlp_sizes=(32,), lstm_sizes=(16,),
    )
    agent = PolicyAgent(net, dist)
    loss = GeneralizedOnPolicyLoss(
        agent=agent,
        reward_normalizer=PopArt(AverageMeanStd(), compensate=False),
        parametric_action_distribution=dist,
        advantage_estimator=GAE(lambda_=0.95),
        policy_loss=policy_loss,
        discount_factor=0.9,
        regularizer=KLPolicyRegularizer(entropy=0.0),
        baseline_cost=1.0,
    )
    engine = RolloutEngine(env, agent, 8)
    config = PPOConfig(
        epochs_per_step=epochs_per_step,
        batch_mode="shuffle",  # recurrent net: split modes forbidden
        batches_per_step=batches_per_step,
    )
    optimizer = optax.chain(optax.clip_by_global_norm(0.5), optax.adam(1e-2))
    return PPOLearner(engine, agent, loss, config, optimizer)


@pytest.mark.parametrize(
    "loss_factory,min_gain",
    [
        (lambda: policy_losses.ppo(epsilon=0.2), 1.0),
        # V-MPO's top-half + Lagrange temperature learns slower on this
        # env; require clear but smaller improvement.
        (lambda: policy_losses.vmpo(e_n=0.1), 0.5),
        (lambda: policy_losses.awr(beta=1.0, w_max=20.0), 1.0),
    ],
    ids=["ppo", "vmpo", "awr"],
)
def test_discrete_ppo_family_learns(loss_factory, min_gain):
    """--agent=ppo --policy_loss={ppo,vmpo,awr} on a toy discrete env
    (round-1 review item #8): each loss family must improve the return."""
    learner = _make_discrete_ppo_learner(loss_factory())
    state = jax.jit(learner.init)(jax.random.PRNGKey(0))
    run = jax.jit(lambda s: learner.train_many(s, 15))
    state, _ = run(state)
    early = _mean_return(state)
    state = state._replace(stats=episode_stats.reset_window(state.stats))
    for _ in range(4):
        state, _ = run(state)
    late = _mean_return(state)
    # DiscreteMatchEnv: ~2.5 expected at random (10 steps, 1/4 hit), 10 max.
    assert late > early + min_gain, (early, late)
