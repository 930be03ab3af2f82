"""Example --agent_module: free loss x net x optimizer composition.

The TPU-native equivalent of the reference's gin seam
(/root/reference/mujoco/ppo_main.py:37-107 + mujoco/gin/ppo.gin): plain
Python instead of a config language — every piece of the agent stack is an
ordinary object the hook can replace. This example rebuilds the PPO loss
as a V-MPO + V-trace-advantage combination over a wider network with a
SGDR-style cosine-decayed AdamW — a composition the CLI flags alone do not
expose:

    python -m seed_rl_tpu.train --agent=ppo --env=toy \
        --agent_module=scripts/examples/custom_ppo_composition.py ...
"""

import numpy as np
import optax


def configure(args, env, components):
    import jax.numpy as jnp

    from seed_rl_tpu.agents.ppo import policy_losses
    from seed_rl_tpu.agents.ppo.continuous_control_agent import (
        ContinuousControlNet,
        NormalizingPolicyAgent,
    )
    from seed_rl_tpu.agents.ppo.generalized_onpolicy_loss import (
        GeneralizedOnPolicyLoss,
    )
    from seed_rl_tpu.agents.ppo.input_normalization import (
        InputNormalization,
    )
    from seed_rl_tpu.agents.ppo.policy_regularizers import (
        KLPolicyRegularizer,
    )
    from seed_rl_tpu.ops.advantages import VTrace
    from seed_rl_tpu.ops.popart import PopArt
    from seed_rl_tpu.ops.running_statistics import EMAMeanStd

    dist = components["dist"]
    import jax

    obs_spec = env.observation_spec()
    obs_size = int(np.prod(jax.tree.leaves(obs_spec)[0].shape))

    net = ContinuousControlNet(
        parametric_distribution_param_size=dist.param_size,
        num_layers_policy=3,
        num_layers_value=3,
        num_units_policy=128,
        num_units_value=128,
        activation=jnp.tanh,
        kernel_init_gain=float(np.sqrt(2.0)),
        last_kernel_init_policy_gain=0.01,
        last_kernel_init_value_gain=1.0,
        std_independent_of_input=True,
    )
    agent = NormalizingPolicyAgent(
        net,
        dist,
        input_normalization=InputNormalization(
            EMAMeanStd(std_min_value=1e-3), input_size=obs_size
        ),
        input_clipping=10.0,
    )
    loss = GeneralizedOnPolicyLoss(
        agent=agent,
        reward_normalizer=PopArt(EMAMeanStd(), compensate=True),
        parametric_action_distribution=dist,
        advantage_estimator=VTrace(lambda_=0.9),
        policy_loss=policy_losses.vmpo(e_n=0.02),
        discount_factor=args.discounting,
        regularizer=KLPolicyRegularizer(entropy=1e-3),
        baseline_cost=0.5,
    )
    optimizer = optax.chain(
        optax.clip_by_global_norm(args.clip_norm),
        optax.adamw(
            optax.cosine_decay_schedule(
                args.learning_rate, decay_steps=10_000
            ),
            weight_decay=1e-4,
        ),
    )
    components.update(net=net, agent=agent, loss=loss, optimizer=optimizer)
    return components
