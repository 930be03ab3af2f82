"""Worker script for the multi-process mesh test (see test_multihost.py).

Each process owns 4 virtual CPU devices; ``init_multi_host`` joins them into
one 8-device global mesh (the multi-host equivalent of the reference's
``init_learner_multi_host``, common/utils.py:53-98). Both processes then run
the same SPMD V-trace program over the global mesh and print the training
metrics — which must agree bitwise across processes.
"""

import os
import sys


def main():
    process_id = int(sys.argv[1])
    port = sys.argv[2]
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax._src.xla_bridge as xb

    xb._backend_factories.pop("axon", None)
    xb._topology_factories.pop("axon", None)

    from seed_rl_tpu.parallel import init_multi_host

    init_multi_host(
        coordinator_address=f"127.0.0.1:{port}",
        num_processes=2,
        process_id=process_id,
    )
    assert len(jax.local_devices()) == 4
    assert len(jax.devices()) == 8

    import optax

    from seed_rl_tpu import distributions as pd
    from seed_rl_tpu.agent import PolicyAgent
    from seed_rl_tpu.agents import vtrace as vtrace_agent
    from seed_rl_tpu.envs import BatchedEnv, ToyEnv
    from seed_rl_tpu.models.policy import MLPPolicyNetwork
    from seed_rl_tpu.parallel import DistributedLearner, make_mesh
    from seed_rl_tpu.rollout import RolloutEngine

    env = BatchedEnv(ToyEnv(horizon=3), 16)
    dist = pd.NormalTanhDistribution(3)
    net = MLPPolicyNetwork(
        parametric_distribution_param_size=dist.param_size, mlp_sizes=(16,)
    )
    agent = PolicyAgent(net, dist)
    engine = RolloutEngine(env, agent, unroll_length=4)
    learner = vtrace_agent.VTraceLearner(
        engine, agent, vtrace_agent.VTraceConfig(discounting=0.9),
        optax.adam(1e-3),
    )
    dlearner = DistributedLearner(learner, make_mesh(8))
    state = dlearner.init(jax.random.PRNGKey(0))
    for _ in range(3):
        state, metrics = dlearner.train_step(state)
    # Replicated scalars are identical on every process by SPMD construction;
    # print them so the driver can compare.
    print(
        "METRICS",
        process_id,
        float(metrics["losses/total"]),
        float(metrics["policy/entropy"]),
        int(state.step),
        flush=True,
    )

    # R2D2 with replay state sharded over both hosts — insert, prioritized
    # sampling, IS weights and the priority write-back run as one global
    # SPMD program; per-host replay shards are the semantics the reference
    # realizes with per-host buffers (agents/r2d2/learner.py:387-468).
    from seed_rl_tpu.agents import r2d2
    from seed_rl_tpu.envs import DiscreteMatchEnv
    from seed_rl_tpu.models.dueling_mlp import VectorDuelingDQNNet

    qenv = BatchedEnv(DiscreteMatchEnv(n_actions=4), 16)
    qnet = VectorDuelingDQNNet(
        num_actions=4, mlp_sizes=(16,), lstm_size=8, hidden_size=16
    )
    qagent = r2d2.R2D2Agent(qnet, r2d2.training_env_epsilons(16))
    qengine = RolloutEngine(
        qenv, qagent, unroll_length=4, num_overlapping_steps=1
    )
    qconfig = r2d2.R2D2Config(
        burn_in=1, n_steps=2, replay_buffer_size=64,
        replay_buffer_min_size=16, batch_size=8, num_eval_envs=0,
    )
    qlearner = r2d2.R2D2Learner(qengine, qagent, qconfig, optax.adam(1e-3))
    qdist = DistributedLearner(qlearner, make_mesh(8))
    qstate = qdist.init(jax.random.PRNGKey(1))
    qstate = qdist.warmup_step(qstate)
    for _ in range(2):
        qstate, qmetrics = qdist.train_step(qstate)
    print(
        "R2D2_METRICS",
        process_id,
        float(qmetrics["losses/td"]),
        float(qmetrics["replay/sampled_priority_mean"]),
        float(qmetrics["replay/importance_weight_mean"]),
        int(qstate.step),
        flush=True,
    )


if __name__ == "__main__":
    main()
