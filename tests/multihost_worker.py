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


if __name__ == "__main__":
    main()
