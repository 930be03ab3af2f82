"""TPU-native SEED RL: a JAX/XLA/Pallas reinforcement-learning framework.

Capability parity target: google-research/seed_rl (see SURVEY.md). The
reference's actor→gRPC→learner streaming-inference loop is replaced by fully
on-device batched rollout under ``jit``; training scales over TPU meshes via
``jax.sharding`` and XLA collectives.
"""

__version__ = "0.1.0"

from seed_rl_tpu.types import AgentOutput, EnvOutput, QAgentOutput  # noqa: F401
