"""Code-independent policy export (SavedModel-equivalent).

Parity with the reference's ``tf.saved_model.save`` of the agent's
inference function (agents/vtrace/learner.py:472-475, policy_gradient/
learner.py:1149-1164): the jitted policy step is serialized as portable
StableHLO via ``jax.export`` together with its parameters (Orbax), so a
serving process can reload and run it without the model-building code.
"""

import os
import pickle
from typing import Any, Callable

import jax
import jax.numpy as jnp


def _register_pytree_serialization():
    """Registers the framework NamedTuples with jax.export (idempotent)."""
    from jax import export as jax_export

    from seed_rl_tpu.ops.normalizer import NormalizerState
    from seed_rl_tpu.ops.running_statistics import (
        AverageState,
        EMAState,
        TwoLevelState,
    )
    from seed_rl_tpu.types import AgentOutput, EnvOutput, QAgentOutput

    for cls in (
        EnvOutput,
        AgentOutput,
        QAgentOutput,
        # Normalization tracker states ride in the params of normalizing
        # agents (PPO obs_norm / V-trace-SAC NormalizerState), so exported
        # policies must serialize them too.
        EMAState,
        AverageState,
        TwoLevelState,
        NormalizerState,
    ):
        try:
            jax_export.register_namedtuple_serialization(
                cls,
                serialized_name=f"seed_rl_tpu.{cls.__module__.split('.')[-1]}"
                f".{cls.__name__}",
            )
        except ValueError:
            pass  # already registered


def export_policy(
    directory: str,
    agent,
    params,
    example_prev_action,
    example_env_output,
    deterministic: bool = True,
):
    """Serializes the agent's policy step + params to ``directory``."""
    from jax import export as jax_export

    import orbax.checkpoint as ocp

    _register_pytree_serialization()

    batch = jax.tree.leaves(example_env_output.observation)[0].shape[0]
    core_state = agent.initial_state(batch)

    def policy_fn(params, prev_action, env_output, core_state, rng):
        out, state = agent.policy_step(
            params, prev_action, env_output, core_state, rng,
            deterministic=deterministic,
        )
        return out.action, state

    args = (
        params,
        example_prev_action,
        example_env_output,
        core_state,
        jax.random.PRNGKey(0),
    )
    exported = jax_export.export(jax.jit(policy_fn))(*args)
    os.makedirs(directory, exist_ok=True)
    with open(os.path.join(directory, "policy.stablehlo"), "wb") as f:
        f.write(exported.serialize())

    ckptr = ocp.StandardCheckpointer()
    ckptr.save(
        os.path.join(os.path.abspath(directory), "params"), params
    )
    ckptr.wait_until_finished()
    with open(os.path.join(directory, "example_args.pkl"), "wb") as f:
        pickle.dump(
            jax.tree.map(
                lambda x: jax.ShapeDtypeStruct(jnp.shape(x), x.dtype), args
            ),
            f,
        )


def load_policy(directory: str) -> Callable:
    """Loads an exported policy; returns fn(prev_action, env_output,
    core_state, rng) -> (action, new_core_state)."""
    from jax import export as jax_export

    import orbax.checkpoint as ocp

    _register_pytree_serialization()
    with open(os.path.join(directory, "policy.stablehlo"), "rb") as f:
        exported = jax_export.deserialize(f.read())
    with open(os.path.join(directory, "example_args.pkl"), "rb") as f:
        arg_specs = pickle.load(f)
    ckptr = ocp.StandardCheckpointer()
    params = ckptr.restore(
        os.path.join(os.path.abspath(directory), "params"), arg_specs[0]
    )

    def policy(prev_action, env_output, core_state, rng):
        return exported.call(
            params, prev_action, env_output, core_state, rng
        )

    return policy
