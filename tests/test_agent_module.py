"""--agent_module free composition hook (the reference's gin seam).

The reference composes loss x net x optimizer via gin
(mujoco/ppo_main.py:37-107 + mujoco/gin/ppo.gin); here the same freedom is
plain Python: a user module's configure(args, env, components) replaces
any piece of the agent stack before the learner is built. These tests pin
(a) the shipped example module end-to-end through the CLI and (b) the
hook mechanics (mutation, replacement, validation).
"""

import os

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
EXAMPLE = os.path.join(
    REPO, "scripts", "examples", "custom_ppo_composition.py"
)


def test_example_module_composes_and_trains(tmp_path):
    """The shipped example (V-MPO + V-trace advantages + PopArt
    compensation + AdamW over a 3x128 net) trains through the CLI."""
    from seed_rl_tpu import train

    train.main([
        "--agent=ppo", "--env=toy", "--num_envs=16",
        "--unroll_length=4", "--epochs_per_step=1",
        "--batches_per_step=2", "--total_environment_frames=256",
        f"--agent_module={EXAMPLE}", f"--logdir={tmp_path}",
        "--steps_per_call=1",
    ])


def test_hook_replaces_optimizer(tmp_path):
    """A minimal module swapping only the optimizer is honored."""
    import optax

    from seed_rl_tpu import train

    mod = tmp_path / "swap_opt.py"
    mod.write_text(
        "import optax\n"
        "CALLS = []\n"
        "def configure(args, env, components):\n"
        "    CALLS.append(sorted(components))\n"
        "    components['optimizer'] = optax.sgd(1e-3)\n"
        "    return components\n"
    )
    train.main([
        "--agent=vtrace", "--env=toy", "--num_envs=16",
        "--unroll_length=4", "--total_environment_frames=256",
        f"--agent_module={mod}", f"--logdir={tmp_path / 'log'}",
        "--steps_per_call=1",
    ])


def test_hook_missing_configure_fails_loudly(tmp_path):
    from seed_rl_tpu import train

    mod = tmp_path / "empty.py"
    mod.write_text("x = 1\n")
    with pytest.raises(AssertionError, match="configure"):
        train.main([
            "--agent=vtrace", "--env=toy", "--num_envs=8",
            "--unroll_length=4", "--total_environment_frames=64",
            f"--agent_module={mod}",
        ])
