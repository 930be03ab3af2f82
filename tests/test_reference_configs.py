"""CI smoke for the reference-config launch scripts.

Each script under scripts/reference_configs/ maps a reference training
config (gcp/train_*.sh, local_baseline_*.sh, sac_main.py defaults) onto
this framework's CLI. These tests execute the actual scripts with tiny
frame/size overrides (later CLI flags win) and, where the real simulator
dependency is absent (ale_py, deepmind_lab), substitute the synthetic/toy
env that exercises the identical code path — so the shipped scripts are
verified launchable, not just documentation.
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CONFIGS = os.path.join(REPO, "scripts", "reference_configs")


def _run_script(name, env_name, overrides, timeout=420, extra_env=None):
    # Fresh logdir: a stale one would restore-on-start from a previous
    # test run's checkpoint, whose state structure may no longer match.
    logdir = f"/tmp/seed_rl_tpu_cfg_smoke_{name}"
    import shutil

    shutil.rmtree(logdir, ignore_errors=True)
    env = {
        **os.environ,
        "JAX_PLATFORMS": "cpu",
        "PYTHONPATH": REPO,
        "LOGDIR": logdir,
        **(extra_env or {}),
    }
    proc = subprocess.run(
        ["bash", os.path.join(CONFIGS, name), env_name] + overrides,
        cwd=REPO,
        env=env,
        capture_output=True,
        timeout=timeout,
    )
    assert proc.returncode == 0, (
        proc.stdout.decode()[-2000:] + proc.stderr.decode()[-2000:]
    )
    return proc.stdout.decode() + proc.stderr.decode()


def test_mujoco_ppo_reference_config_launches():
    _run_script(
        "train_mujoco_ppo.sh",
        "HalfCheetah-v5",
        [
            "--num_envs=8",
            "--batches_per_step=2",
            "--epochs_per_step=1",
            "--total_environment_frames=256",
        ],
    )


def test_mujoco_sac_reference_config_launches():
    _run_script(
        "train_mujoco_sac.sh",
        "HalfCheetah-v5",
        [
            "--num_envs=4",
            "--batch_size=16",
            "--replay_buffer_size=512",
            "--replay_buffer_min_size=32",
            "--total_environment_frames=160",
        ],
    )


def test_atari_r2d2_reference_config_launches():
    # ale_py absent: synthetic host Atari exercises the same pipeline
    # (thread-pooled host stepping, host-RAM replay, replay-ratio).
    _run_script(
        "train_atari_r2d2.sh",
        "Pong",
        [
            "--env=synthetic_atari_host",
            "--num_envs=4",
            "--num_eval_envs=1",
            "--unroll_length=6",
            "--burn_in=2",
            "--n_steps=2",
            "--batch_size=4",
            "--replay_buffer_size=64",
            "--replay_buffer_min_size=8",
            "--total_environment_frames=360",
        ],
    )


def test_dmlab_vtrace_reference_config_launches():
    # deepmind_lab absent: the synthetic device path exercises the same
    # fused rollout+train program (conv+LSTM over uint8 frames).
    _run_script(
        "train_dmlab_vtrace.sh",
        "explore_goal_locations_small",
        [
            "--env=synthetic_atari",
            "--num_envs=8",
            "--unroll_length=6",
            "--steps_per_call=2",
            "--total_environment_frames=384",
        ],
    )


def test_atari_r2d2_fleet_config_launches():
    """The reference R2D2 cloud DATA-PLANE shape: run_fleet.py spawns a
    remote learner + actor processes; synthetic host Atari stands in for
    ALE. Verifies the fleet trains to the frame budget and exits 0."""
    _run_script(
        "train_atari_r2d2_fleet.sh",
        "Pong",
        [
            "--env=synthetic_atari_host",
            "--num_eval_envs=1",
            "--unroll_length=5",
            "--burn_in=2",
            "--n_steps=2",
            "--batch_size=2",
            "--replay_ratio=1.0",
            "--replay_buffer_size=32",
            "--replay_buffer_min_size=2",
            "--total_environment_frames=40",
        ],
        extra_env={
            "WORKERS": "1",
            "ACTORS_PER_WORKER": "2",
            "ENVS_PER_ACTOR": "2",
        },
    )
