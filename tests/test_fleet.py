"""Fleet orchestrator tests (deploy/run_fleet.py).

The reference's deployment drivers (gcp/run.py, docker/run.sh) start one
learner plus workers x actors_per_worker actor processes and rely on the
platform to restart crashed actors. These tests pin the orchestrator's
command construction (env id layout, passthrough args) and run a real tiny
fleet end-to-end: learner trains to its frame budget on unrolls streamed
from two external actor processes, then the fleet exits cleanly.
"""

import importlib.util
import os
import subprocess
import sys

import pytest

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
FLEET_PY = os.path.join(REPO_ROOT, "deploy", "run_fleet.py")


def _load_fleet():
    spec = importlib.util.spec_from_file_location("run_fleet", FLEET_PY)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_command_layout():
    fleet = _load_fleet()
    args = fleet.parse_args(
        [
            "--agent=vtrace",
            "--env=synthetic_atari_host",
            "--workers=2",
            "--actors_per_worker=3",
            "--envs_per_actor=4",
            "--server_address=/tmp/x.sock",
            "--",
            "--unroll_length=7",
        ]
    )
    num_envs = 2 * 3 * 4
    learner = fleet._learner_cmd(args, num_envs)
    assert "--run_mode=learner" in learner
    assert f"--num_envs={num_envs}" in learner
    assert "--unroll_length=7" in learner  # passthrough reaches learner
    # Actor task k steps envs [k*envs_per_actor, (k+1)*envs_per_actor):
    # the reference env_id = task * env_batch_size + i (common/actor.py:77).
    actor5 = fleet._actor_cmd(args, task=5)
    assert "--run_mode=actor" in actor5
    assert "--num_envs=4" in actor5
    assert "--env_id_offset=20" in actor5
    assert "--unroll_length=7" in actor5  # passthrough reaches actors


@pytest.mark.slow
def test_tiny_fleet_end_to_end(tmp_path):
    num_envs = 4  # 2 actors x 2 envs
    unroll_length = 5
    frames = num_envs * unroll_length * 3  # 3 learner steps
    env = {
        **os.environ,
        "JAX_PLATFORMS": "cpu",
        "PYTHONPATH": REPO_ROOT,
    }
    proc = subprocess.run(
        [
            sys.executable,
            FLEET_PY,
            "--agent=vtrace",
            "--env=synthetic_atari_host",
            "--workers=1",
            "--actors_per_worker=2",
            "--envs_per_actor=2",
            f"--logdir={tmp_path}",
            "--",
            f"--unroll_length={unroll_length}",
            f"--total_environment_frames={frames}",
        ],
        cwd=REPO_ROOT,
        env=env,
        stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT,
        timeout=420,
    )
    out = proc.stdout.decode()
    assert proc.returncode == 0, out
    assert "learner exited rc=0" in out, out
