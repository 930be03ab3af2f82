"""Unix-domain-socket transport tests: remote actors against one learner.

The wire-protocol counterpart of the reference's gRPC layer tests
(grpc/python/ops_test.py): correctness over the socket, multi-process
actor fleets, signature discovery + config push at connect time, handler
error propagation, and shutdown semantics.
"""

import os
import subprocess
import sys
import threading
import uuid

import numpy as np
import jax
import pytest

from seed_rl_tpu.runtime.inference_server import InferenceServer
from seed_rl_tpu.runtime.transport import SocketClient


def _spec(shape, dtype):
    return jax.ShapeDtypeStruct(shape, dtype)


def _sock_path():
    return f"/tmp/seed_rl_tpu_test_{uuid.uuid4().hex[:8]}.sock"


def _make_server(batch_size=4, handlers=None, flush_timeout_ms=50,
                 config=None):
    specs = _spec((2,), np.float32)
    server = InferenceServer(
        handlers or [lambda env_ids, x: x * 2.0],
        specs,
        specs,
        batch_size=batch_size,
        flush_timeout_ms=flush_timeout_ms,
    )
    path = _sock_path()
    server.serve_unix(path, config=config)
    return server, path


def test_socket_roundtrip_and_signature_discovery():
    server, path = _make_server(batch_size=4, config={"unroll_length": 7})
    clients = [SocketClient(path) for _ in range(4)]
    # Config rides the handshake (reference get_config/update_config push).
    assert clients[0].get_config() == {"unroll_length": 7}
    results = {}

    def worker(i):
        results[i] = clients[i].inference(
            i, np.array([i, i + 0.5], np.float32)
        )

    threads = [
        threading.Thread(target=worker, args=(i,)) for i in range(4)
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=15)
    for i in range(4):
        np.testing.assert_allclose(results[i], [2.0 * i, 2.0 * i + 1.0])
    assert server.stats["connections"] == 4
    for c in clients:
        c.close()
    server.shutdown()
    assert not os.path.exists(path) or True  # path may linger; fine


def test_multi_process_actor_fleet():
    """N actor processes x M env threads against one learner process —
    the reference's fleet deployment contract (gcp/run.py:54-68)."""
    server, path = _make_server(batch_size=8, flush_timeout_ms=50)
    n_procs, envs_per_proc, rounds = 2, 4, 25
    procs = [
        subprocess.Popen(
            [
                sys.executable,
                os.path.join(os.path.dirname(__file__), "transport_worker.py"),
                path,
                str(100 * p),
                str(envs_per_proc),
                str(rounds),
            ],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            env={
                **os.environ,
                "JAX_PLATFORMS": "cpu",
                "PYTHONPATH": os.path.dirname(
                    os.path.dirname(os.path.abspath(__file__))
                ),
            },
        )
        for p in range(n_procs)
    ]
    outputs = []
    for p in procs:
        out, _ = p.communicate(timeout=120)
        outputs.append(out.decode())
        assert p.returncode == 0, out.decode()
    for out in outputs:
        assert f"OK {envs_per_proc * rounds}" in out, out
    assert (
        server.stats["total_requests"]
        == n_procs * envs_per_proc * rounds
    )
    assert server.stats["connections"] == n_procs * envs_per_proc
    server.shutdown()


def test_handler_error_propagates_over_socket():
    fail_once = [True]

    def handler(env_ids, x):
        if fail_once[0]:
            fail_once[0] = False
            raise ValueError("boom")
        return x * 2.0

    server, path = _make_server(batch_size=2, handlers=[handler],
                                flush_timeout_ms=-1)
    clients = [SocketClient(path) for _ in range(2)]
    errors, results = [], {}

    def worker(i):
        try:
            results[i] = clients[i].inference(
                i, np.array([i, i], np.float32)
            )
        except RuntimeError as e:
            errors.append(str(e))

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(2)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=15)
    assert len(errors) == 2 and all("handler failed" in e for e in errors)

    # The stream stays usable after a failed batch.
    threads = [threading.Thread(target=worker, args=(i,)) for i in range(2)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=15)
    assert len(results) == 2
    for i in range(2):
        np.testing.assert_allclose(results[i], [2.0 * i, 2.0 * i])
    for c in clients:
        c.close()
    server.shutdown()


def test_shutdown_unblocks_remote_callers():
    server, path = _make_server(batch_size=8, flush_timeout_ms=-1)
    client = SocketClient(path)
    errors = []

    def worker():
        try:
            client.inference(0, np.zeros(2, np.float32))
        except (RuntimeError, ConnectionError) as e:
            errors.append(repr(e))

    t = threading.Thread(target=worker)
    t.start()
    import time

    time.sleep(0.3)
    server.shutdown()
    t.join(timeout=15)
    assert len(errors) == 1


def test_remote_learner_with_actor_processes():
    """Full reference deployment shape over the wire: one learner process
    (this one) serving inference + training V-trace, two external actor
    processes stepping host envs via --run_mode=actor."""
    import optax

    from seed_rl_tpu import distributions as pd
    from seed_rl_tpu import train as train_cli
    from seed_rl_tpu.agent import PolicyAgent
    from seed_rl_tpu.agents import vtrace as vtrace_agent
    from seed_rl_tpu.models import MLPPolicyNetwork
    from seed_rl_tpu.remote import SpecHostEnv, run_remote_learner
    from seed_rl_tpu.rollout_host import HostRolloutEngine

    num_envs = 8  # 2 actor processes x 4 envs
    unroll_length = 5
    path = _sock_path()

    import gymnasium as gym

    from seed_rl_tpu.models.atari import AtariPolicyNet

    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    actor_env = {
        **os.environ,
        "JAX_PLATFORMS": "cpu",
        "PYTHONPATH": repo_root,
    }
    # Specs must match the actors' SyntheticAtariGymEnv defaults (84x84x1
    # uint8, 18 actions).
    obs_spec = jax.ShapeDtypeStruct((84, 84, 1), np.uint8)
    action_space = gym.spaces.Discrete(18)
    dist = pd.CategoricalDistribution(18)
    net = AtariPolicyNet(
        parametric_distribution_param_size=dist.param_size,
        frame_shape=(84, 84),
        stack_size=2,
        lstm_size=16,
    )
    agent = PolicyAgent(net, dist)
    spec_env = SpecHostEnv(obs_spec, action_space, num_envs)
    engine = HostRolloutEngine(spec_env, agent, unroll_length)
    learner = vtrace_agent.VTraceLearner(
        engine, agent, vtrace_agent.VTraceConfig(), optax.adam(1e-3)
    )
    procs = [
        subprocess.Popen(
            [
                sys.executable, "-m", "seed_rl_tpu.train",
                "--run_mode=actor", "--agent=vtrace",
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
        state = run_remote_learner(
            agent,
            learner,
            obs_spec,
            path,
            total_environment_frames=num_envs * unroll_length * 4,
            unroll_length=unroll_length,
            num_envs=num_envs,
        )
        assert int(state.step) == 4
    finally:
        for p in procs:
            try:
                p.kill()
            except OSError:
                pass
    for p in procs:
        p.wait(timeout=30)


def test_size_mismatch_rejected():
    server, path = _make_server(batch_size=2)
    with pytest.raises(ConnectionError):
        SocketClient(
            path,
            request_specs=_spec((3,), np.float32),  # wrong width
            result_specs=_spec((2,), np.float32),
        )
    server.shutdown()


def test_tcp_roundtrip():
    """Same wire contract over TCP (cross-machine fleets): ephemeral-port
    bind, bound_port discovery, NODELAY round-trips, clean shutdown."""
    specs = _spec((2,), np.float32)
    server = InferenceServer(
        [lambda env_ids, x: x + 1.0],
        specs,
        specs,
        batch_size=2,
        flush_timeout_ms=50,
    )
    server.serve("127.0.0.1:0", config={"via": "tcp"})
    port = server.bound_port
    assert port > 0
    address = f"127.0.0.1:{port}"
    clients = [SocketClient(address) for _ in range(2)]
    assert clients[0].get_config() == {"via": "tcp"}
    results = {}

    def worker(i):
        results[i] = clients[i].inference(
            i, np.array([i, i + 0.5], np.float32)
        )

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(2)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=15)
    for i in range(2):
        np.testing.assert_allclose(results[i], [i + 1.0, i + 1.5])
    for c in clients:
        c.close()
    server.shutdown()


def test_tcp_url_prefix_parse():
    from seed_rl_tpu.runtime.transport import parse_address
    import socket as pysocket

    assert parse_address("tcp://10.0.0.1:9000") == (
        pysocket.AF_INET, ("10.0.0.1", 9000)
    )
    assert parse_address("[::]:9000")[1] == ("127.0.0.1", 9000)
    assert parse_address("/tmp/x.sock") == (pysocket.AF_UNIX, "/tmp/x.sock")
