"""Tests for the C++ dynamic-batching inference server.

Mirrors /root/reference/grpc/python/ops_test.py semantics: correctness of
batched calls, server-side batch trigger, multi-client thread stress,
round-robin over bound handlers, shutdown unblocking half-filled batches,
and partial-batch flushing.
"""

import threading
import time

import numpy as np
import jax
import pytest

from seed_rl_tpu.runtime.inference_server import InferenceServer, _Codec


def _spec(shape, dtype):
    return jax.ShapeDtypeStruct(shape, dtype)


def test_codec_roundtrip():
    specs = {
        "a": _spec((3,), np.float32),
        "b": _spec((2, 2), np.uint8),
    }
    codec = _Codec(specs)
    value = {
        "a": np.array([1.0, 2.0, 3.0], np.float32),
        "b": np.arange(4, dtype=np.uint8).reshape(2, 2),
    }
    raw = codec.encode(value)
    assert len(raw) == codec.nbytes
    decoded = codec.decode_batch(memoryview(raw), 1)
    np.testing.assert_array_equal(decoded["a"][0], value["a"])
    np.testing.assert_array_equal(decoded["b"][0], value["b"])


def _make_server(batch_size, handlers=None, flush_timeout_ms=100):
    request_specs = _spec((2,), np.float32)
    result_specs = _spec((2,), np.float32)
    if handlers is None:
        handlers = [lambda env_ids, x: x * 2.0]
    return InferenceServer(
        handlers,
        request_specs,
        result_specs,
        batch_size=batch_size,
        flush_timeout_ms=flush_timeout_ms,
    )


def test_full_batch_correctness_many_threads():
    batch = 8
    server = _make_server(batch)
    results = {}

    def worker(i):
        req = np.array([i, i + 0.5], np.float32)
        results[i] = server.inference(i, req)

    threads = [
        threading.Thread(target=worker, args=(i,)) for i in range(32)
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=20)
    assert len(results) == 32
    for i in range(32):
        np.testing.assert_allclose(
            results[i], [2 * i, 2 * i + 1.0], rtol=1e-6
        )
    assert server.stats["total_requests"] == 32
    # 32 requests at batch 8 -> exactly 4 full batches.
    assert server.stats["total_batches"] == 4
    server.shutdown()


def test_partial_batch_flush():
    server = _make_server(8, flush_timeout_ms=50)
    # 3 requests < batch 8: only the flush timeout can complete them.
    out = []
    threads = [
        threading.Thread(
            target=lambda i=i: out.append(
                (i, server.inference(i, np.array([i, i], np.float32)))
            )
        )
        for i in range(3)
    ]
    start = time.time()
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=10)
    assert len(out) == 3
    assert time.time() - start < 5
    for i, res in out:
        np.testing.assert_allclose(res, [2 * i, 2 * i])
    server.shutdown()


def test_round_robin_over_handlers():
    calls = []

    def make_handler(tag):
        def handler(env_ids, x):
            calls.append(tag)
            return x + float(tag)

        return handler

    server = _make_server(
        4, handlers=[make_handler(0), make_handler(1)], flush_timeout_ms=-1
    )
    results = {}

    def worker(i):
        results[i] = server.inference(
            i, np.zeros(2, np.float32)
        )

    threads = [
        threading.Thread(target=worker, args=(i,)) for i in range(8)
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=10)
    assert sorted(calls) == [0, 1]
    offsets = sorted(float(v[0]) for v in results.values())
    assert offsets.count(0.0) == 4 and offsets.count(1.0) == 4
    server.shutdown()


def test_shutdown_unblocks_half_filled_batch():
    server = _make_server(8, flush_timeout_ms=-1)
    errors = []

    def worker(i):
        try:
            server.inference(i, np.zeros(2, np.float32))
        except RuntimeError as e:
            errors.append(str(e))

    threads = [
        threading.Thread(target=worker, args=(i,)) for i in range(3)
    ]
    for t in threads:
        t.start()
    time.sleep(0.3)
    server.shutdown()
    for t in threads:
        t.join(timeout=10)
    assert len(errors) == 3


def test_handler_sees_env_ids():
    seen = []

    def handler(env_ids, x):
        seen.extend(env_ids.tolist())
        return x

    server = _make_server(4, handlers=[handler], flush_timeout_ms=-1)
    threads = [
        threading.Thread(
            target=lambda i=i: server.inference(
                100 + i, np.zeros(2, np.float32)
            )
        )
        for i in range(4)
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=10)
    assert sorted(seen) == [100, 101, 102, 103]
    server.shutdown()


def test_handler_error_propagates_to_all_blocked_callers():
    """A crashing policy must raise in every blocked inference() call, not
    silently return zeros (reference cancellation semantics,
    grpc.cc:381-397 / ops_test.py:384-541)."""
    fail_first = [True]

    def handler(env_ids, x):
        if fail_first[0]:
            fail_first[0] = False
            raise ValueError("policy exploded")
        return x * 2.0

    server = _make_server(4, handlers=[handler], flush_timeout_ms=-1)
    errors, ok = [], []

    def worker(i):
        try:
            ok.append(server.inference(i, np.zeros(2, np.float32)))
        except RuntimeError as e:
            errors.append(str(e))

    threads = [
        threading.Thread(target=worker, args=(i,)) for i in range(4)
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=10)
    assert len(errors) == 4 and not ok
    assert all("policy exploded" in e for e in errors)

    # The server must stay alive and serve subsequent batches normally.
    results = {}

    def worker2(i):
        results[i] = server.inference(
            i, np.array([i, i], np.float32)
        )

    threads = [
        threading.Thread(target=worker2, args=(i,)) for i in range(4)
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=10)
    assert len(results) == 4
    for i in range(4):
        np.testing.assert_allclose(results[i], [2.0 * i, 2.0 * i])
    server.shutdown()


def test_sustained_throughput_multiple_rounds():
    """Many rounds per thread — exercises buffer recycling."""
    batch = 4
    server = _make_server(batch, flush_timeout_ms=100)
    n_threads, rounds = 8, 25
    failures = []

    def worker(i):
        try:
            for r in range(rounds):
                req = np.array([i, r], np.float32)
                res = server.inference(i, req)
                np.testing.assert_allclose(res, [2.0 * i, 2.0 * r])
        except Exception as e:  # pragma: no cover
            failures.append(e)

    threads = [
        threading.Thread(target=worker, args=(i,)) for i in range(n_threads)
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=60)
    assert not failures, failures
    assert server.stats["total_requests"] == n_threads * rounds
    server.shutdown()
