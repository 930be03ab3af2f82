"""Throughput benchmark for the native C++ dynamic batcher.

The reference's gRPC inference layer claims "up to a million QPS"
(grpc/README.md:7). This measures the equivalent surface here — the C++
batcher behind runtime.inference_server.InferenceServer — with N client
threads each making blocking per-step inference(env_id, obs) -> action
calls (a 4-float observation, a 1-int result, the MuJoCo-class wire shape)
against a trivial handler, isolating batching/slot/wakeup overhead from
policy compute.

Usage: python scripts/bench_batcher.py [num_clients] [batch_size] [seconds]
"""

import sys
import threading
import time

import numpy as np

sys.path.insert(0, "/root/repo")

from seed_rl_tpu.runtime.inference_server import InferenceServer  # noqa: E402


class _Spec:
    def __init__(self, shape, dtype):
        self.shape = shape
        self.dtype = dtype


def main():
    num_clients = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    batch_size = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    seconds = float(sys.argv[3]) if len(sys.argv) > 3 else 5.0

    server = InferenceServer(
        handlers=[
            lambda env_ids, obs: np.zeros((len(env_ids), 1), np.int32)
        ],
        request_specs=_Spec((4,), np.float32),
        result_specs=_Spec((1,), np.int32),
        batch_size=batch_size,
        flush_timeout_ms=5,
    )

    stop = threading.Event()
    counts = [0] * num_clients

    def client(i):
        obs = np.arange(4, dtype=np.float32)
        while not stop.is_set():
            server.inference(i, obs)
            counts[i] += 1

    threads = [
        threading.Thread(target=client, args=(i,), daemon=True)
        for i in range(num_clients)
    ]
    t0 = time.perf_counter()
    for t in threads:
        t.start()
    time.sleep(seconds)
    stop.set()
    for t in threads:
        t.join(timeout=5)
    dt = time.perf_counter() - t0
    total = sum(counts)
    s = server.stats
    reqs, batches = s["total_requests"], s["total_batches"]
    server.shutdown()
    print(
        f"clients={num_clients} batch={batch_size}: {total / dt:,.0f} QPS "
        f"({batches} batches, mean fill {reqs / max(batches, 1):.1f})"
    )


if __name__ == "__main__":
    main()
