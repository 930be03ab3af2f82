"""Actor-process worker for the socket-transport test.

Usage: python tests/transport_worker.py <socket_path> <env_offset> <n_envs>
<rounds>. Connects N env threads to the learner's unix-socket front-end,
runs `rounds` inference calls each (request [env_id, round]), verifies the
handler's results, prints "OK <total_calls>" on success.
"""

import sys
import threading

import numpy as np


def main():
    path, offset, n_envs, rounds = (
        sys.argv[1],
        int(sys.argv[2]),
        int(sys.argv[3]),
        int(sys.argv[4]),
    )
    from seed_rl_tpu.runtime.transport import SocketClient

    failures = []
    done = []

    def env_thread(i):
        env_id = offset + i
        try:
            client = SocketClient(path)
            for r in range(rounds):
                req = np.array([env_id, r], np.float32)
                res = client.inference(env_id, req)
                np.testing.assert_allclose(res, [2.0 * env_id, 2.0 * r])
                done.append(1)
            client.close()
        except Exception as e:  # pragma: no cover
            failures.append(repr(e))

    threads = [
        threading.Thread(target=env_thread, args=(i,)) for i in range(n_envs)
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=60)
    if failures:
        print("FAIL", failures[:3], flush=True)
        sys.exit(1)
    print("OK", len(done), flush=True)


if __name__ == "__main__":
    main()
