"""Socket transport client for external actor processes.

The client half of the native wire in front of the batching inference
server (batcher.cc TransportServer): remote actors connect over a
unix-domain socket, discover the request/result signatures from the
server's handshake blob (the counterpart of the reference's Init RPC
signature discovery, grpc/ops/grpc.cc:145-153 + python/ops.py:137-146),
and then stream fixed-size length-free frames — one blocking
``inference(env_id, request) -> result`` per env step, batched
server-side exactly like the in-process path.

Failure semantics match the in-process server: a handler exception raises
in the blocked call (status 2); server shutdown raises RuntimeError and
closes the stream (status 1), which the actor loop's reconnect logic
handles (reference actor.py:71-74, 182-185).
"""

import pickle
import socket
import struct
import time
from typing import Optional

import numpy as np

from seed_rl_tpu.runtime.inference_server import _Codec


def _read_full(sock: socket.socket, n: int) -> bytes:
    parts = []
    while n > 0:
        chunk = sock.recv(n)
        if not chunk:
            raise ConnectionError("server closed the connection")
        parts.append(chunk)
        n -= len(chunk)
    return b"".join(parts)


def parse_address(address: str):
    """``(family, target)`` for a transport address.

    ``host:port`` / ``tcp://host:port`` -> AF_INET (cross-machine fleets,
    the reference's server_address form); anything else is a unix-domain
    socket path (single-host fleets, no TCP stack overhead).
    """
    addr = address[6:] if address.startswith("tcp://") else address
    if ":" in addr and "/" not in addr:
        if addr.startswith("["):  # bracketed IPv6, e.g. "[::1]:9000"
            host, _, port = addr[1:].partition("]:")
        else:
            host, port = addr.rsplit(":", 1)
        if not host or host == "::":
            host = "127.0.0.1"
        family = socket.AF_INET6 if ":" in host else socket.AF_INET
        return family, (host, int(port))
    return socket.AF_UNIX, addr


class SocketClient:
    """Blocking per-step inference client over a unix or TCP socket."""

    def __init__(
        self,
        path: str,
        request_specs=None,
        result_specs=None,
        connect_timeout: float = 10.0,
    ):
        family, target = parse_address(path)
        is_tcp = family in (socket.AF_INET, socket.AF_INET6)
        deadline = time.time() + connect_timeout
        while True:
            try:
                if is_tcp:
                    # create_connection resolves hostnames and picks the
                    # right family (v4/v6) via getaddrinfo.
                    self._sock = socket.create_connection(target)
                else:
                    self._sock = socket.socket(family, socket.SOCK_STREAM)
                    self._sock.connect(target)
                break
            except socket.gaierror:
                # Unresolvable host = permanent misconfiguration: fail fast
                # instead of retrying for the whole connect window.
                raise
            except (ConnectionRefusedError, FileNotFoundError, OSError):
                try:
                    self._sock.close()
                except AttributeError:
                    pass
                if time.time() > deadline:
                    raise
                time.sleep(0.05)
        if is_tcp:
            # One small request/response per env transition: disable Nagle
            # or every inference call eats an RTT of batching delay.
            self._sock.setsockopt(
                socket.IPPROTO_TCP, socket.TCP_NODELAY, 1
            )

        magic = _read_full(self._sock, 4)
        if magic != b"SRL1":
            raise ConnectionError(f"bad handshake magic {magic!r}")
        (spec_len,) = struct.unpack("<Q", _read_full(self._sock, 8))
        blob = _read_full(self._sock, spec_len) if spec_len else b""
        self.server_config = None
        if request_specs is None or result_specs is None:
            assert blob, "server sent no signatures; pass specs explicitly"
            payload = pickle.loads(blob)
            request_specs, result_specs = payload[0], payload[1]
            if len(payload) > 2:
                # Learner-pushed config rides the handshake (reference
                # get_config / update_config, common/utils.py:1074-1110).
                self.server_config = payload[2]
        self._req_codec = _Codec(request_specs)
        self._res_codec = _Codec(result_specs)
        self._sock.sendall(
            struct.pack("<QQ", self._req_codec.nbytes, self._res_codec.nbytes)
        )
        (status,) = _read_full(self._sock, 1)
        if status != 0:
            raise ConnectionError(
                "request/result byte sizes do not match the server's"
            )

    def get_config(self):
        return self.server_config

    def inference(self, env_id: int, request):
        """Blocking call; returns the un-batched result pytree."""
        import jax

        frame = struct.pack("<q", int(env_id)) + self._req_codec.encode(
            request
        )
        self._sock.sendall(frame)
        (status,) = _read_full(self._sock, 1)
        payload = _read_full(self._sock, self._res_codec.nbytes)
        if status == 2:
            raise RuntimeError("inference handler failed (server-side)")
        if status != 0:
            raise RuntimeError("inference server is shut down")
        decoded = self._res_codec.decode_batch(memoryview(payload), 1)
        return jax.tree.map(lambda x: x[0], decoded)

    def close(self):
        try:
            self._sock.shutdown(socket.SHUT_RDWR)
        except OSError:
            pass
        self._sock.close()


class RemoteActorClient:
    """Adapts SocketClient to the reference actor call convention
    (common/actor.py:108): inference(env_id, run_id, env_output,
    raw_reward) -> action, with request = (run_id, EnvOutput)."""

    def __init__(self, path: str, connect_timeout: float = 10.0):
        self._client = SocketClient(path, connect_timeout=connect_timeout)

    def get_config(self):
        return self._client.get_config()

    def inference(self, env_id, run_id, env_output, raw_reward):
        del raw_reward  # tracked learner-side via EnvOutput.reward
        (action,) = self._client.inference(
            env_id, (np.int64(run_id), env_output)
        )
        return action

    def close(self):
        self._client.close()
