"""Batching inference front-end for external (host-process) actors.

The TPU-native replacement for the reference's gRPC streaming inference
server (grpc/ops/grpc.cc + common/actor.py): env threads (or an IPC shim in
front of them) call ``client.inference(env_id, obs) -> action`` per step;
the native C++ batcher (batcher.cc) groups calls into full batches with
zero-Python-overhead slot assignment; a runner thread executes the jitted
policy per batch — round-robin across bound handlers (one per inference
shard, matching grpc.cc:192-197 + vtrace learner.py:410) — and results are
sliced back to the callers.

Wire format: each request/response is a fixed-size byte blob (the
concatenation of the flattened leaves of the observation/action specs).
This mirrors the reference's fixed-signature bind contract (shape/dtype
checked per call, grpc.cc:258-337 error cases).
"""

import ctypes
import os
import subprocess
import threading
from typing import Callable, List, Optional, Sequence

import numpy as np

_LIB = None
_LIB_LOCK = threading.Lock()


def _build_and_load():
    global _LIB
    with _LIB_LOCK:
        if _LIB is not None:
            return _LIB
        here = os.path.dirname(os.path.abspath(__file__))
        src = os.path.join(here, "batcher.cc")
        lib_path = os.path.join(here, "libbatcher.so")
        if (not os.path.exists(lib_path)) or os.path.getmtime(
            lib_path
        ) < os.path.getmtime(src):
            subprocess.check_call(
                [
                    "g++",
                    "-O2",
                    "-std=c++17",
                    "-shared",
                    "-fPIC",
                    "-pthread",
                    src,
                    "-o",
                    lib_path,
                ]
            )
        lib = ctypes.CDLL(lib_path)
        lib.batcher_create.restype = ctypes.c_void_p
        lib.batcher_create.argtypes = [ctypes.c_size_t] * 4
        lib.batcher_destroy.argtypes = [ctypes.c_void_p]
        lib.batcher_submit.restype = ctypes.c_int
        lib.batcher_submit.argtypes = [
            ctypes.c_void_p,
            ctypes.c_int64,
            ctypes.c_char_p,
            ctypes.c_char_p,
        ]
        lib.batcher_get_batch.restype = ctypes.c_int
        lib.batcher_get_batch.argtypes = [
            ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_char_p),
            ctypes.POINTER(ctypes.POINTER(ctypes.c_int64)),
            ctypes.POINTER(ctypes.c_size_t),
            ctypes.POINTER(ctypes.c_uint64),
            ctypes.c_int,
        ]
        lib.batcher_complete_batch.restype = ctypes.c_int
        lib.batcher_complete_batch.argtypes = [
            ctypes.c_void_p,
            ctypes.c_uint64,
            ctypes.c_char_p,
            ctypes.c_size_t,
        ]
        lib.batcher_fail_batch.restype = ctypes.c_int
        lib.batcher_fail_batch.argtypes = [ctypes.c_void_p, ctypes.c_uint64]
        lib.batcher_shutdown.argtypes = [ctypes.c_void_p]
        lib.batcher_total_requests.restype = ctypes.c_uint64
        lib.batcher_total_requests.argtypes = [ctypes.c_void_p]
        lib.batcher_total_batches.restype = ctypes.c_uint64
        lib.batcher_total_batches.argtypes = [ctypes.c_void_p]
        lib.transport_server_create.restype = ctypes.c_void_p
        lib.transport_server_create.argtypes = [
            ctypes.c_void_p,
            ctypes.c_char_p,
            ctypes.c_char_p,
            ctypes.c_size_t,
        ]
        lib.transport_server_connections.restype = ctypes.c_uint64
        lib.transport_server_connections.argtypes = [ctypes.c_void_p]
        lib.transport_server_port.restype = ctypes.c_int
        lib.transport_server_port.argtypes = [ctypes.c_void_p]
        lib.transport_server_shutdown.argtypes = [ctypes.c_void_p]
        lib.transport_server_destroy.argtypes = [ctypes.c_void_p]
        _LIB = lib
        return lib


class _Codec:
    """Flat fixed-size byte codec for a pytree of (shape, dtype) specs."""

    def __init__(self, specs: Sequence):
        import jax

        self.leaves, self.treedef = jax.tree_util.tree_flatten(specs)
        self.sizes = [
            int(np.prod(l.shape, dtype=np.int64)) * np.dtype(l.dtype).itemsize
            for l in self.leaves
        ]
        self.nbytes = int(sum(self.sizes))

    def encode(self, values) -> bytes:
        import jax

        leaves = jax.tree_util.tree_leaves(values)
        parts = []
        for leaf, spec in zip(leaves, self.leaves):
            arr = np.asarray(leaf, np.dtype(spec.dtype))
            assert arr.shape == tuple(spec.shape), (arr.shape, spec.shape)
            parts.append(arr.tobytes())
        return b"".join(parts)

    def decode_batch(self, buf: memoryview, count: int):
        """Bytes [count * nbytes] -> pytree of [count, ...] numpy arrays."""
        import jax

        raw = np.frombuffer(buf, np.uint8, count * self.nbytes).reshape(
            count, self.nbytes
        )
        out, offset = [], 0
        for spec, size in zip(self.leaves, self.sizes):
            chunk = raw[:, offset:offset + size]
            out.append(
                np.ascontiguousarray(chunk)
                .view(np.dtype(spec.dtype))
                .reshape((count,) + tuple(spec.shape))
            )
            offset += size
        return jax.tree_util.tree_unflatten(self.treedef, out)

    def encode_batch(self, values) -> bytes:
        import jax

        leaves = jax.tree_util.tree_leaves(values)
        count = leaves[0].shape[0]
        rows = []
        for leaf, spec in zip(leaves, self.leaves):
            arr = np.asarray(leaf, np.dtype(spec.dtype)).reshape(count, -1)
            rows.append(arr.view(np.uint8).reshape(count, -1))
        return np.concatenate(rows, axis=1).tobytes()


class InferenceServer:
    """Dynamic-batching inference server driving jitted policy handlers.

    Args:
      handlers: one callable per inference shard:
        ``handler(env_ids i64[count], batched_request_pytree) -> batched
        result pytree``. Called round-robin per batch.
      request_specs / result_specs: pytrees of ShapeDtypeStruct-likes for a
        SINGLE request/result (no batch dim).
      batch_size: dynamic batch size (reference: inference_batch_size).
      num_buffers: in-flight batch buffers (2 = double buffering).
      flush_timeout_ms: fire partial batches after this idle time; -1 to
        fire only full batches (reference behavior).
    """

    def __init__(
        self,
        handlers: Sequence[Callable],
        request_specs,
        result_specs,
        batch_size: int,
        num_buffers: int = 2,
        flush_timeout_ms: int = 50,
    ):
        assert len(handlers) >= 1
        self._lib = _build_and_load()
        self._handlers = list(handlers)
        self._request_specs = request_specs
        self._result_specs = result_specs
        self._req_codec = _Codec(request_specs)
        self._res_codec = _Codec(result_specs)
        self._transport = None
        self.batch_size = batch_size
        self._flush_timeout_ms = flush_timeout_ms
        self._handle = self._lib.batcher_create(
            batch_size,
            self._req_codec.nbytes,
            self._res_codec.nbytes,
            num_buffers,
        )
        assert self._handle
        self._handler_error = None  # last handler exception (repr string)
        self._runner = threading.Thread(target=self._run, daemon=True)
        self._stopped = threading.Event()
        self._runner.start()

    def _run(self):
        lib = self._lib
        shard = 0
        data_p = ctypes.c_char_p()
        ids_p = ctypes.POINTER(ctypes.c_int64)()
        count = ctypes.c_size_t()
        ticket = ctypes.c_uint64()
        while True:
            rc = lib.batcher_get_batch(
                self._handle,
                ctypes.byref(data_p),
                ctypes.byref(ids_p),
                ctypes.byref(count),
                ctypes.byref(ticket),
                self._flush_timeout_ms,
            )
            if rc == 1:
                return  # shutdown
            if rc == 2:
                continue  # timeout, nothing to do
            n = count.value
            buf = ctypes.string_at(data_p, n * self._req_codec.nbytes)
            env_ids = np.ctypeslib.as_array(ids_p, shape=(n,)).copy()
            requests = self._req_codec.decode_batch(memoryview(buf), n)

            handler = self._handlers[shard]
            shard = (shard + 1) % len(self._handlers)
            try:
                results = handler(env_ids, requests)
                encoded = self._res_codec.encode_batch(results)
            except Exception as exc:  # keep the runner alive: a dead runner
                # deadlocks every blocked submitter. Mark the batch failed so
                # every blocked inference() call raises — the error-
                # propagation parity of the reference's server cancellation
                # on handler errors (grpc.cc:381-397, ops_test.py:384-541).
                import traceback

                self._handler_error = "".join(
                    traceback.format_exception_only(type(exc), exc)
                ).strip()
                traceback.print_exc()
                lib.batcher_fail_batch(self._handle, ticket.value)
                continue
            lib.batcher_complete_batch(
                self._handle, ticket.value, encoded, n
            )

    def inference(self, env_id: int, request):
        """Blocking per-step call from an actor thread."""
        req = self._req_codec.encode(request)
        out = ctypes.create_string_buffer(self._res_codec.nbytes)
        rc = self._lib.batcher_submit(self._handle, env_id, req, out)
        if rc == 2:
            raise RuntimeError(
                "inference handler failed: "
                f"{self._handler_error or 'unknown error'}"
            )
        if rc != 0:
            raise RuntimeError("inference server is shut down")
        decoded = self._res_codec.decode_batch(
            memoryview(out.raw), 1
        )
        import jax

        return jax.tree.map(lambda x: x[0], decoded)

    def serve_unix(self, path: str, config=None) -> None:
        """Open a native socket front-end at ``path``.

        ``path`` is a unix-domain socket path, or ``host:port`` /
        ``tcp://host:port`` for cross-machine actor fleets (port 0 binds an
        ephemeral port — read it from :attr:`bound_port`). Remote actor
        processes connect with
        ``seed_rl_tpu.runtime.transport.SocketClient`` (or
        ``RemoteActorClient``); their calls flow through the same C++
        batcher as in-process ``inference()`` calls. The handshake carries
        the request/result signatures (reference Init RPC discovery,
        grpc.cc:145-153) plus an optional learner ``config`` payload
        (reference serialize_config/update_config push,
        common/utils.py:1074-1110).
        """
        import pickle

        assert self._transport is None, "transport already started"
        payload = (self._request_specs, self._result_specs, config)
        blob = pickle.dumps(payload)
        self._transport = self._lib.transport_server_create(
            self._handle, path.encode(), blob, len(blob)
        )
        if not self._transport:
            raise OSError(f"failed to bind transport socket at {path}")

    serve = serve_unix  # address-generic alias

    @property
    def bound_port(self) -> int:
        """Bound TCP port (0 for unix-domain transports / no transport)."""
        if not self._transport:
            return 0
        return self._lib.transport_server_port(self._transport)

    @property
    def stats(self):
        stats = {
            "total_requests": self._lib.batcher_total_requests(self._handle),
            "total_batches": self._lib.batcher_total_batches(self._handle),
        }
        if self._transport:
            stats["connections"] = self._lib.transport_server_connections(
                self._transport
            )
        return stats

    def shutdown(self):
        if not self._stopped.is_set():
            self._stopped.set()
            self._lib.batcher_shutdown(self._handle)
            if self._transport:
                self._lib.transport_server_shutdown(self._transport)
                self._lib.transport_server_destroy(self._transport)
                self._transport = None
            self._runner.join(timeout=5)
