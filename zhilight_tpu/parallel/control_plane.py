"""Cross-host scheduler control plane.

Parity target: the reference's multi-node serving control plane — rank 0 pops
the task queue and ``engine_->broadcast_data(new_tasks)`` ships
boost-serialized SearchTasks to every node over a ZMQ REQ/REP channel
(src/generator/batch_generator.cpp:1477-1480,
3rd/bmengine/bmengine/include/bmengine/c10d/host_communicator.hpp:17-110),
after which every rank runs the identical ``batch_search`` loop.

TPU adaptation: JAX is multi-controller — EVERY process must enter every jit
computation over a multi-host mesh, in the same order — so the entire
scheduler loop runs in lockstep on every host. Rank 0 is the only source of
nondeterminism (task arrival, request cancels, session closes, wall-clock TTL
expiry): once per scheduler iteration it serializes those events and
broadcasts them; workers block on the channel and replay the events against
their (identical) local state. Device results are bit-identical across hosts
(same computation, fully-replicated outputs), so nothing else needs syncing.

The channel is a plain length-prefixed-pickle TCP fan-out: rank 0 listens,
workers connect. Like the reference's ZMQ/NCCL ports, the control port must
only be reachable inside the serving pod (pickled payloads are code-trusting).
"""

from __future__ import annotations

import logging
import pickle
import socket
import struct
import threading
import time
from typing import Any, List, Optional

logger = logging.getLogger(__name__)

__all__ = ["ControlPlane", "LocalPlane", "TcpPlane", "make_control_plane"]

# offset from the jax.distributed coordinator port for the scheduler channel
CONTROL_PORT_OFFSET = 17


class ControlPlane:
    """Rank-0-to-all broadcast channel for scheduler lockstep."""

    rank: int = 0
    world: int = 1

    def broadcast(self, obj: Any) -> Any:
        """Rank 0 sends ``obj`` to every worker and returns it; workers
        ignore their argument, block, and return what rank 0 sent.
        Returns None on rank>0 when rank 0 closed the channel (shutdown)."""
        raise NotImplementedError

    def close(self):
        pass


class LocalPlane(ControlPlane):
    """Single-host no-op plane."""

    def broadcast(self, obj: Any) -> Any:
        return obj


def _send_msg(conn: socket.socket, payload: bytes):
    conn.sendall(struct.pack("<Q", len(payload)) + payload)


def _recv_exact(conn: socket.socket, n: int) -> Optional[bytes]:
    buf = b""
    while len(buf) < n:
        chunk = conn.recv(n - len(buf))
        if not chunk:
            return None
        buf += chunk
    return buf


def _recv_msg(conn: socket.socket) -> Optional[bytes]:
    head = _recv_exact(conn, 8)
    if head is None:
        return None
    (n,) = struct.unpack("<Q", head)
    return _recv_exact(conn, n)


class TcpPlane(ControlPlane):
    """Length-prefixed-pickle TCP fan-out (reference HostCommunicator: node 0
    binds, others connect, host_communicator.hpp:29-52)."""

    def __init__(self, rank: int, world: int, address: str, timeout: float = 600.0):
        assert world > 1
        self.rank = rank
        self.world = world
        host, _, port = address.partition(":")
        port = int(port)
        self._conns: List[socket.socket] = []
        self._sock: Optional[socket.socket] = None
        self._closed = False
        if rank == 0:
            srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
            srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
            srv.bind((host if host not in ("", "0.0.0.0") else "", port))
            srv.listen(world - 1)
            srv.settimeout(timeout)
            ranks = {}
            for _ in range(world - 1):
                conn, _addr = srv.accept()
                conn.setsockopt(socket.IPPROTO_TCP, socket.TCP_NODELAY, 1)
                hello = _recv_msg(conn)
                r = pickle.loads(hello)
                ranks[r] = conn
            srv.close()
            self._conns = [ranks[r] for r in sorted(ranks)]
            logger.info("control plane: %d workers connected", len(self._conns))
        else:
            deadline = time.monotonic() + timeout
            last_err = None
            while time.monotonic() < deadline:
                try:
                    conn = socket.create_connection((host, port), timeout=5.0)
                    break
                except OSError as e:  # rank 0 not up yet
                    last_err = e
                    time.sleep(0.2)
            else:
                raise TimeoutError(f"control plane connect to {address}: {last_err}")
            conn.setsockopt(socket.IPPROTO_TCP, socket.TCP_NODELAY, 1)
            conn.settimeout(None)  # workers block on the next step broadcast
            _send_msg(conn, pickle.dumps(rank))
            self._sock = conn
            logger.info("control plane: worker %d connected to %s", rank, address)

    def broadcast(self, obj: Any) -> Any:
        if self.rank == 0:
            payload = pickle.dumps(obj, protocol=pickle.HIGHEST_PROTOCOL)
            for conn in self._conns:
                _send_msg(conn, payload)
            return obj
        msg = _recv_msg(self._sock)
        if msg is None:  # rank 0 went away: treated as shutdown
            return None
        return pickle.loads(msg)

    def close(self):
        if self._closed:
            return
        self._closed = True
        for conn in self._conns:
            try:
                conn.close()
            except OSError:
                pass
        if self._sock is not None:
            try:
                self._sock.close()
            except OSError:
                pass


def make_control_plane(pcfg, address: Optional[str] = None) -> ControlPlane:
    """Build the plane from a ParallelConfig. The channel listens on the
    jax.distributed coordinator host at coordinator port + 17 unless an
    explicit ``host:port`` is given (ZT_CONTROL_ADDR overrides)."""
    import os

    if pcfg.num_hosts <= 1:
        return LocalPlane()
    address = address or os.environ.get("ZT_CONTROL_ADDR")
    if address is None:
        if not pcfg.coordinator_address:
            raise ValueError("multi-host serving needs coordinator_address")
        host, _, port = pcfg.coordinator_address.partition(":")
        address = f"{host}:{int(port) + CONTROL_PORT_OFFSET}"
    return TcpPlane(pcfg.host_rank, pcfg.num_hosts, address)
