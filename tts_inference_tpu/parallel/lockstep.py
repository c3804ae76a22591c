"""Launchable lockstep multi-host serving (SURVEY §5.8, VERDICT r3 #2).

`tests/test_multihost.py` proved the contract: over a process-spanning
mesh with replicated token outputs, every process that enters the same
jitted EngineCore calls in the same order computes identical tokens —
so ONE scheduler (process 0) can own the WS/HTTP API while follower
processes contribute their chips to every decode step. This module makes
that launchable (`cli serve --coordinator HOST:PORT --num-processes N
--process-id I`) instead of a test fixture.

Design: SPMD requires all processes to enter each multi-process-mesh
computation, in the same order, with the same operands. The scheduler's
device-entering surface is small — ``warmup_graphs``,
``prefill_decode_launch``, ``decode_steps_launch`` (+ the host-side paged
allocator ``_free_slot_blocks``) — and is always driven from the single
scheduler thread. So process 0 wraps its EngineCore in
:class:`MirroredCore`: each call is serialized (length-prefixed pickle)
to every follower over a TCP side channel *before* being dispatched
locally; followers replay it against their own identically-constructed
EngineCore in :func:`follower_loop`.

Device arrays cross the channel as **handles**, never bytes: both sides
register every ``jax.Array`` leaf a mirrored call returns under the same
sequential id, so when the scheduler chains a previous launch's
``last_tok``/``active`` into the next call, the descriptor carries
``("ref", id)`` and each process substitutes its own twin. Host operands
(prompts, seeds, sampling params) go by value — they are identical by
construction, which is exactly what keeps the SPMD executions bit-equal.

Non-mirrored work stays process-local: the vocoder (tiny, jitted on the
local default device from fetched host tokens), metrics, and the API.
The fused admission-vocode path is disabled under lockstep because it
feeds the mesh-replicated token output into a local single-device jit;
the async vocode worker covers first chunks instead.

CI shape (tests/test_lockstep_serve.py): 2 CPU processes × 4 virtual
devices = a dp=2(DCN-analog, gloo TCP) × tp=4(ICI-analog) global mesh;
a WS client streams audio from process 0 and the bytes match
single-process serving exactly.
"""

from __future__ import annotations

import io
import pickle
import socket
import struct
import threading
from collections import deque
from typing import List, Optional, Sequence

_HDR = struct.Struct(">Q")
_STOP = "__stop__"
# mirrored methods: everything that enters a mesh-jitted graph or mutates
# host state that later mesh-jitted calls depend on (paged allocator,
# slot length bounds, prefix pool)
MIRRORED = (
    "warmup_graphs",
    "prefill_decode_launch",
    "decode_steps_launch",
    "decode_steps",
    "prefill_slots",
    "reset_slots",
    "reset_and_seed",
    "seed_slots",
    "_free_slot_blocks",
)


def _is_jax_array(x) -> bool:
    import jax

    return isinstance(x, jax.Array)


class _Ref:
    """Wire marker: 'use your own output registered under handle id'."""

    __slots__ = ("hid",)

    def __init__(self, hid: int):
        self.hid = hid


class _JnpVal:
    """Wire marker: a jax.Array operand shipped by value. The follower must
    rebuild it as a jax array — pjit with explicit in_shardings rejects raw
    numpy ('non-trivial shardings for numpy inputs'), while an uncommitted
    local jax array (same value on every process) is accepted."""

    __slots__ = ("val",)

    def __init__(self, val):
        self.val = val


class _HandleTable:
    """Sequentially-numbered registry of mirrored-call outputs.

    Both sides run the identical registration walk after each call, so
    handle ids line up without any negotiation. Bounded: the scheduler
    only ever chains *recent* outputs (the 2-deep pipeline), so a small
    window keeps memory flat over an unbounded serve."""

    def __init__(self, window: int = 256):
        self._by_hid: deque = deque(maxlen=window)   # (hid, array)
        self._hid_of: dict = {}                       # id(array) -> hid
        self._arr_of: dict = {}                       # hid -> array
        self._next = 0

    def register_outputs(self, out) -> None:
        import jax

        for leaf in jax.tree_util.tree_leaves(out):
            if _is_jax_array(leaf):
                hid = self._next
                self._next += 1
                if len(self._by_hid) == self._by_hid.maxlen:
                    old_hid, old_arr = self._by_hid[0]
                    self._hid_of.pop(id(old_arr), None)
                    self._arr_of.pop(old_hid, None)
                self._by_hid.append((hid, leaf))
                self._hid_of[id(leaf)] = hid
                self._arr_of[hid] = leaf

    def hid_for(self, arr) -> Optional[int]:
        return self._hid_of.get(id(arr))

    def lookup(self, hid: int):
        return self._arr_of[hid]


def _encode(table: _HandleTable, obj):
    """Deep-copy obj with jax.Array leaves replaced by _Ref / numpy."""
    import jax
    import numpy as np

    def enc(x):
        if _is_jax_array(x):
            hid = table.hid_for(x)
            if hid is not None:
                return _Ref(hid)
            # not a mirrored output: must be a host-built operand — fetch.
            # (Replicated or locally-addressable arrays only; anything else
            # would mean an unmirrored mesh computation leaked through.)
            return _JnpVal(np.asarray(x))
        return x

    return jax.tree_util.tree_map(enc, obj)


def _decode(table: _HandleTable, obj):
    import jax
    import jax.numpy as jnp

    def dec(x):
        if isinstance(x, _Ref):
            return table.lookup(x.hid)
        if isinstance(x, _JnpVal):
            return jnp.asarray(x.val)
        return x

    return jax.tree_util.tree_map(
        dec, obj, is_leaf=lambda x: isinstance(x, (_Ref, _JnpVal))
    )


def _send(sock: socket.socket, payload: bytes) -> None:
    sock.sendall(_HDR.pack(len(payload)) + payload)


def _recv(sock: socket.socket) -> bytes:
    buf = io.BytesIO()
    need = _HDR.size
    while need:
        chunk = sock.recv(need)
        if not chunk:
            raise ConnectionError("lockstep channel closed")
        buf.write(chunk)
        need -= len(chunk)
    (n,) = _HDR.unpack(buf.getvalue())
    out = io.BytesIO()
    while n:
        chunk = sock.recv(min(n, 1 << 20))
        if not chunk:
            raise ConnectionError("lockstep channel closed mid-message")
        out.write(chunk)
        n -= len(chunk)
    return out.getvalue()


class MirroredCore:
    """EngineCore proxy for the coordinator (process 0).

    Mirrored methods broadcast a descriptor to every follower, then run
    locally; everything else passes straight through. One lock serializes
    [send → local dispatch], so the follower's replay order always equals
    the local dispatch order (jitted launches are async — holding the lock
    across dispatch costs microseconds, not the step time)."""

    def __init__(self, core, follower_socks: Sequence[socket.socket]):
        self._core = core
        self._socks = list(follower_socks)
        self._table = _HandleTable()
        self._lock = threading.Lock()

    def __getattr__(self, name):
        core = object.__getattribute__(self, "_core")
        attr = getattr(core, name)
        if name not in MIRRORED:
            return attr

        def mirrored(*args, **kwargs):
            with self._lock:
                kwargs.pop("timer", None)   # host-local, not picklable
                desc = pickle.dumps(
                    (name, _encode(self._table, args),
                     _encode(self._table, kwargs)),
                    protocol=pickle.HIGHEST_PROTOCOL,
                )
                for s in self._socks:
                    _send(s, desc)
                out = attr(*args, **kwargs)
                self._table.register_outputs(out)
                return out

        return mirrored

    def close(self) -> None:
        try:
            desc = pickle.dumps((_STOP, (), {}))
            for s in self._socks:
                _send(s, desc)
                s.close()
        except OSError:
            pass


def follower_loop(core, sock: socket.socket) -> int:
    """Replay mirrored calls against this process's EngineCore until the
    coordinator sends stop or the channel drops. Returns replayed count."""
    table = _HandleTable()
    n = 0
    while True:
        try:
            name, args, kwargs = pickle.loads(_recv(sock))
        except ConnectionError:
            return n
        if name == _STOP:
            return n
        out = getattr(core, name)(
            *_decode(table, args), **_decode(table, kwargs)
        )
        table.register_outputs(out)
        n += 1


def coordinator_channel(port: int, n_followers: int,
                        timeout_s: float = 300.0) -> List[socket.socket]:
    """Accept the follower side-channel connections (process 0)."""
    srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
    srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
    srv.bind(("0.0.0.0", port))
    srv.listen(n_followers)
    srv.settimeout(timeout_s)
    socks = []
    try:
        for _ in range(n_followers):
            c, _addr = srv.accept()
            c.setsockopt(socket.IPPROTO_TCP, socket.TCP_NODELAY, 1)
            c.settimeout(None)      # channel blocks for the serve lifetime
            socks.append(c)
    finally:
        srv.close()
    return socks


def follower_channel(host: str, port: int,
                     timeout_s: float = 300.0) -> socket.socket:
    """Connect a follower to the coordinator side channel (retries until
    the coordinator finishes its boot and starts listening)."""
    import time

    deadline = time.monotonic() + timeout_s
    while True:
        try:
            s = socket.create_connection((host, port), timeout=5.0)
            s.setsockopt(socket.IPPROTO_TCP, socket.TCP_NODELAY, 1)
            # the connect timeout must NOT survive into the replay loop —
            # an idle serve legitimately sends nothing for minutes
            s.settimeout(None)
            return s
        except OSError:
            if time.monotonic() >= deadline:
                raise
            time.sleep(0.25)
