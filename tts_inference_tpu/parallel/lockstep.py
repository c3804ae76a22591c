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

import hashlib
import hmac
import io
import os
import pickle
import socket
import struct
import threading
from collections import deque
from typing import List, Optional, Sequence

_HDR = struct.Struct(">Q")
_STOP = "__stop__"
_PING = "__ping__"      # liveness probe — followers ignore it
_MAGIC = b"TTSLSv1\x00"
_HELLO = struct.Struct(">8sI32s")   # magic | process_id | hmac(token)

# SECURITY: the side channel carries pickled call descriptors (arbitrary
# code execution on loads) and user prompt text. The handshake below keeps
# strangers out of follower slots and rejects coordinators that don't hold
# the shared token — but the payloads are NOT encrypted. Like
# jax.distributed's own service, the channel must stay on a trusted
# private network; bind it to the cluster-internal interface
# (--lockstep-bind), never a public one.


def _token() -> bytes:
    return os.environ.get("TTS_LOCKSTEP_TOKEN", "").encode()


def _hello_mac(token: bytes, process_id: int) -> bytes:
    return hmac.new(token or b"\x00", _MAGIC + struct.pack(">I", process_id),
                    hashlib.sha256).digest()


def _ack_mac(token: bytes) -> bytes:
    return hmac.new(token or b"\x00", _MAGIC + b"ack",
                    hashlib.sha256).digest()


class LockstepPeerLost(RuntimeError):
    """A follower channel died: the multi-process mesh is no longer whole,
    so NO further mesh computation can ever complete (every collective
    would block on the missing peer). The reference hit exactly this class
    of failure — engine-core dies, live connections hang
    (`res.md:69-77`) — so here it is fatal-by-design: the scheduler drains
    every live request with a clean error and the serve process exits
    nonzero for the supervisor (deploy/launch.py --lockstep-processes)
    to restart the whole group."""

    lockstep_fatal = True   # duck-typed by Scheduler.run_forever (no import
    #                         cycle: engine/ must not depend on parallel/)
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
    # preemption-resume (kv_on_demand): snapshot enters a mesh-jitted
    # gather (collective under a multi-process mesh — every process must
    # replay it); restore/preempt mutate sampling state / the allocator
    "snapshot_slot",
    "restore_slot",
    "preempt_slot",
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
        # by-value wire cache for REPEATED input operands (e.g. the same
        # SamplingParams arrays every decode call). jax arrays are
        # immutable, so identity-keying is sound; the deque holds strong
        # refs, which also keeps the keyed ids from being reused. Without
        # this, every mirrored call paid one blocking device fetch (a
        # full tunnel round-trip) PER operand array — measured +45 ms
        # per launch (+62%) against a 132 µs wire cost.
        self._val_cache: deque = deque(maxlen=window)  # (id, array, wire)
        self._wire_of: dict = {}                       # id(array) -> _JnpVal

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

    def wire_val(self, arr) -> Optional["_JnpVal"]:
        return self._wire_of.get(id(arr))

    def cache_wire_val(self, arr, wire: "_JnpVal") -> None:
        if len(self._val_cache) == self._val_cache.maxlen:
            old_id, _old_arr, _old_wire = self._val_cache[0]
            self._wire_of.pop(old_id, None)
        self._val_cache.append((id(arr), arr, wire))
        self._wire_of[id(arr)] = wire


def _encode(table: _HandleTable, obj):
    """Deep-copy obj with jax.Array leaves replaced by _Ref / numpy."""
    import jax
    import numpy as np

    def enc(x):
        if _is_jax_array(x):
            hid = table.hid_for(x)
            if hid is not None:
                return _Ref(hid)
            # not a mirrored output: must be a host-built operand — ship
            # by value. (Replicated or locally-addressable arrays only;
            # anything else would mean an unmirrored mesh computation
            # leaked through.) The fetch is a blocking device round-trip,
            # so repeated operands (immutable jax arrays, identity-keyed)
            # are memoized — only an operand's FIRST send pays it.
            cached = table.wire_val(x)
            if cached is not None:
                return cached
            wire = _JnpVal(np.asarray(x))
            table.cache_wire_val(x, wire)
            return wire
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
        self.peer_lost: Optional[str] = None

    def _fail(self, exc: BaseException) -> "LockstepPeerLost":
        """Mark the mirror broken, tear the channel down, and build the
        fatal error every subsequent mirrored call re-raises instantly
        (never re-touching the dead sockets)."""
        if self.peer_lost is None:
            self.peer_lost = f"{type(exc).__name__}: {exc}"
        for s in self._socks:
            try:
                s.close()
            except OSError:
                pass
        return LockstepPeerLost(
            f"lockstep follower lost ({self.peer_lost}); the multi-process "
            "mesh cannot make progress — restart the group"
        )

    def __getattr__(self, name):
        core = object.__getattribute__(self, "_core")
        attr = getattr(core, name)
        if name not in MIRRORED:
            return attr

        def mirrored(*args, **kwargs):
            with self._lock:
                if self.peer_lost is not None:
                    raise self._fail(RuntimeError(self.peer_lost))
                # 'timer' (PhaseTimer) is host-local and unpicklable: strip
                # it from the WIRE copy only — the local dispatch keeps it,
                # so the coordinator's graph census / phase timings survive
                wire_kwargs = {k: v for k, v in kwargs.items()
                               if k != "timer"}
                desc = pickle.dumps(
                    (name, _encode(self._table, args),
                     _encode(self._table, wire_kwargs)),
                    protocol=pickle.HIGHEST_PROTOCOL,
                )
                try:
                    for s in self._socks:
                        _send(s, desc)
                except OSError as e:
                    raise self._fail(e) from e
                out = attr(*args, **kwargs)
                self._table.register_outputs(out)
                return out

        return mirrored

    def lockstep_check(self) -> None:
        """Probe the follower channel (scheduler error path): a collective
        abort (gloo timeout) surfaces as a generic XLA error before any
        channel send fails — this distinguishes 'transient request error'
        from 'a follower is gone, the mesh is dead'. Two pings with a gap:
        the first send after a peer death often lands in the TCP buffer
        (RST arrives in response), only the second raises."""
        import time

        with self._lock:
            if self.peer_lost is not None:
                raise self._fail(RuntimeError(self.peer_lost))
            desc = pickle.dumps((_PING, (), {}))
            try:
                for s in self._socks:
                    _send(s, desc)
                time.sleep(0.05)
                for s in self._socks:
                    _send(s, desc)
            except OSError as e:
                raise self._fail(e) from e

    def close(self) -> None:
        if self.peer_lost is not None:
            return              # channel already torn down by _fail
        try:
            desc = pickle.dumps((_STOP, (), {}))
            for s in self._socks:
                _send(s, desc)
                s.close()
        except OSError:
            pass


def follower_loop(core, sock: socket.socket,
                  watchdog_s: Optional[float] = None) -> int:
    """Replay mirrored calls against this process's EngineCore until the
    coordinator sends stop. Returns the replayed count on a clean stop;
    raises ConnectionError if the channel drops (the caller exits nonzero
    so a supervisor restarts the group).

    Collective watchdog: if the channel hits EOF while a replayed call is
    still EXECUTING, the cluster lost a peer mid-step — this process may be
    blocked inside a mesh collective that can never complete. Rather than
    hang forever (the reference's engine-core-crash failure mode,
    `res.md:69-77`), a monitor thread gives the in-flight call
    ``watchdog_s`` (env TTS_LOCKSTEP_WATCHDOG_S, default 120 s) after EOF,
    then hard-exits the process with rc 17."""
    import sys
    import time

    if watchdog_s is None:
        watchdog_s = float(os.environ.get("TTS_LOCKSTEP_WATCHDOG_S", "120"))
    state = {"phase": "recv"}
    done = threading.Event()

    def monitor():
        import select

        while not done.wait(1.0):
            if state["phase"] != "call":
                continue
            # phase=='call' means the replay thread is NOT in sock.recv —
            # a MSG_PEEK here is race-free (peek never consumes, and a
            # concurrent blocking recv can only start after phase flips)
            try:
                r, _, _ = select.select([sock], [], [], 0)
                if not r:
                    continue
                if sock.recv(1, socket.MSG_PEEK) != b"":
                    continue        # next call already queued, not EOF
            except OSError:
                pass                # socket died under us — treat as EOF
            deadline = time.monotonic() + watchdog_s
            while not done.wait(1.0):
                if state["phase"] != "call":
                    return          # call completed; recv will see the EOF
                if time.monotonic() >= deadline:
                    print(
                        "lockstep follower: channel lost with a call "
                        f"in flight; still blocked after {watchdog_s:.0f}s "
                        "(peer-starved collective) — exiting",
                        file=sys.stderr, flush=True,
                    )
                    os._exit(17)
            return

    mon = threading.Thread(target=monitor, daemon=True,
                           name="lockstep-watchdog")
    mon.start()
    table = _HandleTable()
    n = 0
    try:
        while True:
            state["phase"] = "recv"
            try:
                raw = _recv(sock)
            except ConnectionError as e:
                raise ConnectionError(
                    f"lockstep channel lost after {n} calls: {e}") from e
            name, args, kwargs = pickle.loads(raw)
            if name == _STOP:
                return n
            if name == _PING:
                continue
            state["phase"] = "call"
            out = getattr(core, name)(
                *_decode(table, args), **_decode(table, kwargs)
            )
            table.register_outputs(out)
            n += 1
    finally:
        done.set()


def _recv_exact(sock: socket.socket, n: int) -> bytes:
    buf = b""
    while len(buf) < n:
        chunk = sock.recv(n - len(buf))
        if not chunk:
            raise ConnectionError("handshake: peer closed")
        buf += chunk
    return buf


def coordinator_channel(port: int, n_followers: int,
                        timeout_s: float = 300.0,
                        bind: str = "127.0.0.1") -> List[socket.socket]:
    """Accept the follower side-channel connections (process 0).

    `bind` defaults to loopback; `cli serve` passes the coordinator's own
    interface from --coordinator / --lockstep-bind — never 0.0.0.0 unless
    explicitly requested. Each accepted peer must present the shared-token
    handshake (TTS_LOCKSTEP_TOKEN) before it can occupy a follower slot;
    strangers are dropped and accepting continues, so a port-scanner can't
    wedge the cluster at boot. The coordinator acks with its own token
    proof so followers never pickle.loads from an impostor."""
    token = _token()
    srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
    srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
    srv.bind((bind, port))
    srv.listen(n_followers)
    srv.settimeout(timeout_s)
    socks = []
    seen_pids: set = set()
    try:
        while len(socks) < n_followers:
            c, _addr = srv.accept()
            try:
                c.settimeout(10.0)  # a stranger must not stall the boot
                magic, pid, mac = _HELLO.unpack(
                    _recv_exact(c, _HELLO.size))
                if magic != _MAGIC or pid in seen_pids or not \
                        hmac.compare_digest(mac, _hello_mac(token, pid)):
                    raise ConnectionError("bad handshake")
                c.sendall(_ack_mac(token))
            except (ConnectionError, struct.error, OSError):
                c.close()
                continue
            seen_pids.add(pid)
            c.setsockopt(socket.IPPROTO_TCP, socket.TCP_NODELAY, 1)
            c.settimeout(None)      # channel blocks for the serve lifetime
            socks.append(c)
    finally:
        srv.close()
    return socks


def follower_channel(host: str, port: int,
                     timeout_s: float = 300.0,
                     process_id: int = 1) -> socket.socket:
    """Connect a follower to the coordinator side channel (retries until
    the coordinator finishes its boot and starts listening). Sends the
    shared-token hello and verifies the coordinator's ack before returning
    — a peer that can't prove the token never gets to feed us pickles."""
    import time

    token = _token()
    deadline = time.monotonic() + timeout_s
    while True:
        try:
            s = socket.create_connection((host, port), timeout=5.0)
            s.setsockopt(socket.IPPROTO_TCP, socket.TCP_NODELAY, 1)
            s.settimeout(15.0)
            s.sendall(_HELLO.pack(_MAGIC, process_id,
                                  _hello_mac(token, process_id)))
            ack = _recv_exact(s, 32)
            if not hmac.compare_digest(ack, _ack_mac(token)):
                s.close()
                # not OSError: a token mismatch is config error, not a
                # boot race — fail fast instead of retrying to deadline
                raise RuntimeError("coordinator failed token proof — "
                                   "TTS_LOCKSTEP_TOKEN mismatch?")
            # the handshake timeout must NOT survive into the replay loop —
            # an idle serve legitimately sends nothing for minutes
            s.settimeout(None)
            return s
        except OSError:
            if time.monotonic() >= deadline:
                raise
            time.sleep(0.25)
