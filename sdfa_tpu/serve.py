"""TCP streaming service: speech chunks in → mesh frames out, N clients.

No reference counterpart (the reference is clip-offline only —
speech_anime/model/model.py:333-426); this is the deployment surface of
the multi-session ``streaming.StreamingServer`` (DESIGN.md §12.3): many
concurrent client connections multiplex into ONE device pipeline.

Stdlib only (socket + threading — no web framework in the image, and
none needed for a length-prefixed binary protocol).

Protocol (both directions): ``uint32_be header_len | header JSON |
payload bytes`` where the header's ``nbytes`` states the payload length
(0 → no payload).

Client → server ops:

- ``{"op": "open", "speaker": int|str}`` →
  ``{"op": "ok", "sid", "wire", ["coef_fp"]}`` — ``wire`` announces the
  frame payload type for the whole connection; under the coefficient
  wires ``coef_fp`` carries the decode-system fingerprint the client's
  ``CoefDecoder`` must match (template/constraints identity).
- ``{"op": "push", "sid", "nbytes"}`` + f32le mono samples (model rate)
- ``{"op": "flush", "sid"}``   end of utterance (server zero-pads)
- ``{"op": "close", "sid"}``   free the slot early

Server → client (unsolicited, as ticks produce frames):

- ``{"op": "frames", "sid", "ts": [ms...], "shape": [...], "dtype",
  "nbytes"}`` + payload: count·prod(shape) values of ``dtype`` (numpy
  typestr). Shape/payload depend on the announced wire: vertex wires
  (``f32``/``i16``/``i8d``) ship ``shape=[V, 3]`` float32le vertices;
  the coefficient wires ship ``shape=[K]`` PCA coefficients —
  ``"<f4"`` under ``coef``, ``"<f2"`` under ``coef16`` (kept f16 end
  to end; decode locally with ``streaming.CoefDecoder``).
- ``{"op": "done", "sid"}``    every frame of a flushed stream delivered
- ``{"op": "error", "msg"}``

Threading: each connection gets a reader thread (the socketserver
handler) and a writer thread draining a per-client outbox; ONE tick
thread drives the device pipeline for all clients — device work stays
single-threaded, exactly like the bench/offline paths. A lock guards
the StreamingServer's host-side bookkeeping.
"""

from __future__ import annotations

import json
import queue
import socket
import socketserver
import struct
import threading
from typing import Dict, Optional, Tuple

import numpy as np

from .streaming import StreamingServer
from .utils import log

_HDR = struct.Struct(">I")


def send_msg(sock: socket.socket, header: dict, payload: bytes = b"") -> None:
    header = dict(header, nbytes=len(payload))
    raw = json.dumps(header).encode("utf-8")
    sock.sendall(_HDR.pack(len(raw)) + raw + payload)


def recv_msg(sock: socket.socket) -> Optional[Tuple[dict, bytes]]:
    """One framed message, or None on clean EOF."""
    hdr = _recv_exact(sock, _HDR.size)
    if hdr is None:
        return None
    (hlen,) = _HDR.unpack(hdr)
    raw = _recv_exact(sock, hlen)
    if raw is None:
        return None
    header = json.loads(raw.decode("utf-8"))
    nbytes = int(header.get("nbytes", 0))
    payload = b""
    if nbytes:
        payload = _recv_exact(sock, nbytes)
        if payload is None:
            return None
    return header, payload


def _recv_exact(sock: socket.socket, n: int) -> Optional[bytes]:
    buf = bytearray()
    while len(buf) < n:
        chunk = sock.recv(n - len(buf))
        if not chunk:
            return None
        buf.extend(chunk)
    return bytes(buf)


class _Client:
    """Per-connection state: owned sids + the outbox the writer drains."""

    def __init__(self):
        self.sids: set = set()
        self.outbox: "queue.Queue" = queue.Queue()
        self.alive = True


class ServeApp:
    """Owns the StreamingServer + tick thread; handlers call into it."""

    def __init__(self, task, capacity: int = 8, emit_batch: int = 16,
                 block_frames: int = 16, wire: str = "i16",
                 pipeline: bool = True, idle_sleep: float = 0.005,
                 warm_start: bool = True):
        self.srv = StreamingServer(task, capacity=capacity,
                                   emit_batch=emit_batch,
                                   block_frames=block_frames, wire=wire,
                                   pipeline=pipeline)
        if warm_start:
            # pre-pay every first-call cost (jit compiles / persistent-
            # cache hits, solve-constants upload) BEFORE accepting
            # connections: run one short synthetic utterance through the
            # real pool so the first client's first frame serves at warm
            # latency (VERDICT r4 #5)
            import time

            t0 = time.time()
            sid = self.srv.open(0)
            sr = int(task.hp.audio.sample_rate)
            self.srv.push(sid, np.zeros(int(0.8 * sr), np.float32))
            self.srv.flush(sid)
            for _ in range(128):
                self.srv.tick()
                if self.srv.is_done(sid):
                    break
            self.srv.close(sid)
            log.info(f"serving path warmed in {time.time() - t0:.1f}s")
        # announced in every open-ok reply: under the coefficient wires
        # frame payloads are (K,) PCA coefficients the client decodes
        # locally (streaming.CoefDecoder), not (V, 3) meshes — plus the
        # decode-system fingerprint the client's decoder must match
        self.wire = wire
        self.coef_fp = None
        if wire in ("coef", "coef16"):
            from .streaming import CoefDecoder

            self.coef_fp = CoefDecoder(task).fingerprint()
        self.lock = threading.Lock()
        self.owner: Dict[int, _Client] = {}
        self.idle_sleep = idle_sleep
        self._stop = threading.Event()
        self._wake = threading.Event()
        self._tick_thread = threading.Thread(target=self._tick_loop,
                                             daemon=True)
        self._tick_thread.start()

    # -- handler entry points (any connection thread) ---------------------
    def open(self, client: _Client, speaker) -> int:
        with self.lock:
            sid = self.srv.open(speaker)
            client.sids.add(sid)
            self.owner[sid] = client
        self._wake.set()
        return sid

    def push(self, client: _Client, sid: int, samples: np.ndarray) -> None:
        with self.lock:
            self._check_owner(client, sid)
            self.srv.push(sid, samples)
        self._wake.set()

    def flush(self, client: _Client, sid: int) -> None:
        with self.lock:
            self._check_owner(client, sid)
            self.srv.flush(sid)
        self._wake.set()

    def close_sid(self, client: _Client, sid: int) -> None:
        with self.lock:
            self._check_owner(client, sid)
            self.srv.close(sid)
            client.sids.discard(sid)
            self.owner.pop(sid, None)

    def drop_client(self, client: _Client) -> None:
        client.alive = False
        with self.lock:
            for sid in list(client.sids):
                self.srv.close(sid)
                self.owner.pop(sid, None)
            client.sids.clear()

    def shutdown(self) -> None:
        self._stop.set()
        self._wake.set()
        self._tick_thread.join(timeout=10)

    def _check_owner(self, client: _Client, sid: int) -> None:
        if self.owner.get(sid) is not client:
            raise KeyError(f"sid {sid} does not belong to this connection")

    # -- tick thread ------------------------------------------------------
    def _tick_loop(self) -> None:
        while not self._stop.is_set():
            try:
                self._tick_once()
            except Exception as exc:  # noqa: BLE001 — the tick thread must
                # survive transient device errors (XLA RESOURCE_EXHAUSTED,
                # remote-compile hiccups): a dead tick thread would leave a
                # service that accepts connections but never emits frames,
                # with every client parked in frames() forever. Report to
                # all live clients and keep ticking.
                log.error(f"tick failed: {type(exc).__name__}: {exc}")
                with self.lock:
                    clients = {c for c in self.owner.values() if c is not None}
                for client in clients:
                    if client.alive:
                        client.outbox.put((
                            {"op": "error",
                             "msg": f"tick failed: {exc}"}, b""))
                self._wake.wait(timeout=1.0)
                self._wake.clear()

    def _tick_once(self) -> None:
        # dispatch under the lock (touches slot state clients mutate);
        # the BLOCKING device→host download happens outside it — holding
        # the lock across the 300-600 ms device round would stall every
        # client push/open/flush for the whole tick
        with self.lock:
            live = self.srv.live()
            pending = self.srv.tick_dispatch() if live else None
        emitted = self.srv.tick_collect(pending)
        with self.lock:
            done = [sid for sid in self.srv.live() if self.srv.is_done(sid)]
            targets = []  # route under the lock, send outside it
            for sid, frames in emitted.items():
                client = self.owner.get(sid)
                if client is not None and client.alive and frames:
                    targets.append((client, sid, frames))
            for sid in done:
                client = self.owner.get(sid)
                if client is not None and client.alive:
                    targets.append((client, sid, None))  # done marker
                self.srv.close(sid)
                if client is not None:
                    client.sids.discard(sid)
                self.owner.pop(sid, None)
        progressed = False
        for client, sid, frames in targets:
            if frames is None:
                client.outbox.put(({"op": "done", "sid": sid}, b""))
            else:
                progressed = True
                ts = [float(t) for t, _ in frames]
                verts = np.stack([v for _, v in frames])
                # frames ship in the wire's own dtype — coef16 stays f16
                # on the TCP link too (the byte saving IS the wire)
                if verts.dtype not in (np.float16,):
                    verts = verts.astype(np.float32, copy=False)
                le = verts.dtype.newbyteorder("<")
                client.outbox.put((
                    {"op": "frames", "sid": sid, "ts": ts,
                     "shape": list(verts.shape[1:]), "dtype": le.str},
                    np.ascontiguousarray(verts.astype(le)).tobytes()))
        if not progressed:
            # nothing emitted: park until a client acts (or timeout —
            # flushed streams may still have windows to drain)
            self._wake.wait(timeout=self.idle_sleep if live else 0.25)
            self._wake.clear()


class _Handler(socketserver.BaseRequestHandler):
    def handle(self):
        app: ServeApp = self.server.app  # type: ignore[attr-defined]
        client = _Client()
        writer = threading.Thread(target=self._writer, args=(client,),
                                  daemon=True)
        writer.start()
        try:
            while True:
                msg = recv_msg(self.request)
                if msg is None:
                    break
                header, payload = msg
                try:
                    self._dispatch(app, client, header, payload)
                except Exception as exc:  # noqa: BLE001 — a malformed
                    # request (bad payload size → ValueError, non-int sid
                    # → TypeError, ...) must get a protocol error reply,
                    # not tear down the connection and every other live
                    # stream multiplexed on it
                    client.outbox.put(({"op": "error", "msg": str(exc)}, b""))
        finally:
            app.drop_client(client)
            client.outbox.put(None)  # writer sentinel
            writer.join(timeout=5)

    def _dispatch(self, app, client, header, payload):
        op = header.get("op")
        if op == "open":
            sid = app.open(client, header.get("speaker", 0))
            reply = {"op": "ok", "sid": sid, "wire": app.wire}
            if app.coef_fp is not None:
                reply["coef_fp"] = app.coef_fp
            client.outbox.put((reply, b""))
        elif op == "push":
            samples = np.frombuffer(payload, dtype="<f4")
            app.push(client, int(header["sid"]), samples)
        elif op == "flush":
            app.flush(client, int(header["sid"]))
        elif op == "close":
            app.close_sid(client, int(header["sid"]))
        else:
            client.outbox.put(
                ({"op": "error", "msg": f"unknown op {op!r}"}, b""))

    def _writer(self, client: _Client) -> None:
        while True:
            item = client.outbox.get()
            if item is None:
                return
            header, payload = item
            try:
                send_msg(self.request, header, payload)
            except OSError:
                client.alive = False
                return


class StreamServerTCP(socketserver.ThreadingTCPServer):
    allow_reuse_address = True
    daemon_threads = True

    def __init__(self, addr, app: ServeApp):
        super().__init__(addr, _Handler)
        self.app = app


def serve(task, host: str = "127.0.0.1", port: int = 9876,
          **app_kwargs) -> None:
    """Blocking entry: python -m sdfa_tpu serve ..."""
    app = ServeApp(task, **app_kwargs)
    with StreamServerTCP((host, port), app) as server:
        log.info(f"streaming server on {host}:{server.server_address[1]} "
                 f"(capacity {app.srv.N})")
        try:
            server.serve_forever()
        finally:
            app.shutdown()


class StreamClient:
    """Minimal blocking client for the protocol above (tests/examples).

    >>> with StreamClient(("127.0.0.1", 9876)) as c:
    ...     sid = c.open(speaker=0)
    ...     c.push(sid, samples); c.flush(sid)
    ...     for ts, verts in c.frames(sid):
    ...         ...
    """

    def __init__(self, addr):
        self.sock = socket.create_connection(addr)

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.sock.close()

    def open(self, speaker=0) -> int:
        send_msg(self.sock, {"op": "open", "speaker": speaker})
        header, _ = self._next()
        if header["op"] == "error":
            raise RuntimeError(header["msg"])
        # "coef"/"coef16" → frames() yields (ts, coeffs (K,)): decode
        # locally with streaming.CoefDecoder (pass decoder= to frames());
        # coef_fp is the server's decode-system fingerprint — frames()
        # asserts any passed decoder matches it before decoding
        self.wire = header.get("wire", "i16")
        self.coef_fp = header.get("coef_fp")
        return int(header["sid"])

    def push(self, sid: int, samples) -> None:
        payload = np.ascontiguousarray(
            np.asarray(samples, np.float32).ravel()).astype("<f4").tobytes()
        send_msg(self.sock, {"op": "push", "sid": sid}, payload)

    def flush(self, sid: int) -> None:
        send_msg(self.sock, {"op": "flush", "sid": sid})

    def close(self, sid: int) -> None:
        send_msg(self.sock, {"op": "close", "sid": sid})

    def frames(self, sid: int, decoder=None):
        """Yield (ts_ms, verts (V,3) f32) until the stream's done marker.

        Under the coefficient wires (``self.wire`` after open()) frames
        arrive as (K,) PCA coefficient vectors; pass a
        ``streaming.CoefDecoder`` as ``decoder`` to yield reconstructed
        (V, 3) meshes instead (decoded batched, one call per message).

        Iterates one sid at a time: messages for OTHER sids of this
        connection arriving meanwhile are skipped — open one connection
        per concurrent stream if you need interleaved consumption."""
        if decoder is not None:
            decoder.check_fingerprint(getattr(self, "coef_fp", None))
        while True:
            header, payload = self._next()
            op = header["op"]
            if op == "error":
                raise RuntimeError(header["msg"])
            if op == "done" and header["sid"] == sid:
                return
            if op == "frames" and header["sid"] == sid:
                shape = tuple(header["shape"])
                verts = np.frombuffer(
                    payload, dtype=header.get("dtype", "<f4")).reshape(
                    (len(header["ts"]),) + shape)
                if decoder is not None:
                    verts = decoder.decode(verts)
                for ts, v in zip(header["ts"], verts):
                    yield ts, v

    def _next(self):
        msg = recv_msg(self.sock)
        if msg is None:
            raise ConnectionError("server closed the connection")
        return msg
