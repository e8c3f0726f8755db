"""TCP streaming service (sdfa_tpu/serve.py): protocol framing, multiple
concurrent client connections multiplexing into one device pipeline, and
end-to-end equivalence with the offline path."""

import socket
import threading

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sdfa_tpu.serve import (ServeApp, StreamClient, StreamServerTCP,
                            recv_msg, send_msg)
from sdfa_tpu.task import AnimationTask

from _assets import ensure_pca_assets


@pytest.fixture(scope="module")
def shipped_task():
    from sdfa_tpu.models import build_model
    from sdfa_tpu.tools import configure

    hp = configure("dgrad", dataset_root=ensure_pca_assets())
    model = build_model(hp, load_pca=True)
    rng = jax.random.PRNGKey(0)
    variables = model.init(
        {"params": rng, "dropout": rng},
        jnp.zeros((2, 64, 128, 3), jnp.float32),
        jnp.zeros((2,), jnp.int32), False)
    task = AnimationTask(hp, model, variables,
                         device_frontend=True, overlap_frontend=True)
    return hp, task


@pytest.fixture()
def server(shipped_task):
    hp, task = shipped_task
    app = ServeApp(task, capacity=4, emit_batch=16, block_frames=16,
                   wire="i16", pipeline=True)
    srv = StreamServerTCP(("127.0.0.1", 0), app)
    thread = threading.Thread(target=srv.serve_forever, daemon=True)
    thread.start()
    yield hp, task, srv.server_address
    srv.shutdown()
    srv.server_close()
    app.shutdown()
    thread.join(timeout=10)


def _sig(hp, seconds=1.2, seed=3, f0=150.0):
    sr = int(hp.audio.sample_rate)
    t = np.arange(int(seconds * sr)) / sr
    rng = np.random.default_rng(seed)
    s = (0.3 * np.sin(2 * np.pi * f0 * t)
         * (1 + 0.4 * np.sin(2 * np.pi * 3 * t))
         + 0.01 * rng.normal(size=len(t)))
    return np.clip(s, -1, 1).astype(np.float32)


def test_framing_roundtrip():
    a, b = socket.socketpair()
    try:
        payload = np.arange(7, dtype="<f4").tobytes()
        send_msg(a, {"op": "push", "sid": 3}, payload)
        header, got = recv_msg(b)
        assert header["op"] == "push" and header["sid"] == 3
        assert header["nbytes"] == len(payload) and got == payload
        b.close()
        assert recv_msg(a) is None  # clean EOF
    finally:
        a.close()


def test_single_stream_matches_offline(server):
    from sdfa_tpu.task import WIRE_LSB

    hp, task, addr = server
    sig = _sig(hp)
    ts_ref, verts_ref = task.generate_vertices(sig, speaker=0)
    with StreamClient(addr) as c:
        sid = c.open(speaker=0)
        # chunked push exercises framing mid-utterance
        for lo in range(0, len(sig), 2000):
            c.push(sid, sig[lo:lo + 2000])
        c.flush(sid)
        got = list(c.frames(sid))
    assert [t for t, _ in got] == list(ts_ref)
    verts = np.stack([v for _, v in got])
    err = float(np.abs(verts - np.asarray(verts_ref).reshape(verts.shape)).max())
    assert err <= 2e-5 + WIRE_LSB / 2, err


def test_concurrent_clients(server):
    from sdfa_tpu.task import WIRE_LSB

    hp, task, addr = server
    sigs = [_sig(hp, seed=s, f0=140 + 10 * s) for s in range(3)]
    results = {}
    errors = []

    def run(k):
        try:
            with StreamClient(addr) as c:
                sid = c.open(speaker=0)
                c.push(sid, sigs[k])
                c.flush(sid)
                results[k] = list(c.frames(sid))
        except Exception as exc:  # pragma: no cover
            errors.append((k, exc))

    threads = [threading.Thread(target=run, args=(k,)) for k in range(3)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=300)
    assert not errors, errors
    for k in range(3):
        ts_ref, verts_ref = task.generate_vertices(sigs[k], speaker=0)
        got = results[k]
        assert [t for t, _ in got] == list(ts_ref), k
        verts = np.stack([v for _, v in got])
        err = float(np.abs(
            verts - np.asarray(verts_ref).reshape(verts.shape)).max())
        assert err <= 2e-5 + WIRE_LSB / 2, (k, err)


def test_bad_ops_are_rejected(server):
    hp, task, addr = server
    with StreamClient(addr) as c:
        send_msg(c.sock, {"op": "nonsense"})
        header, _ = c._next()
        assert header["op"] == "error"
        # pushing to a sid this connection does not own
        send_msg(c.sock, {"op": "push", "sid": 0},
                 np.zeros(4, "<f4").tobytes())
        header, _ = c._next()
        assert header["op"] == "error"


def test_slot_released_on_disconnect(server):
    import time

    hp, task, addr = server
    c = StreamClient(addr)
    for _ in range(4):  # fill every slot (capacity=4)
        c.open(speaker=0)
    with StreamClient(addr) as c2:
        with pytest.raises(RuntimeError, match="full"):
            c2.open(speaker=0)
    c.sock.close()  # drop the connection without close/flush
    for _ in range(50):
        with StreamClient(addr) as c3:
            try:
                c3.open(speaker=0)
                return
            except RuntimeError:
                time.sleep(0.1)
    pytest.fail("slots not released after disconnect")  # pragma: no cover


def test_coef_wire_over_tcp(shipped_task):
    """A coef-wire service announces the wire at open(); frames cross as
    (K,) coefficient payloads and the client reconstructs meshes with
    CoefDecoder (frames(decoder=...)), matching offline to solve-oracle
    accuracy — no wire quantization term at all."""
    from sdfa_tpu.streaming import CoefDecoder

    hp, task = shipped_task
    app = ServeApp(task, capacity=2, emit_batch=16, block_frames=16,
                   wire="coef", pipeline=True)
    srv = StreamServerTCP(("127.0.0.1", 0), app)
    thread = threading.Thread(target=srv.serve_forever, daemon=True)
    thread.start()
    try:
        sig = _sig(hp, seconds=1.1, seed=9)
        ts_ref, verts_ref = task.generate_vertices(sig, speaker=1)
        dec = CoefDecoder(task)
        with StreamClient(srv.server_address) as c:
            sid = c.open(speaker=1)
            assert c.wire == "coef"
            c.push(sid, sig)
            c.flush(sid)
            got = list(c.frames(sid, decoder=dec))
        assert [t for t, _ in got] == list(ts_ref)
        verts = np.stack([v for _, v in got])
        err = float(np.abs(
            verts - np.asarray(verts_ref).reshape(verts.shape)).max())
        assert err <= 5e-5, err
    finally:
        srv.shutdown()
        srv.server_close()
        app.shutdown()
        thread.join(timeout=10)


def test_coef16_wire_stays_f16_on_tcp_and_fingerprint_checked(shipped_task):
    """coef16 payloads cross the TCP link as float16 (the byte saving is
    the point of the wire — ADVICE r4), the open-ok reply carries the
    decode-system fingerprint, and a mismatched fingerprint is rejected
    before any frame decodes."""
    from sdfa_tpu.streaming import CoefDecoder

    hp, task = shipped_task
    app = ServeApp(task, capacity=2, emit_batch=16, block_frames=16,
                   wire="coef16", pipeline=True)
    srv = StreamServerTCP(("127.0.0.1", 0), app)
    thread = threading.Thread(target=srv.serve_forever, daemon=True)
    thread.start()
    try:
        sig = _sig(hp, seconds=1.1, seed=9)
        ts_ref, verts_ref = task.generate_vertices(sig, speaker=1)
        dec = CoefDecoder(task)
        with StreamClient(srv.server_address) as c:
            sid = c.open(speaker=1)
            assert c.wire == "coef16"
            assert c.coef_fp == dec.fingerprint()
            c.push(sid, sig)
            c.flush(sid)
            got = list(c.frames(sid))  # undecoded: raw wire payloads
        assert [t for t, _ in got] == list(ts_ref)
        coefs = np.stack([v for _, v in got])
        assert coefs.dtype == np.float16, coefs.dtype  # f16 END TO END
        verts = dec.decode(coefs)
        err = float(np.abs(
            verts - np.asarray(verts_ref).reshape(verts.shape)).max())
        assert err <= 5e-4, err

        # tampered fingerprint → loud rejection before decode
        with StreamClient(srv.server_address) as c:
            sid = c.open(speaker=1)
            c.coef_fp = dict(c.coef_fp, system_sha1="0" * 16)
            c.push(sid, sig)
            c.flush(sid)
            with pytest.raises(AssertionError, match="decode system"):
                list(c.frames(sid, decoder=dec))
    finally:
        srv.shutdown()
        srv.server_close()
        app.shutdown()
        thread.join(timeout=10)
