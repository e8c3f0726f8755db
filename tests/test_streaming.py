"""StreamingSession == offline generate_vertices on the same audio.

The streaming path recomputes the frontend in blocks, deltas with the
band SG operators, and the suffix in emit_batch buckets — all
reassociations of the offline math, so vertices match to fp tolerance
and the timeline matches exactly.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

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
    assert task.overlap_frontend
    return hp, task


def _sig(hp, seconds=1.6, seed=3):
    sr = int(hp.audio.sample_rate)
    t = np.arange(int(seconds * sr)) / sr
    rng = np.random.default_rng(seed)
    s = (0.3 * np.sin(2 * np.pi * 150 * t)
         * (1 + 0.4 * np.sin(2 * np.pi * 3 * t))
         + 0.01 * rng.normal(size=len(t)))
    return np.clip(s, -1, 1).astype(np.float32)


class TestStreaming:
    def test_matches_offline(self, shipped_task):
        hp, task = shipped_task
        sig = _sig(hp, seconds=3.0)
        ts_ref, verts_ref = task.generate_vertices(sig, 0)

        sess = task.stream(0, emit_batch=16)
        got = []
        rng = np.random.default_rng(0)
        i = 0
        while i < len(sig):
            n = int(rng.integers(400, 3000))
            got.extend(sess.push(sig[i : i + n]))
            i += n
        n_live = len(got)
        got.extend(sess.flush())

        assert [ts for ts, _ in got] == list(ts_ref)
        verts = np.stack([v for _, v in got])
        assert verts.shape == verts_ref.shape
        np.testing.assert_allclose(verts, verts_ref, atol=5e-5)
        # most frames must arrive BEFORE flush (it's streaming, not batch)
        assert n_live > len(got) * 0.55, (n_live, len(got))

    def test_matches_offline_at_bucket_boundary_length(self, shipped_task):
        """ADVICE r2 #1 end-to-end: a clip whose frame grid lands exactly
        on the 256-frame jit bucket with MINIMAL right slack — the class
        where the last windows' deltas historically hit the offline
        right-edge SG fits while streaming used interior taps."""
        from sdfa_tpu.audio.pipeline import WindowSpec

        hp, task = shipped_task
        wspec = WindowSpec(hp)
        n_pick = None
        for t_target in range(280, 420):
            n = t_target * wspec.hop_size + wspec.win_size
            idx, _, _, _, t_total = wspec.frame_grid(n, bucket=256)
            # minimal slack is 5 (the +4 interiority pad + 1); demand <= 6
            if t_total % 256 == 0 and t_total - int(idx.max()) <= 6:
                n_pick = n
                break
        assert n_pick is not None, "no boundary length found in sweep"

        sr = int(hp.audio.sample_rate)
        sig = _sig(hp, seconds=n_pick / sr)[:n_pick]
        assert len(sig) == n_pick
        ts_ref, verts_ref = task.generate_vertices(sig, 0)
        sess = task.stream(0, emit_batch=16)
        got = list(sess.push(sig))
        got.extend(sess.flush())
        assert [ts for ts, _ in got] == list(ts_ref)
        np.testing.assert_allclose(
            np.stack([v for _, v in got]), verts_ref, atol=5e-5)

    def test_lookahead_bound(self, shipped_task):
        """Every frame arrives within lookahead_s + one block of audio of
        its timestamp: push sample-exact and record arrival positions."""
        hp, task = shipped_task
        sig = _sig(hp, seconds=1.2, seed=5)
        sr = int(hp.audio.sample_rate)
        sess = task.stream(0, emit_batch=4)
        block_s = sess.BLOCK * sess.spec.hop_size / sr
        batch_s = sess.emit_batch / sess.spec.fps
        # ts is the window center MINUS ts_delta (100 ms at the shipped
        # config) — frames are stamped earlier than their audio
        bound = (sess.lookahead_s + block_s + batch_s
                 + sess.spec.ts_delta / 1000.0 + 0.05)
        step = 160  # 20 ms pushes
        for i in range(0, len(sig), step):
            arrived_at = (i + step) / sr
            for ts, _ in sess.push(sig[i : i + step]):
                assert arrived_at - ts / 1000.0 <= bound, (ts, arrived_at)

    def test_empty_and_flush_only(self, shipped_task):
        """Zero real audio still yields the offline path's pad windows
        (window_starts(0) is non-empty by the reference's geometry) —
        streaming must match that, not return nothing."""
        hp, task = shipped_task
        sess = task.stream(0)
        assert sess.push(np.zeros(0, np.float32)) == []
        ts_ref, verts_ref = task.generate_vertices(
            np.zeros(0, np.float32), 0)
        got = sess.flush()
        assert [ts for ts, _ in got] == list(ts_ref)
        np.testing.assert_allclose(
            np.stack([v for _, v in got]), verts_ref, atol=5e-5)

    def test_long_session_bounded_memory(self, shipped_task):
        """An indefinite live session must not grow host buffers: after
        trimming, sig/mel/z stay O(lookahead + block), independent of how
        much audio has been pushed."""
        hp, task = shipped_task
        sr = int(hp.audio.sample_rate)
        sess = task.stream(0, emit_batch=16)
        rng = np.random.default_rng(7)
        total, n_frames = 0, 0
        caps = dict(sig=0, mel=0, z=0)
        for _ in range(24):          # 12 s in 0.5 s pushes
            chunk = np.clip(0.1 * rng.normal(size=sr // 2), -1, 1
                            ).astype(np.float32)
            n_frames += len(sess.push(chunk))
            total += len(chunk)
            for k, v in sess.buffer_samples().items():
                caps[k] = max(caps[k], v)
        n_frames += len(sess.flush())
        assert n_frames == sess._n_windows(total)
        # bounds: signal ~ one mel block + window span; mel/z ~ a few
        # hundred frames regardless of the 12 s pushed (~96k samples)
        assert caps["sig"] < 3 * sess.spec.sliding, caps
        assert caps["mel"] < 600, caps
        assert caps["z"] < 600, caps


class TestServer:
    """StreamingServer: N concurrent streams, one batched pipeline."""

    def test_concurrent_streams_match_offline(self, shipped_task):
        from sdfa_tpu.streaming import StreamingServer

        hp, task = shipped_task
        clips = [_sig(hp, seconds=s, seed=k)
                 for k, s in ((11, 1.4), (12, 1.9), (13, 1.1))]
        offline = [task.generate_vertices(c, spk)
                   for spk, c in enumerate(clips)]

        srv = StreamingServer(task, capacity=4, emit_batch=8)
        sids = [srv.open(spk) for spk in range(len(clips))]
        got = {sid: [] for sid in sids}
        pos = [0] * len(clips)
        rng = np.random.default_rng(0)
        # interleave pushes in random chunk sizes; tick as audio arrives
        while any(p < len(c) for p, c in zip(pos, clips)):
            for k, sid in enumerate(sids):
                if pos[k] < len(clips[k]):
                    n = int(rng.integers(500, 2500))
                    srv.push(sid, clips[k][pos[k] : pos[k] + n])
                    pos[k] += n
            for sid, frames in srv.tick().items():
                got[sid].extend(frames)
        live_counts = {sid: len(got[sid]) for sid in sids}
        for sid in sids:
            srv.flush(sid)
        while not all(srv.is_done(sid) for sid in sids):
            for sid, frames in srv.tick().items():
                got[sid].extend(frames)

        for k, sid in enumerate(sids):
            ts_ref, verts_ref = offline[k]
            assert [ts for ts, _ in got[sid]] == list(ts_ref), f"stream {k}"
            verts = np.stack([v for _, v in got[sid]])
            np.testing.assert_allclose(verts, verts_ref, atol=5e-5,
                                       err_msg=f"stream {k}")
            # frames flowed while the stream was live, not only at flush
            assert live_counts[sid] > 0.4 * len(got[sid]), (k, live_counts)

    def test_matches_dedicated_session(self, shipped_task):
        """A multiplexed stream emits bit-comparable frames to a dedicated
        StreamingSession on the same audio (same kernels, same order)."""
        from sdfa_tpu.streaming import StreamingServer

        hp, task = shipped_task
        sig = _sig(hp, seconds=1.3, seed=21)

        sess = task.stream(1, emit_batch=8)
        ref = sess.push(sig)
        ref.extend(sess.flush())

        srv = StreamingServer(task, capacity=2, emit_batch=8)
        sid = srv.open(1)
        srv.push(sid, sig)
        got = []
        for s2, frames in srv.tick().items():
            got.extend(frames)
        srv.flush(sid)
        while not srv.is_done(sid):
            for s2, frames in srv.tick().items():
                got.extend(frames)
        assert [t for t, _ in got] == [t for t, _ in ref]
        np.testing.assert_allclose(np.stack([v for _, v in got]),
                                   np.stack([v for _, v in ref]), atol=2e-5)

    def test_capacity_and_slot_reuse(self, shipped_task):
        from sdfa_tpu.streaming import StreamingServer

        hp, task = shipped_task
        srv = StreamingServer(task, capacity=2, emit_batch=4)
        a = srv.open(0)
        b = srv.open(1)
        with pytest.raises(RuntimeError, match="server full"):
            srv.open(0)
        # an empty stream still emits the reference geometry's silence
        # windows (n_windows(0) > 0 — zero-padding semantics)
        srv.flush(a)
        n_silence = 0
        while not srv.is_done(a):
            n_silence += len(srv.tick().get(a, []))
        assert n_silence == srv.spec.n_windows(0) > 0
        srv.close(a)
        c = srv.open(2)        # slot reused
        assert c == a
        assert sorted(srv.live()) == sorted([b, c])

    def test_pipelined_ticks_match_and_wire_formats(self, shipped_task):
        """pipeline=True returns the previous round's frames (one-tick
        latency) but the union over the drain loop is identical; the f32
        wire matches a dedicated session to fp-reassociation tolerance
        (the pool-flattened prefix tiles differently) and the i16 wire
        adds at most the WIRE_LSB/2 quantization bound on top."""
        from sdfa_tpu.streaming import StreamingServer
        from sdfa_tpu.task import WIRE_LSB

        hp, task = shipped_task
        sig = _sig(hp, seconds=1.2, seed=33)

        sess = task.stream(0, emit_batch=8)
        ref = sess.push(sig)
        ref.extend(sess.flush())

        from sdfa_tpu.task import WIRE_LSB8

        for wire, atol in (("f32", 2e-5), ("i16", 2e-5 + WIRE_LSB / 2),
                           ("i8d", 2e-5 + WIRE_LSB8 / 2)):
            srv = StreamingServer(task, capacity=2, emit_batch=8,
                                  wire=wire, pipeline=True)
            sid = srv.open(0)
            got = []
            rng = np.random.default_rng(5)
            i = 0
            while i < len(sig):
                n = int(rng.integers(700, 2600))
                srv.push(sid, sig[i : i + n])
                i += n
                for _, frames in srv.tick().items():
                    got.extend(frames)
            srv.flush(sid)
            while not srv.is_done(sid):
                for _, frames in srv.tick().items():
                    got.extend(frames)
            assert [t for t, _ in got] == [t for t, _ in ref], wire
            err = np.abs(np.stack([v for _, v in got])
                         - np.stack([v for _, v in ref])).max()
            assert err <= atol, (wire, err)

    def test_i8d_delta_wire_rebase_and_no_drift(self, shipped_task):
        """int8-delta wire: slot close→reopen re-bases both carries (the
        new stream's frames are absolute, not relative to the dead
        stream), and a long stream accumulates NO quantization drift —
        the device carry and the host mirror run the same clamped
        integer recurrence, so the tail frames are as accurate as the
        head frames."""
        from sdfa_tpu.streaming import StreamingServer
        from sdfa_tpu.task import WIRE_LSB8

        hp, task = shipped_task
        sig_a = _sig(hp, seconds=1.1, seed=7)
        sig_b = _sig(hp, seconds=2.8, seed=8)
        ref_b = task.generate_vertices(sig_b, 1)[1]

        srv = StreamingServer(task, capacity=2, emit_batch=8, wire="i8d")
        a = srv.open(0)
        srv.push(a, sig_a)
        srv.flush(a)
        while not srv.is_done(a):
            srv.tick()
        srv.close(a)
        b = srv.open(1)  # reuses the freed slot → must re-base
        assert b == a
        srv.push(b, sig_b)
        srv.flush(b)
        got = []
        while not srv.is_done(b):
            for _, frames in srv.tick().items():
                got.extend(frames)
        verts = np.stack([v for _, v in got])
        bound = 2e-5 + WIRE_LSB8 / 2
        assert np.abs(verts - ref_b).max() <= bound
        # drift check: the tail is as accurate as the head
        assert np.abs(verts[-8:] - ref_b[-8:]).max() <= bound

    def test_ring_wrap_long_stream(self, shipped_task):
        """A clip much longer than the ring forces many wrap-arounds of
        every slot's ring segment; frames still match offline (the gather
        indices follow the mod-R addressing, and ingestion is bounded so
        needed rows are never lapped)."""
        from sdfa_tpu.streaming import StreamingServer

        hp, task = shipped_task
        sig = _sig(hp, seconds=3.2, seed=44)
        ts_ref, verts_ref = task.generate_vertices(sig, 1)

        srv = StreamingServer(task, capacity=2, emit_batch=4,
                              block_frames=12, ring_frames=128)
        assert srv.R * srv.spec.hop_size < len(sig) / 2  # must wrap
        sid = srv.open(1)
        got = []
        i = 0
        while i < len(sig):
            srv.push(sid, sig[i : i + 1800])
            i += 1800
            for _, frames in srv.tick().items():
                got.extend(frames)
        srv.flush(sid)
        while not srv.is_done(sid):
            for _, frames in srv.tick().items():
                got.extend(frames)
        assert [t for t, _ in got] == list(ts_ref)
        np.testing.assert_allclose(np.stack([v for _, v in got]),
                                   verts_ref, atol=5e-5)

    def test_coefficient_wire_and_client_decoder(self, shipped_task):
        """wire="coef": the server ships the raw (85+180,) PCA
        coefficients per frame — 14× fewer bytes than the int8-delta
        vertex wire — and CoefDecoder reconstructs meshes on the client
        that match offline generate_vertices; "coef16" halves the wire
        again and stays inside the serving budget. The decode math is
        the float64 solve oracle, so the coef wire's accuracy is set by
        the device suffix, not by any wire quantization."""
        from sdfa_tpu.streaming import CoefDecoder, StreamingServer

        hp, task = shipped_task
        sig = _sig(hp, seconds=1.3, seed=51)
        ts_ref, verts_ref = task.generate_vertices(sig, 1)

        dec = CoefDecoder(task)
        n_v = verts_ref.shape[1]
        assert dec.n_coefs * 4 < n_v * 3  # f32 coefs < 1 byte/coordinate
        coefs = None
        for wire, atol in (("coef", 5e-5), ("coef16", 5e-4)):
            srv = StreamingServer(task, capacity=2, emit_batch=8,
                                  wire=wire)
            sid = srv.open(1)
            srv.push(sid, sig)
            srv.flush(sid)
            got = []
            while not srv.is_done(sid):
                for _, frames in srv.tick().items():
                    got.extend(frames)
            assert [t for t, _ in got] == list(ts_ref), wire
            coefs = np.stack([v for _, v in got])
            assert coefs.shape == (len(ts_ref), dec.n_coefs)
            verts = dec.decode(coefs)
            err = np.abs(verts - verts_ref).max()
            assert err <= atol, (wire, err)
        # single-frame decode convenience matches the batched call (the
        # fused XLA front may reassociate across batch shapes — bound it
        # far under the wire budget rather than bitwise)
        np.testing.assert_allclose(dec.decode(coefs[0]),
                                   dec.decode(coefs)[0], atol=1e-6)
        # the fast front tracks the all-f64 precise path (solve_host
        # oracle values) to ~1e-7 m — 50× under the i16 wire's LSB/2
        np.testing.assert_allclose(dec.decode(coefs),
                                   dec.decode(coefs, precise=True),
                                   atol=5e-7)
        # precise single == precise batched row: pure numpy, bitwise
        np.testing.assert_array_equal(
            dec.decode(coefs[0], precise=True),
            dec.decode(coefs, precise=True)[0])
        # the decoder's closed-form Rodrigues == the f64 solve oracle's
        # (elementwise c+x²C… vs I+sK+CK² — identical algebra)
        dg = np.random.default_rng(2).normal(size=(512, 9)) * 0.2
        np.testing.assert_allclose(
            dec._transforms_t_fast(dg),
            dec._solver._transforms_t_np(dg), atol=1e-13, rtol=1e-13)
