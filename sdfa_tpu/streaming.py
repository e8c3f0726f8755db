"""Real-time streaming serving: push audio chunks → mesh frames out.

No reference counterpart — the reference (speech_anime/model/model.py:
333-426) is clip-offline only: it needs the whole wav before producing
any frame. This session produces 60 fps mesh frames incrementally with a
fixed lookahead of roughly half a sliding window (sliding/2 ≈ 0.28 s at
the shipped config) plus the Δ/Δ² context (4 hop frames ≈ 0.03 s),
reusing the overlap fast path's machinery:

- per block, ONE fused device call (``task._get_stream_fns``) runs the
  mel frontend, the band-structured Savitzky-Golay Δ/Δ² (the offline
  ``dsp.delta_matrix``'s interior 9-tap kernel; T-independent edge
  columns for frames 0..3 — both verified identical to the whole-clip
  operator), and the per-frame encoder prefix (time-independent by
  construction, ``nn.spec.time_independent_prefix``), carrying an
  8-frame mel tail between calls on device;
- the biLSTM/attention suffix + decode + solve run per ``emit_batch``
  windows through the same fused fn as ``AnimationTask.generate_vertices``
  (``task._get_verts_fn``), gathering from a bounded z-slice.

Offline equivalence: pushing a clip in arbitrary chunk sizes and
flushing yields the same timeline and vertices as
``generate_vertices(clip)`` (tests/test_streaming.py; small fp
reassociation tolerance — band vs whole-clip delta matmul).
"""

from __future__ import annotations

import math
from typing import List, Tuple

import jax.numpy as jnp
import numpy as np


class StreamingSession:
    """Created via ``AnimationTask.stream(speaker)``.

    push(samples) -> list of (ts_ms, verts (V, 3)) frames ready so far;
    flush() -> the remaining frames (right-pads like the offline path).
    """

    # delta context: savgol width 9 → 4 future frames finalize a delta
    _DCTX = 4

    def __init__(self, task, speaker, emit_batch: int = 16,
                 block_frames: int = 16):
        if isinstance(speaker, str):
            speaker = dict(task.hp.dataset_anime.speakers)[speaker]
        self.task = task
        self.speaker = int(speaker)
        self.spec = task._wspec()
        self.emit_batch = int(emit_batch)
        # mel/encoder block granularity (one jit shape each): smaller →
        # lower emission latency, more dispatches. 16 frames ≈ 0.13 s.
        self.BLOCK = int(block_frames)
        assert task.overlap_frontend, (
            "streaming rides the overlap fast path — construct the task "
            "with device_frontend=True (encoder prefix must be usable)")
        assert self.BLOCK >= 9, (
            "block_frames must be >= 9 (the left-edge delta fit needs the "
            "first 9 mel frames inside the first fused block)")
        face_type = task.hp.model.face_data_type
        assert face_type in ("dgrad_3d", "verts_off_3d", "verts_pos_3d"), (
            f"streaming emits meshes; face type {face_type!r} has no "
            "vertex decoding (use feature_to_anime/generate_animation)")

        s = self.spec
        self._pad = s.sliding  # same left zero-pad as frame_grid
        # rolling host buffers with ABSOLUTE offsets: consumed history is
        # trimmed so an indefinite live session stays O(lookahead) memory
        # (buffer_samples() exposes the retained sizes)
        self._sig = np.zeros(self._pad, np.float32)
        self._sig_off = 0        # absolute sample index of _sig[0]
        self._n_real = 0
        self._t_mel = 0          # mel frames computed
        self._mel_tail = jnp.zeros((8, s.n_mels), jnp.float32)  # device carry
        self._zbuf = None        # rolling encoded frames (n, ...)
        self._z_off = 0          # absolute frame index of _zbuf[0]
        self._z_done = 0         # encoded (delta-finalized) frames
        self._w_done = 0         # windows emitted
        self._flushed = False

        # task-level cached jits (one compile per task + block size, not
        # per session — live services create a session per utterance)
        self._fused_first, self._fused_steady = task._get_stream_fns(self.BLOCK)
        self._verts_fn, self._consts = task._get_verts_fn()

        # z-slice length for one emit batch: 64 window frames + the hop
        # span of emit_batch windows, padded to a 64 multiple (static)
        span = s.frames + int(math.ceil(
            (self.emit_batch - 1) * s.sr / s.fps / s.hop_size)) + 2
        self._slice_len = -(-span // 64) * 64

    # -- geometry (mirrors WindowSpec.window_starts arithmetic) -----------
    @property
    def lookahead_s(self) -> float:
        """Worst-case audio lookahead before a frame can be emitted."""
        s = self.spec
        return (s.sliding / 2 + self._DCTX * s.hop_size) / s.sr

    def _window_geom(self, w: int):
        s = self.spec
        start, ts = s.window_geom(w)  # shared with the offline paths
        # hop-snap exactly like frame_grid (np.round = banker's rounding)
        snapped = int(np.round(np.float64(start) / s.hop_size)) * s.hop_size
        f0 = (snapped + self._pad) // s.hop_size
        return f0, ts

    def _n_windows(self, n_samples: int) -> int:
        return self.spec.n_windows(n_samples)

    # -- pipeline ----------------------------------------------------------
    def _ingest(self):
        """Advance the pipeline one fused device call per complete block:
        mel + Δ/Δ² + encoder prefix in one round-trip; the 8-frame mel
        tail carries between calls on device. z lags the mel cursor by
        exactly the 4-frame Δ context (the first block emits B−4 frames
        with the offline edge fits, steady-state emits B)."""
        s, B = self.spec, self.BLOCK
        while True:
            t0 = self._t_mel
            lo_abs = t0 * s.hop_size
            need = lo_abs + s.win_size + (B - 1) * s.hop_size
            if self._sig_off + len(self._sig) < need:
                break
            lo = lo_abs - self._sig_off
            block = self._sig[lo : need - self._sig_off]
            if s.preemph:
                prev = self._sig[lo - 1] if lo_abs else np.float32(0.0)
                first = block[0] if lo_abs == 0 else block[0] - s.preemph * prev
                block = np.concatenate(
                    [[first], block[1:] - s.preemph * block[:-1]]
                ).astype(np.float32)
            fn = self._fused_first if t0 == 0 else self._fused_steady
            self._mel_tail, z = fn(self.task.variables, jnp.asarray(block),
                                   self._mel_tail)
            z = np.asarray(z)
            self._zbuf = (z if self._zbuf is None
                          else np.concatenate([self._zbuf, z]))
            self._z_done += len(z)
            self._t_mel += B
            # trim consumed signal (keep one sample for the preemph carry)
            cut = max(0, self._t_mel * s.hop_size - 1 - self._sig_off)
            if cut:
                self._sig = self._sig[cut:]
                self._sig_off += cut

    def _emit_ready(self, limit_w: int) -> List[Tuple[float, np.ndarray]]:
        """Emit complete windows < limit_w whose frames are encoded."""
        s = self.spec
        out = []
        while self._w_done < limit_w:
            batch = []
            w = self._w_done
            while (len(batch) < self.emit_batch and w < limit_w):
                f0, ts = self._window_geom(w)
                if f0 + s.frames > self._z_done:
                    break
                batch.append((w, f0, ts))
                w += 1
            if not batch:
                break
            out.extend(self._run_batch(batch))
            self._w_done = batch[-1][0] + 1
            # trim z consumed by every window before the next unemitted one
            cut = self._window_geom(self._w_done)[0] - self._z_off
            if cut > 0 and self._zbuf is not None:
                self._zbuf = self._zbuf[cut:]
                self._z_off += cut
        return out

    def buffer_samples(self) -> dict:
        """Retained buffer sizes — bounded for indefinite sessions (the
        mel state is just the 8-frame device-side tail carry)."""
        return dict(sig=len(self._sig), mel=int(self._mel_tail.shape[0]),
                    z=0 if self._zbuf is None else len(self._zbuf))

    def _run_batch(self, batch):
        s = self.spec
        lo = batch[0][1]  # first window's f0; batch span < _slice_len
        rel = lo - self._z_off
        z_slice = self._zbuf[rel : rel + self._slice_len]
        if len(z_slice) < self._slice_len:  # near the live edge: pad
            z_slice = np.concatenate(
                [z_slice, np.zeros((self._slice_len - len(z_slice),)
                                   + z_slice.shape[1:], np.float32)])
        # pad the window batch to the static emit_batch shape
        rows = [(f0 - lo) for (_, f0, _) in batch]
        keep = len(rows)
        while len(rows) < self.emit_batch:
            rows.append(rows[-1])
        idx = (np.asarray(rows, np.int32)[:, None]
               + np.arange(s.frames, dtype=np.int32)[None, :])
        spk = jnp.full((self.emit_batch,), self.speaker, jnp.int32)
        flat = self._verts_fn(self.task.variables, self._consts,
                              jnp.asarray(z_slice), jnp.asarray(idx), spk)
        verts = np.asarray(flat[:keep]).reshape(keep, -1, 3)
        return [(batch[i][2], verts[i]) for i in range(keep)]

    # -- public API --------------------------------------------------------
    def push(self, samples: np.ndarray) -> List[Tuple[float, np.ndarray]]:
        """Feed more audio; returns frames that became ready: a list of
        (ts_ms, verts (V, 3))."""
        assert not self._flushed, "session already flushed"
        samples = np.asarray(samples, np.float32).flatten()
        assert samples.size == 0 or (
            samples.min() >= -1 and samples.max() <= 1)
        self._sig = np.concatenate([self._sig, samples])
        self._n_real += len(samples)
        self._ingest()
        return self._emit_ready(self._n_windows(self._n_real))

    def flush(self) -> List[Tuple[float, np.ndarray]]:
        """End of stream: zero-pad (exactly like the offline right pad)
        and emit every remaining window."""
        assert not self._flushed, "session already flushed"
        self._flushed = True
        s = self.spec
        n_w = self._n_windows(self._n_real)
        if n_w == 0:
            return []
        last_f0, _ = self._window_geom(n_w - 1)
        # grow in block-sized zero chunks until the whole-block ingestion
        # has encoded every frame the last window gathers (ingestion only
        # advances in BLOCK steps, so a single exact-size pad can stall
        # one block short)
        while self._z_done < last_f0 + s.frames:
            self._sig = np.concatenate(
                [self._sig, np.zeros(self.BLOCK * s.hop_size, np.float32)])
            self._ingest()
        return self._emit_ready(n_w)
