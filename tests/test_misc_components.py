"""Coverage for the smaller inventory components: LSTM2d, bilateral filter,
visualizer, LPC, VAD pairs, mu-law, noise, npext."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sdfa_tpu.audio import features as afeat
from sdfa_tpu.audio import misc as amisc
from sdfa_tpu.nn.recurrent import LSTM2d
from sdfa_tpu.utils import BilateralFilter1D, npext, visualizer


class TestLSTM2d:
    def test_alternating_axes_shapes(self):
        m = LSTM2d(input_size=4, hidden_size=6, num_layers=2)
        x = jnp.zeros((2, 4, 8, 5))  # B, C, F, T
        v = m.init({"params": jax.random.PRNGKey(0)}, x)
        out = m.apply(v, x)
        assert out.shape == (2, 12, 8, 5)  # 2·hidden channels


class TestBilateral:
    def test_smooths_noise_keeps_edges(self):
        rng = np.random.default_rng(0)
        t = np.arange(200)
        clean = np.where(t < 100, 0.0, 1.0)  # step edge
        noisy = clean + rng.normal(0, 0.02, 200)
        filt = BilateralFilter1D(radius=4, sigma_space=2.0, sigma_value=0.1)
        out = filt(noisy[:, None])[:, 0]
        # noise reduced away from the edge
        assert out[:80].std() < noisy[:80].std()
        # edge preserved (value-range kernel suppresses cross-edge mixing)
        assert abs(out[110] - 1.0) < 0.1 and abs(out[90]) < 0.1


class TestVisualizer:
    def test_color_mapping(self):
        img = visualizer.color_mapping(np.random.default_rng(0).normal(size=(16, 32)))
        assert img.shape == (16, 32, 3) and img.dtype == np.uint8

    def test_plot_grid(self):
        items = [np.random.default_rng(1).normal(size=(8, 8)),
                 dict(data=np.arange(10.0), title="curve")]
        img = visualizer.plot_grid(items)
        assert img.ndim == 3 and img.shape[2] == 3

    def test_plot_item_rows_and_modes(self):
        """Reference plot() surface: rows of plot_items, image + colorbar,
        (x, y) curve pair, CHW image coercion, index labels."""
        pi = visualizer.plot_item
        rng = np.random.default_rng(2)
        spec = pi(rng.normal(size=(16, 24)), title="spec",
                  index_labels=["a"] * 8 + ["b"] * 8 + ["c"] * 8)
        curve = pi((np.arange(32.0), np.sin(np.arange(32.0) / 4)),
                   title="xy")
        rgb_chw = pi(rng.uniform(size=(3, 10, 12)), title="chw")
        assert rgb_chw["item"].shape == (10, 12, 3)  # CHW → HWC coercion
        img = visualizer.plot([spec, curve], rgb_chw, suptitle="grid")
        assert img.ndim == 3 and img.shape[2] == 3

    def test_rectangles_mode(self):
        pi = visualizer.plot_item(
            np.array([0.3, 0.9, 0.5]), title="bars",
            labels=["p", "m", "e"], rectangle=True)
        img = visualizer.plot(pi)
        assert img.ndim == 3 and img.shape[2] == 3

    def test_aligned_transcription_strip(self):
        """The S20 mode the reference ships broken (its Transcription
        import target doesn't exist): audio + word-onset markers."""
        sr = 8000
        sig = np.sin(np.arange(sr * 2) * 0.05).astype(np.float32)
        tr = visualizer.Transcription(words=[
            visualizer.Word("hello", 0.20, 0.55),
            visualizer.Word("world", 0.80, 1.30),
        ])
        assert tr.transcript == "hello world"
        item = visualizer.plot_item(sig, title="utt", sr=sr,
                                    aligned_transcription=tr)
        img = visualizer.plot(item)
        assert img.ndim == 3 and img.shape[2] == 3
        # word markers must land inside the strip: green dash-dot lines are
        # drawn at start*sr — verify via the draw fn running without the
        # reference's ImportError and producing non-blank output
        assert img.std() > 0

    def test_value_range_same_mode(self):
        pi = visualizer.plot_item
        a = pi(np.zeros((4, 4)), title="lo", vmin=0.0, vmax=1.0)
        b = pi(np.ones((4, 4)), title="hi", vmin=-2.0, vmax=3.0)
        grid = visualizer._GridLayout([[a, b]])
        grid.set_value_range(None, None, mode="same")
        assert a.vmin == b.vmin == -2.0 and a.vmax == b.vmax == 3.0


class TestLpc:
    def test_whitens_ar_signal(self):
        """LPC on an AR(2) process should recover roughly the AR coefficients."""
        rng = np.random.default_rng(2)
        n = 4096
        e = rng.normal(0, 1, n)
        x = np.zeros(n)
        for i in range(2, n):
            x[i] = 1.3 * x[i - 1] - 0.4 * x[i - 2] + e[i]
        out = afeat._lpc(x.astype(np.float32), 8000, order=2,
                         win_size=1024, hop_size=512, preemphasis=0.0)
        assert out.shape[0] == 3  # gain + 2 coeffs
        # a1 ≈ −1.3, a2 ≈ 0.4 (sign convention: A(z)=1+a1 z⁻¹+a2 z⁻²)
        a1 = out[1].mean()
        a2 = out[2].mean()
        assert a1 == pytest.approx(-1.3, abs=0.15)
        assert a2 == pytest.approx(0.4, abs=0.15)


class TestAudioMisc:
    def test_mulaw_roundtrip(self):
        x = np.linspace(-0.9, 0.9, 64)
        y = amisc.mulaw(x, 255)
        back = amisc.inv_mulaw(y, 255)
        np.testing.assert_allclose(back, x, atol=1e-6)

    def test_quantize_range(self):
        x = np.linspace(-1, 1, 64)
        q = amisc.mu_quantize(amisc.mulaw(x, 255), 255)
        assert q.min() >= 0 and q.max() <= 255

    def test_vad_pairs_roundtrip(self):
        flags = np.array([0, 1, 1, 0, 0, 1, 0], np.uint8)
        pairs = amisc.vad_to_pairs(flags)
        assert pairs == [(1, 3), (5, 6)]
        np.testing.assert_array_equal(amisc.vad_from_pairs(pairs, 7), flags)

    def test_vad_detects_speech_region(self):
        """Sample-level flags (the reference contract, vad.py:51-56)."""
        sr = 8000
        sig = np.zeros(sr, np.float32)
        sig[3000:5000] = 0.3 * np.sin(2 * np.pi * 200 * np.arange(2000) / sr)
        flags = amisc.detect_speech(sig, sr)
        assert len(flags) == len(sig)
        pairs = amisc.vad_to_pairs(flags)
        assert len(pairs) >= 1
        s, e = pairs[0]
        # 20ms frame quantization: span within one frame of [3000, 5000)
        assert 2800 <= s <= 3200 and 4800 <= e <= 5400

    def test_vad_span_accuracy_on_synthesized_speech(self):
        """Bound the energy-VAD's span error vs ground truth on synthesized
        speech+silence (webrtcvad substitution, PARITY.md S13): measured
        span endpoints within 40 ms of truth on speech-shaped AM tones over
        a −50 dB noise floor."""
        sr = 8000
        rng = np.random.default_rng(7)
        sig = rng.normal(0, 0.003, 4 * sr).astype(np.float32)  # −50 dB floor
        truth = []
        for (lo_s, hi_s) in ((0.5, 1.4), (2.0, 3.3)):
            lo, hi = int(lo_s * sr), int(hi_s * sr)
            t = np.arange(hi - lo) / sr
            # AM tone with 4 Hz syllabic envelope ≈ speech energy contour
            sig[lo:hi] += (0.25 * np.sin(2 * np.pi * 180 * t)
                           * (0.6 + 0.4 * np.sin(2 * np.pi * 4 * t))).astype(np.float32)
            truth.append((lo, hi))
        # no smoothing — matching clean_voca's call (reference preload.py:198);
        # the reference's smooth_ms threshold is smooth_ms/2.5 *frames*
        # (800 ms at 100 ms), which would bridge the 0.6 s gap by design
        flags = amisc.detect_speech(sig, sr, vad_mode=3)
        pairs = amisc.vad_to_pairs(flags)
        assert len(pairs) == len(truth), pairs
        tol = int(0.04 * sr)  # 40 ms = 2 VAD frames
        for (ps, pe), (ts, te) in zip(pairs, truth):
            assert abs(ps - ts) <= tol, (ps, ts)
            assert abs(pe - te) <= tol, (pe, te)

    def test_vad_smoothing_suppresses_short_runs(self):
        sr = 8000
        sig = np.zeros(2 * sr, np.float32)
        # one 20 ms blip — shorter than the 100 ms smoothing window
        sig[8000:8160] = 0.5
        flags = amisc.detect_speech(sig, sr, smooth_ms=100)
        assert not flags.any()

    def test_noise_generators(self):
        w = amisc.white_noise(1000, 0.1, rng=np.random.default_rng(0))
        p = amisc.pink_noise(1000, 0.1, rng=np.random.default_rng(0))
        assert w.shape == p.shape == (1000,)
        # pink noise has more low-frequency energy than white
        fw = np.abs(np.fft.rfft(w - w.mean()))
        fp = np.abs(np.fft.rfft(p - p.mean()))
        low_ratio_w = fw[:50].sum() / fw.sum()
        low_ratio_p = fp[:50].sum() / fp.sum()
        assert low_ratio_p > low_ratio_w


class TestNpExt:
    def test_first_last_nonzero(self):
        arr = np.array([[0, 0, 3, 0, 5], [0, 0, 0, 0, 0]])
        np.testing.assert_array_equal(npext.first_nonzero(arr), [2, -1])
        np.testing.assert_array_equal(npext.last_nonzero(arr), [4, -1])
