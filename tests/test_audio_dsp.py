"""Audio frontend parity tests.

Oracles: torch.stft (the reference's backend — spectrogram.py:85-104) and
scipy.signal.savgol_filter (librosa.feature.delta's implementation).
"""

import numpy as np
import pytest
import torch

from sdfa_tpu.audio import dsp

SR, WIN, HOP, NMELS, FMIN, FMAX = 8000, 512, 64, 128, 50, 3600


def _torch_stft_power(signal, win_size, hop_size, padding=False):
    window = torch.from_numpy(np.hamming(win_size).astype(np.float32))
    fft = torch.stft(
        torch.from_numpy(signal).unsqueeze(0),
        n_fft=win_size, hop_length=hop_size, win_length=win_size,
        window=window, center=padding, pad_mode="constant",
        normalized=False, onesided=True, return_complex=True,
    )
    return (fft.real ** 2 + fft.imag ** 2)[0].numpy()


@pytest.fixture(scope="module")
def signal():
    rng = np.random.default_rng(42)
    t = np.arange(4544) / SR
    sig = 0.3 * np.sin(2 * np.pi * 440 * t) + 0.1 * rng.normal(size=len(t))
    return sig.astype(np.float32)


class TestSTFT:
    def test_power_matches_torch(self, signal):
        ours = np.asarray(dsp.stft_power(signal, WIN, HOP))
        ref = _torch_stft_power(signal, WIN, HOP)
        assert ours.shape == ref.shape == (257, 64)
        np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-4)

    def test_power_matches_torch_centered(self, signal):
        ours = np.asarray(dsp.stft_power(signal, WIN, HOP, padding=True))
        ref = _torch_stft_power(signal, WIN, HOP, padding=True)
        np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-4)

    def test_frame_count(self):
        assert dsp.num_frames(4544, WIN, HOP) == 64


class TestMelFilters:
    def test_shape_and_slaney_norm(self):
        filt = dsp.mel_filters(SR, WIN, NMELS, FMIN, FMAX)
        assert filt.shape == (NMELS, 257)
        # each slaney-normalized triangle integrates (bin-sum × bin-width ×
        # norm) to ~1 over its support; equivalently peak ≈ 2/(width_hz)
        assert (filt >= 0).all()
        assert filt.max() < 1.0
        # triangles should tile [fmin, fmax]: every bin strictly inside the
        # range is covered by at least one filter
        freqs = np.linspace(0, SR / 2, 257)
        inside = (freqs > 80) & (freqs < 3500)
        assert (filt.sum(axis=0)[inside] > 0).all()

    def test_mel_scale_roundtrip(self):
        f = np.array([50.0, 440.0, 999.0, 1000.0, 2500.0, 3600.0])
        np.testing.assert_allclose(dsp._mel_to_hz(dsp._hz_to_mel(f)), f, rtol=1e-12)

    def test_linear_below_1khz(self):
        # slaney scale: linear with slope 3/200 below 1 kHz
        np.testing.assert_allclose(dsp._hz_to_mel(np.array([200.0])), [3.0])
        np.testing.assert_allclose(dsp._hz_to_mel(np.array([1000.0])), [15.0])


class TestMelPipeline:
    def test_full_parity_with_torch_reference(self, signal):
        """Reproduce the reference TorchImpl.mel_spectrogram numerically."""
        filt = torch.from_numpy(dsp.mel_filters(SR, WIN, NMELS, FMIN, FMAX))
        pre = np.append(signal[0], signal[1:] - 0.65 * signal[:-1]).astype(np.float32)
        power = torch.from_numpy(_torch_stft_power(pre, WIN, HOP))
        mel = torch.matmul(filt, power)
        mel = 10.0 * torch.log10(torch.clamp(mel, min=torch.finfo(torch.float).eps))
        mel = ((mel - 20.0 + 80.0) / 80.0).clamp(0, 1).numpy()

        ours = np.asarray(dsp.mel_spectrogram(
            signal, sr=SR, win_size=WIN, hop_size=HOP, n_mels=NMELS,
            fmin=FMIN, fmax=FMAX, ref_db=20, top_db=80,
            normalize=True, preemph=0.65,
        ))
        assert ours.shape == (NMELS, 64)
        np.testing.assert_allclose(ours, mel, atol=5e-4)

    def test_batched_matches_single(self, signal):
        batch = np.stack([signal, signal * 0.5])
        out = np.asarray(dsp.mel_spectrogram(
            batch, sr=SR, win_size=WIN, hop_size=HOP, n_mels=NMELS,
            fmin=FMIN, fmax=FMAX, normalize=True, ref_db=20, top_db=80,
        ))
        single = np.asarray(dsp.mel_spectrogram(
            signal, sr=SR, win_size=WIN, hop_size=HOP, n_mels=NMELS,
            fmin=FMIN, fmax=FMAX, normalize=True, ref_db=20, top_db=80,
        ))
        assert out.shape == (2, NMELS, 64)
        np.testing.assert_allclose(out[0], single, atol=1e-6)


class TestDelta:
    def test_matches_savgol(self):
        from scipy.signal import savgol_filter

        rng = np.random.default_rng(1)
        feat = rng.normal(size=(128, 64)).astype(np.float32)
        for order in (1, 2):
            ref = savgol_filter(feat.astype(np.float64), 9, polyorder=order,
                                deriv=order, axis=-1, mode="interp")
            ours = np.asarray(dsp.delta(feat, order=order))
            np.testing.assert_allclose(ours, ref, atol=1e-4)

    def test_add_deltas_shape(self):
        feat = np.zeros((128, 64), np.float32)
        out = np.asarray(dsp.add_deltas(feat))
        assert out.shape == (3, 128, 64)


class TestMisc:
    def test_preemphasis_matches_reference(self, signal):
        ref = np.append(signal[0], signal[1:] - 0.65 * signal[:-1])
        ours = dsp.preemphasis(signal, 0.65)
        np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-7)

    def test_rms_energy(self, signal):
        ours = np.asarray(dsp.rms_energy(signal, WIN, HOP))
        frames = np.lib.stride_tricks.sliding_window_view(signal, WIN)[::HOP]
        ref = np.sqrt((frames ** 2).mean(axis=-1))
        np.testing.assert_allclose(ours, ref[: len(ours)], atol=1e-6)

    def test_db_roundtrip(self):
        x = np.abs(np.random.default_rng(0).normal(size=32)).astype(np.float32) + 0.01
        db = np.asarray(dsp.power_to_db(x))
        np.testing.assert_allclose(np.asarray(dsp.db_to_power(db)), x, rtol=1e-4)
        norm = np.asarray(dsp.normalize_db(db, 20, 80, clip=False))
        np.testing.assert_allclose(np.asarray(dsp.denormalize_db(norm, 20, 80)), db, rtol=1e-5, atol=1e-5)


class TestRmsNormalize:
    def test_target_db(self):
        from sdfa_tpu.audio import rms

        rng = np.random.default_rng(3)
        wav = (0.05 * rng.normal(size=8000)).astype(np.float32)
        out = rms.normalize(wav, target_db=-24.5)
        rms_db, _ = rms.analyze_db(out)
        assert rms_db == pytest.approx(-24.5, abs=0.5)
