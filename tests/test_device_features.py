"""On-device training feature pipeline vs the host path, same knobs."""

import numpy as np
import pytest

import jax.numpy as jnp

from sdfa_tpu.data import device_features as dfeat
from sdfa_tpu.data import features_host

SR, WIN, HOP, NMELS = 8000, 512, 64, 128
MEL_CFG = dict(win_size=WIN, hop_size=HOP, n_mels=NMELS, fmin=50, fmax=3600,
               ref_db=20, top_db=80, preemphasis=0.65, win_fn="hamm",
               normalize=True, clip_normalized=True, subtract_mean=False,
               padding=False)
SPEC = dfeat.FeatureSpec(sr=SR, win_size=WIN, hop_size=HOP, n_mels=NMELS,
                         fmin=50, fmax=3600, ref_db=20, top_db=80)


def _signal(n=20000, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(n) / SR
    return (0.3 * np.sin(2 * np.pi * 180 * t) * (1 + 0.5 * np.sin(2 * np.pi * 3 * t))
            + 0.02 * rng.normal(size=n)).astype(np.float32)


def _host(signal, stt, end, **aug):
    feat, _, _ = features_host.windowed_features(
        signal=signal, signal_stt=stt, signal_end=end,
        mel_cfg=dict(MEL_CFG), sr=SR, frames=64, **aug,
    )
    return np.transpose(feat, (0, 2, 1))  # (3, T, F) wait -> host returns (3,F,T)


def _device(signal, stt, end, preemph=0.65, et=0, f_variant=None,
            feat_scale=None, drop_rows=None, drop_is_max=0.0, drop_thres=0.0):
    ext = dfeat.MAX_EX_TIME * HOP
    raw = features_host.slice_window(signal, stt - ext, end + ext)
    if f_variant is None:
        f_variant = dfeat.freq_variant_index(0, False, False, "constant")
    out = dfeat.device_train_features(
        jnp.asarray(raw[None]),
        jnp.asarray([preemph], jnp.float32),
        jnp.asarray([et + dfeat.MAX_EX_TIME], jnp.int32),
        jnp.asarray([f_variant], jnp.int32),
        jnp.asarray((feat_scale if feat_scale is not None else np.ones(NMELS))[None], jnp.float32),
        jnp.asarray((drop_rows if drop_rows is not None else np.zeros(NMELS))[None], jnp.float32),
        jnp.asarray([drop_is_max], jnp.float32),
        jnp.asarray([drop_thres], jnp.float32),
        spec=SPEC,
    )
    return np.asarray(out)[0]  # (T, F, 3)


class TestDeviceFeatureParity:
    def test_no_augmentation(self):
        sig = _signal()
        stt, end = 4000, 4000 + 4544
        host = features_host.windowed_features(
            signal=sig, signal_stt=stt, signal_end=end,
            mel_cfg=dict(MEL_CFG), sr=SR, frames=64)[0]
        host = np.transpose(host, (2, 1, 0))  # (T, F, 3)
        dev = _device(sig, stt, end)
        np.testing.assert_allclose(dev, host, atol=2e-3)
        np.testing.assert_allclose(dev[..., 0], host[..., 0], atol=5e-4)

    @pytest.mark.parametrize("et", [-4, -1, 2, 4])
    def test_time_extension(self, et):
        sig = _signal(seed=1)
        stt, end = 5000, 5000 + 4544
        host = features_host.windowed_features(
            signal=sig, signal_stt=stt, signal_end=end,
            mel_cfg=dict(MEL_CFG), sr=SR, frames=64,
            feat_extra=(0, et),
            random_args=dict(trunck=False, pad_mode="constant", lower_freq=False),
        )[0]
        host = np.transpose(host, (2, 1, 0))
        dev = _device(sig, stt, end, et=et)
        np.testing.assert_allclose(dev[..., 0], host[..., 0], atol=2e-3)

    @pytest.mark.parametrize("ef,lower,trunc,mode", [
        (3, False, False, "reflect"),
        (3, True, True, "constant"),
        (-4, False, False, "constant"),
        (5, False, True, "reflect"),
        (2, True, False, "constant"),
    ])
    def test_freq_extension(self, ef, lower, trunc, mode):
        sig = _signal(seed=2)
        stt, end = 6000, 6000 + 4544
        host = features_host.windowed_features(
            signal=sig, signal_stt=stt, signal_end=end,
            mel_cfg=dict(MEL_CFG), sr=SR, frames=64,
            feat_extra=(ef, 0),
            random_args=dict(trunck=trunc, pad_mode=mode, lower_freq=lower),
        )[0]
        host = np.transpose(host, (2, 1, 0))
        dev = _device(sig, stt, end,
                      f_variant=dfeat.freq_variant_index(ef, lower, trunc, mode))
        np.testing.assert_allclose(dev[..., 0], host[..., 0], atol=2e-3)

    def test_scale_and_zero_dropout(self):
        sig = _signal(seed=3)
        stt, end = 3000, 3000 + 4544
        rng = np.random.default_rng(4)
        scale = np.exp(rng.uniform(-0.15, 0.15, NMELS)).astype(np.float32)
        drop = np.zeros(NMELS, np.float32)
        drop_idx = rng.choice(NMELS, 10, replace=False)
        drop[drop_idx] = 1.0
        host = features_host.windowed_features(
            signal=sig, signal_stt=stt, signal_end=end,
            mel_cfg=dict(MEL_CFG), sr=SR, frames=64,
            feat_scale=scale[:, None], feat_dropout=10 / NMELS,
            random_args=dict(mask_idx=drop_idx, drop_mode="zero", mask_thres=0.5,
                             trunck=False, pad_mode="constant", lower_freq=False),
        )[0]
        host = np.transpose(host, (2, 1, 0))
        dev = _device(sig, stt, end, feat_scale=scale, drop_rows=drop,
                      drop_is_max=0.0)
        np.testing.assert_allclose(dev[..., 0], host[..., 0], atol=2e-3)

    def test_max_dropout_mode(self):
        sig = _signal(seed=5)
        stt, end = 2000, 2000 + 4544
        rng = np.random.default_rng(6)
        drop = np.zeros(NMELS, np.float32)
        drop_idx = rng.choice(NMELS, 12, replace=False)
        drop[drop_idx] = 1.0
        host = features_host.windowed_features(
            signal=sig, signal_stt=stt, signal_end=end,
            mel_cfg=dict(MEL_CFG), sr=SR, frames=64,
            feat_dropout=12 / NMELS,
            random_args=dict(mask_idx=drop_idx, drop_mode="max", mask_thres=0.45,
                             trunck=False, pad_mode="constant", lower_freq=False),
        )[0]
        host = np.transpose(host, (2, 1, 0))
        dev = _device(sig, stt, end, drop_rows=drop, drop_is_max=1.0,
                      drop_thres=0.45)
        np.testing.assert_allclose(dev[..., 0], host[..., 0], atol=2e-3)
        # "max" mode is a silent no-op in the reference
        # (get_features.py:191-192 writes into a fancy-index copy) —
        # reproduced on both paths for augmentation-distribution parity
        clean = features_host.windowed_features(
            signal=sig, signal_stt=stt, signal_end=end,
            mel_cfg=dict(MEL_CFG), sr=SR, frames=64,
        )[0]
        np.testing.assert_array_equal(host, np.transpose(clean, (2, 1, 0)))
