"""Window-overlap inference fast path (DESIGN.md §10).

Adjacent sliding windows share 62/64 frames (98.6% signal overlap,
reference sliding_window.py:29,48); the encoder prefix up to the first
temporal layer is per-timestep, so it runs once per clip. These tests
prove (a) the prefix analyzer is correct and conservative, (b) LayerStack
subrange composition is exact, and (c) the end-to-end divergence of the
fast path vs the exact per-window path is tightly bounded.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sdfa_tpu.audio import pipeline as ap
from sdfa_tpu.models import build_model
from sdfa_tpu.models.sdfa import SpeechDrivenAnimation, encoder_overlap_split
from sdfa_tpu.nn.spec import (
    LayerStack, freeze_specs, parse_specs, time_independent_prefix,
)
from sdfa_tpu.tools import configure

from _assets import ensure_pca_assets


@pytest.fixture(scope="module")
def hp():
    root = ensure_pca_assets()
    return configure("dgrad", dataset_root=root)


# ---------------------------------------------------------------------------
# analyzer
# ---------------------------------------------------------------------------
def test_shipped_encoder_prefix(hp):
    model = build_model(hp, load_pca=True)
    split, taxis = encoder_overlap_split(model.encoder_specs, model.weight_norm)
    # permute/conv/pool/conv/pool/conv/freq-lstm/squeeze/permute = 9 layers,
    # output (N, T, C) — time at axis 1
    assert split == 9
    assert taxis == 1


def _analyze(specs):
    return time_independent_prefix(parse_specs([list(s) for s in specs]))


def test_analyzer_stops_at_time_kernel_conv():
    specs = [
        ("permute", (0, 3, 2, 1)),            # (N,C,F,T)
        ("conv2d", 3, 32, (3, 3), (1, 1)),    # kernel 3 along time
    ]
    split, taxis = _analyze(specs)
    assert split == 1 and taxis == 3


def test_analyzer_stops_at_time_stride():
    specs = [
        ("permute", (0, 3, 2, 1)),
        ("pool2d", "max", (2, 2)),            # pools time
    ]
    assert _analyze(specs)[0] == 1


def test_analyzer_stops_at_cat_condition():
    specs = [
        ("permute", (0, 3, 2, 1)),
        ("conv2d", 3, 32, (3, 1), (1, 1), "cat_condition=1"),
    ]
    assert _analyze(specs)[0] == 1


def test_analyzer_stops_at_temporal_layers():
    assert _analyze([("lstm", 256, 256)])[0] == 0
    assert _analyze([("attn", "bah", 512, 128, 2)])[0] == 0
    assert _analyze([("gru", 256, 256)])[0] == 0


def test_analyzer_fc_on_time_last_stops():
    # (N, T, F, C): fc over last axis is fine; after permute putting T last
    # it must stop
    assert _analyze([("fc", 3, 8)])[0] == 1
    assert _analyze([("permute", (0, 2, 3, 1)), ("fc", 64, 8)])[0] == 1


def test_analyzer_freq_lstm_requires_time_last():
    # (N,T,F,C) without permute: freq-lstm would recur over the time axis
    assert _analyze([("freq-lstm", 64, 32)])[0] == 0


# ---------------------------------------------------------------------------
# LayerStack subranges
# ---------------------------------------------------------------------------
def test_layerstack_subrange_composes_exactly(hp):
    specs = freeze_specs(hp.model.audio_encoder.layers)
    stack = LayerStack(specs=specs, weight_norm=True, tag="enc")
    x = jnp.asarray(np.random.default_rng(0).normal(size=(3, 64, 128, 3)),
                    jnp.float32)
    variables = stack.init({"params": jax.random.PRNGKey(0)}, x)
    full, _ = stack.apply(variables, x, training=False)
    mid, _ = stack.apply(variables, x, training=False, stop=9)
    out, _ = stack.apply(variables, mid, training=False, start=9)
    np.testing.assert_array_equal(np.asarray(full), np.asarray(out))


# ---------------------------------------------------------------------------
# end-to-end bounded divergence
# ---------------------------------------------------------------------------
def test_overlap_path_bounded_divergence(hp):
    model = build_model(hp, load_pca=True)
    rng = jax.random.PRNGKey(0)
    variables = model.init(
        {"params": rng, "dropout": rng},
        jnp.zeros((2, 64, 128, 3), jnp.float32),
        jnp.zeros((2,), jnp.int32), False,
    )

    sr = int(hp.audio.sample_rate)
    t = np.arange(int(1.5 * sr)) / sr
    sig = (0.3 * np.sin(2 * np.pi * 150 * t)
           * (1 + 0.4 * np.sin(2 * np.pi * 3 * t))).astype(np.float32)

    wspec = ap.WindowSpec(hp)
    starts, ts_exact = wspec.window_starts(len(sig))
    frame_idx, ts_fast, pad_l, pad_r, t_total = wspec.frame_grid(len(sig))
    # identical output-frame timeline
    assert ts_exact == ts_fast
    assert frame_idx.shape == (len(starts), wspec.frames)
    assert frame_idx.min() >= 0 and frame_idx.max() < t_total
    # snapping moves each window start by at most hop/2 samples
    snapped = frame_idx[:, 0].astype(np.int64) * wspec.hop_size - pad_l
    assert np.abs(snapped - starts).max() <= wspec.hop_size // 2

    spk = jnp.zeros((len(starts),), jnp.int32)

    feats = ap.window_features_device(jnp.asarray(sig), jnp.asarray(starts), wspec)
    preds_e, _, _ = model.apply(variables, feats, spk, False)
    anime_e = np.asarray(model.decode_to_anime(variables, preds_e))

    clip_feat = ap.clip_frame_features_device(jnp.asarray(sig), wspec, pad_l, pad_r)
    assert clip_feat.shape == (t_total, wspec.n_mels, 3)
    preds_o, _, _ = model.apply(
        variables, clip_feat, jnp.asarray(frame_idx), spk, False,
        method=SpeechDrivenAnimation.forward_overlap,
    )
    anime_o = np.asarray(model.decode_to_anime(variables, preds_o))

    # measured ~7e-5 max abs (rel 8e-4) — bound with slack but keep meaning
    diff = np.abs(anime_e - anime_o)
    assert diff.max() < 5e-4, diff.max()
    assert diff.mean() < 5e-5, diff.mean()


def test_encode_frames_batch_matches_single(hp):
    """encode_frames_batch (B clips in one prefix call — the serving/bench
    cross-clip batching path) == encode_frames per clip."""
    model = build_model(hp, load_pca=True)
    rng = jax.random.PRNGKey(0)
    variables = model.init(
        {"params": rng, "dropout": rng},
        jnp.zeros((2, 64, 128, 3), jnp.float32),
        jnp.zeros((2,), jnp.int32), False,
    )
    feats = jnp.asarray(
        np.random.default_rng(3).normal(size=(3, 90, 128, 3)), jnp.float32)
    z_b = model.apply(variables, feats,
                      method=SpeechDrivenAnimation.encode_frames_batch)
    assert z_b.shape[:2] == (3, 90)
    for i in range(3):
        z_i = model.apply(variables, feats[i],
                          method=SpeechDrivenAnimation.encode_frames)
        np.testing.assert_allclose(np.asarray(z_b[i]), np.asarray(z_i),
                                   atol=1e-5, rtol=1e-5)


def test_flat_multiclip_window_table_matches_per_clip(hp):
    """The serving/bench cross-clip batching: windows gathered from a FLAT
    concatenated frame table with c·T_total offsets == per-clip
    forward_overlap. Proves clip boundaries are never crossed."""
    model = build_model(hp, load_pca=True)
    rng = jax.random.PRNGKey(0)
    variables = model.init(
        {"params": rng, "dropout": rng},
        jnp.zeros((2, 64, 128, 3), jnp.float32),
        jnp.zeros((2,), jnp.int32), False,
    )
    sr = int(hp.audio.sample_rate)
    rng_np = np.random.default_rng(5)
    n_clips = 3
    t = np.arange(int(1.2 * sr)) / sr
    signals = np.stack([
        (0.3 * np.sin(2 * np.pi * (120 + 40 * k) * t)).astype(np.float32)
        for k in range(n_clips)
    ]) + rng_np.normal(0, 0.01, (n_clips, len(t))).astype(np.float32)

    wspec = ap.WindowSpec(hp)
    frame_idx_np, _, pad_l, pad_r, t_total = wspec.frame_grid(signals.shape[1])
    frame_idx = jnp.asarray(frame_idx_np)
    W = len(frame_idx_np)
    spk1 = jnp.zeros((W,), jnp.int32)

    # per-clip reference
    refs = []
    for k in range(n_clips):
        clip_feat = ap.clip_frame_features_device(
            jnp.asarray(signals[k]), wspec, pad_l, pad_r)
        preds, _, _ = model.apply(
            variables, clip_feat, frame_idx, spk1, False,
            method=SpeechDrivenAnimation.forward_overlap)
        refs.append(np.asarray(model.decode_to_anime(variables, preds)[:, 0]))
    ref = np.stack(refs)  # (C, W, D)

    # flat multi-clip table (the bench pipeline's stage 1+2)
    feats = jax.vmap(
        lambda s: ap.clip_frame_features_device(s, wspec, pad_l, pad_r)
    )(jnp.asarray(signals))
    z = model.apply(variables, feats,
                    method=SpeechDrivenAnimation.encode_frames_batch)
    assert z.shape[:2] == (n_clips, t_total)
    z_flat = z.reshape((n_clips * t_total,) + z.shape[2:])
    idx = (jnp.arange(n_clips, dtype=jnp.int32)[:, None, None] * t_total
           + frame_idx[None]).reshape(n_clips * W, -1)
    spk = jnp.zeros((n_clips * W,), jnp.int32)
    preds, _, _ = model.apply(variables, z_flat, idx, spk,
                              method=SpeechDrivenAnimation.forward_windows)
    got = np.asarray(model.decode_to_anime(variables, preds)[:, 0])
    np.testing.assert_allclose(got.reshape(n_clips, W, -1), ref,
                               atol=2e-5, rtol=1e-5)


def test_task_overlap_mode_matches_exact(hp):
    """AnimationTask(overlap_frontend=True) = same timeline, bounded anime
    divergence, same `others` surface, ensembling works."""
    from sdfa_tpu.task import AnimationTask

    model = build_model(hp, load_pca=True)
    rng = jax.random.PRNGKey(0)
    variables = model.init(
        {"params": rng, "dropout": rng},
        jnp.zeros((2, 64, 128, 3), jnp.float32),
        jnp.zeros((2,), jnp.int32), False,
    )
    sr = int(hp.audio.sample_rate)
    t = np.arange(int(1.2 * sr)) / sr
    sig = (0.3 * np.sin(2 * np.pi * 150 * t)).astype(np.float32)

    exact = AnimationTask(hp, model, variables,
                          device_frontend=True, overlap_frontend=False)
    fast = AnimationTask(hp, model, variables,
                         device_frontend=True, overlap_frontend=True)
    ts_e, an_e, _ = exact.generate_animation(sig, 0)
    ts_f, an_f, others = fast.generate_animation(sig, 0)
    assert ts_e == ts_f
    assert np.abs(an_e - an_f).max() < 5e-4
    assert others["inputs"].shape == (len(ts_f), 64, 128, 3)
    assert others["latent"].shape == (len(ts_f), 512)
    assert others["latent_align"] is not None

    # ensembling averages two shifted passes (model.py:369-403)
    _, an_ens, _ = fast.generate_animation(sig, 0, ensembling_ms=40)
    assert an_ens.shape == an_f.shape
    assert not np.allclose(an_ens, an_f)


def test_clip_features_match_exact_on_aligned_interior_windows(hp):
    """When a window start already sits on the hop grid, its gathered
    clip-level mel equals the per-window mel exactly on interior frames
    (edges differ only in Δ/Δ² and the preemphasis first sample)."""
    wspec = ap.WindowSpec(hp)
    sr = wspec.sr
    rng = np.random.default_rng(1)
    sig = rng.normal(0, 0.1, 2 * sr).astype(np.float32)

    start = 10 * wspec.hop_size  # on-grid start
    starts = np.asarray([start], np.int32)
    exact = np.asarray(ap.window_features_device(
        jnp.asarray(sig), jnp.asarray(starts), wspec))[0]  # (T, M, 3)

    pad_l = wspec.sliding
    clip = np.asarray(ap.clip_frame_features_device(
        jnp.asarray(sig), wspec, pad_l, pad_l))
    f0 = (start + pad_l) // wspec.hop_size
    gathered = clip[f0:f0 + wspec.frames]

    # mel channel: all frames except frame 0 (preemphasis first-sample) match
    np.testing.assert_allclose(gathered[1:, :, 0], exact[1:, :, 0],
                               atol=2e-5, rtol=0)
    # delta channels: interior frames (SG half-width 4 from each edge,
    # +1 for the frame-0 mel effect spreading through the 9-tap filter)
    np.testing.assert_allclose(gathered[5:-4, :, 1], exact[5:-4, :, 1],
                               atol=2e-5, rtol=0)
    np.testing.assert_allclose(gathered[5:-4, :, 2], exact[5:-4, :, 2],
                               atol=2e-5, rtol=0)


def test_analyzer_conv2d_with_time_at_channel_returns_tuple():
    """conv2d reached while time is still at axis 1 must return the
    (split, taxis) TUPLE like every other exit — a bare int here crashed
    AnimationTask construction for conv-first encoder specs."""
    out = _analyze([("conv2d", 3, 16, (1, 3))])
    assert out == (0, 1)


def test_suffix_skip_into_prefix_disables_overlap():
    """A suffix layer whose skip_connect reaches before the prefix split
    would read history=None in the overlap path; encoder_overlap_split
    must return split=0 (exact per-window path) for such specs."""
    specs = (
        ("permute", (0, 3, 2, 1)),                 # (N,C,F,T)
        ("conv2d", 3, 8, (3, 1), (1, 1)),          # per-timestep: prefix
        ("permute", (0, 3, 2, 1)),                 # back to (N,T,F,C)
        ("flatten", "start_dim=2"),                # temporal-suffix start
        ("fc", 1024, 8, "act=linear", "skip_connect=2"),  # reaches prefix
    )
    frozen = freeze_specs([list(s) for s in specs])
    split, _ = encoder_overlap_split(frozen, False)
    assert split == 0

    # same suffix WITHOUT the offending skip keeps its prefix
    specs_ok = tuple(s[:-1] if s[0] == "fc" else s for s in specs)
    frozen_ok = freeze_specs([list(s) for s in specs_ok])
    split_ok, _ = encoder_overlap_split(frozen_ok, False)
    assert split_ok == 3


def test_raw_pca_windows_decode_matches_default(hp):
    """forward_windows(raw_pca=True) (coefficient preds, decoded in a
    separate decode_to_anime call — the bench's chunked decode+solve path)
    == the default forward_windows whose heads invert PCA inline."""
    model = build_model(hp, load_pca=True)
    rng = jax.random.PRNGKey(0)
    variables = model.init(
        {"params": rng, "dropout": rng},
        jnp.zeros((2, 64, 128, 3), jnp.float32),
        jnp.zeros((2,), jnp.int32), False,
    )
    feats = jnp.asarray(
        np.random.default_rng(5).normal(size=(80, 128, 3)), jnp.float32)
    z = model.apply(variables, feats,
                    method=SpeechDrivenAnimation.encode_frames)
    idx = jnp.asarray(np.stack([np.arange(64) + k for k in (0, 7, 16)]))
    spk = jnp.zeros((3,), jnp.int32)

    preds_full, _, _ = model.apply(
        variables, z, idx, spk, method=SpeechDrivenAnimation.forward_windows)
    want = np.asarray(model.decode_to_anime(variables, preds_full))

    preds_pca, _, _ = model.apply(
        variables, z, idx, spk, raw_pca=True,
        method=SpeechDrivenAnimation.forward_windows)
    assert set(preds_pca) == {"dgrad_3d_scale_pca", "dgrad_3d_rotat_pca"}
    assert preds_pca["dgrad_3d_scale_pca"].shape[-1] == 85
    got = np.asarray(model.decode_to_anime(variables, preds_pca))

    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-6)


def test_negative_suffix_skip_keeps_overlap():
    """skip_connect=-1 in the suffix (residual on the layer's own input)
    resolves inside the suffix history — the overlap path must stay on.
    A negative skip that resolves INTO the prefix must still disable it."""
    base = (
        ("permute", (0, 3, 2, 1)),
        ("conv2d", 3, 8, (3, 1), (1, 1)),          # prefix
        ("permute", (0, 3, 2, 1)),
        ("flatten", "start_dim=2"),                # suffix starts (split=3)
    )
    ok = base + (("fc", 1024, 1024, "act=linear", "skip_connect=-1"),)
    split, _ = encoder_overlap_split(freeze_specs([list(s) for s in ok]), False)
    assert split == 3

    # at layer 4 (the fc), skip=-3 resolves to 4+1-3 = 2 < split=3 → prefix
    bad = base + (("fc", 1024, 8, "act=linear", "skip_connect=-3"),)
    split_bad, taxis_bad = encoder_overlap_split(
        freeze_specs([list(s) for s in bad]), False)
    assert (split_bad, taxis_bad) == (0, 1)
