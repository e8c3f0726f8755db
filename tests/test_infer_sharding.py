"""Sharded serving: the overlap inference pipeline over a device mesh.

SURVEY.md §5 "Long-context/SP": the window/clip dimension is embarrassingly
parallel — clips shard across chips as data parallelism, parameters stay
replicated, and the per-clip overlap fast path (encode once per clip,
windowed suffix) keeps every gather local to its clip's shard, so XLA
inserts no cross-chip collectives on the hot path.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from sdfa_tpu.audio import pipeline as ap
from sdfa_tpu.models import build_model
from sdfa_tpu.models.sdfa import SpeechDrivenAnimation
from sdfa_tpu.parallel import mesh as mesh_lib
from sdfa_tpu.tools import configure

from _assets import ensure_pca_assets


@pytest.fixture(scope="module")
def setup():
    hp = configure("dgrad", dataset_root=ensure_pca_assets())
    model = build_model(hp, load_pca=True)
    rng = jax.random.PRNGKey(0)
    variables = model.init(
        {"params": rng, "dropout": rng},
        jnp.zeros((2, 64, 128, 3), jnp.float32),
        jnp.zeros((2,), jnp.int32), False,
    )
    return hp, model, variables


def _clips(hp, n):
    sr = int(hp.audio.sample_rate)
    t = np.arange(int(1.2 * sr)) / sr
    return np.stack([
        (0.3 * np.sin(2 * np.pi * (140 + 15 * k) * t)
         * (1 + 0.4 * np.sin(2 * np.pi * 3 * t))).astype(np.float32)
        for k in range(n)
    ])


def test_clip_sharded_overlap_matches_single_device(setup):
    hp, model, variables = setup
    n_dev = jax.device_count()
    assert n_dev == 8, "conftest must provide the 8-device virtual mesh"
    signals = _clips(hp, n_dev)

    wspec = ap.WindowSpec(hp)
    frame_idx_np, _, pad_l, pad_r, _ = wspec.frame_grid(signals.shape[1])
    frame_idx = jnp.asarray(frame_idx_np)
    spk = jnp.zeros((frame_idx.shape[0],), jnp.int32)

    def clip_fn(variables, sig):
        clip_feat = ap.clip_frame_features_device(sig, wspec, pad_l, pad_r)
        preds, _, _ = model.apply(
            variables, clip_feat, frame_idx, spk, False,
            method=SpeechDrivenAnimation.forward_overlap)
        return model.decode_to_anime(variables, preds)[:, 0]  # (W, D)

    def pipeline(variables, sigs):
        return jax.vmap(lambda s: clip_fn(variables, s))(sigs)

    # single-device reference
    ref = np.asarray(jax.jit(pipeline)(variables, jnp.asarray(signals)))

    # sharded: clips across the data axis, params replicated
    mesh = mesh_lib.make_mesh()
    sharded = jax.jit(
        pipeline,
        in_shardings=(mesh_lib.replicated(mesh), mesh_lib.batch_sharding(mesh)),
        out_shardings=mesh_lib.batch_sharding(mesh),
    )
    vars_r = mesh_lib.replicate(mesh, variables)
    sigs_s = jax.device_put(jnp.asarray(signals), mesh_lib.batch_sharding(mesh))
    out = sharded(vars_r, sigs_s)

    # really sharded: each device holds one clip's rows
    assert out.sharding.is_equivalent_to(
        mesh_lib.batch_sharding(mesh), out.ndim)
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5, rtol=1e-5)


def test_window_sharded_exact_forward_matches(setup):
    """The exact per-window forward shards on the window axis too (the
    reference's 100-window inference batches, model.py:428, as SPMD)."""
    hp, model, variables = setup
    n_dev = jax.device_count()
    feats = jnp.asarray(
        np.random.default_rng(1).normal(size=(2 * n_dev, 64, 128, 3)),
        jnp.float32)
    spk = jnp.zeros((2 * n_dev,), jnp.int32)

    def fwd(variables, feats, spk):
        preds, _, _ = model.apply(variables, feats, spk, False)
        return model.decode_to_anime(variables, preds)[:, 0]

    ref = np.asarray(jax.jit(fwd)(variables, feats, spk))

    mesh = mesh_lib.make_mesh()
    sharded = jax.jit(
        fwd,
        in_shardings=(mesh_lib.replicated(mesh),
                      mesh_lib.batch_sharding(mesh),
                      mesh_lib.batch_sharding(mesh)),
        out_shardings=mesh_lib.batch_sharding(mesh),
    )
    out = sharded(
        mesh_lib.replicate(mesh, variables),
        jax.device_put(feats, mesh_lib.batch_sharding(mesh)),
        jax.device_put(spk, mesh_lib.batch_sharding(mesh)),
    )
    assert out.sharding.is_equivalent_to(mesh_lib.batch_sharding(mesh), out.ndim)
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5, rtol=1e-5)
