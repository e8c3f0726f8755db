"""PROOF that a checkpoint written by the REFERENCE framework loads
(VERDICT r2 missing #1 / next #2).

The reference's own ``SaberSpeechDrivenAnimation`` (imported from
/root/reference, not a twin) is built with the shipped dgrad config,
its state saved through torch in the reference checkpoint schema
(saber/trainer/manager/checkpoints.py:50-64) — once with modern module
names and once with the LEGACY names of the published pretrained models
(speech_anime/api.py:170-197, incl. the stray ``hamm`` buffer) — then
ingested through ``api.load_task`` and compared against the torch
model's own forward on identical windows.
"""

import os

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from _reference_oracle import load_reference_full_model
from sdfa_tpu import api

# inverse of compat/torch_ckpt._LEGACY_RENAMES, longest-match-first so
# "_layers.10." does not get clobbered by "_layers.1."
_TO_LEGACY = sorted(
    [
        ("_ext_post_bn", "_ext_batch_norm"),
        ("_model._audio_encoder._layers.10.", "time_aggregator.layers.1."),
        ("_model._audio_encoder._layers.9.", "time_aggregator.layers.0."),
        ("_model._audio_encoder._layers.1.", "audio_encoder.layers.0."),
        ("_model._audio_encoder._layers.2.", "audio_encoder.layers.1."),
        ("_model._audio_encoder._layers.3.", "audio_encoder.layers.2."),
        ("_model._audio_encoder._layers.4.", "audio_encoder.layers.3."),
        ("_model._audio_encoder._layers.5.", "audio_encoder.layers.4."),
        ("_model._audio_encoder._layers.6.", "audio_encoder.layers.5."),
        ("_model._output_module._scale_layers", "anime_decoder.layers_scale"),
        ("_model._output_module._rotat_layers", "anime_decoder.layers_rotat"),
        ("_model._output_module._scale_pca", "anime_decoder.proj_scale"),
        ("_model._output_module._rotat_pca", "anime_decoder.proj_rotat"),
        ("_model._output_module._layers.", "anime_decoder.layers."),
    ],
    key=lambda kv: -len(kv[0]),
)


def _legacy_key(key: str) -> str:
    for new, old in _TO_LEGACY:
        if new in key:
            return key.replace(new, old)
    return key


@pytest.fixture(scope="module")
def assets(tmp_path_factory):
    """Random PCA npys with the shipped dims + the reference torch model."""
    root = str(tmp_path_factory.mktemp("refckpt"))
    os.makedirs(os.path.join(root, "pca"), exist_ok=True)
    rng = np.random.default_rng(0)
    for name, shape in {
        "scale_compT.npy": (59856, 85), "scale_means.npy": (59856,),
        "rotat_compT.npy": (29928, 180), "rotat_means.npy": (29928,),
    }.items():
        np.save(os.path.join(root, "pca", name),
                rng.normal(0, 0.01, shape).astype(np.float32))
    model, hp = load_reference_full_model(root)
    # randomize BatchNorm running stats — at their 0/1 defaults a broken
    # running-stats mapping would be invisible to the forward comparison
    g = torch.Generator().manual_seed(7)
    for mod in model.modules():
        if isinstance(mod, torch.nn.modules.batchnorm._BatchNorm):
            mod.running_mean.normal_(0.0, 0.5, generator=g)
            mod.running_var.uniform_(0.5, 2.0, generator=g)
    return root, model, hp


def _save_reference_ckpt(model, path, legacy: bool):
    """Write the reference checkpoint schema (checkpoints.py:50-64)."""
    state = model.state_dict()
    if legacy:
        state = {_legacy_key(k): v for k, v in state.items()}
        # published ckpts carry a stray window buffer (api.py:195)
        state["hamm"] = torch.hamming_window(512)
    torch.save(
        {"epoch": 50, "global_step": 86751, "state": state,
         "optim_default": {}},
        path,
    )


@pytest.mark.parametrize("legacy", [False, True],
                         ids=["modern-names", "legacy-names"])
def test_reference_checkpoint_full_forward_parity(assets, tmp_path, legacy):
    root, ref_model, _hp = assets
    ckpt = str(tmp_path / ("legacy.ckpt" if legacy else "modern.ckpt"))
    _save_reference_ckpt(ref_model, ckpt, legacy)

    task = api.load_task(ckpt, custom_hparams="dgrad", dataset_root=root)

    rng = np.random.default_rng(3)
    feat = rng.normal(0, 1.0, (4, 64, 128, 3)).astype(np.float32)
    spk = np.array([0, 1, 2, 3], np.int32)

    with torch.no_grad():
        ref_out = ref_model(dict(audio_feat=torch.from_numpy(feat),
                                 speaker_id=torch.from_numpy(spk.astype(np.int64))))
    ref_scale = ref_out["prediction"]["dgrad_3d_scale"].numpy()
    ref_rotat = ref_out["prediction"]["dgrad_3d_rotat"].numpy()

    preds, _, _ = task.model.apply(
        task.variables, jnp.asarray(feat), jnp.asarray(spk), False)
    ours_scale = np.asarray(preds["dgrad_3d_scale"]).reshape(ref_scale.shape)
    ours_rotat = np.asarray(preds["dgrad_3d_rotat"]).reshape(ref_rotat.shape)

    # north-star budget: < 1e-4 through the whole model
    assert np.abs(ours_scale - ref_scale).max() < 1e-4
    assert np.abs(ours_rotat - ref_rotat).max() < 1e-4


def test_reference_checkpoint_reaches_vertices(assets, tmp_path):
    """The ingested checkpoint drives the full serving surface: the
    wav→vertices path runs and produces finite FLAME-shaped frames (vertex
    parity of the decode+solve stage itself is pinned elsewhere against
    the f64 oracle — tests/test_e2e_parity.py, bench realism)."""
    root, ref_model, _hp = assets
    ckpt = str(tmp_path / "modern.ckpt")
    _save_reference_ckpt(ref_model, ckpt, legacy=False)
    task = api.load_task(ckpt, custom_hparams="dgrad", dataset_root=root)
    sr = int(task.hp.audio.sample_rate)
    t = np.arange(sr) / sr
    wav = (0.3 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
    ts, verts = task.generate_vertices(wav, 0)
    verts = np.asarray(verts)
    assert verts.shape[1:] == (5023, 3)
    assert len(ts) == len(verts) and np.isfinite(verts).all()
