"""trainer.pca_targets: PCA-coefficient targets decoded on device.

The host ships 85+180 coefficient floats per frame instead of the 89,784
dgrad floats (~350× smaller step upload); the loss decodes with the model's
own frozen PCA constants. Projection is affine, so bilinear frame
interpolation commutes with it — and the loss must equal the full-target
path evaluated on the PCA-reconstructed targets.
"""

import copy

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sdfa_tpu.data import DatasetSlidingWindow, synthetic
from sdfa_tpu.models import build_model, losses as L
from sdfa_tpu.tools import configure
from sdfa_tpu.train.trainer import _scaler_names, make_loss_fn


@pytest.fixture(scope="module")
def synth_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("synth") / "voca")
    synthetic.generate(root, "dgrad_3d", speakers=["m0"],
                       sentences_per_speaker=1, seconds_per_sentence=1.0,
                       pca_dims=(8, 8))
    return root


@pytest.fixture(scope="module")
def hp_pair(synth_root):
    hp_full = configure("dgrad", dataset_root=synth_root)
    hp_pca = configure("dgrad", dataset_root=synth_root)
    hp_pca.trainer.set_key("pca_targets", True)
    return hp_full, hp_pca


def test_coef_targets_shape_and_cache(hp_pair):
    _, hp_pca = hp_pair
    ds = DatasetSlidingWindow(hp_pca, training=False)
    item = ds[0]
    k_scale = ds._pca_mats[0][0].shape[1]
    k_rotat = ds._pca_mats[1][0].shape[1]
    assert item["dgrad_3d_scale_coef_0"].shape == (1, k_scale)
    assert item["dgrad_3d_rotat_coef_0"].shape == (1, k_rotat)
    assert "dgrad_3d_scale_0" not in item
    # per-sentence coefficient cache written next to the frame store
    import os

    d = str(ds.info_list[0]["npy_data_path:path"])
    assert os.path.exists(d + "_coeffs.npy")


def test_projection_commutes_with_interpolation(hp_pair):
    """coef targets == project(full targets) — bilinear interp in frame
    space equals interp in coefficient space (projection is affine)."""
    hp_full, hp_pca = hp_pair
    ds_full = DatasetSlidingWindow(hp_full, training=False)
    ds_pca = DatasetSlidingWindow(hp_pca, training=False)
    for i in (0, 5, len(ds_full) - 1):
        it_f = ds_full[i]
        it_p = ds_pca[i]
        full = np.concatenate([
            it_f["dgrad_3d_scale_0"].reshape(-1),
            it_f["dgrad_3d_rotat_0"].reshape(-1),
        ])
        # re-interleave to the flat frame layout and project on host
        frame = np.zeros(9976 * 9, np.float32)
        frame.reshape(-1, 9)[:, :6] = it_f["dgrad_3d_scale_0"][0]
        frame.reshape(-1, 9)[:, 6:] = it_f["dgrad_3d_rotat_0"][0]
        proj = ds_pca._project_frames(frame[None])[0]
        got = np.concatenate([
            it_p["dgrad_3d_scale_coef_0"][0], it_p["dgrad_3d_rotat_coef_0"][0],
        ])
        np.testing.assert_allclose(got, proj, atol=1e-4)
        assert it_f["anime_weight_0"] == pytest.approx(it_p["anime_weight_0"])
        del full


def test_loss_equivalence_vs_decoded_full_targets(hp_pair):
    """loss(pca batch) == loss(full batch whose targets are the host-decoded
    coefficients) — proves the device decode matches and nothing else in the
    loss path changed."""
    hp_full, hp_pca = hp_pair
    ds_pca = DatasetSlidingWindow(hp_pca, training=False)
    items = [ds_pca[i] for i in range(3)]
    batch_pca = ds_pca.collate(items)

    # host-decode the coefficients into a full-target batch
    (comp_s, mean_s), (comp_r, mean_r) = ds_pca._pca_mats
    dec_s = batch_pca["dgrad_3d_scale_coef"] @ comp_s.T + mean_s  # (B,1,59856)
    dec_r = batch_pca["dgrad_3d_rotat_coef"] @ comp_r.T + mean_r
    batch_full = {k: v for k, v in batch_pca.items() if "_coef" not in k}
    batch_full["dgrad_3d_scale"] = dec_s.reshape(len(dec_s), 1, 9976, 6)
    batch_full["dgrad_3d_rotat"] = dec_r.reshape(len(dec_r), 1, 9976, 3)

    # head widths must match the synthetic 8-dim PCA bases
    hp_model = configure("dgrad", dataset_root=hp_pca.dataset_anime.root)
    out = hp_model.model.output
    for key in ("layers_scale", "layers_rotat"):
        specs = [list(s) for s in out[key]]
        specs[-1][2] = 8  # last fc out_channels = coeff count
        out.set_key(key, [tuple(s) for s in specs])
    model = build_model(hp_model, load_pca=True)
    rng = jax.random.PRNGKey(0)
    variables = model.init(
        {"params": rng, "dropout": rng},
        jnp.zeros((2, 64, 128, 3), jnp.float32), jnp.zeros((2,), jnp.int32), False)
    scalers = {n: L.ScalerState.init() for n in _scaler_names(model.face_type)}
    loss_fn = make_loss_fn(model, hp_pca)

    def run(batch):
        total, aux = loss_fn(
            variables["params"], variables.get("batch_stats", {}),
            variables.get("constants", {}), scalers,
            {k: jnp.asarray(v) for k, v in batch.items()},
            jax.random.PRNGKey(1), False)
        return float(total), {k: float(v) for k, v in aux["scalars"].items()}

    t_pca, s_pca = run(batch_pca)
    t_full, s_full = run(batch_full)
    assert t_pca == pytest.approx(t_full, rel=1e-5)
    for key in s_full:
        assert s_pca[key] == pytest.approx(s_full[key], rel=1e-4), key


def test_compact_targets_keeps_coefs_f32(hp_pair):
    _, hp_pca = hp_pair
    hp2 = configure("dgrad", dataset_root=hp_pca.dataset_anime.root)
    hp2.trainer.set_key("pca_targets", True)
    hp2.trainer.set_key("compact_targets", True)
    ds = DatasetSlidingWindow(hp2, training=False)
    batch = ds._maybe_compact(ds.collate([ds[0]]))
    assert batch["dgrad_3d_scale_coef"].dtype == np.float32
