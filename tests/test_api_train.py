"""api.train_model end-to-end on CPU: the full wiring (dataset → loaders
incl. the thread-prefetch wrapper → Experiment → Trainer → checkpoint),
capped to 2 tiny steps."""

import os

import jax
import pytest

from sdfa_tpu import api
from sdfa_tpu.data import synthetic


@pytest.fixture(scope="module")
def synth_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("api_train") / "voca")
    synthetic.generate(root, "dgrad_3d", speakers=["m0", "f0"],
                       sentences_per_speaker=1, seconds_per_sentence=2.0)
    return root


def test_train_model_end_to_end(synth_root, tmp_path):
    log_dir = str(tmp_path / "run")
    exp = api.train_model(
        "dgrad", dataset_root=synth_root, log_dir=log_dir, max_steps=2,
        overrides=dict(trainer=dict(pca_targets=True,
                                    anime_loader=dict(batch_size=2))))
    assert int(jax.device_get(exp.state.step)) == 2
    assert os.path.exists(os.path.join(log_dir, "last.ckpt"))
    assert os.path.exists(os.path.join(log_dir, "params_info.txt"))


def test_train_model_thread_prefetch_can_be_disabled(synth_root, tmp_path):
    exp = api.train_model(
        "dgrad", dataset_root=synth_root,
        log_dir=str(tmp_path / "run2"), max_steps=1,
        overrides=dict(trainer=dict(pca_targets=True, thread_prefetch=False,
                                    anime_loader=dict(batch_size=2))))
    assert int(jax.device_get(exp.state.step)) == 1
