"""Dataset visualization QA driver smoke (reference dataset_visualize.py)."""

import os

from sdfa_tpu.visualize import visualize_dataset

from test_data_pipeline import synth_root  # fixture


def test_visualize_dataset(synth_root, tmp_path):
    out = visualize_dataset(synth_root, face_type="dgrad_3d",
                            out_dir=str(tmp_path), max_items=1)
    videos = [f for f in os.listdir(out) if f.endswith(".avi")]
    assert len(videos) == 1
    assert os.path.getsize(os.path.join(out, videos[0])) > 0
