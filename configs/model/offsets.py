"""Per-vertex offsets model variant (values mirror reference
config/model/offsets.py)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import _shared as S

hparams = dict(
    tag="offsets",
    audio=dict(feature=S.audio_feature()),
    anime=dict(),
    dataset_speech=None,
    dataset_anime=dict(
        type="voca",
        name="voca-offsets",
        train_list=["train.csv"],
        valid_list=["valid.csv"],
    ),
    optim=S.optimizer(lr=1e-4),
    loss=S.loss_config(),
    ensembling_ms=0,
    save_video=True,
    model=dict(
        __entirety__=True,
        verbose=True,
        weight_norm=True,
        face_data_type="verts_off_3d",
        prediction_type="face_data",
        audio_encoder=dict(__entirety__=True, layers=S.audio_encoder_layers()),
        output=dict(
            __entirety__=True,
            layers=[
                ("fc", 520, 512, S.LRELU, "cat_condition=2"),
                ("fc", 512, 256, "act=tanh"),
                ("fc", 256, 59, "act=linear"),
            ],
            output_dim=15069,
            using_pca=True,
            pca_trainable=False,
            pca=(
                "{DATASET_ANIME_ROOT}/pca/compT.npy",
                "{DATASET_ANIME_ROOT}/pca/means.npy",
            ),
        ),
        speaker_embedding=S.speaker_onehot(8),
    ),
    trainer=S.trainer_config(max_epochs=100),
    device="tpu",
)
