"""Flagship model: deformation-gradient output with two PCA branches
(values mirror reference config/model/dgrad.py)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import _shared as S

hparams = dict(
    tag="dgrad",
    audio=dict(feature=S.audio_feature()),
    anime=dict(),
    dataset_speech=None,
    dataset_anime=dict(
        type="voca",
        name="voca-dgrad",
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
        face_data_type="dgrad_3d",
        prediction_type="face_data",
        audio_encoder=dict(__entirety__=True, layers=S.audio_encoder_layers()),
        output=dict(
            __entirety__=True,
            layers=[
                ("fc", 520, 512, S.LRELU, "cat_condition=2"),
            ],
            layers_scale=[
                ("fc", 520, 512, S.LRELU, "cat_condition=2"),
                ("fc", 512, 256, "act=tanh"),
                ("fc", 256, 85, "act=linear"),
            ],
            layers_rotat=[
                ("fc", 520, 512, S.LRELU, "cat_condition=2"),
                ("fc", 512, 256, "act=tanh"),
                ("fc", 256, 180, "act=linear"),
            ],
            output_dim_scale=59856,
            output_dim_rotat=29928,
            using_pca=True,
            pca_trainable=False,
            pca_scale=(
                "{DATASET_ANIME_ROOT}/pca/scale_compT.npy",
                "{DATASET_ANIME_ROOT}/pca/scale_means.npy",
            ),
            pca_rotat=(
                "{DATASET_ANIME_ROOT}/pca/rotat_compT.npy",
                "{DATASET_ANIME_ROOT}/pca/rotat_means.npy",
            ),
        ),
        speaker_embedding=S.speaker_onehot(8),
    ),
    trainer=S.trainer_config(max_epochs=100),
    device="tpu",
)
