"""Default hparams skeleton (mirrors reference config/default.py values)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import _shared as S

hparams = dict(
    tag="default",
    audio=dict(),
    anime=dict(),
    dataset_speech=None,
    dataset_anime=dict(),
    optim=dict(
        __entirety__=True,
        name="Adam",
        args=dict(lr=1e-3, weight_decay=0, __entirety__=True),
        lr_scheduler=dict(
            __entirety__=True,
            name="NoamDecay",
            args=dict(mode="epoch", warmup_iters=10),
        ),
    ),
    loss=S.loss_config(),
    ensembling_ms=0,
    save_video=True,
    model=dict(
        __entirety__=True,
        verbose=True,
        weight_norm=True,
        face_data_type="dgrad_3d",
        prediction_type="face_data",
        # module slots (None = unused, same surface as the reference)
        audio_encoder=None,
        asr_encoder=None,
        time_aggregator=None,
        anime_decoder=None,
        speaker_embedding=None,
        emotion_embedding=None,
        vector_quantizer=None,
        phoneme_classifier=None,
        audio_reconstructor=None,
    ),
    trainer=S.trainer_config(max_epochs=150),
    device="tpu",
    eval_input=None,
    eval_spk_cond=None,
)
