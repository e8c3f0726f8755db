"""Shared building blocks for the shipped configs.

Values mirror the reference configs (speech_anime/config/*); structure is
factored here so each config file only states what differs.
"""

BN = "batch_norm={}".format(dict(momentum=0.01, eps=1e-3))
LRELU = "act=lrelu@a:0.2"


def audio_feature(**overrides):
    base = dict(
        name="mel",
        with_delta=True,
        sliding_window_frames=64,
        scaling=1,
        random_noise=0.01,
        random_reverb=False,
        random_preemph=0.95,
        random_pitch_shift=False,
        random_time_stretch=False,
        random_mel_extra=[5, 4],
        random_mel_noise=None,
        random_mel_scale=0.15,
        random_mel_dropout=0.15,
        random_mel_tremolo=None,
    )
    base.update(overrides)
    return base


def audio_encoder_layers():
    """The shipped spectral-gathering encoder (config/model/dgrad.py:58-71)."""
    return [
        ("permute", (0, 3, 2, 1)),  # N,T,F,C → N,C,F,T
        ("conv2d", 3, 32, (3, 1), (1, 1), LRELU, BN),
        ("pool2d", "max", (2, 1)),
        ("conv2d", 32, 64, (3, 1), (1, 1), LRELU, BN),
        ("pool2d", "max", (2, 1)),
        ("conv2d", 64, 64, (1, 1), (1, 1), LRELU, BN),
        ("freq-lstm", 64, 32, "hidden_size=128", "output_size=256"),
        ("squeeze", 2),  # N,C,T
        ("permute", (0, 2, 1)),  # N,T,C
        ("lstm", 256, 256, "num_layers=2", "bidirectional=True", "dropout=0.1"),
        ("attn", "bah", 512, 128, 2, "scale_score_at_eval=1.0"),
    ]


def optimizer(lr=1e-4):
    return dict(
        name="Adam",
        args=dict(lr=lr, weight_decay=0, __entirety__=True),
        lr_scheduler=None,
    )


def loss_config():
    return dict(
        __entirety__=True,
        ploss_scale=1,
        mloss_scale=1,
        eloss_scale=1,
        dynamic_scalar=True,
        phoneme_cross_entropy_weight=False,
        anime_loss_weight=None,
    )


def trainer_config(max_epochs=100, **overrides):
    base = dict(
        anime_loader=dict(batch_size=50, multiple_workers=True),
        speech_loader=dict(batch_size=10, multiple_workers=True),
        max_epochs=max_epochs,
        plot_gap_steps=400,
        eval_gap_epochs=10,
        save_gap_epochs=10,
        valid_gap_epochs=0,
        reference_metric="ploss",
        reference_metric_larger=False,
        eval_debug=False,
        evaluate=dict(test=[]),
    )
    base.update(overrides)
    return base


def speaker_onehot(num_speakers=8):
    return dict(using_onehot=True, num_speakers=num_speakers)
