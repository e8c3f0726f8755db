"""SpeechDrivenAnimation — the core audio→face network, as one flax module.

Reference: /root/reference/speech_anime/model/model.py:18-45 (forward),
modules/output_module.py:8-116 (two-branch dgrad output + PCA inversion),
modules/speaker.py:5-27 (one-hot / learned condition), modules/configurable.py
(config-driven encoder).

The whole forward is a pure jitted function: (params, audio_feat (N,T,F,C),
speaker_id (N,)) → prediction dict + attention alignments.
"""

from __future__ import annotations

import functools
import os
from typing import Any, Callable, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..nn import LayerStack, freeze_specs
from ..nn import functions as fn
from ..utils.config import ConfigDict

from ..nn.precision import MODEL_PREC as _PREC

FACE_TYPES = ("dgrad_3d", "blend_1d", "verts_pos_3d", "verts_off_3d",
              "marks_pos_2d", "marks_off_2d")
PRED_TYPES = ("pca_coeffs", "pca_normal", "face_data")


class PcaInversion(nn.Module):
    """y = x·compTᵀ + means (output_module.py:94-116). compT: (out, coeffs)."""

    coeffs_dim: int = 0
    output_dim: int = 0
    trainable: bool = False
    init_fn: Optional[Callable[[], Tuple[np.ndarray, np.ndarray]]] = None

    @nn.compact
    def __call__(self, x):
        def comp_init(key, shape, dtype=jnp.float32):
            del key
            if self.init_fn is not None:
                comp, _ = self.init_fn()
                return jnp.asarray(comp, dtype).reshape(shape)
            return jnp.zeros(shape, dtype)

        def mean_init(key, shape, dtype=jnp.float32):
            del key
            if self.init_fn is not None:
                _, means = self.init_fn()
                return jnp.asarray(means, dtype).reshape(shape)
            return jnp.zeros(shape, dtype)

        shape_c = (self.output_dim, self.coeffs_dim)
        shape_m = (self.output_dim,)
        if self.trainable:
            comp = self.param("compT", comp_init, shape_c)
            means = self.param("means", mean_init, shape_m)
        else:
            comp = self.variable("constants", "compT", comp_init, None, shape_c).value
            means = self.variable("constants", "means", mean_init, None, shape_m).value
        return jnp.matmul(x, comp.T, precision=_PREC) + means


class SpeakerEmbedding(nn.Module):
    """One-hot (shipped) or learned condition vector (speaker.py:5-27)."""

    num_speakers: int = 8
    using_onehot: bool = True
    embedding_size: int = 32

    @nn.compact
    def __call__(self, speaker_id):
        if self.using_onehot:
            return fn.one_hot(speaker_id, self.num_speakers)
        emb = nn.Embed(num_embeddings=self.num_speakers, features=self.embedding_size)
        return emb(speaker_id)

    @property
    def condition_size(self) -> int:
        return self.num_speakers if self.using_onehot else self.embedding_size


class SpeechDrivenAnimation(nn.Module):
    """audio_feat → anime_feat network (model.py:18-45 + output_module.py)."""

    encoder_specs: Tuple[Any, ...] = ()
    output_specs: Tuple[Any, ...] = ()
    output_scale_specs: Tuple[Any, ...] = ()
    output_rotat_specs: Tuple[Any, ...] = ()
    face_type: str = "dgrad_3d"
    pred_type: str = "face_data"
    using_pca: bool = True
    pca_trainable: bool = False
    output_dim: int = 0              # non-dgrad face types
    output_dim_scale: int = 0        # dgrad scale branch (59856)
    output_dim_rotat: int = 0        # dgrad rotat branch (29928)
    pca_coeffs_scale: int = 0
    pca_coeffs_rotat: int = 0
    pca_coeffs: int = 0
    weight_norm: bool = True
    num_speakers: int = 8
    speaker_onehot: bool = True
    speaker_embedding_size: int = 32
    pca_scale_init: Optional[Callable] = None
    pca_rotat_init: Optional[Callable] = None
    pca_init: Optional[Callable] = None

    @property
    def return_pca(self) -> bool:
        return self.pred_type.startswith("pca")

    def setup(self):
        assert self.face_type in FACE_TYPES
        assert self.pred_type in PRED_TYPES
        self.audio_encoder = LayerStack(
            specs=self.encoder_specs, weight_norm=self.weight_norm, tag="audio_encoder"
        )
        self.speaker_embedding = SpeakerEmbedding(
            num_speakers=self.num_speakers,
            using_onehot=self.speaker_onehot,
            embedding_size=self.speaker_embedding_size,
        )
        self.output_trunk = LayerStack(
            specs=self.output_specs, weight_norm=self.weight_norm, tag="output"
        )
        if self.face_type == "dgrad_3d":
            self.scale_head = LayerStack(
                specs=self.output_scale_specs, weight_norm=self.weight_norm, tag="output-scale"
            )
            self.rotat_head = LayerStack(
                specs=self.output_rotat_specs, weight_norm=self.weight_norm, tag="output-rotat"
            )
            if self.using_pca:
                self.scale_pca = PcaInversion(
                    coeffs_dim=self.pca_coeffs_scale, output_dim=self.output_dim_scale,
                    trainable=self.pca_trainable, init_fn=self.pca_scale_init,
                )
                self.rotat_pca = PcaInversion(
                    coeffs_dim=self.pca_coeffs_rotat, output_dim=self.output_dim_rotat,
                    trainable=self.pca_trainable, init_fn=self.pca_rotat_init,
                )
        elif self.using_pca:
            self.pca = PcaInversion(
                coeffs_dim=self.pca_coeffs, output_dim=self.output_dim,
                trainable=self.pca_trainable, init_fn=self.pca_init,
            )

    def __call__(self, audio_feat, speaker_id=None, training: bool = False):
        """Returns (pred_dict, z_audio, align_dict)."""
        align_dict: Dict[str, jnp.ndarray] = {}
        condition = None
        if speaker_id is not None:
            condition = self.speaker_embedding(speaker_id)

        z_audio, aligns = self.audio_encoder(
            audio_feat, condition=condition, training=training
        )
        align_dict.update(aligns)
        return self._output_heads(z_audio, condition, training, align_dict)

    def forward_overlap(self, clip_feat, frame_idx, speaker_id=None,
                        training: bool = False):
        """Window-overlap inference fast path (DESIGN.md §10).

        Adjacent 64-frame sliding windows share 62 of their frames; the
        encoder up to the first temporal layer is per-timestep (time-kernel-1
        convs, freq-axis LSTM — proven by nn.spec.time_independent_prefix),
        so it runs ONCE on the clip-level frame grid and each window gathers
        its slice of the result. Only the biLSTM+attention suffix and the
        output heads run per window.

        clip_feat: (T_total, F, C) from audio.pipeline.clip_frame_features_device
        frame_idx: (W, frames) int32 from WindowSpec.frame_grid
        Eval-only: the per-frame prefix is window-agnostic, which would change
        BatchNorm batch statistics under training.
        """
        assert not training, "overlap fast path is inference-only"
        return self.forward_windows(self.encode_frames(clip_feat), frame_idx,
                                    speaker_id)

    def encode_frames(self, clip_feat):
        """Per-frame encoder prefix over the clip-level frame grid:
        (T_total, F, C) → (T_total, …) with time leading. Runs ONCE per
        clip; windows gather from the result (forward_windows)."""
        split, taxis = encoder_overlap_split(self.encoder_specs, self.weight_norm)
        assert split > 0, (
            "encoder has no time-independent prefix — use the per-window path"
        )
        z_frames, _ = self.audio_encoder(
            clip_feat[None], condition=None, training=False, stop=split
        )
        return jnp.moveaxis(z_frames[0], taxis - 1, 0)  # time-first

    def encode_frames_batch(self, clip_feats):
        """Batched ``encode_frames``: (B, T_total, F, C) → (B, T_total, …).

        Runs the per-frame prefix over several clips' frame grids in one
        call — the freq-LSTM scan then recurs with B·T_total rows per step
        instead of T_total, which fills the MXU at serving batch sizes.
        Identical math to encode_frames per clip (tests/test_overlap_path)."""
        split, taxis = encoder_overlap_split(self.encoder_specs, self.weight_norm)
        assert split > 0, (
            "encoder has no time-independent prefix — use the per-window path"
        )
        z_frames, _ = self.audio_encoder(
            clip_feats, condition=None, training=False, stop=split
        )
        return jnp.moveaxis(z_frames, taxis, 1)  # (B, T_total, …)

    def forward_windows(self, z_frames, frame_idx, speaker_id=None,
                        raw_pca: bool = False):
        """Temporal suffix per window: gather each window's frame slice from
        the clip-level prefix output, then biLSTM/attention + output heads.

        z_frames: (T_total, …) from encode_frames; frame_idx: (W, frames).

        raw_pca=True (using_pca models only) returns the heads' RAW PCA
        coefficients (…_pca keys, 85+180 floats/window) instead of the
        inverted 89,784-float frames — the caller decodes in bounded
        chunks via decode_to_anime (key-dispatching), keeping the peak
        decode buffer off the serving program's HBM high-water mark."""
        split, taxis = encoder_overlap_split(self.encoder_specs, self.weight_norm)
        align_dict: Dict[str, jnp.ndarray] = {}
        condition = None
        if speaker_id is not None:
            condition = self.speaker_embedding(speaker_id)

        # bf16 BEFORE the gather when the fused 1-pass biLSTM kernel will
        # consume it: the kernel's first dot rounds its activation operand
        # to bf16 regardless, so rounding at the (tiny) clip-level table
        # is value-identical and HALVES the (W, frames, 256) gather
        # write + kernel read — ~4.6 GB of pure HBM traffic at the
        # 128-clip serving batch. SDFA_BF16_GATHER=0 opts out.
        from ..nn.recurrent import _lstm_passes, _pallas_inference_eligible

        z_src = z_frames
        if (z_frames.dtype == jnp.float32 and _lstm_passes() == 1
                and os.environ.get("SDFA_BF16_GATHER", "1") == "1"
                and _pallas_inference_eligible(False, "SDFA_PALLAS_BILSTM")):
            z_src = z_frames.astype(jnp.bfloat16)
        z_windows = z_src[frame_idx]                   # (W, frames, …)
        z_windows = jnp.moveaxis(z_windows, 1, taxis)  # batch=W, time at taxis
        z_audio, aligns = self.audio_encoder(
            z_windows, condition=condition, training=False, start=split
        )
        align_dict.update(aligns)
        return self._output_heads(z_audio, condition, False, align_dict,
                                  raw_pca=raw_pca)

    def _output_heads(self, z_audio, condition, training, align_dict,
                      raw_pca: bool = False):
        x, aligns = self.output_trunk(z_audio, condition=condition, training=training)
        align_dict.update(aligns)

        emit_pca = self.return_pca or (raw_pca and self.using_pca)
        postfix = "_pca" if emit_pca else ""
        preds: Dict[str, jnp.ndarray] = {}
        if self.face_type == "dgrad_3d":
            x_scale, a1 = self.scale_head(x, condition=condition, training=training)
            x_rotat, a2 = self.rotat_head(x, condition=condition, training=training)
            align_dict.update(a1)
            align_dict.update(a2)
            if self.using_pca and not emit_pca:
                # keep outputs FLAT (N, L, tris·6 / tris·3): trailing dims of
                # 6/3 would be padded to 128 lanes on TPU (14-42× memory)
                x_scale = self.scale_pca(x_scale)
                x_rotat = self.rotat_pca(x_rotat)
            elif self.using_pca and self.is_initializing():
                # pca_* prediction types skip the inversion in forward, but
                # decode_to_anime still needs its constants — materialize
                self.scale_pca(x_scale)
                self.rotat_pca(x_rotat)
            preds[f"dgrad_3d_scale{postfix}"] = x_scale
            preds[f"dgrad_3d_rotat{postfix}"] = x_rotat
        else:
            if self.using_pca and not emit_pca:
                x = self.pca(x)
            elif self.using_pca and self.is_initializing():
                self.pca(x)
            preds[f"{self.face_type}{postfix}"] = x

        return preds, z_audio, align_dict

    # -- post-processing -------------------------------------------------
    def decode_to_anime(self, variables, preds: Dict[str, jnp.ndarray],
                        planes: bool = False) -> jnp.ndarray:
        """pred dict → flat anime feature (N, L, tris·9) or (N, L, V·3)
        (model.py:225-259 data_to_anime_feat).

        ``planes=True`` (dgrad_3d only) emits the k-major plane layout
        [k·n_tris + tri] instead of the reference's [tri·9 + k] — same
        values, permuted; feed to solve_fn(dgrad_layout="planes"). On
        TPU this turns the solver's 9 stride-9 component slices into
        free contiguous slices (the permutation rides the decode's
        existing interleave gather, costing nothing extra)."""

        def pca_apply(name, coeffs, perm=None):
            col = "params" if self.pca_trainable else "constants"
            sub = variables[col][name]
            comp_t, means = sub["compT"].T, sub["means"]
            if perm is not None:
                # permute the (small) BASIS columns, not the (huge) decoded
                # activation: the output then lands in the target layout
                # straight out of the matmul — the round-3 profile showed
                # the activation-level gather + the layout transpose XLA
                # appends to it costing ~39 ms/call at W=8832
                comp_t, means = comp_t[:, perm], means[perm]
            return jnp.matmul(coeffs, comp_t, precision=_PREC) + means

        # dispatch on the keys actually present (not self.return_pca):
        # forward_windows(raw_pca=True) hands coefficient preds to a
        # face_data-typed model for chunked decoding
        if self.face_type == "dgrad_3d":
            if "dgrad_3d_scale_pca" in preds:
                if planes:
                    # k-major straight out of the PCA matmuls: concat of
                    # the 6 scale planes and 3 rotat planes IS the planes
                    # layout — no activation gather at all
                    n_tris = variables[
                        "params" if self.pca_trainable else "constants"
                    ]["scale_pca"]["means"].shape[-1] // 6
                    scale = pca_apply("scale_pca", preds["dgrad_3d_scale_pca"],
                                      perm=_km_perm(n_tris, 6))
                    rotat = pca_apply("rotat_pca", preds["dgrad_3d_rotat_pca"],
                                      perm=_km_perm(n_tris, 3))
                    return jnp.concatenate([scale, rotat], axis=-1)
                scale = pca_apply("scale_pca", preds["dgrad_3d_scale_pca"])
                rotat = pca_apply("rotat_pca", preds["dgrad_3d_rotat_pca"])
            else:
                scale, rotat = preds["dgrad_3d_scale"], preds["dgrad_3d_rotat"]
            scale = scale.reshape(scale.shape[:2] + (-1,))
            rotat = rotat.reshape(rotat.shape[:2] + (-1,))
            # interleave [6 scale | 3 rotat] per triangle via one gather along
            # the (large) last dim — layout-safe on TPU, no (…, tris, 9) temp
            n_tris = scale.shape[-1] // 6
            perm = _planes_perm(n_tris) if planes else _interleave_perm(n_tris)
            flat = jnp.concatenate([scale, rotat], axis=-1)
            return jnp.take(flat, perm, axis=-1)
        assert not planes, "planes layout only exists for dgrad_3d"
        if f"{self.face_type}_pca" in preds:
            return pca_apply("pca", preds[f"{self.face_type}_pca"])
        return preds[self.face_type]


@functools.lru_cache(maxsize=None)
def encoder_overlap_split(encoder_specs, weight_norm: bool):
    """(prefix_len, time_axis) of the encoder's time-independent prefix —
    static per model config, cached on the frozen spec tuple."""
    from ..nn.spec import (_suffix_skips_into_prefix, _thaw_spec, parse_specs,
                           time_independent_prefix)

    raw = [list(_thaw_spec(s)) for s in encoder_specs]
    parsers = parse_specs(raw, weight_norm)
    split, taxis = time_independent_prefix(parsers)
    if _suffix_skips_into_prefix(parsers, split):
        # suffix reads prefix history: run everything per window (time
        # axis reported for the empty prefix = the input layout's, axis 1)
        return 0, 1
    return split, taxis


@functools.lru_cache(maxsize=None)
def _interleave_perm(n_tris: int):
    """perm[9j+k] = 6j+k (k<6) else 6·T + 3j + (k−6): dgrad frame layout."""
    j = np.arange(n_tris)
    perm = np.empty(n_tris * 9, np.int32)
    for k in range(6):
        perm[9 * j + k] = 6 * j + k
    for k in range(3):
        perm[9 * j + 6 + k] = 6 * n_tris + 3 * j + k
    # cache numpy, NOT jnp: under an active jit trace jnp.asarray returns a
    # tracer, and an lru_cache'd tracer leaks into the next trace
    # (UnexpectedTracerError); a numpy constant stages identically.
    return perm


@functools.lru_cache(maxsize=None)
def _km_perm(n_tris: int, per_tri: int):
    """perm[k·T+j] = per_tri·j+k — tri-major → k-major, applied to the PCA
    basis columns so the decode matmul emits planes directly."""
    j = np.arange(n_tris)
    perm = np.empty(n_tris * per_tri, np.int32)
    for k in range(per_tri):
        perm[k * n_tris + j] = per_tri * j + k
    return perm  # numpy on purpose — see _interleave_perm


@functools.lru_cache(maxsize=None)
def _planes_perm(n_tris: int):
    """perm[k·T+j] = 6j+k (k<6) else 6T+3j+(k−6): k-major plane layout —
    solve_fn(dgrad_layout="planes") slices each component contiguously."""
    j = np.arange(n_tris)
    perm = np.empty(n_tris * 9, np.int32)
    for k in range(6):
        perm[k * n_tris + j] = 6 * j + k
    for k in range(3):
        perm[(6 + k) * n_tris + j] = 6 * n_tris + 3 * j + k
    return perm  # numpy on purpose — see _interleave_perm


def _npy_loader(*paths):
    def load():
        arrays = [np.load(p).astype(np.float32) for p in paths]
        return tuple(arrays)

    return load


def build_model(hparams: ConfigDict, load_pca: bool = True) -> SpeechDrivenAnimation:
    """Construct the network from a resolved hparams tree (the shipped config
    format, config/model/dgrad.py)."""
    mp = hparams.model
    out = mp.output
    face_type = mp.face_data_type
    spk = mp.get("speaker_embedding") or {}

    def _coeffs(spec_list):
        # last fc layer's out_channels is the PCA coefficient count
        last = [s for s in spec_list if s[0] == "fc"][-1]
        return int(last[2])

    kwargs: Dict[str, Any] = dict(
        encoder_specs=freeze_specs(mp.audio_encoder.layers),
        output_specs=freeze_specs(out.layers),
        face_type=face_type,
        pred_type=mp.prediction_type,
        using_pca=bool(out.get("using_pca", False)),
        pca_trainable=bool(out.get("pca_trainable", False)),
        weight_norm=bool(mp.get("weight_norm", False)),
        num_speakers=int(spk.get("num_speakers", 0) or 0),
        speaker_onehot=bool(spk.get("using_onehot", True)),
        speaker_embedding_size=int(spk.get("embedding_size", 32) or 32),
    )
    if face_type == "dgrad_3d":
        kwargs.update(
            output_scale_specs=freeze_specs(out.layers_scale),
            output_rotat_specs=freeze_specs(out.layers_rotat),
            output_dim_scale=int(out.output_dim_scale),
            output_dim_rotat=int(out.output_dim_rotat),
            pca_coeffs_scale=_coeffs(out.layers_scale),
            pca_coeffs_rotat=_coeffs(out.layers_rotat),
        )
        if kwargs["using_pca"] and load_pca:
            kwargs["pca_scale_init"] = _npy_loader(*out.pca_scale)
            kwargs["pca_rotat_init"] = _npy_loader(*out.pca_rotat)
    else:
        kwargs.update(
            output_dim=int(out.output_dim),
            pca_coeffs=_coeffs(out.layers),
        )
        if kwargs["using_pca"] and load_pca:
            kwargs["pca_init"] = _npy_loader(*out.pca)
    return SpeechDrivenAnimation(**kwargs)
