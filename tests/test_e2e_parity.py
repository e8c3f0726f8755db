"""END-TO-END parity: full dgrad model vs a faithful torch twin + f64 solve.

This is the BASELINE.md metric in test form: audio features → full shipped
architecture → dgrad frame → vertices, our JAX stack vs the reference
semantics reproduced with torch ops (the reference's backend) and the
float64 SuperLU solve. Budget: max per-vertex error < 1e-4.
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from sdfa_tpu import mesh
from sdfa_tpu.models import build_model
from sdfa_tpu.nn.functions import get_pad_tuple
from sdfa_tpu.ops import DeformationSolver
from sdfa_tpu.tools import configure

FLAME_PLY = "/root/reference/speech_anime/datasets/vocaset/template/FLAME_sample.ply"


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("assets"))
    import os

    os.makedirs(root + "/pca", exist_ok=True)
    rng = np.random.default_rng(0)
    np.save(root + "/pca/scale_compT.npy", rng.normal(0, 0.01, (59856, 85)).astype(np.float32))
    np.save(root + "/pca/scale_means.npy", rng.normal(0, 0.001, (59856,)).astype(np.float32))
    np.save(root + "/pca/rotat_compT.npy", rng.normal(0, 0.01, (29928, 180)).astype(np.float32))
    np.save(root + "/pca/rotat_means.npy", rng.normal(0, 0.001, (29928,)).astype(np.float32))
    hp = configure("dgrad", dataset_root=root)
    model = build_model(hp, load_pca=True)
    k = jax.random.PRNGKey(42)
    feats = jnp.asarray(rng.normal(0.4, 0.2, (2, 64, 128, 3)), jnp.float32)
    spk = jnp.asarray([1, 3], jnp.int32)
    variables = model.init({"params": k, "dropout": k}, feats, spk, False)
    return hp, model, variables, np.asarray(feats), np.asarray(spk)


def _wn_weight(leaf, torch_shape_hint=None):
    """Effective kernel from our (kernel_v, kernel_g) pair or plain kernel."""
    if "kernel" in leaf:
        return np.asarray(leaf["kernel"])
    v = np.asarray(leaf["kernel_v"])
    g = np.asarray(leaf["kernel_g"])
    if v.ndim == 2:  # ours (in, out), norm over axis 0
        norm = np.linalg.norm(v, axis=0, keepdims=True)
        return v / np.maximum(norm, 1e-12) * g[None, :]
    # conv (O, I, ...) norm over all but axis 0
    axes = tuple(range(1, v.ndim))
    norm = np.sqrt((v**2).sum(axis=axes, keepdims=True))
    return v / np.maximum(norm, 1e-12) * g.reshape((-1,) + (1,) * (v.ndim - 1))


class TorchTwin(torch.nn.Module):
    """Reference-faithful torch forward using OUR converted parameters."""

    def __init__(self, variables):
        super().__init__()
        p = variables["params"]
        s = variables["batch_stats"]
        c = variables["constants"]
        enc = p["audio_encoder"]
        self.p, self.s, self.c = p, s, c

        def t(x):
            return torch.from_numpy(np.ascontiguousarray(np.asarray(x)))

        self.t = t
        self.enc = enc

    def _conv_bn(self, x, leaf, stats, ksz, stride):
        w = self.t(_wn_weight(leaf))
        b = self.t(leaf["bias"])
        lo_w, hi_w = get_pad_tuple(x.shape[-1], ksz[1], stride[1], 1, "same")
        lo_h, hi_h = get_pad_tuple(x.shape[-2], ksz[0], stride[0], 1, "same")
        x = torch.nn.functional.pad(x, (lo_w, hi_w, lo_h, hi_h))
        x = torch.nn.functional.conv2d(x, w, b, stride=stride)
        x = torch.nn.functional.leaky_relu(x, 0.2)
        x = torch.nn.functional.batch_norm(
            x, self.t(stats["post_bn"]["mean"]), self.t(stats["post_bn"]["var"]),
            self.t(leaf["post_bn"]["scale"]), self.t(leaf["post_bn"]["bias"]),
            training=False, eps=1e-3,
        )
        return x

    def _lstm(self, x, leaf, input_size, hidden, layers, bidir, prefix=""):
        mod = torch.nn.LSTM(input_size, hidden, num_layers=layers, bias=("b_ih_l0" in leaf),
                            batch_first=True, bidirectional=bidir)
        with torch.no_grad():
            for li in range(layers):
                for d in range(2 if bidir else 1):
                    sfx = f"_l{li}" + ("_reverse" if d else "")
                    getattr(mod, f"weight_ih{sfx}").copy_(self.t(np.asarray(leaf[f"w_ih{sfx}"]).T))
                    getattr(mod, f"weight_hh{sfx}").copy_(self.t(np.asarray(leaf[f"w_hh{sfx}"]).T))
                    if f"b_ih{sfx}" in leaf:
                        getattr(mod, f"bias_ih{sfx}").copy_(self.t(leaf[f"b_ih{sfx}"]))
                        getattr(mod, f"bias_hh{sfx}").copy_(self.t(leaf[f"b_hh{sfx}"]))
        mod.eval()
        out, _ = mod(x)
        return out

    def _fc(self, x, leaf, act=None):
        w = self.t(_wn_weight(leaf))  # ours (in, out)
        out = x @ w
        if "bias" in leaf:
            out = out + self.t(leaf["bias"])
        if act == "lrelu":
            out = torch.nn.functional.leaky_relu(out, 0.2)
        elif act == "tanh":
            out = torch.tanh(out)
        return out

    def forward(self, feats, spk):
        p, s = self.p, self.s
        enc_p, enc_s = p["audio_encoder"], s["audio_encoder"]
        cond = torch.nn.functional.one_hot(spk.long(), 8).float()

        x = feats.permute(0, 3, 2, 1)  # N,T,F,C → N,C,F,T
        x = self._conv_bn(x, enc_p["built_layers_1"], enc_s["built_layers_1"], (3, 1), (1, 1))
        x = torch.nn.functional.max_pool2d(x, (2, 1))
        x = self._conv_bn(x, enc_p["built_layers_3"], enc_s["built_layers_3"], (3, 1), (1, 1))
        x = torch.nn.functional.max_pool2d(x, (2, 1))
        x = self._conv_bn(x, enc_p["built_layers_5"], enc_s["built_layers_5"], (1, 1), (1, 1))

        # freq-lstm: (B,C,F,T) → per-timestep biLSTM over F, full-concat, proj
        fl = enc_p["built_layers_6"]
        bsz, ch, fq, tt = x.shape
        seq = x.permute(0, 3, 2, 1).reshape(bsz * tt, fq, ch)
        h = self._lstm(seq, fl["lstm"], ch, 128, 1, True)
        h = h.reshape(bsz * tt, fq * 256)
        h = self._fc(h, fl["proj"]).reshape(bsz, tt, 256)

        # biLSTM over time
        h = self._lstm(h, enc_p["built_layers_9"], 256, 256, 2, True)

        # bahdanau attention, query = center window radius 2
        at = enc_p["built_layers_10"]
        mid = h.shape[1] // 2
        query = h[:, mid - 1 : mid + 2, :]  # (N, 3, 512)
        wq = self.t(_wn_weight(at["conv_query"]))  # (O, I, k)
        q = torch.nn.functional.conv1d(query.permute(0, 2, 1), wq, stride=3)
        q = q.permute(0, 2, 1)  # (N, 1, 512)
        qp = q @ self.t(np.asarray(at["proj_qry"]["kernel"]))
        kp = h @ self.t(np.asarray(at["proj_key"]["kernel"]))
        score = torch.tanh(qp + kp + self.t(at["b"])) @ self.t(np.asarray(at["v"]["kernel"]))
        score = score.permute(0, 2, 1) * 1.0  # eval scale 1.0
        align = torch.softmax(score, dim=-1)
        z = align @ h  # (N, 1, 512)

        # output trunk + heads with cat_condition
        def cat(x):
            return torch.cat([x, cond[:, None, :].expand(-1, x.shape[1], -1)], dim=2)

        trunk = self._fc(cat(z), p["output_trunk"]["built_layers_0"], act="lrelu")
        hs = p["scale_head"]
        xs = self._fc(cat(trunk), hs["built_layers_0"], act="lrelu")
        xs = self._fc(xs, hs["built_layers_1"], act="tanh")
        xs = self._fc(xs, hs["built_layers_2"])
        hr = p["rotat_head"]
        xr = self._fc(cat(trunk), hr["built_layers_0"], act="lrelu")
        xr = self._fc(xr, hr["built_layers_1"], act="tanh")
        xr = self._fc(xr, hr["built_layers_2"])

        # PCA inversion
        cs = self.c["scale_pca"]
        cr = self.c["rotat_pca"]
        scale = xs @ self.t(np.asarray(cs["compT"])).T + self.t(cs["means"])
        rotat = xr @ self.t(np.asarray(cr["compT"])).T + self.t(cr["means"])
        return scale, rotat


class TestEndToEndParity:
    def test_model_forward_matches_torch_twin(self, setup):
        hp, model, variables, feats, spk = setup
        preds, _, _ = model.apply(variables, jnp.asarray(feats), jnp.asarray(spk), False)
        ours_s = np.asarray(preds["dgrad_3d_scale"])[:, 0]
        ours_r = np.asarray(preds["dgrad_3d_rotat"])[:, 0]

        twin = TorchTwin(jax.device_get(variables))
        with torch.no_grad():
            ref_s, ref_r = twin(torch.from_numpy(feats), torch.from_numpy(spk))
        ref_s = ref_s[:, 0].numpy()
        ref_r = ref_r[:, 0].numpy()
        err_s = np.abs(ours_s - ref_s).max()
        err_r = np.abs(ours_r - ref_r).max()
        assert err_s < 5e-5, f"scale branch err {err_s}"
        assert err_r < 5e-5, f"rotat branch err {err_r}"

    def test_full_wav_to_vertices_budget(self, setup):
        """model output → dgrad frame → vertices, jax f32 vs f64 oracle."""
        hp, model, variables, feats, spk = setup
        preds, _, _ = model.apply(variables, jnp.asarray(feats), jnp.asarray(spk), False)
        anime = np.asarray(model.decode_to_anime(variables, preds))[:, 0]  # (2, 89784)

        import sys

        sys.path.insert(0, "/root/reference/speech_anime/datasets/vocaset/mask")
        import non_face

        verts, faces = mesh.read_ply(FLAME_PLY, dtype=np.float64)
        solver = DeformationSolver(verts, faces, cnst_indices=non_face.non_face_verts)
        ours = np.asarray(solver.solve(anime.reshape(2, -1, 9)))
        oracle = np.stack([solver.solve_host(a.astype(np.float64)) for a in anime])
        err = np.abs(ours - oracle).max()
        assert err < 1e-4, f"wav→vertices parity err {err} (budget 1e-4)"
