"""Numerical parity against a torch oracle.

Builds torch modules with the REFERENCE's state-dict layout (keys like
`edge_convs.0.layer.0.weight`) from torch's public API, runs them in eval
mode, converts the weights through utils/checkpoint.py, and checks our flax
models produce the same outputs. This validates BatchNorm semantics, conv
transposes, the decomposed EdgeConv kernel, attention temperature, and the
CAPL feature/classifier math end-to-end.
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn
import torch.nn.functional as tF

import jax
import jax.numpy as jnp

from gfs3dseg_gws_tpu.models import DGCNN, GWCAPL
from gfs3dseg_gws_tpu.utils.checkpoint import (
    convert_torch_attention,
    convert_torch_base_learner,
    convert_torch_dgcnn_encoder,
    _bn,
    _conv_kernel,
)

B, N, CIN, K = 2, 64, 9, 5
W = 8  # edgeconv width


def torch_conv_block(in_feat, dims, conv1d=False, bias=False):
    Conv = tnn.Conv1d if conv1d else tnn.Conv2d
    BN = tnn.BatchNorm1d if conv1d else tnn.BatchNorm2d
    layers = []
    for i, d in enumerate(dims):
        layers += [Conv(in_feat if i == 0 else dims[i - 1], d, 1, bias=bias),
                   BN(d), tnn.LeakyReLU(0.2)]
    return tnn.Sequential(*layers)


class TorchDGCNN(tnn.Module):
    """Oracle DGCNN with the reference's parameter layout."""

    def __init__(self, widths=((W, W), (W, W), (W, W)), mlp=(16, 16),
                 nfeat=CIN, k=K):
        super().__init__()
        self.k = k
        self.edge_convs = tnn.ModuleList()
        for i, ws in enumerate(widths):
            in_feat = nfeat * 2 if i == 0 else widths[i - 1][-1] * 2
            blk = tnn.Module()
            blk.layer = torch_conv_block(in_feat, ws)
            self.edge_convs.append(blk)
        blk = tnn.Module()
        blk.layer = torch_conv_block(sum(w[-1] for w in widths), mlp,
                                     conv1d=True)
        self.conv = blk

    @staticmethod
    def knn_idx(x, k):
        inner = -2 * torch.matmul(x.transpose(2, 1), x)
        xx = torch.sum(x ** 2, dim=1, keepdim=True)
        pd = -xx - inner - xx.transpose(2, 1)
        return pd.topk(k=k, dim=-1)[1]

    def edge_feature(self, x):
        b, c, n = x.shape
        idx = self.knn_idx(x, self.k)
        central = x.unsqueeze(-1).expand(-1, -1, -1, self.k)
        idx_e = idx.unsqueeze(1).expand(-1, c, -1, -1).reshape(b, c,
                                                               n * self.k)
        nbr = torch.gather(x, 2, idx_e).reshape(b, c, n, self.k)
        return torch.cat((nbr - central, central), dim=1)

    def forward(self, x):
        outs = []
        for blk in self.edge_convs:
            e = self.edge_feature(x)
            e = blk.layer(e)
            x = e.max(dim=-1)[0]
            outs.append(x)
        cat = torch.cat(outs, dim=1)
        return outs, self.conv.layer(cat)


def _np(x):
    return x.detach().cpu().numpy()


@pytest.fixture(scope="module")
def torch_encoder():
    torch.manual_seed(0)
    enc = TorchDGCNN()
    enc.eval()
    # randomise BN stats so conversion is actually exercised
    for m in enc.modules():
        if isinstance(m, (tnn.BatchNorm1d, tnn.BatchNorm2d)):
            with torch.no_grad():
                m.running_mean.uniform_(-0.2, 0.2)
                m.running_var.uniform_(0.5, 1.5)
                m.weight.uniform_(0.8, 1.2)
                m.bias.uniform_(-0.1, 0.1)
    return enc


class TestEncoderParity:
    def test_dgcnn_forward_matches(self, torch_encoder):
        x = np.random.default_rng(0).standard_normal(
            (B, CIN, N)).astype(np.float32)
        with torch.no_grad():
            t_outs, t_final = torch_encoder(torch.from_numpy(x))

        params, stats = convert_torch_dgcnn_encoder(
            torch_encoder.state_dict())
        model = DGCNN(edgeconv_widths=((W, W), (W, W), (W, W)),
                      mlp_widths=(16, 16), k=K, use_pallas=False)
        variables = {"params": params, "batch_stats": stats}
        j_outs, j_final = model.apply(
            variables, jnp.asarray(x.transpose(0, 2, 1)), False)

        for t, j in zip(t_outs, j_outs):
            np.testing.assert_allclose(
                _np(t).transpose(0, 2, 1), np.asarray(j), rtol=2e-4,
                atol=2e-4)
        np.testing.assert_allclose(
            _np(t_final).transpose(0, 2, 1), np.asarray(j_final), rtol=2e-4,
            atol=2e-4)


class TorchCAPL(tnn.Module):
    """Oracle of the CAPL feature/classifier path (eval mode)."""

    def __init__(self, classes=13, num_gw=10, feat_dim=3 * W, main_dim=16):
        super().__init__()
        self.encoder = TorchDGCNN()
        self.base_learner = tnn.ModuleList()  # placeholder; built below
        convs = []
        for i, w in enumerate((W, W)):
            convs.append(tnn.Sequential(
                tnn.Conv1d(16 if i == 0 else W, w, 1), tnn.BatchNorm1d(w)))
        self.base_learner = tnn.Module()
        self.base_learner.convs = tnn.ModuleList(convs)
        self.att_learner = tnn.Module()
        for name in ("q_map", "k_map", "v_map"):
            setattr(self.att_learner, name, tnn.Conv1d(16, W, 1, bias=False))
        self.fusion = tnn.Sequential(
            tnn.Conv1d(3 * W + num_gw, main_dim, 1), tnn.BatchNorm1d(main_dim),
            tnn.LeakyReLU(0.2))
        self.main_proto = tnn.Parameter(torch.randn(classes, main_dim))
        self.bg_proto = tnn.Parameter(torch.randn(1, main_dim))
        self.num_gw = num_gw

    def base_forward(self, x):
        for i, conv in enumerate(self.base_learner.convs):
            x = conv(x)
            if i != len(self.base_learner.convs) - 1:
                x = tF.relu(x)
        return x

    def att_forward(self, x):
        q = self.att_learner.q_map(x)
        k = self.att_learner.k_map(x)
        v = self.att_learner.v_map(x)
        attn = torch.matmul(q.transpose(1, 2) / (W ** 0.5), k)
        attn = tF.softmax(attn, dim=-1)
        return torch.matmul(attn, v.transpose(1, 2)).transpose(1, 2)

    def get_features(self, x, gp):
        edge_outs, feat2 = self.encoder(x)
        feat3 = self.base_forward(feat2)
        att = self.att_forward(feat2)
        semantic = torch.cat((edge_outs[0], att, feat3), dim=1)
        ec = torch.cat(edge_outs, dim=1)
        ec = tF.normalize(ec, p=2, dim=1)
        gp_l2 = tF.normalize(gp, dim=1, p=2).unsqueeze(0)
        cos = torch.matmul(gp_l2, ec)
        cos = torch.softmax(10 * cos, dim=1)
        assign = torch.argmax(cos, dim=1)
        onehot = tF.one_hot(assign, self.num_gw).transpose(2, 1).float()
        pf = torch.cat([cos, semantic], dim=1)
        return self.fusion(pf), semantic, onehot

    def get_pred(self, x, proto):
        xn = tF.normalize(x, p=2, dim=1)
        pn = tF.normalize(proto, p=2, dim=1).unsqueeze(0)
        return (pn @ xn) * 10


class TestCaplParity:
    def test_features_and_pred_match(self):
        torch.manual_seed(1)
        oracle = TorchCAPL()
        oracle.eval()
        for m in oracle.modules():
            if isinstance(m, (tnn.BatchNorm1d, tnn.BatchNorm2d)):
                with torch.no_grad():
                    m.running_mean.uniform_(-0.2, 0.2)
                    m.running_var.uniform_(0.5, 1.5)

        x = np.random.default_rng(3).standard_normal(
            (B, CIN, N)).astype(np.float32)
        gp = np.random.default_rng(4).standard_normal(
            (10, 3 * W)).astype(np.float32)
        with torch.no_grad():
            t_pf, t_sem, t_onehot = oracle.get_features(
                torch.from_numpy(x), torch.from_numpy(gp))
            t_pred = oracle.get_pred(t_pf, oracle.main_proto)

        sd = oracle.state_dict()
        enc_sd = {k[len("encoder."):]: v for k, v in sd.items()
                  if k.startswith("encoder.")}
        enc_p, enc_s = convert_torch_dgcnn_encoder(enc_sd)
        bl_p, bl_s = convert_torch_base_learner(sd)
        fus_bn_p, fus_bn_s = _bn(sd, "fusion.1")
        params = {
            "encoder": enc_p, "base_learner": bl_p,
            "att_learner": convert_torch_attention(sd),
            "fusion": {"kernel": _conv_kernel(sd["fusion.0.weight"]),
                       "bias": _np(sd["fusion.0.bias"])},
            "fusion_bn": fus_bn_p,
            "main_proto": _np(sd["main_proto"]),
            "bg_proto": _np(sd["bg_proto"]),
        }
        stats = {"encoder": enc_s, "base_learner": bl_s,
                 "fusion_bn": fus_bn_s}

        model = GWCAPL(classes=13, base_num=7, num_gw=10, main_dim=16,
                       edgeconv_widths=((W, W), (W, W), (W, W)),
                       mlp_widths=(16, 16), base_widths=(W, W), output_dim=W,
                       k=K, use_pallas=False)
        variables = {"params": params, "batch_stats": stats}
        j_pf, j_sem, j_onehot = model.apply(
            variables, jnp.asarray(x.transpose(0, 2, 1)), jnp.asarray(gp),
            False, method="get_features")

        np.testing.assert_allclose(_np(t_sem).transpose(0, 2, 1),
                                   np.asarray(j_sem), rtol=2e-4, atol=2e-4)
        np.testing.assert_allclose(_np(t_onehot).transpose(0, 2, 1),
                                   np.asarray(j_onehot), atol=1e-6)
        np.testing.assert_allclose(_np(t_pf).transpose(0, 2, 1),
                                   np.asarray(j_pf), rtol=2e-4, atol=2e-4)

        j_pred = model.apply(variables, j_pf,
                             jnp.asarray(_np(oracle.main_proto)),
                             method="get_pred")
        np.testing.assert_allclose(_np(t_pred).transpose(0, 2, 1),
                                   np.asarray(j_pred), rtol=2e-4, atol=2e-4)
