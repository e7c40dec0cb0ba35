"""Numeric SuperGlue parity: Flax port + converter vs a torch twin built
from the MagicLeap architecture definition (Conv1d MLPs, packed-per-head
attention, log-domain Sinkhorn with dustbin)."""

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")

# full-scale twins: minutes of wall-clock; excluded from the default
# run by pytest.ini addopts, executed via `pytest -m nightly`
pytestmark = pytest.mark.nightly
import torch.nn as tnn

from posediffusion_tpu.matching import convert_superglue
from posediffusion_tpu.matching.superglue import SuperGlueNet, log_sinkhorn, match_pair


def torch_mlp(channels, do_bn=True):
    layers = []
    for i in range(1, len(channels)):
        layers.append(tnn.Conv1d(channels[i - 1], channels[i], 1, bias=True))
        if i < len(channels) - 1:
            if do_bn:
                layers.append(tnn.BatchNorm1d(channels[i]))
            layers.append(tnn.ReLU())
    return tnn.Sequential(*layers)


class TorchAttention(tnn.Module):
    def __init__(self, num_heads, d_model):
        super().__init__()
        self.dim = d_model // num_heads
        self.num_heads = num_heads
        self.merge = tnn.Conv1d(d_model, d_model, 1)
        self.proj = tnn.ModuleList(
            [tnn.Conv1d(d_model, d_model, 1) for _ in range(3)]
        )

    def forward(self, query, key, value):
        b = query.size(0)
        q, k, v = [
            l(x).view(b, self.dim, self.num_heads, -1)
            for l, x in zip(self.proj, (query, key, value))
        ]
        scores = torch.einsum("bdhn,bdhm->bhnm", q, k) / self.dim**0.5
        probs = torch.softmax(scores, dim=-1)
        x = torch.einsum("bhnm,bdhm->bdhn", probs, v)
        return self.merge(x.contiguous().view(b, self.dim * self.num_heads, -1))


class TorchPropagation(tnn.Module):
    def __init__(self, d_model, num_heads):
        super().__init__()
        self.attn = TorchAttention(num_heads, d_model)
        self.mlp = torch_mlp([d_model * 2, d_model * 2, d_model])
        tnn.init.constant_(self.mlp[-1].bias, 0.0)

    def forward(self, x, source):
        message = self.attn(x, source, source)
        return self.mlp(torch.cat([x, message], dim=1))


class TorchSuperGlueTwin(tnn.Module):
    """MagicLeap-architecture twin emitting the released key layout."""

    def __init__(self, gnn_layers=3, d_model=256):
        super().__init__()
        self.kenc_encoder = torch_mlp([3, 32, 64, 128, 256, d_model])
        self.layers = tnn.ModuleList(
            [TorchPropagation(d_model, 4) for _ in range(2 * gnn_layers)]
        )
        self.names = ["self", "cross"] * gnn_layers
        self.final_proj = tnn.Conv1d(d_model, d_model, 1, bias=True)
        self.bin_score = tnn.Parameter(torch.tensor(1.0))

    def state_dict_magicleap(self):
        sd = {}
        for k, v in self.kenc_encoder.state_dict().items():
            sd[f"kenc.encoder.{k}"] = v.detach().numpy()
        for i, layer in enumerate(self.layers):
            for p in range(3):
                for k, v in layer.attn.proj[p].state_dict().items():
                    sd[f"gnn.layers.{i}.attn.proj.{p}.{k}"] = v.detach().numpy()
            for k, v in layer.attn.merge.state_dict().items():
                sd[f"gnn.layers.{i}.attn.merge.{k}"] = v.detach().numpy()
            for k, v in layer.mlp.state_dict().items():
                sd[f"gnn.layers.{i}.mlp.{k}"] = v.detach().numpy()
        for k, v in self.final_proj.state_dict().items():
            sd[f"final_proj.{k}"] = v.detach().numpy()
        sd["bin_score"] = self.bin_score.detach().numpy()
        return sd

    def normalize(self, kpts, hw):
        h, w = hw
        center = torch.tensor([w / 2.0, h / 2.0])
        return (kpts - center) / (0.7 * max(w, h))

    def forward(self, desc0, desc1, kpts0, kpts1, scores0, scores1, hw):
        # channel-first layout like MagicLeap: (B, C, N)
        d0 = desc0.transpose(1, 2)
        d1 = desc1.transpose(1, 2)
        n0 = self.normalize(kpts0, hw)
        n1 = self.normalize(kpts1, hw)
        in0 = torch.cat([n0, scores0[..., None]], -1).transpose(1, 2)
        in1 = torch.cat([n1, scores1[..., None]], -1).transpose(1, 2)
        x0 = d0 + self.kenc_encoder(in0)
        x1 = d1 + self.kenc_encoder(in1)
        for layer, name in zip(self.layers, self.names):
            src0, src1 = (x1, x0) if name == "cross" else (x0, x1)
            x0 = x0 + layer(x0, src0)
            x1 = x1 + layer(x1, src1)
        m0, m1 = self.final_proj(x0), self.final_proj(x1)
        scores = torch.einsum("bdn,bdm->bnm", m0, m1) / 256**0.5
        return scores


class TestSuperGlueNumericTwin:
    def test_scores_match_torch(self, rng):
        torch.manual_seed(0)
        twin = TorchSuperGlueTwin(gnn_layers=3).eval()
        # Moderate scaling: keeps 6 residual layers numerically tame while
        # attention stays NON-uniform — a uniform softmax would mask
        # head-partition mismatches (MagicLeap's heads are channel-
        # interleaved, not contiguous).
        with torch.no_grad():
            for p in twin.parameters():
                if p.dim() > 1:
                    p.mul_(0.45)
        params = convert_superglue(twin.state_dict_magicleap(), gnn_layers=3)

        K = 24
        desc0 = rng.normal(size=(1, K, 256)).astype(np.float32) * 0.2
        desc1 = rng.normal(size=(1, K, 256)).astype(np.float32) * 0.2
        kpts0 = rng.uniform(5, 115, size=(1, K, 2)).astype(np.float32)
        kpts1 = rng.uniform(5, 115, size=(1, K, 2)).astype(np.float32)
        s0 = rng.uniform(size=(1, K)).astype(np.float32)
        s1 = rng.uniform(size=(1, K)).astype(np.float32)
        hw = (120, 160)

        with torch.no_grad():
            ref = twin(
                torch.tensor(desc0), torch.tensor(desc1),
                torch.tensor(kpts0), torch.tensor(kpts1),
                torch.tensor(s0), torch.tensor(s1), hw,
            ).numpy()

        net = SuperGlueNet(gnn_layers=3)
        mask = jnp.ones((1, K), bool)
        scores = net.apply(
            params["net"], jnp.asarray(desc0), jnp.asarray(desc1),
            jnp.asarray(kpts0), jnp.asarray(kpts1),
            jnp.asarray(s0), jnp.asarray(s1), mask, mask, hw,
        )
        np.testing.assert_allclose(np.asarray(scores)[0], ref[0], atol=5e-3, rtol=1e-3)

    def test_sinkhorn_matches_magicleap_formulation(self, rng):
        """log_sinkhorn with full masks reproduces the MagicLeap
        log_optimal_transport recursion (torch transcription)."""
        m, n, iters = 9, 12, 30
        scores = rng.normal(size=(1, m, n)).astype(np.float32)
        alpha = 0.7

        ts = torch.tensor(scores)
        one = ts.new_tensor(1)
        ms, ns = (m * one), (n * one)
        bins0 = ts.new_full((1, m, 1), alpha)
        bins1 = ts.new_full((1, 1, n), alpha)
        alpha_t = ts.new_full((1, 1, 1), alpha)
        couplings = torch.cat(
            [torch.cat([ts, bins0], -1), torch.cat([bins1, alpha_t], -1)], 1
        )
        norm = -(ms + ns).log()
        log_mu = torch.cat([norm.expand(m), ns.log()[None] + norm])[None]
        log_nu = torch.cat([norm.expand(n), ms.log()[None] + norm])[None]
        u, v = torch.zeros_like(log_mu), torch.zeros_like(log_nu)
        for _ in range(iters):
            u = log_mu - torch.logsumexp(couplings + v.unsqueeze(1), dim=2)
            v = log_nu - torch.logsumexp(couplings + u.unsqueeze(2), dim=1)
        Z_ref = (couplings + u.unsqueeze(2) + v.unsqueeze(1)) - norm

        Z = log_sinkhorn(
            jnp.asarray(scores), jnp.asarray(alpha),
            jnp.ones((1, m), bool), jnp.ones((1, n), bool), iterations=iters,
        )
        np.testing.assert_allclose(np.asarray(Z), Z_ref.numpy(), atol=1e-4)
