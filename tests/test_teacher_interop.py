"""Teacher weight interop: torch-reference state_dict -> stacked JAX pytree
(utils.torch_compat.teacher_params_from_torch), forward parity vs an
independently-written torch mirror of the reference LunarMoETeacher
(lunar_evaluator.py:278-462, with this repo's two documented defect fixes:
correct blockwise attention with per-key rel-pos, real semantic
conditioning), and byte-exact state_dict round trips for both models."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as tF

from lunaris_orion_tpu.config import TeacherConfig, VAEConfig
from lunaris_orion_tpu.models import teacher as jteacher
from lunaris_orion_tpu.utils import torch_compat as tc

CFG = TeacherConfig(
    num_experts=2, feature_dim=24, extractor_dim=16, extractor_stem=8,
    branch_dim=8, expert_layers=2, intermediate_dim=16, embedding_dim=8,
    num_heads=4, rel_pos_size=4, image_size=16, dropout_rate=0.1)


# --- compact torch mirror (reference module names; corrected attention) ----

def _cbn(cin, cout, k, groups=1):
    return nn.Sequential(nn.Conv2d(cin, cout, k, padding=k // 2, groups=groups),
                         nn.LeakyReLU(0.2), nn.BatchNorm2d(cout))


class MirrorExtractor(nn.Module):
    def __init__(self, cfg):
        super().__init__()
        st, br = cfg.extractor_stem, cfg.branch_dim
        self.conv1 = _cbn(3, st, 3)
        for name in ("edge", "color", "detail"):
            k = 5 if name == "color" else 3
            setattr(self, f"{name}_branch", nn.Sequential(
                nn.Conv2d(st, st, k, padding=k // 2, groups=st),
                nn.Conv2d(st, br, 1), nn.LeakyReLU(0.2), nn.BatchNorm2d(br)))
        self.fusion = _cbn(br * 3, cfg.extractor_dim, 1)

    def forward(self, x):
        x = self.conv1(x)
        feats = [self.edge_branch(x), self.color_branch(x),
                 self.detail_branch(x)]
        return self.fusion(torch.cat(feats, dim=1))


class MirrorAttention(nn.Module):
    """Corrected math (per-key rel-pos, full softmax) with the reference's
    parameter names/shapes (lunar_evaluator.py:126-137)."""

    def __init__(self, c, heads, rel_pos_size):
        super().__init__()
        self.heads, self.d = heads, c // heads
        self.qkv = nn.Conv2d(c, c * 3, 1)
        self.proj = nn.Conv2d(c, c, 1)
        self.rel_pos_h = nn.Parameter(torch.randn(1, heads, rel_pos_size, 1) * 0.02)
        self.rel_pos_w = nn.Parameter(torch.randn(1, heads, 1, rel_pos_size) * 0.02)

    def forward(self, x):
        b, c, h, w = x.shape
        n = h * w
        qkv = self.qkv(x).reshape(b, 3, self.heads, self.d, h, w)
        qkv = qkv.permute(0, 1, 2, 4, 5, 3).reshape(b, 3, self.heads, n, self.d)
        q, k, v = qkv[:, 0], qkv[:, 1], qkv[:, 2]
        rh = tF.interpolate(self.rel_pos_h, size=(h, 1), mode="bilinear",
                            align_corners=True).expand(-1, -1, -1, w)
        rw = tF.interpolate(self.rel_pos_w, size=(1, w), mode="bilinear",
                            align_corners=True).expand(-1, -1, h, -1)
        bias = (rh + rw).reshape(1, self.heads, 1, n)       # per-KEY bias
        attn = torch.softmax(q @ k.transpose(-2, -1) * self.d ** -0.5 + bias,
                             dim=-1)
        out = (attn @ v).permute(0, 1, 3, 2).reshape(b, c, h, w)
        return self.proj(out)


class MirrorExpertBlock(nn.Module):
    def __init__(self, cin, cout, cfg):
        super().__init__()
        self.conv1 = nn.Sequential(nn.Conv2d(cin, cout, 3, padding=1),
                                   nn.LeakyReLU(0.2), nn.BatchNorm2d(cout),
                                   nn.Dropout2d(cfg.dropout_rate))
        self.attention = MirrorAttention(cout, cfg.num_heads, cfg.rel_pos_size)
        self.conv2 = nn.Sequential(nn.Conv2d(cout, cout, 3, padding=1),
                                   nn.LeakyReLU(0.2), nn.BatchNorm2d(cout),
                                   nn.Dropout2d(cfg.dropout_rate))
        self.shortcut = (nn.Sequential(nn.Conv2d(cin, cout, 1),
                                       nn.BatchNorm2d(cout))
                         if cin != cout else nn.Identity())
        self.layer_scale = nn.Parameter(torch.ones(1, cout, 1, 1) * 0.1)

    def forward(self, x):
        out = self.conv2(self.attention(self.conv1(x))) * self.layer_scale
        return tF.leaky_relu(out + self.shortcut(x), 0.2)


def _head(cin, hidden, cout, ln=True):
    mods = [nn.AdaptiveAvgPool2d(1), nn.Flatten()]
    if ln:
        mods.append(nn.LayerNorm(cin))
    mods += [nn.Linear(cin, hidden), nn.LeakyReLU(0.2), nn.Dropout(0.1),
             nn.Linear(hidden, cout)]
    return nn.Sequential(*mods)


class MirrorTeacher(nn.Module):
    def __init__(self, cfg: TeacherConfig):
        super().__init__()
        self.cfg = cfg
        self.feature_extractor = MirrorExtractor(cfg)
        self.experts = nn.ModuleList([
            nn.Sequential(*[MirrorExpertBlock(
                cfg.extractor_dim if li == 0 else cfg.feature_dim,
                cfg.feature_dim, cfg) for li in range(cfg.expert_layers)])
            for _ in range(cfg.num_experts)])
        self.gate = _head(cfg.extractor_dim, cfg.intermediate_dim,
                          cfg.num_experts, ln=False)
        self.quality_heads = nn.ModuleList([
            _head(cfg.feature_dim, cfg.intermediate_dim // 4, 4)
            for _ in range(cfg.num_experts)])
        self.semantic_head = _head(cfg.feature_dim,
                                   cfg.intermediate_dim // 2, 1)
        self.style_net = _head(cfg.feature_dim, cfg.intermediate_dim // 2,
                               cfg.embedding_dim)
        self.prompt_net = _head(cfg.feature_dim, cfg.intermediate_dim // 2,
                                cfg.embedding_dim)

    def forward(self, x):
        feats = self.feature_extractor(x)
        weights = torch.softmax(self.gate(feats), dim=1)
        expert_feats = [e(feats) for e in self.experts]
        quality = torch.stack([h(f) for h, f in
                               zip(self.quality_heads, expert_feats)], dim=1)
        weighted = torch.sum(quality * weights.unsqueeze(-1), dim=1)
        pooled = torch.stack([f.mean(dim=[2, 3]) for f in expert_feats], dim=1)
        combined = torch.sum(pooled * weights.unsqueeze(-1), dim=1)
        c4 = combined.unsqueeze(-1).unsqueeze(-1)
        return {
            "quality_scores": torch.sigmoid(weighted),
            "expert_weights": weights,
            "style_embedding": self.style_net(c4),
            "prompt_embedding": self.prompt_net(c4),
            "semantic_score": torch.sigmoid(
                self.semantic_head(expert_feats[0])),
        }


@pytest.fixture(scope="module")
def pair():
    torch.manual_seed(0)
    mirror = MirrorTeacher(CFG).eval()
    # Randomize BN running stats so the conversion of mean/var is exercised
    # (fresh stats are 0/1, which an identity mapping would also pass).
    g = torch.Generator().manual_seed(1)
    for m in mirror.modules():
        if isinstance(m, nn.BatchNorm2d):
            m.running_mean = torch.randn(m.num_features, generator=g) * 0.2
            m.running_var = torch.rand(m.num_features, generator=g) + 0.5
    sd = {k: v.detach().numpy() for k, v in mirror.state_dict().items()}
    jp, js = tc.teacher_params_from_torch(sd, CFG)
    return mirror, sd, jp, js


class TestTeacherForwardParity:
    @pytest.mark.slow
    def test_eval_forward_matches(self, pair):
        mirror, _, jp, js = pair
        x = np.random.default_rng(0).uniform(
            -1, 1, (2, 16, 16, 3)).astype(np.float32)
        with torch.no_grad():
            t = mirror(torch.tensor(x.transpose(0, 3, 1, 2)))
        j, _ = jteacher.apply(jp, js, jnp.asarray(x), cfg=CFG, train=False,
                              attn_impl="full")
        for key, tol in (("expert_weights", 1e-4), ("quality_scores", 1e-4),
                         ("style_embedding", 1e-3), ("prompt_embedding", 1e-3),
                         ("semantic_score", 1e-4)):
            np.testing.assert_allclose(
                np.asarray(j[key]), t[key].numpy(), rtol=1e-3, atol=tol,
                err_msg=key)


class TestRoundTrip:
    def test_teacher_state_dict_round_trip(self, pair):
        _, sd, jp, js = pair
        back = tc.teacher_state_dict_to_torch(jp, js, CFG)
        for k, v in sd.items():
            if k.endswith("num_batches_tracked"):
                continue
            np.testing.assert_array_equal(back[k], v, err_msg=k)

    def test_vae_state_dict_round_trip(self):
        vcfg = VAEConfig(latent_dim=24, image_size=32, base_channels=16)
        key = jax.random.PRNGKey(3)
        from lunaris_orion_tpu.models import vae as jvae
        params = jvae.init(key, vcfg)
        sd = tc.vae_state_dict_to_torch(params, vcfg)
        again = tc.vae_params_from_torch(sd, vcfg)
        a = jax.tree_util.tree_leaves(params)
        b = jax.tree_util.tree_leaves(again)
        assert len(a) == len(b)
        for x, y in zip(a, b):
            np.testing.assert_allclose(np.asarray(x, np.float32),
                                       np.asarray(y), rtol=0, atol=1e-7)

    def test_full_checkpoint_load(self, pair, tmp_path):
        """Full reference .pt (train_hybrid.py:594-615): both models +
        scalars come back converted."""
        mirror, sd, jp, js = pair
        vcfg = VAEConfig(latent_dim=24, image_size=32, base_channels=16)
        from tests.test_torch_parity import TorchMirrorVAE
        tvae = TorchMirrorVAE(vcfg).eval()
        ckpt = {"global_step": 41, "best_loss": 0.25,
                "vae_state_dict": tvae.state_dict(),
                "teacher_state_dict": mirror.state_dict()}
        path = tmp_path / "latest.pt"
        torch.save(ckpt, path)
        out = tc.load_full_torch_checkpoint(str(path), vcfg, CFG)
        assert out["global_step"] == 41 and out["best_loss"] == 0.25
        for got, want in ((out["teacher_params"], jp),
                          (out["teacher_stats"], js)):
            a = jax.tree_util.tree_leaves(got)
            b = jax.tree_util.tree_leaves(want)
            assert len(a) == len(b)
            for x, y in zip(a, b):
                np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
