#!/usr/bin/env python
"""Hybrid-loop curve parity: the FULL co-training loop (VAE + teacher +
RL reward + dual AdamW) vs a pinned PyTorch run at tiny scale (VERDICT r2
item 3 — the VAE-only experiment in parity_curves.py does not cover the
teacher/RL path, train_hybrid.py:838-954).

Both sides run the reference's live hybrid step semantics:
  teacher(x) no-grad -> prompt embeddings; VAE fwd; MSE+KL;
  teacher(recon.detach(), pe) -> quality/semantic (cosine conditioning —
  this repo's documented fix of reference defect #10);
  reward -> EMA baseline (update-then-advantage ordering, :874-883) ->
  pg_loss; vae_loss = recon + 0.1*kl + pg; teacher_loss = 0.5*(-mean q);
  both clipped AdamW steps + per-step cosine-warm-restart schedules.

The JAX side is the PRODUCT train step (train.step.make_train_step) on a
real TrainState — not a re-derivation. The torch side composes the test
mirrors (TorchMirrorVAE / MirrorTeacher) into the reference loop.

Modes:
  * deterministic: z = mu on both sides (the JAX reparameterize is patched
    to return mu for this tool only), dropout 0 both sides — every float
    input identical, curves must overlay within roundoff.
  * sampled: posterior sampling with each framework's own RNG — curves must
    agree within the sampling-noise band.

Writes docs/parity_hybrid.json + docs/parity_hybrid.png.
Usage: python tools/parity_hybrid.py [--steps 200] [--batch 8]
"""

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tests"))

import numpy as np

REPO = Path(__file__).resolve().parent.parent

# Tiny-but-structured configs: 32px sprites, 2 experts x 2 layers.
def make_cfgs():
    from lunaris_orion_tpu.config import TrainConfig, VAEConfig, TeacherConfig
    vcfg = VAEConfig(latent_dim=24, image_size=32, base_channels=16)
    tcfg = TeacherConfig(
        num_experts=2, feature_dim=24, extractor_dim=16, extractor_stem=8,
        branch_dim=8, expert_layers=2, intermediate_dim=16, embedding_dim=8,
        num_heads=4, rel_pos_size=4, image_size=32, dropout_rate=0.0)
    cfg = TrainConfig(mixed_precision=False, gradient_accumulation_steps=1,
                      vae_lr=1e-4, teacher_lr=1e-4, scheduler_t0=10)
    return cfg, vcfg, tcfg


def make_data(steps, batch, size, seed=0):
    rng = np.random.default_rng(seed)
    cells = rng.integers(0, 256, (steps * batch, size // 4, size // 4, 3),
                         dtype=np.uint8)
    up = np.repeat(np.repeat(cells, 4, axis=1), 4, axis=2)
    return up.reshape(steps, batch, size, size, 3)


METRICS = ("recon_loss", "kl_loss", "quality_reward", "semantic_reward",
           "baseline", "pg_loss", "teacher_loss")


def run_torch(data, cfg, vcfg, tcfg, sample, seed=7):
    import torch
    import torch.nn as nn
    import torch.nn.functional as tF
    from test_torch_parity import TorchMirrorVAE
    from test_teacher_interop import MirrorTeacher

    torch.manual_seed(seed)
    vae = TorchMirrorVAE(vcfg).train()
    teacher = MirrorTeacher(tcfg).train()
    for m in teacher.modules():          # deterministic parity: dropout off
        if isinstance(m, (nn.Dropout, nn.Dropout2d)):
            m.p = 0.0
    gen = torch.Generator().manual_seed(seed + 1)

    def tx(model, lr):
        opt = torch.optim.AdamW(model.parameters(), lr=lr, weight_decay=0.01,
                                betas=(0.9, 0.999))
        sched = torch.optim.lr_scheduler.CosineAnnealingWarmRestarts(
            opt, T_0=cfg.scheduler_t0, T_mult=2, eta_min=cfg.min_lr)
        return opt, sched

    vopt, vsched = tx(vae, cfg.vae_lr)
    topt, tsched = tx(teacher, cfg.teacher_lr)
    sd0 = {
        "vae": {k: v.detach().clone().numpy()
                for k, v in vae.state_dict().items()},
        "teacher": {k: v.detach().clone().numpy()
                    for k, v in teacher.state_dict().items()},
    }

    n = vcfg.num_down
    baseline, binit = 0.0, False
    curves = {k: [] for k in METRICS}
    for step in range(data.shape[0]):
        x = torch.tensor(data[step].transpose(0, 3, 1, 2).astype(np.float32)
                         / 127.5 - 1.0)
        # (1) teacher on inputs, no grad (train_hybrid.py:853-855)
        with torch.no_grad():
            pe = teacher(x)["prompt_embedding"].detach()
        # (2) VAE forward (z = mu in deterministic mode)
        h, skips = x, []
        for i in range(n):
            h = getattr(vae.encoder, f"down{i + 1}")(h)
            if i < n - 1:
                skips.append(h)
        flat = h.flatten(1)
        mu = vae.encoder.fc_mu(flat)
        logvar = vae.encoder.fc_logvar(flat)
        z = mu
        if sample:
            eps = torch.randn(mu.shape, generator=gen)
            z = mu + eps * torch.exp(0.5 * logvar)
        g = vae.decoder.fc(z).view(-1, vcfg.channels[-1],
                                   vcfg.bottleneck_hw, vcfg.bottleneck_hw)
        for i in range(n):
            g = getattr(vae.decoder, f"up{i + 1}")(g)
            j = n - 2 - i
            if 0 <= j < len(skips):
                g = g + skips[j]
        recon = torch.tanh(vae.decoder.final_conv(g))

        recon_loss = tF.mse_loss(recon, x)
        kl = -0.5 * torch.mean(1 + logvar - mu.pow(2) - logvar.exp())

        # (3) teacher on recon.detach() with cosine semantic conditioning
        t2 = teacher(recon.detach())
        a = t2["prompt_embedding"]
        cos = torch.sum(a * pe, -1) / torch.clamp(
            a.norm(dim=-1) * pe.norm(dim=-1), min=1e-8)
        semantic = t2["semantic_score"] * cos[:, None]
        quality = t2["quality_scores"]

        # (4) reward / EMA baseline / advantage (:869-886)
        quality_reward = quality.mean(dim=1, keepdim=True)
        total_reward = quality_reward + cfg.semantic_weight * semantic
        mean_reward = float(total_reward.mean().detach())
        if not binit:
            baseline, binit = mean_reward, True
        else:
            baseline = (cfg.baseline_momentum * baseline
                        + (1 - cfg.baseline_momentum) * mean_reward)
        advantage = (total_reward - baseline).detach() * cfg.reward_scale
        pg_loss = -(advantage * recon_loss).mean()
        vae_loss = (cfg.recon_weight * recon_loss + cfg.kl_weight * kl
                    + pg_loss)
        teacher_loss = cfg.quality_weight * (-quality.mean())

        vopt.zero_grad(set_to_none=True)
        topt.zero_grad(set_to_none=True)
        (vae_loss + teacher_loss).backward()
        torch.nn.utils.clip_grad_norm_(vae.parameters(), cfg.max_grad_norm)
        torch.nn.utils.clip_grad_norm_(teacher.parameters(),
                                       cfg.max_grad_norm)
        vopt.step()
        topt.step()
        vsched.step()
        tsched.step()

        vals = {"recon_loss": float(recon_loss.detach()),
                "kl_loss": float(kl.detach()),
                "quality_reward": float(quality_reward.mean().detach()),
                "semantic_reward": float(semantic.mean().detach()),
                "baseline": baseline,
                "pg_loss": float(pg_loss.detach()),
                "teacher_loss": float(teacher_loss.detach())}
        for k in METRICS:
            curves[k].append(vals[k])
    return sd0, curves


def run_jax(data, cfg, vcfg, tcfg, sd0, sample, seed=7):
    import jax
    import jax.numpy as jnp
    from lunaris_orion_tpu.models import vae as jvae
    from lunaris_orion_tpu.train.state import create_state
    from lunaris_orion_tpu.train.step import make_train_step
    from lunaris_orion_tpu.utils import torch_compat as tc

    state = create_state(jax.random.PRNGKey(seed), cfg, vcfg, tcfg)
    jp, js = tc.teacher_params_from_torch(sd0["teacher"], tcfg)
    state = state.replace(
        vae_params=jax.tree_util.tree_map(
            jnp.asarray, tc.vae_params_from_torch(sd0["vae"], vcfg)),
        teacher_params=jp, teacher_stats=js)

    orig_reparam = jvae.reparameterize
    if not sample:
        jvae.reparameterize = lambda rng, mu, logvar: mu  # z = mu (tool-only)
    try:
        step_fn = jax.jit(make_train_step(cfg, vcfg, tcfg, remat=False,
                                          attn_impl="full"))
        curves = {k: [] for k in METRICS}
        for step in range(data.shape[0]):
            state, m = step_fn(state, jnp.asarray(data[step][None]))
            for k in METRICS:
                curves[k].append(float(m[k]))
    finally:
        jvae.reparameterize = orig_reparam
    return curves


def plot(results, out_png):
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    C_TORCH, C_JAX = "#2a78d6", "#eb6834"
    INK, MUTED = "#1a1a19", "#6b6a63"
    show = ("recon_loss", "kl_loss", "quality_reward", "baseline")
    fig, axes = plt.subplots(len(show), 2, figsize=(10, 10), dpi=140,
                             facecolor="white", sharex=True)
    for col, mode in enumerate(("deterministic", "sampled")):
        for row, metric in enumerate(show):
            ax = axes[row][col]
            ax.plot(results[mode]["torch"][metric], color=C_TORCH, lw=2,
                    label="PyTorch reference loop")
            ax.plot(results[mode]["jax"][metric], color=C_JAX, lw=2,
                    linestyle=(0, (4, 2)), label="lunaris-orion-tpu")
            ax.set_title(f"{metric} — {mode} z", fontsize=10, color=INK,
                         loc="left")
            ax.grid(True, color="#e8e7e0", lw=0.6)
            ax.set_axisbelow(True)
            for s in ("top", "right"):
                ax.spines[s].set_visible(False)
            for s in ("left", "bottom"):
                ax.spines[s].set_color(MUTED)
            ax.tick_params(colors=MUTED, labelsize=8)
            if row == len(show) - 1:
                ax.set_xlabel("step", color=MUTED, fontsize=9)
    axes[0][0].legend(frameon=False, fontsize=9, labelcolor=INK)
    fig.suptitle("Hybrid co-training loop parity: pinned PyTorch run vs "
                 "this repo's product train step (same init, data, "
                 "optimizers, RL reward path)", fontsize=11, color=INK,
                 x=0.01, ha="left")
    fig.tight_layout(rect=(0, 0, 1, 0.965))
    fig.savefig(out_png)
    print(f"wrote {out_png}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=200)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--cpu", action="store_true",
                    help="force the JAX side onto CPU (frees the TPU; env "
                         "vars alone are overridden by the axon plugin)")
    ap.add_argument("--modes", default="deterministic,sampled",
                    help="comma list; finished modes are loaded from the "
                         "incremental json so a crash never re-runs them")
    args = ap.parse_args()
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    cfg, vcfg, tcfg = make_cfgs()
    data = make_data(args.steps, args.batch, vcfg.image_size)

    docs = REPO / "docs"
    docs.mkdir(exist_ok=True)
    wanted = [m.strip() for m in args.modes.split(",") if m.strip()]
    results = {}
    if (docs / "parity_hybrid.json").exists():
        with open(docs / "parity_hybrid.json") as f:
            results = json.load(f)
    for mode, sample in (("deterministic", False), ("sampled", True)):
        if mode not in wanted:
            continue
        if mode in results and "max_rel_divergence" in results[mode]:
            print(f"{mode}: already complete in incremental json — skipped",
                  flush=True)
            continue
        sd0, t_curves = run_torch(data, cfg, vcfg, tcfg, sample)
        j_curves = run_jax(data, cfg, vcfg, tcfg, sd0, sample)
        results[mode] = {"torch": t_curves, "jax": j_curves}
        div = {}
        h = args.steps // 2
        for k in METRICS:
            t = np.asarray(t_curves[k])[h:]
            j = np.asarray(j_curves[k])[h:]
            div[k] = float(np.max(np.abs(t - j)
                                  / np.maximum(np.abs(t), 1e-3)))
        results[mode]["max_rel_divergence"] = div
        print(f"{mode}: back-half max rel divergence " +
              " ".join(f"{k}={v:.3%}" for k, v in div.items()), flush=True)
        with open(docs / "parity_hybrid.json", "w") as f:
            json.dump(results, f)   # incremental: survive timeouts

    if all(m in results for m in ("deterministic", "sampled")):
        plot(results, docs / "parity_hybrid.png")


if __name__ == "__main__":
    main()
