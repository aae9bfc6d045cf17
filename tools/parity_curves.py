#!/usr/bin/env python
"""Loss-curve parity experiment: this repo's VAE train loop vs a pinned
PyTorch run of the reference architecture (north star: "matched recon+KL
loss curves", BASELINE.json; VERDICT r1 item 4).

Both sides train the SAME model (weights converted from one torch init via
utils.torch_compat), on the SAME synthetic uint8 sprite stream in the SAME
batch order, with matched optimizers (AdamW lr/wd/betas, global-norm clip
1.0, per-step cosine-warm-restart schedule — train_hybrid.py:504-527,
907-926 semantics at grad_accum=1):

  * deterministic mode (z = mu on both sides): every floating-point input
    is identical, so the curves must overlay within accumulated roundoff —
    THE converter/loss/optimizer correctness check.
  * sampled mode (posterior sampling, each framework's own RNG): realistic
    training; curves must agree within the sampling-noise band.

Writes docs/parity_curves.json + docs/parity_curves.png and prints a
summary line per mode.

Usage: python tools/parity_curves.py [--steps 300] [--batch 16]
"""

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tests"))

import numpy as np

REPO = Path(__file__).resolve().parent.parent


def make_data(steps: int, batch: int, size: int, seed: int = 0) -> np.ndarray:
    """Deterministic uint8 sprite stream [steps, batch, size, size, 3]."""
    rng = np.random.default_rng(seed)
    # blocky sprite-like content (not pure noise) so recon loss has signal
    cells = rng.integers(0, 256, (steps * batch, size // 4, size // 4, 3),
                         dtype=np.uint8)
    up = np.repeat(np.repeat(cells, 4, axis=1), 4, axis=2)
    return up.reshape(steps, batch, size, size, 3)


def run_torch(data: np.ndarray, cfg, sample: bool, seed: int = 7):
    import torch
    import torch.nn.functional as tF
    from test_torch_parity import TorchMirrorVAE

    torch.manual_seed(seed)
    model = TorchMirrorVAE(cfg).train()
    gen = torch.Generator().manual_seed(seed + 1)
    opt = torch.optim.AdamW(model.parameters(), lr=1e-4, weight_decay=0.01,
                            betas=(0.9, 0.999))
    sched = torch.optim.lr_scheduler.CosineAnnealingWarmRestarts(
        opt, T_0=10, T_mult=2, eta_min=1e-6)
    sd0 = {k: v.detach().clone().numpy() for k, v in model.state_dict().items()}

    curves = {"recon": [], "kl": []}
    n = cfg.num_down
    for step in range(data.shape[0]):
        x = torch.tensor(data[step].transpose(0, 3, 1, 2).astype(np.float32)
                         / 127.5 - 1.0)
        # forward with optional posterior sampling (mirror defaults to z=mu)
        h, skips = x, []
        for i in range(n):
            h = getattr(model.encoder, f"down{i + 1}")(h)
            if i < n - 1:
                skips.append(h)
        flat = h.flatten(1)
        mu = model.encoder.fc_mu(flat)
        logvar = model.encoder.fc_logvar(flat)
        z = mu
        if sample:
            eps = torch.randn(mu.shape, generator=gen)
            z = mu + eps * torch.exp(0.5 * logvar)
        g = model.decoder.fc(z).view(-1, cfg.channels[-1],
                                     cfg.bottleneck_hw, cfg.bottleneck_hw)
        for i in range(n):
            g = getattr(model.decoder, f"up{i + 1}")(g)
            j = n - 2 - i
            if 0 <= j < len(skips):
                g = g + skips[j]
        recon = torch.tanh(model.decoder.final_conv(g))

        recon_loss = tF.mse_loss(recon, x)
        kl = -0.5 * torch.mean(1 + logvar - mu.pow(2) - logvar.exp())
        loss = recon_loss + 0.1 * kl
        opt.zero_grad(set_to_none=True)
        loss.backward()
        torch.nn.utils.clip_grad_norm_(model.parameters(), 1.0)
        opt.step()
        sched.step()
        curves["recon"].append(float(recon_loss.detach()))
        curves["kl"].append(float(kl.detach()))
    return sd0, curves


def run_jax(data: np.ndarray, cfg, sd0, sample: bool, seed: int = 7):
    import jax
    import jax.numpy as jnp
    import optax
    from lunaris_orion_tpu.models import vae as jvae
    from lunaris_orion_tpu.train.losses import recon_kl
    from lunaris_orion_tpu.train.schedule import cosine_warm_restarts
    from lunaris_orion_tpu.utils.torch_compat import vae_params_from_torch

    params = jax.tree_util.tree_map(
        jnp.asarray, vae_params_from_torch(sd0, cfg))
    sched = cosine_warm_restarts(1e-4, 10, eta_min=1e-6, t_mult=2)
    # identical chain to train.state.make_optimizers
    tx = optax.chain(
        optax.clip_by_global_norm(1.0),
        optax.adamw(sched, b1=0.9, b2=0.999, eps=1e-8, weight_decay=0.01),
    )
    opt_state = tx.init(params)
    key = jax.random.PRNGKey(seed)

    @jax.jit
    def train_step(params, opt_state, batch, rng):
        x = batch.astype(jnp.float32) / 127.5 - 1.0

        def loss_fn(p):
            recon, mu, logvar = jvae.apply(
                p, x, rng=rng if sample else None, cfg=cfg,
                sample_posterior=sample)
            rl, kl = recon_kl(recon, x, mu, logvar)
            return rl + 0.1 * kl, (rl, kl)

        (_, (rl, kl)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, rl, kl

    curves = {"recon": [], "kl": []}
    for step in range(data.shape[0]):
        rng = jax.random.fold_in(key, step)
        params, opt_state, rl, kl = train_step(
            params, opt_state, jnp.asarray(data[step]), rng)
        curves["recon"].append(float(rl))
        curves["kl"].append(float(kl))
    return curves


def plot(results: dict, out_png: Path) -> None:
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    # dataviz palette: categorical slots 1 (blue) and 2 (orange), light mode
    C_TORCH, C_JAX = "#2a78d6", "#eb6834"
    INK, MUTED = "#1a1a19", "#6b6a63"
    fig, axes = plt.subplots(2, 2, figsize=(10, 6), dpi=140,
                             facecolor="white", sharex=True)
    for col, mode in enumerate(("deterministic", "sampled")):
        for row, metric in enumerate(("recon", "kl")):
            ax = axes[row][col]
            t = results[mode]["torch"][metric]
            j = results[mode]["jax"][metric]
            ax.plot(t, color=C_TORCH, lw=2, label="PyTorch reference")
            ax.plot(j, color=C_JAX, lw=2, label="lunaris-orion-tpu",
                    linestyle=(0, (4, 2)))
            ax.set_title(f"{metric} loss — {mode} z", fontsize=10,
                         color=INK, loc="left")
            ax.grid(True, color="#e8e7e0", lw=0.6)
            ax.set_axisbelow(True)
            for s in ("top", "right"):
                ax.spines[s].set_visible(False)
            for s in ("left", "bottom"):
                ax.spines[s].set_color(MUTED)
            ax.tick_params(colors=MUTED, labelsize=8)
            if row == 1:
                ax.set_xlabel("step", color=MUTED, fontsize=9)
    axes[0][0].legend(frameon=False, fontsize=9, labelcolor=INK)
    fig.suptitle("VAE loss-curve parity: pinned PyTorch run vs this repo "
                 "(same init, same data, same optimizer)",
                 fontsize=11, color=INK, x=0.01, ha="left")
    fig.tight_layout(rect=(0, 0, 1, 0.96))
    fig.savefig(out_png)
    print(f"wrote {out_png}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--size", type=int, default=32)
    args = ap.parse_args()

    from lunaris_orion_tpu.config import VAEConfig
    cfg = VAEConfig(latent_dim=24, image_size=args.size, base_channels=16)
    data = make_data(args.steps, args.batch, args.size)

    results = {}
    for mode, sample in (("deterministic", False), ("sampled", True)):
        sd0, t_curves = run_torch(data, cfg, sample)
        j_curves = run_jax(data, cfg, sd0, sample)
        results[mode] = {"torch": t_curves, "jax": j_curves}
        tr = np.asarray(t_curves["recon"])
        jr = np.asarray(j_curves["recon"])
        tk = np.asarray(t_curves["kl"])
        jk = np.asarray(j_curves["kl"])
        # relative divergence over the back half (after transients)
        h = args.steps // 2
        rec_div = float(np.max(np.abs(tr[h:] - jr[h:]) / np.abs(tr[h:])))
        kl_div = float(np.max(np.abs(tk[h:] - jk[h:])
                              / np.maximum(np.abs(tk[h:]), 1e-3)))
        results[mode]["max_rel_divergence"] = {"recon": rec_div, "kl": kl_div}
        print(f"{mode}: final recon torch={tr[-1]:.5f} jax={jr[-1]:.5f} | "
              f"final kl torch={tk[-1]:.5f} jax={jk[-1]:.5f} | "
              f"back-half max rel divergence recon={rec_div:.3%} "
              f"kl={kl_div:.3%}")

    docs = REPO / "docs"
    docs.mkdir(exist_ok=True)
    with open(docs / "parity_curves.json", "w") as f:
        json.dump(results, f)
    plot(results, docs / "parity_curves.png")


if __name__ == "__main__":
    main()
