"""The five BASELINE.json benchmark configs, as a runnable harness.

  1. train_hybrid CPU config   (128px, latent 256, batch 8, fp32)
  2. mid-range                 (mixed precision, latent 384, grad_accum 2)
  3. high-end                  (latent 512, embed 256, feature 512, batch 64)
  4. full hybrid loop          (VAE + teacher losses, checkpoint resume)
  5. inference path            (batch sampling + teacher quality scoring)

Usage: python tools/bench_configs.py [--smoke] [--only 1,3,5]
  --smoke shrinks images to 32px so every config (including CPU) finishes in
  seconds — the CI-able variant. Without it, configs run at their real dims
  on the available device (config 1 runs on CPU by definition and is
  intentionally capped at very few steps; the 128px teacher on one CPU core
  is as impractical here as it is for the reference).

Timings use the scan-slope method (see bench.py). Emits one JSON line per
config to stdout.
"""

import argparse
import json
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


def _setup_cache():
    try:
        cache = Path.home() / ".cache" / "lunaris_jax_cache"
        cache.mkdir(parents=True, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", str(cache))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:
        pass


def _slope_hybrid(cfg, vcfg, tcfg, k_big=4, reps=2, remat=False):
    from lunaris_orion_tpu.train.state import create_state
    from lunaris_orion_tpu.train.step import make_train_step
    state = create_state(jax.random.PRNGKey(0), cfg, vcfg, tcfg)
    step = make_train_step(cfg, vcfg, tcfg, remat=remat)
    imgs = jnp.asarray(np.random.default_rng(0).integers(
        0, 256, (cfg.gradient_accumulation_steps, cfg.batch_size,
                 cfg.image_size, cfg.image_size, 3), dtype=np.uint8))

    def make(kk):
        @jax.jit
        def run(state):
            def body(s, i):
                s2, m = step(s, imgs)
                return s2, m["total_loss"]
            _, losses = jax.lax.scan(body, state, jnp.arange(kk))
            return losses[-1]
        return lambda: float(run(state))

    ts = []
    for k in (1, k_big):
        fn = make(k)
        fn()
        best = float("inf")
        for _ in range(reps):
            t0 = time.time()
            fn()
            best = min(best, time.time() - t0)
        ts.append(best)
    dt = (ts[1] - ts[0]) / (k_big - 1)
    sprites = cfg.batch_size * cfg.gradient_accumulation_steps / dt
    return dt, sprites


def emit(name, **kw):
    print(json.dumps({"config": name, **kw}), flush=True)


def analytic_hybrid_macs(image, *, latent=256, feature=128, experts=4,
                         layers=3):
    """Dominant-term MAC count for ONE hybrid micro-batch-of-1 step at the
    reference defaults: VAE fwd+bwd (3x fwd) + teacher fwd on inputs
    (1x fwd, no grad) + teacher fwd+bwd on recon (3x fwd). Used only to
    form the 128px/32px scaling ratio for the CPU config's derived number —
    the attention N^2 terms dominate it (N = image^2 spatial tokens)."""
    # VAE (see bench.analytic_vae_step_flops; MACs, fwd only):
    chans = [64, 128, 256, 512]
    vae = 0
    cin, hw = 3, image
    for c in chans:
        hw //= 2
        vae += hw * hw * c * cin * 9 + 2 * hw * hw * c * c * 9
        cin = c
    vae += 3 * (512 * (image // 16) ** 2) * latent
    cin, hw = 512, image // 16
    for c in [256, 128, 64, 32]:
        hw *= 2
        vae += hw * hw * c * cin * 4
        cin = c
    vae += image * image * 3 * 32 * 9
    # Teacher (fwd): per expert-block: 2 conv3x3 (9NF^2) + qkv/proj 1x1
    # (4NF^2) + attention scores+apply (2 N^2 F); extractor ~small.
    n = image * image
    per_block = 13 * n * feature * feature + 2 * n * n * feature
    teacher = experts * layers * per_block
    return 3 * vae + 1 * teacher + 3 * teacher


def config1_cpu(image):
    """CPU config (reference README.md:156-171: batch 8, grad-accum 8,
    latent 256, fp32, 128px). The full 128px recipe is impractical on this
    1-core host (r2: compile + 2 steps exceeded a 55-minute budget — the
    reference targets multi-core desktops), so the recorded number is a
    DERIVED estimate, like the other relay-limited measurements: the 32px
    micro-step that DOES run is measured, and the 128px recipe rate is
    scaled by the analytic FLOP ratio (attention-N^2-dominated)."""
    from lunaris_orion_tpu.config import TrainConfig
    jax.config.update("jax_platforms", "cpu")
    cfg = TrainConfig(batch_size=8, gradient_accumulation_steps=1,
                      latent_dim=256, image_size=32,
                      mixed_precision=False)
    dt32, _ = _slope_hybrid(cfg, cfg.vae_config(), cfg.teacher_config(),
                            k_big=2, reps=1)
    ratio = analytic_hybrid_macs(128) / analytic_hybrid_macs(32)
    # recipe step = 8 micro-steps (grad accum) at 128px
    derived_step_s = dt32 * ratio * 8
    sprites = 64 / derived_step_s  # global batch 8 x accum 8
    emit("1_cpu_hybrid", measured_micro32_ms=round(dt32 * 1e3, 1),
         flop_ratio_128_over_32=round(ratio, 1),
         derived_recipe_step_s=round(derived_step_s, 1),
         derived_sprites_per_sec=float(f"{sprites:.3g}"),
         note="derived: 32px micro-step x analytic FLOP ratio x accum 8; "
              "128px recipe impractical on this 1-core host",
         device="cpu")
    jax.config.update("jax_platforms", None)


def _planner_probe(cfg, vcfg, tcfg, *, remat, headroom=0.92):
    """The Trainer's static memory plan (train/loop.py:_plan_and_compile),
    reproduced for the bench: compile the donated sharded-free step, check
    XLA's memory analysis against HBM, halve the micro-batch (doubling
    accumulation — same global batch) until it fits. Returns the surviving
    cfg. r1's config-2 run bypassed this and died at the HBM edge."""
    from lunaris_orion_tpu.train.state import create_state
    from lunaris_orion_tpu.train.step import make_train_step
    from lunaris_orion_tpu.utils.hbm import device_hbm_bytes
    dev = jax.devices()[0]
    hbm = device_hbm_bytes(dev)
    while True:
        abstract = jax.eval_shape(
            lambda k: create_state(k, cfg, vcfg, tcfg), jax.random.PRNGKey(0))
        batch_abs = jax.ShapeDtypeStruct(
            (cfg.gradient_accumulation_steps, cfg.batch_size,
             cfg.image_size, cfg.image_size, 3), jnp.uint8)
        jitted = jax.jit(make_train_step(cfg, vcfg, tcfg, remat=remat),
                         donate_argnums=0)
        need = None
        try:
            compiled = jitted.lower(abstract, batch_abs).compile()
            mem = compiled.memory_analysis()
            if mem is not None:
                need = (getattr(mem, "temp_size_in_bytes", 0)
                        + getattr(mem, "argument_size_in_bytes", 0)
                        + getattr(mem, "output_size_in_bytes", 0))
        except Exception as e:
            # XLA:TPU reports >HBM allocations as a compile-time permanent
            # error rather than via memory_analysis — treat as "too big".
            if "out of memory" not in str(e).lower():
                raise
            need = float("inf")
        print(f"  planner: micro-batch {cfg.batch_size} x accum "
              f"{cfg.gradient_accumulation_steps}: needs "
              f"{(need or 0)/2**30:.2f} GB of {(hbm or 0)/2**30:.2f} GB",
              file=sys.stderr, flush=True)
        if need != float("inf") and (
                hbm is None or need is None or need < headroom * hbm):
            return cfg
        if cfg.batch_size <= 1:
            return cfg
        cfg = cfg.replace(
            batch_size=cfg.batch_size // 2,
            gradient_accumulation_steps=cfg.gradient_accumulation_steps * 2)


def config2_midrange(image):
    from lunaris_orion_tpu.config import TrainConfig
    # The reference's mid-range recipe targets a 24GB RTX 3090; on a 16GB
    # v5e chip the static planner shrinks the micro-batch (same global
    # batch 64) with remat — the r1 run bypassed the planner and crashed
    # the TPU worker at the HBM edge. This host's relay additionally kills
    # any single XLA execution past ~1-2 minutes, so the grad-accum scan
    # cannot run as one program here: we time the micro-step (accum=1,
    # identical math — the recipe's step is `accum` such micro-steps plus
    # one optimizer update) and derive the recipe rate.
    cfg = TrainConfig(batch_size=16, gradient_accumulation_steps=4,
                      latent_dim=384, embedding_dim=192, feature_dim=384,
                      image_size=image, mixed_precision=True)
    recipe_global = cfg.batch_size * cfg.gradient_accumulation_steps
    cfg = _planner_probe(cfg, cfg.vae_config(), cfg.teacher_config(),
                         remat=True)
    micro = cfg.replace(gradient_accumulation_steps=1)
    dt, _ = _slope_hybrid(micro, micro.vae_config(), micro.teacher_config(),
                          k_big=3, remat=True)
    sprites = micro.batch_size / dt
    emit("2_midrange_hybrid", image=image,
         micro_step_ms=round(dt * 1e3, 1),
         sprites_per_sec=round(sprites, 2),
         micro_batch=micro.batch_size,
         planned_grad_accum=recipe_global // micro.batch_size,
         derived_recipe_step_s=round(
             dt * recipe_global / micro.batch_size, 2),
         note="micro-step timing; relay kills multi-minute executions",
         device=jax.devices()[0].platform)


def config3_highend(image):
    """The primary bench.py metric at the high-end dims (VAE step)."""
    import bench
    bench.main()


def config4_resume(image, tmp):
    """Full hybrid loop via the Trainer with checkpoint save + resume."""
    from lunaris_orion_tpu.cli.train import build_parser, config_from_args
    from lunaris_orion_tpu.data.synthetic import write_synthetic_dataset
    from lunaris_orion_tpu.train.loop import Trainer
    ds = tmp / "ds4"
    write_synthetic_dataset(ds, 128, image_size=image)
    args = ["--data_dir", str(ds), "--output_dir", str(tmp / "run4"),
            "--num_epochs", "1", "--batch_size", "8",
            "--gradient_accumulation_steps", "1",
            "--image_size", str(image), "--mixed_precision",
            "--save_every", "4", "--log_every", "100"]
    t0 = time.time()
    tr = Trainer(config_from_args(build_parser().parse_args(args)))
    r1 = tr.train()
    t_train = time.time() - t0
    args += ["--resume_from", str(tmp / "run4" / "checkpoints")]
    tr2 = Trainer(config_from_args(build_parser().parse_args(args)))
    resumed_step = int(tr2.state.step)
    r2 = tr2.train()
    emit("4_full_hybrid_resume", image=image,
         epochs=r1["epochs"] + r2["epochs"],
         first_best_loss=round(r1["best_loss"], 4),
         resumed_at_step=resumed_step,
         final_step=int(tr2.state.step),
         wall_s=round(time.time() - t0, 1),
         device=jax.devices()[0].platform)


def config5_inference(image, tmp):
    """Batch prior sampling + teacher scoring throughput."""
    from lunaris_orion_tpu.config import TrainConfig
    from lunaris_orion_tpu.models import vae as vae_mod
    from lunaris_orion_tpu.models import teacher as teacher_mod
    cfg = TrainConfig(latent_dim=256, image_size=image)
    vcfg, tcfg = cfg.vae_config(), cfg.teacher_config()
    key = jax.random.PRNGKey(0)
    vp = vae_mod.init(key, vcfg)
    tp, ts = teacher_mod.init(jax.random.fold_in(key, 1), tcfg)
    B = 16  # 64 exceeds HBM at 128px: the E-stacked teacher activations are ~10GB/tensor

    def make(kk):
        @jax.jit
        def run(z0):
            def body(z, i):
                imgs = vae_mod.decode(vp["decoder"], z, [], vcfg)
                out, _ = teacher_mod.apply(tp, ts, imgs, cfg=tcfg, train=False)
                q = jnp.mean(out["quality_scores"], -1)
                return z + 1e-3, jnp.mean(q)
            _, qs = jax.lax.scan(body, z0, jnp.arange(kk))
            return qs[-1]
        return lambda: float(run(jax.random.normal(key, (B, vcfg.latent_dim))))

    ts_ = []
    for k in (1, 4):
        fn = make(k)
        fn()
        best = float("inf")
        for _ in range(2):
            t0 = time.time()
            fn()
            best = min(best, time.time() - t0)
        ts_.append(best)
    dt = (ts_[1] - ts_[0]) / 3
    emit("5_inference_sample_and_score", image=image, batch=B,
         batch_ms=round(dt * 1e3, 1),
         images_per_sec=round(B / dt, 1),
         device=jax.devices()[0].platform)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--smoke", action="store_true", help="32px everywhere")
    ap.add_argument("--only", type=str, default="1,2,3,4,5")
    args = ap.parse_args()
    _setup_cache()
    image = 32 if args.smoke else 128
    cpu_image = 32 if args.smoke else 32  # CPU hybrid at 128px is impractical
    only = set(args.only.split(","))
    tmp = Path(tempfile.mkdtemp(prefix="bench_configs_"))
    if "1" in only:
        config1_cpu(cpu_image)
    if "2" in only:
        config2_midrange(image)
    if "3" in only:
        config3_highend(image)
    if "4" in only:
        config4_resume(image, tmp)
    if "5" in only:
        config5_inference(image, tmp)


if __name__ == "__main__":
    main()
