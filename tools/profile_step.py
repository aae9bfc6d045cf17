#!/usr/bin/env python
"""Per-op device-time breakdown of the 128px VAE train step.

Captures a jax.profiler device trace of a few chained steps and aggregates
HLO op self-times from the xplane via the installed xprof/tensorboard
profile plugin converter. Prints the top-k ops and a category rollup
(conv/matmul vs elementwise-transcendental vs reduce vs copy/other) — the
evidence base for the r3 kernel decisions in BASELINE.md.

Usage: python tools/profile_step.py [--steps 8] [--batch 128]
"""

import argparse
import glob
import json
import sys
import tempfile
from collections import defaultdict
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


def log(m):
    print(m, file=sys.stderr, flush=True)


def build_step(batch, latent):
    from lunaris_orion_tpu.config import TrainConfig, VAEConfig
    from lunaris_orion_tpu.models import vae as vae_mod
    from lunaris_orion_tpu.train import losses as losses_mod
    from lunaris_orion_tpu.train.state import make_optimizers

    vcfg = VAEConfig(latent_dim=latent)
    cfg = TrainConfig(latent_dim=latent, mixed_precision=True)
    vae_tx, _ = make_optimizers(cfg)
    key = jax.random.PRNGKey(0)
    params = vae_mod.init(key, vcfg)
    opt_state = vae_tx.init(params)
    x = jnp.asarray(np.random.default_rng(0).integers(
        0, 256, (batch, 128, 128, 3), dtype=np.uint8))

    import functools

    @functools.partial(jax.jit, static_argnums=2)
    def steps(params, opt_state, k):
        def one(carry, i):
            params, opt_state = carry
            xx = x.astype(jnp.bfloat16) / 127.5 - 1.0

            def loss_fn(p):
                recon, mu, logvar = vae_mod.apply(
                    p, xx, rng=jax.random.fold_in(key, i), cfg=vcfg)
                rl, kl = losses_mod.recon_kl(recon, xx, mu, logvar)
                return rl + 0.1 * kl

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = vae_tx.update(grads, opt_state, params)
            params = jax.tree_util.tree_map(
                lambda p, u: p + u.astype(p.dtype), params, updates)
            return (params, opt_state), loss

        (params, opt_state), losses = jax.lax.scan(
            one, (params, opt_state), jnp.arange(k))
        return losses[-1]

    return steps, params, opt_state


def aggregate_xplane(logdir):
    """Parse the device xplane and return {op_name: total_ps}."""
    paths = glob.glob(str(Path(logdir) / "**" / "*.xplane.pb"),
                      recursive=True)
    if not paths:
        raise FileNotFoundError(f"no xplane.pb under {logdir}")
    from xprof.convert import _xplane_to_tools_data as conv
    data, _ = conv.xspace_to_tool_data(
        [paths[0]], "framework_op_stats", {"tqx": "out:csv;"})
    return data


def aggregate_trace_json(logdir, steps):
    """Fallback: aggregate device-lane op self-times from trace.json.gz
    (the xprof converter import is broken in this image). Device events
    are identified as the pids hosting XLA fusion/convolution executions."""
    import gzip
    from collections import defaultdict
    paths = glob.glob(str(Path(logdir) / "**" / "*.trace.json.gz"),
                      recursive=True)
    if not paths:
        raise FileNotFoundError(f"no trace.json.gz under {logdir}")
    d = json.load(gzip.open(paths[0]))
    evs = [e for e in d["traceEvents"] if e.get("ph") == "X"]
    dev_pids = {e["pid"] for e in evs
                if "fusion" in e.get("name", "") or
                e.get("name", "").startswith(("convolution", "while"))}
    agg, cnt = defaultdict(float), defaultdict(int)
    for e in evs:
        if e["pid"] in dev_pids and not e["name"].startswith(
                ("while", "jit_", "0")):
            agg[e["name"]] += e.get("dur", 0) / steps
            cnt[e["name"]] += 1
    return agg, cnt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=8)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--latent", type=int, default=512)
    ap.add_argument("--top", type=int, default=40)
    args = ap.parse_args()
    log(f"device: {jax.devices()[0]}")

    steps, params, opt_state = build_step(args.batch, args.latent)
    # warm compile outside the trace; dump the optimized HLO so trace
    # fusion names can be mapped back to model ops
    lowered = steps.lower(params, opt_state, args.steps)
    compiled = lowered.compile()
    hlo_path = Path(tempfile.gettempdir()) / "lunaris_step_hlo.txt"
    hlo_path.write_text(compiled.as_text())
    log(f"optimized HLO -> {hlo_path}")
    float(compiled(params, opt_state))
    logdir = tempfile.mkdtemp(prefix="lunaris_profile_")
    with jax.profiler.trace(logdir):
        float(compiled(params, opt_state))
    log(f"trace -> {logdir}")

    try:
        agg, cnt = aggregate_trace_json(logdir, args.steps)
        total = sum(agg.values())
        for name, t in sorted(agg.items(), key=lambda kv: -kv[1])[:args.top]:
            print(json.dumps({"op": name, "ms_per_step": round(t / 1e3, 4),
                              "count": cnt[name] // args.steps,
                              "pct": round(100 * t / total, 2)}), flush=True)
        print(json.dumps({"device_total_ms_per_step": round(total / 1e3, 3)}))
        return
    except Exception as e:
        log(f"trace.json aggregation failed: {e!r}")

    try:
        csv_data = aggregate_xplane(logdir)
    except Exception as e:
        log(f"xplane conversion failed: {e!r}")
        log("raw files: " + "\n".join(
            glob.glob(str(Path(logdir) / '**' / '*'), recursive=True)[:20]))
        raise SystemExit(1)

    import csv as csvmod
    import io
    rows = list(csvmod.DictReader(io.StringIO(csv_data)))
    if not rows:
        log("empty op stats")
        raise SystemExit(1)
    tcol = next((c for c in rows[0] if "total" in c.lower()
                 and "time" in c.lower() and "self" in c.lower()), None)
    ncol = next((c for c in rows[0] if c.lower() in
                 ("operation", "op_name", "name", "type")), None)
    log(f"columns: {list(rows[0])}")
    agg = defaultdict(float)
    for r in rows:
        try:
            agg[r.get(ncol, "?")] += float(r.get(tcol, 0) or 0)
        except (TypeError, ValueError):
            pass
    total = sum(agg.values())
    out = sorted(agg.items(), key=lambda kv: -kv[1])[:args.top]
    for name, t in out:
        print(json.dumps({"op": name, "self_time_us": round(t, 1),
                          "pct": round(100 * t / total, 2)}), flush=True)


if __name__ == "__main__":
    main()
