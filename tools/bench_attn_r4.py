"""r4 attention VPU-floor bench: measure the FOLD_BIAS / MXU_SUM knobs
(flash_attention.py r4) at the production shape.

Each knob combo runs in a fresh subprocess (the knobs are read at trace
time; a same-process re-jit would reuse stale kernels). One combo measures
fwd (drop 0), fwd (drop 0.1) and fwd+bwd-all-inputs (drop 0.1) by
scan-chain slope, mirroring tools/bench_attn_r3.py semantics.

Usage:  python tools/bench_attn_r4.py            # sweep all combos
        python tools/bench_attn_r4.py --one      # current env only
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

SHAPE = dict(B=8, H=8, N=16384, D=16)
ITERS = 6


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def run_one(args):
    import jax
    import jax.numpy as jnp
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from lunaris_orion_tpu.ops.pallas import flash_attention as fa

    B, H, N, D = SHAPE["B"], SHAPE["H"], SHAPE["N"], SHAPE["D"]
    ks = jax.random.split(jax.random.PRNGKey(0), 4)
    q, k, v = (jax.random.normal(kk, (B, H, N, D), jnp.bfloat16)
               for kk in ks[:3])
    bias = jax.random.normal(ks[3], (H, N), jnp.float32) * 0.1

    def slope(make, k1, k2, reps=3):
        # min-per-k then difference-of-mins (the r3 estimator). The
        # interleaved min-of-differences this tool first shipped with is
        # biased LOW under relay-overhead noise: it measured the shipped
        # kernel at 38.0 ms where four independent program variants under
        # this estimator all agree on ~51 ms (tools/bench_attn_bisect.py).
        mins = []
        for kk in (k1, k2):
            f = make(kk)
            f()  # compile
            best = float("inf")
            for _ in range(reps):
                t0 = time.time(); f(); best = min(best, time.time() - t0)
            mins.append(best)
        return (mins[1] - mins[0]) / (k2 - k1)

    def make_fwd(rate):
        def make(kk):
            @jax.jit
            def run(q, k, v, bias):
                def body(c, _):
                    o = fa.attention_bhnd(c, k, v, bias, dropout_rate=rate,
                                          seed=jnp.int32(7))
                    return c + (1e-6 * o).astype(c.dtype), ()
                o, _ = jax.lax.scan(body, q, jnp.arange(kk))
                return jnp.sum(o.astype(jnp.float32))
            return lambda: float(run(q, k, v, bias))
        return make

    def make_bwd(rate):
        def make(kk):
            @jax.jit
            def run(q, k, v, bias):
                def loss(q, k, v, bias):
                    o = fa.attention_bhnd(q, k, v, bias, dropout_rate=rate,
                                          seed=jnp.int32(7))
                    return jnp.sum(o.astype(jnp.float32))
                def body(c, _):
                    g = jax.grad(loss, argnums=(0, 1, 2, 3))(c, k, v, bias)
                    return c + (1e-6 * g[0]).astype(c.dtype), ()
                o, _ = jax.lax.scan(body, q, jnp.arange(kk))
                return jnp.sum(o.astype(jnp.float32))
            return lambda: float(run(q, k, v, bias))
        return make

    res = {
        "fold_bias": fa._fold_bias(), "mxu_sum": fa._mxu_sum(),
        "fwd0_ms": round(slope(make_fwd(0.0), 1, 1 + ITERS) * 1e3, 1),
        "fwd01_ms": round(slope(make_fwd(0.1), 1, 1 + ITERS) * 1e3, 1),
        "fwdbwd01_ms": round(slope(make_bwd(0.1), 1, 1 + ITERS) * 1e3, 1),
    }
    print(json.dumps(res), flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--one", action="store_true",
                    help="measure with the CURRENT env knobs only")
    args = ap.parse_args()
    if args.one:
        run_one(args)
        return
    combos = [(0, 0), (1, 0), (0, 1), (1, 1)]
    for fb, ms in combos:
        env = dict(os.environ,
                   LUNARIS_ATTN_FOLD_BIAS=str(fb),
                   LUNARIS_ATTN_MXU_SUM=str(ms))
        log(f"--- fold_bias={fb} mxu_sum={ms} ---")
        r = subprocess.run([sys.executable, os.path.abspath(__file__),
                            "--one"], env=env, capture_output=True, text=True)
        sys.stderr.write(r.stderr[-2000:] if r.returncode else "")
        print(r.stdout.strip() or f"FAILED rc={r.returncode}", flush=True)


if __name__ == "__main__":
    main()
