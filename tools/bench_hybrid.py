"""Secondary benchmarks (run manually on a TPU host):
1) Pallas attention kernel fwd/bwd at the production shape (N=16384),
2) the full hybrid train step at 128px reference defaults.
Timings fetch a scalar per iteration to force completion through async
dispatch."""
import time, sys
import jax, jax.numpy as jnp, numpy as np
sys.path.insert(0, str(__import__("pathlib").Path(__file__).resolve().parent.parent))


def timeit(fn, n=5):
    fn()  # warmup (compiled already)
    t0 = time.time()
    for _ in range(n):
        out = fn()
    dt = (time.time() - t0) / n
    return dt


# --- 1. attention kernel, completion forced by host fetch of a scalar ---
from lunaris_orion_tpu.ops.pallas import flash_attention as fa
B, H, N, D = 8, 8, 16384, 16
ks = jax.random.split(jax.random.PRNGKey(0), 4)
q = jax.random.normal(ks[0], (B, H, N, D), jnp.bfloat16)
k = jax.random.normal(ks[1], (B, H, N, D), jnp.bfloat16)
v = jax.random.normal(ks[2], (B, H, N, D), jnp.bfloat16)
bias = jax.random.normal(ks[3], (H, N)).astype(jnp.float32)
flops = 4 * B * H * N * N * D

fwd = jax.jit(lambda q, k, v, b, s: jnp.sum(
    fa.attention_bhnd(q + s, k, v, b).astype(jnp.float32)))
fwd(q, k, v, bias, 0.0).block_until_ready()
i = [0]
def run_fwd():
    i[0] += 1
    return float(fwd(q, k, v, bias, i[0] * 1e-6))
dt = timeit(run_fwd)
print(f"pallas attn fwd N=16384: {dt*1e3:.1f}ms = {flops/dt/1e12:.1f} TF/s", flush=True)

gradf = jax.jit(lambda q, k, v, b, s: sum(
    jnp.sum(g.astype(jnp.float32) ** 2) for g in jax.grad(
        lambda q, k, v, b: jnp.sum(fa.attention_bhnd(q + s, k, v, b).astype(jnp.float32) ** 2),
        argnums=(0, 1, 2, 3))(q, k, v, b)))
gradf(q, k, v, bias, 0.0).block_until_ready()
def run_bwd():
    i[0] += 1
    return float(gradf(q, k, v, bias, i[0] * 1e-6))
dt = timeit(run_bwd, n=3)
print(f"pallas attn fwd+bwd N=16384: {dt*1e3:.1f}ms = {3.5*flops/dt/1e12:.1f} TF/s-equiv", flush=True)

# --- 2. full hybrid step at reference defaults (128px, latent 256,
#        feature 128, 4 experts, bf16, batch 8 accum 1) ---
from lunaris_orion_tpu.config import TrainConfig
from lunaris_orion_tpu.train.state import create_state
from lunaris_orion_tpu.train.step import make_train_step

BATCH = 8
cfg = TrainConfig(batch_size=BATCH, gradient_accumulation_steps=1,
                  mixed_precision=True)
state = create_state(jax.random.PRNGKey(0), cfg)
step = jax.jit(make_train_step(cfg), donate_argnums=0)
imgs = jnp.asarray(np.random.default_rng(0).integers(
    0, 256, (1, BATCH, 128, 128, 3), dtype=np.uint8))
print("compiling hybrid step (128px defaults)...", flush=True)
t0 = time.time()
state, m = step(state, imgs)
print(f"compile+first: {time.time()-t0:.1f}s total_loss={float(m['total_loss']):.4f}", flush=True)
def run_step():
    global state
    state, m = step(state, imgs)
    return float(m["total_loss"])
dt = timeit(run_step, n=3)
print(f"hybrid step: {dt*1e3:.0f}ms = {BATCH/dt:.2f} sprites/s/chip "
      f"(teacher-dominated; reference runs this eagerly on GPU)", flush=True)
