#!/usr/bin/env python
"""Multi-host (DCN) executed evidence: the real code paths across 2 OS
processes.

The package's multi-host support (BatchLoader per-process slicing +
make_array_from_process_local_data staging, compute_embed_table chunk
assembly/allgather, sharded train step over a ('data','model') mesh) was
previously unit-tested with single-process mocks only — "implemented but
not executable here". This tool EXECUTES it: it launches 2 worker
processes that form a real JAX distributed cluster on the CPU backend
(`jax.distributed.initialize`, 4 virtual devices each -> 8 global, mesh
(4,2) = DP x EP like dryrun_multichip), runs the identical workload
single-process as an oracle, and verifies:

  * staged global batches are byte-identical to the deterministic global
    index order every process computes (BatchLoader multi-host contract),
  * both workers observe identical train-step metrics (the global programs
    agree), matching the single-process oracle,
  * compute_embed_table returns the same FULL table on every process,
    matching the oracle (train/loop.py cached-embedding path).

Usage:  python tools/multihost_smoke.py            # launcher (spawns all)
        python tools/multihost_smoke.py --proc I --nproc N --port P \
               --data DIR --out FILE               # internal worker mode
        python tools/multihost_smoke.py --oracle --data DIR --out FILE

Reference behavior being scaled: the torch DataLoader + single-GPU trainer
(train_hybrid.py:529-585) has no multi-node story; this is the TPU-native
DCN axis from SURVEY.md §2.7.
"""

import argparse
import json
import os
import socket
import subprocess
import sys
import tempfile
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

# Tiny workload (1-core host): 16px sprites, dryrun-scale model dims.
N_SAMPLES = 48  # 3 global batches of GLOBAL_BATCH x ACCUM per epoch
IMG = 16
GLOBAL_BATCH = 8
ACCUM = 2
STEPS = 3
SEED = 0


def _configs():
    from lunaris_orion_tpu.config import TrainConfig, VAEConfig, TeacherConfig
    vcfg = VAEConfig(latent_dim=16, image_size=IMG, base_channels=16)
    tcfg = TeacherConfig(
        num_experts=2, feature_dim=16, extractor_dim=16, extractor_stem=8,
        branch_dim=8, expert_layers=1, intermediate_dim=16, embedding_dim=8,
        num_heads=4, rel_pos_size=4, image_size=IMG)
    cfg = TrainConfig(batch_size=GLOBAL_BATCH, gradient_accumulation_steps=ACCUM,
                      latent_dim=16, feature_dim=16, num_experts=2,
                      embedding_dim=8, image_size=IMG)
    return cfg, vcfg, tcfg


def _expected_global_batches(ds, indices):
    """Replicates BatchLoader's deterministic global order (seed, epoch 0)."""
    import numpy as np
    rng = np.random.default_rng((SEED, 0))
    idx = rng.permutation(indices)
    step = GLOBAL_BATCH * ACCUM
    out = []
    for start in range(0, len(idx) - step + 1, step):
        chunk = idx[start:start + step]
        flat = ds.gather(chunk)
        out.append(flat.reshape(ACCUM, GLOBAL_BATCH, *flat.shape[1:]))
    return out


def run_workload(data_dir: str) -> dict:
    """The sharded workload — identical code for workers and the oracle;
    jax.process_count() selects the multi-host branches inside the package."""
    import jax
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from lunaris_orion_tpu.data.dataset import (SpriteDataset, BatchLoader,
                                                train_val_split)
    from lunaris_orion_tpu.parallel import (make_mesh, state_shardings,
                                            batch_sharding)
    from lunaris_orion_tpu.train.loop import compute_embed_table
    from lunaris_orion_tpu.train.state import create_state
    from lunaris_orion_tpu.train.step import make_train_step, make_embed_step

    cfg, vcfg, tcfg = _configs()
    assert jax.device_count() == 8, jax.device_count()
    mesh = make_mesh((4, 2))

    key = jax.random.PRNGKey(SEED)
    abstract = jax.eval_shape(lambda k: create_state(k, cfg, vcfg, tcfg), key)
    shards = state_shardings(abstract, mesh, num_experts=tcfg.num_experts,
                             latent_dim=vcfg.latent_dim)
    state = jax.jit(lambda k: create_state(k, cfg, vcfg, tcfg),
                    out_shardings=shards)(key)

    step = jax.jit(make_train_step(cfg, vcfg, tcfg),
                   in_shardings=(shards, batch_sharding(mesh)),
                   out_shardings=(shards, None), donate_argnums=0)

    ds = SpriteDataset(data_dir, image_size=IMG)
    tr_idx, _ = train_val_split(len(ds), 0.0, seed=SEED)
    loader = BatchLoader(ds, tr_idx, batch_size=GLOBAL_BATCH,
                         accum_steps=ACCUM, seed=SEED,
                         sharding=batch_sharding(mesh))
    expected = _expected_global_batches(ds, tr_idx)

    replicate = jax.jit(lambda x: x, out_shardings=NamedSharding(mesh, P()))

    metrics_log, staged_ok = [], True
    done = 0
    for i, batch in enumerate(loader):
        if done >= STEPS:
            break
        # Staging parity: the assembled GLOBAL array must equal the
        # deterministic global batch regardless of process count.
        host = np.asarray(replicate(batch))
        staged_ok = staged_ok and bool((host == expected[i]).all())
        state, m = step(state, batch)
        metrics_log.append({k: float(v) for k, v in m.items()})
        done += 1

    embed_shard = batch_sharding(mesh, leading_accum=False)
    embed_fn = jax.jit(make_embed_step(cfg, tcfg),
                       in_shardings=(shards, embed_shard))
    table = compute_embed_table(embed_fn, state, ds,
                                batch_size=GLOBAL_BATCH,
                                embedding_dim=tcfg.embedding_dim,
                                shard=embed_shard)

    # Context parallelism ACROSS the process boundary (r5): a mesh whose
    # 'model' axis pairs one device from each process — every CP
    # collective (the allgather path's all_gather of k/v/bias and its
    # reduce-scatter transpose) crosses the emulated DCN link, unlike the
    # default mesh where model pairs are process-local. One full hybrid
    # train step with --attn_impl allgather semantics; metrics must be
    # identical on both workers and match the single-process oracle
    # (deterministic hash dropout + global-row seeds make CP numerics
    # process-count-invariant).
    from jax.sharding import Mesh
    from lunaris_orion_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS
    devs = np.array(jax.devices())
    cp_mesh = Mesh(devs.reshape(2, 4).T, (DATA_AXIS, MODEL_AXIS))
    cp_shards = state_shardings(abstract, cp_mesh,
                                num_experts=tcfg.num_experts,
                                latent_dim=vcfg.latent_dim,
                                shard_experts=False)
    cp_state = jax.jit(lambda k: create_state(k, cfg, vcfg, tcfg),
                       out_shardings=cp_shards)(key)
    cp_batch_sh = batch_sharding(cp_mesh)
    cp_step = jax.jit(
        make_train_step(cfg, vcfg, tcfg, attn_impl="allgather",
                        cp_mesh=cp_mesh, cp_axis=MODEL_AXIS,
                        cp_batch_axis=DATA_AXIS),
        in_shardings=(cp_shards, cp_batch_sh),
        out_shardings=(cp_shards, None), donate_argnums=0)
    exp0 = expected[0]
    cp_batch = jax.make_array_from_callback(
        exp0.shape, cp_batch_sh, lambda idx: exp0[idx])
    _, cp_m = cp_step(cp_state, cp_batch)
    cp_metrics = {k: float(v) for k, v in cp_m.items()}

    return {
        "cp_allgather_metrics": cp_metrics,
        "process_count": jax.process_count(),
        "process_index": jax.process_index(),
        "devices": jax.device_count(),
        "staged_batches_match_global_order": staged_ok,
        "metrics": metrics_log,
        "embed_table_sum": float(np.abs(table).sum()),
        "embed_table_rows": table[:3].tolist(),
    }


def worker_main(args):
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = [f for f in os.environ.get("XLA_FLAGS", "").split()
             if not f.startswith("--xla_force_host_platform_device_count")]
    flags.append("--xla_force_host_platform_device_count=4")
    os.environ["XLA_FLAGS"] = " ".join(flags)
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=f"127.0.0.1:{args.port}",
        num_processes=args.nproc, process_id=args.proc)
    result = run_workload(args.data)
    Path(args.out).write_text(json.dumps(result, indent=1))
    jax.distributed.shutdown()


def oracle_main(args):
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = [f for f in os.environ.get("XLA_FLAGS", "").split()
             if not f.startswith("--xla_force_host_platform_device_count")]
    flags.append("--xla_force_host_platform_device_count=8")
    os.environ["XLA_FLAGS"] = " ".join(flags)
    import jax
    jax.config.update("jax_platforms", "cpu")
    result = run_workload(args.data)
    Path(args.out).write_text(json.dumps(result, indent=1))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def launcher() -> int:
    import numpy as np  # noqa: F401  (cheap import check before spawning)
    tmp = tempfile.mkdtemp(prefix="mh_smoke_")
    data = os.path.join(tmp, "sprites")
    # Write the dataset BEFORE any jax import in this process.
    sys.path.insert(0, str(REPO))
    from lunaris_orion_tpu.data.synthetic import write_synthetic_dataset
    write_synthetic_dataset(data, N_SAMPLES, image_size=IMG, shards=2)

    env = dict(os.environ)
    env["PYTHONPATH"] = os.pathsep.join(
        p for p in (str(REPO), env.get("PYTHONPATH", "")) if p)

    port = _free_port()
    me = os.path.abspath(__file__)
    outs = [os.path.join(tmp, f"proc{i}.json") for i in range(2)]
    oracle_out = os.path.join(tmp, "oracle.json")

    procs = [subprocess.Popen(
        [sys.executable, me, "--proc", str(i), "--nproc", "2",
         "--port", str(port), "--data", data, "--out", outs[i]],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
        for i in range(2)]
    logs = [p.communicate(timeout=900)[0] for p in procs]
    for i, p in enumerate(procs):
        if p.returncode != 0:
            print(f"worker {i} FAILED rc={p.returncode}\n{logs[i][-3000:]}")
            return 1

    rc = subprocess.run(
        [sys.executable, me, "--oracle", "--data", data, "--out", oracle_out],
        env=env, capture_output=True, text=True, timeout=900)
    if rc.returncode != 0:
        print(f"oracle FAILED rc={rc.returncode}\n{rc.stdout[-2000:]}"
              f"\n{rc.stderr[-2000:]}")
        return 1

    r0, r1 = (json.loads(Path(o).read_text()) for o in outs)
    ro = json.loads(Path(oracle_out).read_text())

    ok = True

    def check(name, cond):
        nonlocal ok
        print(f"  {'PASS' if cond else 'FAIL'}  {name}")
        ok = ok and cond

    check("2 processes x 4 devices formed an 8-device cluster",
          r0["process_count"] == 2 and r0["devices"] == 8)
    check("staged global batches match the deterministic global order "
          "(both workers + oracle)",
          r0["staged_batches_match_global_order"]
          and r1["staged_batches_match_global_order"]
          and ro["staged_batches_match_global_order"])
    check("workers observe identical step metrics",
          r0["metrics"] == r1["metrics"])

    def close(a, b, tol=2e-4):
        return all(abs(x[k] - y[k]) <= tol * max(1.0, abs(y[k]))
                   for x, y in zip(a, b) for k in y)

    check(f"worker metrics match the single-process oracle over {STEPS} "
          "steps", close(r0["metrics"], ro["metrics"]))
    check("compute_embed_table: full table identical on both workers",
          r0["embed_table_rows"] == r1["embed_table_rows"]
          and r0["embed_table_sum"] == r1["embed_table_sum"])
    ts0, tso = r0["embed_table_sum"], ro["embed_table_sum"]
    check("embed table matches the oracle",
          abs(ts0 - tso) <= 2e-4 * max(1.0, abs(tso)))
    check("CP (allgather) step over a CROSS-PROCESS model axis: workers "
          "identical", r0["cp_allgather_metrics"] == r1["cp_allgather_metrics"])
    check("CP (allgather) step matches the oracle",
          close([r0["cp_allgather_metrics"]], [ro["cp_allgather_metrics"]]))

    print(json.dumps({"multihost_smoke": "PASS" if ok else "FAIL",
                      "steps": STEPS,
                      "loss_trajectory":
                          [m["total_loss"] for m in r0["metrics"]]}))
    return 0 if ok else 1


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--proc", type=int, default=None)
    ap.add_argument("--nproc", type=int, default=2)
    ap.add_argument("--port", type=int, default=None)
    ap.add_argument("--data", type=str, default=None)
    ap.add_argument("--out", type=str, default=None)
    ap.add_argument("--oracle", action="store_true")
    args = ap.parse_args()
    if args.oracle:
        oracle_main(args)
    elif args.proc is not None:
        worker_main(args)
    else:
        sys.exit(launcher())


if __name__ == "__main__":
    main()
