"""Training-tier tests: schedule parity, hybrid step semantics, overfit smoke."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from lunaris_orion_tpu.config import TrainConfig, VAEConfig, TeacherConfig
from lunaris_orion_tpu.train.schedule import cosine_warm_restarts
from lunaris_orion_tpu.train.state import create_state
from lunaris_orion_tpu.train.step import make_train_step, make_eval_step


TINY_VCFG = VAEConfig(latent_dim=16, image_size=16, base_channels=16)
TINY_TCFG = TeacherConfig(
    num_experts=2, feature_dim=16, extractor_dim=16, extractor_stem=8,
    branch_dim=8, expert_layers=1, intermediate_dim=16, embedding_dim=8,
    num_heads=4, rel_pos_size=4, image_size=16)
TINY_CFG = TrainConfig(batch_size=4, gradient_accumulation_steps=2,
                       latent_dim=16, feature_dim=16, num_experts=2,
                       embedding_dim=8, image_size=16, scheduler_t0=10,
                       vae_lr=1e-3, teacher_lr=1e-3)


class TestSchedule:
    @pytest.mark.parametrize("t0,t_mult", [(10, 2), (7, 2), (10, 1)])
    def test_matches_torch_warm_restarts(self, t0, t_mult):
        sched = cosine_warm_restarts(1e-3, t0, eta_min=1e-6, t_mult=t_mult)
        p = torch.nn.Parameter(torch.zeros(1))
        opt = torch.optim.SGD([p], lr=1e-3)
        tsched = torch.optim.lr_scheduler.CosineAnnealingWarmRestarts(
            opt, T_0=t0, T_mult=t_mult, eta_min=1e-6)
        ours, theirs = [], []
        for step in range(100):
            ours.append(float(sched(step)))
            theirs.append(tsched.get_last_lr()[0])
            opt.step()
            tsched.step()
        np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-9)


def _fake_batch(key, cfg, accum=None):
    a = accum if accum is not None else cfg.gradient_accumulation_steps
    return jax.random.randint(
        key, (a, cfg.batch_size, cfg.image_size, cfg.image_size, 3),
        0, 256).astype(jnp.uint8)


@pytest.mark.slow
class TestTrainStep:
    @pytest.fixture(scope="class")
    def setup(self):
        key = jax.random.PRNGKey(0)
        state = create_state(key, TINY_CFG, TINY_VCFG, TINY_TCFG)
        # no donation here: the fixture state is reused across tests
        step = jax.jit(make_train_step(TINY_CFG, TINY_VCFG, TINY_TCFG))
        return state, step

    def test_metrics_complete(self, setup):
        state, step = setup
        batch = _fake_batch(jax.random.PRNGKey(1), TINY_CFG)
        state2, metrics = step(state, batch)
        expected = {"recon_loss", "kl_loss", "quality_loss", "pg_loss",
                    "semantic_reward", "quality_reward", "baseline",
                    "advantage", "vae_loss", "teacher_loss", "total_loss",
                    "quality_scores"}
        assert expected == set(metrics)  # the reference's 13-metric dict
        for k, v in metrics.items():
            assert np.isfinite(float(v)), k
        assert int(state2.step) == 1
        assert bool(state2.baseline_initialized)

    def test_params_update_and_stats_advance(self, setup):
        state, step = setup
        batch = _fake_batch(jax.random.PRNGKey(2), TINY_CFG)
        s2, _ = step(state, batch)
        dv = [not np.allclose(np.asarray(a), np.asarray(b))
              for a, b in zip(jax.tree_util.tree_leaves(state.vae_params),
                              jax.tree_util.tree_leaves(s2.vae_params))]
        dt = [not np.allclose(np.asarray(a), np.asarray(b))
              for a, b in zip(jax.tree_util.tree_leaves(state.teacher_params),
                              jax.tree_util.tree_leaves(s2.teacher_params))]
        assert all(dv), "every VAE param should move"
        # Faithful-to-reference: semantic/style/prompt heads get no gradient
        # (teacher_loss is quality-only and rewards are detached,
        # train_hybrid.py:891-892), so ~20% of leaves only see weight decay.
        assert sum(dt) > len(dt) * 0.6, "teacher params should move"
        ds = [not np.allclose(np.asarray(a), np.asarray(b))
              for a, b in zip(jax.tree_util.tree_leaves(state.teacher_stats),
                              jax.tree_util.tree_leaves(s2.teacher_stats))]
        assert any(ds), "BN stats should advance"

    def test_overfit_decreases_recon(self):
        """A few steps on one repeated batch must reduce recon loss."""
        cfg = TINY_CFG.replace(vae_lr=3e-3, teacher_lr=1e-4,
                               gradient_accumulation_steps=1, scheduler_t0=1000)
        state = create_state(jax.random.PRNGKey(0), cfg, TINY_VCFG, TINY_TCFG)
        step = jax.jit(make_train_step(cfg, TINY_VCFG, TINY_TCFG))
        batch = _fake_batch(jax.random.PRNGKey(3), cfg, accum=1)
        first = last = None
        for i in range(12):
            state, m = step(state, batch)
            if first is None:
                first = float(m["recon_loss"])
            last = float(m["recon_loss"])
        assert last < first * 0.9, (first, last)

    def test_eval_step(self, setup):
        state, _ = setup
        ev = jax.jit(make_eval_step(TINY_CFG, TINY_VCFG, TINY_TCFG))
        batch = _fake_batch(jax.random.PRNGKey(4), TINY_CFG)[0]
        m = ev(state, batch)
        assert {"val_recon_loss", "val_kl_loss", "val_loss",
                "val_quality"} == set(m)
        # deterministic: same batch twice -> identical loss
        m2 = ev(state, batch)
        assert float(m["val_loss"]) == float(m2["val_loss"])

    def test_fused_teacher_matches_unfused_closely(self):
        """fuse_teacher=True (one 2B teacher forward) vs False (the
        reference-faithful two sequential calls): the VAE path is untouched
        so recon/kl match exactly; teacher-derived metrics sit in a loose
        band (joint-BN + dropout-mask deviation, train/step.py docstring)."""
        batch = _fake_batch(jax.random.PRNGKey(6), TINY_CFG)
        out = {}
        for fuse in (True, False):
            cfg = TINY_CFG.replace(fuse_teacher=fuse)
            state = create_state(jax.random.PRNGKey(0), cfg,
                                 TINY_VCFG, TINY_TCFG)
            step = jax.jit(make_train_step(cfg, TINY_VCFG, TINY_TCFG))
            _, m = step(state, batch)
            out[fuse] = m
        np.testing.assert_allclose(float(out[True]["recon_loss"]),
                                   float(out[False]["recon_loss"]), rtol=1e-5)
        np.testing.assert_allclose(float(out[True]["kl_loss"]),
                                   float(out[False]["kl_loss"]), rtol=1e-5)
        for k in ("quality_reward", "total_loss"):
            a, b = float(out[True][k]), float(out[False][k])
            assert np.isfinite(a) and np.isfinite(b)
            assert abs(a - b) < 0.25, (k, a, b)
        # semantic_reward = sigmoid(head) * cosine(embeddings); at random
        # init the cosine is near-random in [-1,1] and the modes use
        # different dropout masks — only range/finiteness is meaningful.
        for fuse in (True, False):
            s = float(out[fuse]["semantic_reward"])
            assert np.isfinite(s) and -1.0 <= s <= 1.0

    def test_cached_prompt_embeddings_step(self):
        """cached_prompt_embeddings: the step takes a per-batch embedding
        table slice instead of running the teacher on inputs; the recon/kl
        path is untouched and the semantic reward responds to the given
        embeddings (the reference's intended dataset-side hook,
        train_hybrid.py:157-171)."""
        from lunaris_orion_tpu.train.step import make_embed_step
        cfg = TINY_CFG.replace(cached_prompt_embeddings=True)
        state = create_state(jax.random.PRNGKey(0), cfg,
                             TINY_VCFG, TINY_TCFG)
        step = jax.jit(make_train_step(cfg, TINY_VCFG, TINY_TCFG))
        batch = _fake_batch(jax.random.PRNGKey(6), cfg)
        embed = jax.jit(make_embed_step(cfg, TINY_TCFG))
        pe = jnp.stack([embed(state, b) for b in batch])  # [A, mb, emb]
        assert pe.shape == (cfg.gradient_accumulation_steps,
                            cfg.batch_size, TINY_TCFG.embedding_dim)
        _, m = step(state, batch, pe)
        for k, v in m.items():
            assert np.isfinite(float(v)), k
        # reference (unfused, live-path) step on the same batch: recon/kl
        # must match exactly — the VAE path is identical.
        cfg2 = TINY_CFG.replace(fuse_teacher=False)
        state2 = create_state(jax.random.PRNGKey(0), cfg2,
                              TINY_VCFG, TINY_TCFG)
        step2 = jax.jit(make_train_step(cfg2, TINY_VCFG, TINY_TCFG))
        _, m2 = step2(state2, batch)
        np.testing.assert_allclose(float(m["recon_loss"]),
                                   float(m2["recon_loss"]), rtol=1e-5)
        # different embeddings -> different semantic reward (it is consumed)
        _, m3 = step(state, batch, -pe)
        assert abs(float(m["semantic_reward"])
                   - float(m3["semantic_reward"])) > 1e-6

    def test_bf16_mixed_precision(self):
        cfg = TINY_CFG.replace(mixed_precision=True)
        state = create_state(jax.random.PRNGKey(0), cfg, TINY_VCFG, TINY_TCFG)
        step = jax.jit(make_train_step(cfg, TINY_VCFG, TINY_TCFG))
        _, m = step(state, _fake_batch(jax.random.PRNGKey(5), cfg))
        assert np.isfinite(float(m["total_loss"]))
        # params remain f32 master copies
        for leaf in jax.tree_util.tree_leaves(state.vae_params):
            assert leaf.dtype == jnp.float32


class TestHBMFallback:
    """Regression for r1's config-2 TPU-worker crash: memory_stats() is
    hidden by some transports, so the static planner compared against None
    and every plan 'fit' vacuously (utils/hbm.py)."""

    def test_known_tpu_kind(self):
        from lunaris_orion_tpu.utils.hbm import device_hbm_bytes

        class Dev:
            platform = "tpu"
            device_kind = "TPU v5 lite"

            def memory_stats(self):
                return None

        assert device_hbm_bytes(Dev()) == 16 * 2**30

    def test_stats_win_when_present(self):
        from lunaris_orion_tpu.utils.hbm import device_hbm_bytes

        class Dev:
            platform = "tpu"
            device_kind = "TPU v5 lite"

            def memory_stats(self):
                return {"bytes_limit": 123456789}

        assert device_hbm_bytes(Dev()) == 123456789

    def test_cpu_unknown(self):
        from lunaris_orion_tpu.utils.hbm import device_hbm_bytes

        class Dev:
            platform = "cpu"
            device_kind = "cpu"

            def memory_stats(self):
                return None

        assert device_hbm_bytes(Dev()) is None

    def test_env_override(self, monkeypatch):
        from lunaris_orion_tpu.utils.hbm import device_hbm_bytes
        monkeypatch.setenv("LUNARIS_HBM_GB", "2.5")

        class Dev:
            platform = "cpu"

        assert device_hbm_bytes(Dev()) == int(2.5 * 2**30)


@pytest.mark.slow
class TestBf16Momentum:
    def test_trains_and_momenta_are_bf16(self):
        cfg = TINY_CFG.replace(bf16_momentum=True, vae_lr=3e-3,
                               gradient_accumulation_steps=1,
                               scheduler_t0=1000)
        state = create_state(jax.random.PRNGKey(0), cfg,
                             TINY_VCFG, TINY_TCFG)
        mu_leaves = jax.tree_util.tree_leaves(state.vae_opt[1][0].mu)
        assert all(l.dtype == jnp.bfloat16 for l in mu_leaves)
        step = jax.jit(make_train_step(cfg, TINY_VCFG, TINY_TCFG))
        batch = _fake_batch(jax.random.PRNGKey(3), cfg, accum=1)
        first = last = None
        for i in range(10):
            state, m = step(state, batch)
            if first is None:
                first = float(m["recon_loss"])
            last = float(m["recon_loss"])
        assert np.isfinite(last) and last < first, (first, last)


class TestHangWatchdog:
    """Failure detection for wedged device transports (loop.py HangWatchdog):
    the reference trainer has no equivalent — a dropped CUDA call blocks
    train_hybrid.py forever. Pure host-thread logic, no device needed."""

    def _make(self, timeout, fired):
        import logging
        from lunaris_orion_tpu.train.loop import HangWatchdog
        return HangWatchdog(timeout, logging.getLogger("test-watchdog"),
                            on_hang=lambda: fired.set(), poll_s=0.02)

    def test_fires_without_heartbeat(self):
        import threading
        fired = threading.Event()
        wd = self._make(0.1, fired)
        wd.start()
        assert fired.wait(2.0), "watchdog never fired without heartbeats"
        wd.stop()

    def test_heartbeats_hold_it_off_and_stop_disarms(self):
        import threading
        import time as _time
        fired = threading.Event()
        wd = self._make(0.3, fired)
        wd.start()
        for _ in range(10):          # beat for ~0.5 s > timeout
            wd.beat()
            _time.sleep(0.05)
        assert not fired.is_set(), "fired despite live heartbeats"
        wd.stop()
        _time.sleep(0.5)             # past timeout after stop()
        assert not fired.is_set(), "fired after stop()"

    def test_disabled_when_zero(self):
        import threading
        fired = threading.Event()
        wd = self._make(0.0, fired)
        wd.start()
        assert wd._thread is None    # timeout<=0: never armed

    def test_config_flag_plumbed(self):
        from lunaris_orion_tpu.cli.train import build_parser, config_from_args
        args = build_parser().parse_args(
            ["--data_dir", "x", "--hang_watchdog_secs", "120"])
        assert config_from_args(args).hang_watchdog_secs == 120.0


class TestSuperviseTrain:
    """Supervisor restart policy (tools/supervise_train.py): exit-66
    relaunches with --resume_from <output_dir>/checkpoints; other exit
    codes propagate. subprocess is stubbed — policy only, no training."""

    def _load(self):
        import importlib.util
        from pathlib import Path
        p = Path(__file__).resolve().parent.parent / "tools" / "supervise_train.py"
        spec = importlib.util.spec_from_file_location("supervise_train", p)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        return mod

    def test_restarts_on_hang_exit_with_resume(self, monkeypatch):
        st = self._load()
        calls = []

        def fake_call(cmd):
            calls.append(cmd)
            return 66 if len(calls) == 1 else 0

        monkeypatch.setattr(st.subprocess, "call", fake_call)
        monkeypatch.setattr(st.time, "sleep", lambda s: None)
        rc = st.main(["--backoff_secs", "0", "--",
                      "--data_dir", "d", "--output_dir", "out/x",
                      "--hang_watchdog_secs", "300"])
        assert rc == 0 and len(calls) == 2
        assert calls[1][-2:] == ["--resume_from", "out/x/checkpoints"]
        # first launch untouched
        assert "--resume_from" not in calls[0]

    def test_second_restart_does_not_stack_resume_flags(self, monkeypatch):
        st = self._load()
        calls = []

        def fake_call(cmd):
            calls.append(cmd)
            return 66 if len(calls) <= 2 else 0

        monkeypatch.setattr(st.subprocess, "call", fake_call)
        monkeypatch.setattr(st.time, "sleep", lambda s: None)
        rc = st.main(["--", "--data_dir", "d", "--output_dir", "o",
                      "--resume_from", "stale/ckpt",
                      "--hang_watchdog_secs", "60"])
        assert rc == 0 and len(calls) == 3
        assert calls[2].count("--resume_from") == 1
        assert calls[2][-1] == "o/checkpoints"

    def test_real_errors_propagate_without_restart(self, monkeypatch):
        st = self._load()
        calls = []
        monkeypatch.setattr(st.subprocess, "call",
                            lambda cmd: calls.append(cmd) or 2)
        rc = st.main(["--", "--data_dir", "d", "--output_dir", "o",
                      "--hang_watchdog_secs", "60"])
        assert rc == 2 and len(calls) == 1

    def test_gives_up_after_max_restarts(self, monkeypatch):
        st = self._load()
        calls = []
        monkeypatch.setattr(st.subprocess, "call",
                            lambda cmd: calls.append(cmd) or 66)
        monkeypatch.setattr(st.time, "sleep", lambda s: None)
        rc = st.main(["--max_restarts", "2", "--",
                      "--data_dir", "d", "--output_dir", "o",
                      "--hang_watchdog_secs", "60"])
        assert rc == 66 and len(calls) == 3

    def test_requires_watchdog_armed(self):
        import pytest
        st = self._load()
        with pytest.raises(SystemExit):
            st.main(["--", "--data_dir", "d", "--output_dir", "o"])
