"""Typed configuration for models, training and data.

Mirrors the reference CLI surface (all 35 flags of
/root/reference/train_hybrid.py:1076-1133, inventoried in SURVEY.md §2.8) as
frozen dataclasses. The CLI front-ends in `lunaris_orion_tpu.cli` parse the
same argparse flags and build these.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Any, Dict, Optional, Tuple


@dataclass(frozen=True)
class VAEConfig:
    """LunarisCoreVAE architecture (reference: lunar_generate.py:84-291).

    The reference hard-codes 128x128 inputs and the 64/128/256/512 channel
    ladder; here both are configurable (small settings are used for CPU tests
    and the multi-chip dry run) with reference defaults.
    """

    latent_dim: int = 256
    image_size: int = 128
    base_channels: int = 64
    channel_mults: Tuple[int, ...] = (1, 2, 4, 8)
    gn_groups: int = 8

    @property
    def num_down(self) -> int:
        return len(self.channel_mults)

    @property
    def channels(self) -> Tuple[int, ...]:
        return tuple(self.base_channels * m for m in self.channel_mults)

    @property
    def bottleneck_hw(self) -> int:
        hw = self.image_size
        for _ in self.channel_mults:
            hw //= 2
        return hw

    @property
    def bottleneck_dim(self) -> int:
        """Flattened bottleneck size (reference 512*8*8=32768, lunar_generate.py:124)."""
        return self.channels[-1] * self.bottleneck_hw * self.bottleneck_hw


@dataclass(frozen=True)
class TeacherConfig:
    """LunarMoETeacher architecture (reference: lunar_evaluator.py:291-336).

    `extractor_dim` is the feature-extractor output width: the reference
    hard-codes it to 128 regardless of `feature_dim`
    (lunar_evaluator.py:313,340,357), so expert blocks map
    extractor_dim -> feature_dim.
    """

    num_experts: int = 4
    feature_dim: int = 128
    extractor_dim: int = 128
    extractor_stem: int = 32
    branch_dim: int = 64
    dropout_rate: float = 0.1
    rel_pos_size: int = 8
    expert_layers: int = 3
    intermediate_dim: int = 256
    embedding_dim: int = 64
    num_heads: int = 8
    layer_scale_init: float = 0.1
    image_size: int = 128
    attn_window: Optional[int] = None  # tokens attend only within windows
                                       # of this size on the flattened
                                       # token axis (corrected realization
                                       # of the reference's intended
                                       # chunked attention; None = global)

    @property
    def head_dim(self) -> int:
        assert self.feature_dim % self.num_heads == 0
        return self.feature_dim // self.num_heads


@dataclass(frozen=True)
class TrainConfig:
    """Full training-run configuration.

    Field-for-field superset of the reference argparse surface
    (train_hybrid.py:1076-1133); TPU-specific knobs are grouped at the end.
    """

    # --- data ---
    data_dir: str = ""
    output_dir: str = "output"
    resume_from: Optional[str] = None

    # --- training ---
    batch_size: int = 16
    gradient_accumulation_steps: int = 2
    chunk_size: int = 32  # parsed-for-compat; attention blocking is autotuned
    num_epochs: int = 100
    num_workers: int = 4  # parsed-for-compat; the input pipeline is device-side
    seed: int = 42
    compile: bool = False  # parsed-for-compat; every step is always jit-compiled
    mixed_precision: bool = False  # bf16 compute (no loss scaling needed on TPU)

    # --- model ---
    latent_dim: int = 256
    embedding_dim: int = 64
    feature_dim: int = 128
    num_experts: int = 4

    # --- optimizer ---
    vae_lr: float = 1e-4
    teacher_lr: float = 1e-4
    min_lr: float = 1e-6
    weight_decay: float = 0.01
    max_grad_norm: float = 1.0
    scheduler_t0: int = 10

    # --- loss weights ---
    recon_weight: float = 1.0
    kl_weight: float = 0.1
    quality_weight: float = 0.5

    # --- logging / checkpoints ---
    log_every: int = 100
    save_every: int = 1000
    sample_every: int = 500
    keep_n_checkpoints: int = 5
    early_stopping_patience: int = 7
    eval_save_freq: int = 500

    # --- RL ---
    reward_scale: float = 0.1
    semantic_weight: float = 0.5
    baseline_momentum: float = 0.9

    # --- device ---
    force_cpu: bool = False
    memory_efficient: bool = False  # parsed-for-compat (no-op in the reference too)

    # --- TPU-native extensions (not in the reference) ---
    image_size: int = 128
    data_axis: str = "data"
    model_axis: str = "model"
    mesh_shape: Optional[Tuple[int, ...]] = None  # None -> (n_devices, 1)
    use_pallas: Optional[bool] = None  # None -> auto (TPU yes, CPU no)
    attn_impl: str = "auto"     # teacher attention implementation:
                                # 'auto' (dispatch; respects use_pallas),
                                # 'full' | 'flash' | 'pallas' (force one
                                # single-device path), or cross-chip
                                # context parallelism: the token axis
                                # N = H*W shards over the mesh 'model'
                                # axis as either 'ring' (k/v rotate via
                                # ppermute — O(N/p) streaming memory) or
                                # 'allgather' (k/v gathered once, fused
                                # Pallas kernel per shard — 4-5x cheaper
                                # compute for the same wire bytes,
                                # BASELINE.md r5; prefer it when the full
                                # k/v fits HBM). Both require a mesh with
                                # model axis > 1 and replicate experts
                                # (the model axis carries sequence, not
                                # experts); see
                                # parallel/ring_attention.py.
    attn_window: int = 0        # >0: teacher attention restricted to
                                # windows of this many tokens — the
                                # CORRECTED form of the reference's
                                # intended memory-efficient chunking
                                # (its shipped chunking is defective,
                                # docs/parity.md). DEVIATION knob, off by
                                # default; cuts the teacher's dominant
                                # O(N^2) attention cost to O(N*window).
    val_fraction: float = 0.1
    prefetch_depth: int = 2
    donate_state: bool = True
    profile_steps: int = 0      # >0: capture a jax.profiler trace of steps 2..2+n
    debug_nans: bool = False    # jax.config nan-checking (slow; for debugging)
    remat: Optional[bool] = None  # None: planner picks no-remat when it fits HBM
    fast_rng: bool = True       # rbg PRNG for dropout masks (1.3x faster hybrid
                                # steps on TPU; threefry if False)
    bf16_momentum: bool = False  # bf16 Adam first moments (halves m-state
                                 # HBM traffic; v stays f32). Off =
                                 # reference-faithful f32 optimizer state.
    steps_per_call: int = 1     # optimizer steps chained inside ONE
                                # dispatched XLA call (lax.scan over K
                                # staged batches; one host->device batch
                                # transfer per call). K=1 is exactly the
                                # reference's per-step loop. K>1 decouples
                                # the host from the device — on hosts with
                                # per-call dispatch overhead (remote
                                # relays) live throughput approaches the
                                # bare-step rate. Per-step metrics are
                                # still returned (stacked) and logged at
                                # their exact steps; checkpoint/eval-grid
                                # saves land on call boundaries (at most
                                # K-1 steps late), and an epoch's trailing
                                # batches that do not fill a K-chunk are
                                # dropped (drop_last at chunk granularity).
    device_data: bool = False   # stage the train/val corpora into HBM once
                                # and build batches with on-device gathers:
                                # zero per-step host->device batch bytes
                                # (the r5 K A/B localized the live-vs-bare
                                # gap to per-batch staging). Auto-disables
                                # with a warning when corpus + compiled
                                # step don't fit the HBM budget, under
                                # multi-host, or with metadata streaming.
    hang_watchdog_secs: float = 0.0  # >0: a daemon thread exits the process
                                # (code 66) if no training heartbeat lands
                                # within this many seconds — failure
                                # detection for device transports that
                                # drop a dispatched call without raising
                                # (the host thread then blocks forever).
                                # Size >= 2x steps_per_call x step time
                                # and above checkpoint-save latency.
    cached_prompt_embeddings: bool = False
                                # the reference's INTENDED dataset-side
                                # prompt-embedding design
                                # (train_hybrid.py:157-171, never enabled
                                # there): keep a per-sample embedding table
                                # refreshed every embed_refresh_epochs and
                                # skip the per-micro-batch teacher call on
                                # the inputs (~30% step time). Off by
                                # default = live-path-faithful.
    embed_refresh_epochs: int = 1
    fuse_teacher: bool = False  # one 2B teacher forward instead of the
                                # reference's two sequential calls per
                                # micro-batch. MEASURED SLOWER on v5e
                                # (7.32 s vs 4.96 s per step at 128px
                                # defaults): the two calls already inline
                                # into one XLA program so there is no
                                # dispatch overhead to save, and fusing
                                # makes the (grad-free) first call's half
                                # of the batch pay backward FLOPs too.
                                # Kept as an option; see BASELINE.md.

    def vae_config(self) -> VAEConfig:
        return VAEConfig(latent_dim=self.latent_dim, image_size=self.image_size)

    def teacher_config(self) -> TeacherConfig:
        return TeacherConfig(
            num_experts=self.num_experts,
            feature_dim=self.feature_dim,
            embedding_dim=self.embedding_dim,
            image_size=self.image_size,
            attn_window=self.attn_window or None,
        )

    def replace(self, **kw) -> "TrainConfig":
        return dataclasses.replace(self, **kw)

    def to_dict(self) -> Dict[str, Any]:
        return dataclasses.asdict(self)

    @classmethod
    def from_dict(cls, d: Dict[str, Any]) -> "TrainConfig":
        names = {f.name for f in dataclasses.fields(cls)}
        clean = {k: v for k, v in d.items() if k in names}
        if isinstance(clean.get("mesh_shape"), list):
            clean["mesh_shape"] = tuple(clean["mesh_shape"])
        return cls(**clean)
