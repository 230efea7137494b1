"""Single typed configuration for the whole framework.

The reference splits configuration across an editable class singleton
(``config.py``), a yacs+YAML loader (``utils/config.py`` +
``utils/defaults.yaml``), and scattered argparse blocks; it also has a
latent positional-arg bug (``train.py:207`` passes ``root_joint`` into the
dataset's ``img_size`` slot). Here everything is one frozen dataclass with
explicit keyword construction.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """DIR network hyperparameters (reference: models/dir.py:389-502, config.py)."""

    joint_num: int = 21
    num_verts: int = 778
    # Backbone pyramid channel dims (ResNet-50): c1..c4.
    backbone: str = "resnet50"
    backbone_layers: Tuple[int, int, int, int] = (3, 4, 6, 3)
    # Stem variant: "conv7" (torchvision layout) or "s2d"
    # (space-to-depth + 4x4 conv, exact weight rewrite, faster on TPU).
    backbone_stem: str = "conv7"
    backbone_dims: Tuple[int, int, int, int] = (256, 512, 1024, 2048)
    # Decoder feature dims per stage (reference fDim, models/dir.py:390).
    decoder_dim: int = 256
    # Joint token embedding dim inside each refinement stage (emd_dim).
    embed_dim: int = 128
    # Per-joint output feature dim from the interaction transformer (joint_dim).
    joint_dim: int = 64
    # Bone-splat distance thresholds per refinement stage (reference:
    # models/dir.py:395,401); the stage feature-map sizes derive from
    # the actual pyramid shapes (16/32 at 256^2 input).
    stage_distances: Tuple[float, ...] = (1.0, 2.0)
    # MANO parameter vector: 6 (root 6D) + 45 (PCA pose) + 10 (shape) + 3 (cam).
    mano_ncomps: int = 45
    mano_param_dim: int = 6 + 45 + 10 + 3
    # Transformer (STE) settings (reference: transformer/mixSTE.py:158-205).
    ste_depth: int = 4
    ste_heads: int = 4
    ste_mlp_ratio: float = 2.0
    # The reference constructs `ste_depth` blocks but executes blocks
    # 1..depth-1 (mixSTE.py:197-199). We build only the executed blocks;
    # the torch checkpoint converter drops `STEblocks.0.*`.
    gcn_layers: int = 4
    # Index of the joint used to center MANO output (0 = wrist).
    root_joint: int = 0
    # Compute dtype for the conv/transformer network path ("float32" |
    # "bfloat16"). MANO, geometry, and losses always run fp32 — they set
    # the mm-level metrics. Params are stored fp32 regardless.
    dtype: str = "float32"
    # Use the fused Pallas bone-splat kernel (TPU only; the jnp path is
    # used on CPU and under interpret-mode tests).
    use_pallas_splat: bool = False
    # Inference-only fused Pallas bottleneck for the early (HBM-bound)
    # backbone stages: BN folded into the convs, the whole block in one
    # VMEM pass (~2x the XLA block at 64^2; ops/pallas_bottleneck.py).
    # Training and stride-2 blocks always use the XLA path; parameters
    # are identical. Interpret-mode on non-TPU backends.
    fused_bottleneck_eval: bool = False
    # Inference-only int8 quantized backbone convs (ops/quant.py):
    # BN folded, weights symmetric per-channel int8, activations
    # dynamic per-tensor int8, s32 accumulation on the MXU's double
    # -rate int8 path. A serving OPTION (~1e-2 PTQ numerics), never
    # the parity default. Composes with fused_bottleneck_eval: the
    # measured-best Pallas path keeps the 64^2 layer1 blocks, int8
    # takes the compute-bound layer2+ blocks.
    quant_backbone_eval: bool = False
    # Same, for the decoder's Residual blocks (convs on existing
    # params, pre-activation BNs stay fp). Separate knob so the TPU
    # A/B isolates backbone vs decoder int8 wins.
    quant_decoder_eval: bool = False
    # Same, for the auxiliary convs outside the block stacks: the stem,
    # the AttentionPool 3x3s (2048->1024 @8^2 x2 hands — the largest
    # remaining bf16 conv mass in the int8 serving program, ~4.4 of
    # 34.5 device-ms), the RefineStage fusion_conv2, and the decoder
    # final/seg/dense head convs (serve-artifact only; the eval bench
    # DCEs the heads). Convs followed by a BN get it folded in first
    # (exact; ops/quant.py:module_quant_conv).
    quant_aux_eval: bool = False
    # Static (calibrated) activation scales instead of dynamic live
    # |max|: removes the per-conv-input reduction (the quantize fuses
    # into the producer's epilogue) at the cost of a calibration pass
    # — run the model with mutable=["quant_stats"] on representative
    # batches and merge the updates (ops/quant.py:merge_calibration).
    quant_static: bool = False
    # MANO contraction precision: "highest" (bit-parity eval) or "high"
    # (bf16x3, ~1e-6 rel err, ~2x fewer MXU passes — use for training).
    mano_precision: str = "highest"
    # Factor the 3x3 fusion conv through the rank-1 splat structure
    # (ops/splat_conv.py): exact, ~13x fewer FLOPs, never materializes
    # the (B, S, S, 2560) splat map. Same parameters either way.
    fused_splat_conv: bool = True
    # GCN adjacency built from the 21-joint hand skeleton.
    bone_num: int = 20
    # Loss weights (reference: models/dir.py:504-511,567-594).
    coord_weight: float = 10.0
    dense_weight: float = 1.0
    seg_weight: float = 0.1
    lovasz_weight: float = 0.1
    normal_weight: float = 0.1
    edge_weight: float = 1.0
    seg_class_weights: Tuple[float, float, float] = (0.1, 0.45, 0.45)
    # Scale normalization constant for xyz-space losses / embeddings.
    coord_scale: float = 0.15


@dataclasses.dataclass(frozen=True)
class DataConfig:
    """Data pipeline settings (reference: config.py, dataset/dataset_utils.py)."""

    data_dir: str = "./data/interhand2.6m"
    img_size: int = 256
    # ImageNet normalization used by the reference (dataset/interhand.py:108).
    mean: Tuple[float, float, float] = (0.485, 0.456, 0.406)
    std: Tuple[float, float, float] = (0.229, 0.224, 0.225)
    # Augmentation ranges (reference: utils/utils.py:463-473, interhand.py:172).
    aug_scale: float = 0.1
    aug_rot_deg: float = 180.0
    aug_transl_px: float = 10.0
    aug_flip: bool = True
    aug_blur_prob: float = 0.3
    aug_noise: float = 0.01
    num_workers: int = 4
    # Fused on-device preprocessing: host does JPEG decode only; MANO GT
    # synthesis + augmentation + normalization run as one jitted XLA
    # program per batch (dir_tpu.data.device_pipeline).
    device_pipeline: bool = False
    # Host-path warp backend: False = cv2 (SIMD, measured ~2x faster),
    # True = native/imageops.cpp (same constant-border semantics within
    # 1 u8 LSB; tools/bench_input_pipeline.py has the numbers).
    native_warp: bool = False
    # Serve samples from the packed decode-once mmap cache
    # (dir_tpu.data.sample_cache; build with tools/build_sample_cache.py)
    # instead of re-decoding JPEGs + re-running MANO GT synthesis every
    # epoch. Output-identical to the JPEG path; trades disk for the
    # host cores the reference spends on 16 DataLoader workers
    # (train.py:208-220).
    packed_cache: bool = False
    # Ship train batches in the lossless uint8 wire format (img/dense/
    # seg stay uint8 — the host pipeline's native dtype — and the train
    # step normalizes on device, train.steps.decode_wire8). Exact same
    # values, ~3.8x fewer host->device bytes (120 -> 32 MB at b64).
    wire8: bool = False


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Trainer settings (reference: config.py:13-31, train.py:223-243)."""

    batch_size: int = 64
    total_epochs: int = 50
    lr: float = 5e-4
    lr_scheduler: str = "cosine"  # "cosine" | "step"
    step_milestones: Tuple[int, ...] = (30,)
    step_gamma: float = 0.1
    weight_decay: float = 0.01  # torch AdamW default
    seed: int = 25
    print_every: int = 100
    draw_every: int = 100  # skeleton-overlay dumps (0 disables)
    eval_every_epochs: int = 1
    # Optimizer steps fused into one device dispatch (lax.scan over
    # stacked batches, train/steps.py): amortizes per-dispatch host/RPC
    # overhead (~8 ms/step through this box's tunnel) with identical
    # math. Host data path only; logging/vis cadence becomes per-call.
    steps_per_call: int = 1
    # Micro-batches accumulated (f32 gradient sum, averaged) into ONE
    # optimizer step (train/steps.py accum_step). batch_size is the
    # MICRO-batch size: each optimizer step consumes grad_accum
    # consecutive loader batches, for an effective batch of
    # batch_size * grad_accum. New capability over the reference, which
    # can only shrink its batch-64 config when memory-bound
    # (config.py:25). Mutually exclusive with steps_per_call > 1; host
    # data path only.
    grad_accum: int = 1
    # In-loop eval metric: "benchmark" (default) = the offline
    # apps/eval.py metric (J_regressor GT, cfg root joint, 2D + root
    # errors) — a deliberate upgrade over the reference's in-loop
    # numbers; "online" = the reference Trainer's exact metric
    # (dataset/interhand.py:262-315 — joint-9 root, GT joints straight
    # from targets), for reproducing its best-checkpoint selection.
    # Both are oracle-tested against the reference's own code.
    inloop_metric: str = "benchmark"
    output_dir: str = "./output/dir_tpu"
    checkpoint: str = ""
    continue_train: bool = False
    # Device mesh: data-parallel axis size of 0 means "all local devices".
    mesh_data_axis: int = 0
    # Compute dtype for the network (MANO + losses stay f32 for parity).
    compute_dtype: str = "float32"


@dataclasses.dataclass(frozen=True)
class Config:
    model: ModelConfig = dataclasses.field(default_factory=ModelConfig)
    data: DataConfig = dataclasses.field(default_factory=DataConfig)
    train: TrainConfig = dataclasses.field(default_factory=TrainConfig)
    mano_assets: str = "./assets/mano"


def default_config() -> Config:
    return Config()


def _to_dict(cfg) -> dict:
    return {f.name: (_to_dict(getattr(cfg, f.name))
                     if dataclasses.is_dataclass(getattr(cfg, f.name))
                     else (list(v) if isinstance(
                         (v := getattr(cfg, f.name)), tuple) else v))
            for f in dataclasses.fields(cfg)}


def _from_dict(cls, d: dict):
    kwargs = {}
    for f in dataclasses.fields(cls):
        if f.name not in d:
            continue
        v = d[f.name]
        if dataclasses.is_dataclass(f.type) or f.name in ("model", "data",
                                                          "train"):
            sub = {"model": ModelConfig, "data": DataConfig,
                   "train": TrainConfig}[f.name]
            kwargs[f.name] = _from_dict(sub, v)
        elif isinstance(v, list):
            kwargs[f.name] = tuple(v)
        else:
            kwargs[f.name] = v
    return cls(**kwargs)


def save_yaml(cfg: Config, path: str) -> None:
    """Dump the full config to YAML (replaces the reference's
    source-snapshot habit, train.py:117-122, with a reproducible record)."""
    import yaml
    with open(path, "w") as f:
        yaml.safe_dump(_to_dict(cfg), f, sort_keys=False)


def load_yaml(path: str) -> Config:
    """Load a config YAML; missing keys keep their defaults."""
    import yaml
    with open(path) as f:
        return _from_dict(Config, yaml.safe_load(f) or {})
