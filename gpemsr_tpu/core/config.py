"""Unified dataclass config system.

Replaces the reference's two ad-hoc config mechanisms (ordered-YAML + NoneDict,
`util/parse.py:8` and the seg subsystem's AttrDict, `inference_code/inference_seg.py:46`)
with one typed surface. Any YAML with the reference key layout loads into these
dataclasses; unknown keys are rejected so typos fail loudly.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Any, Sequence

import yaml


def _from_dict(cls, d):
    """Build a dataclass from a (possibly nested) dict, strictly."""
    if d is None:
        return cls()
    if not dataclasses.is_dataclass(cls):
        return d
    names = {f.name: f for f in dataclasses.fields(cls)}
    kwargs = {}
    for k, v in d.items():
        if k not in names:
            raise KeyError(f"unknown config key {k!r} for {cls.__name__}")
        f = names[k]
        sub = f.type
        if isinstance(sub, str):  # from __future__ annotations
            sub = _RESOLVE.get(sub, None)
        if sub is not None and dataclasses.is_dataclass(sub) and isinstance(v, dict):
            kwargs[k] = _from_dict(sub, v)
        else:
            kwargs[k] = v
    return cls(**kwargs)


# ---------------------------------------------------------------------------
# Prior (VQGAN) networks — key surface mirrors option/train_stage1.yml:34-56
# ---------------------------------------------------------------------------

@dataclass
class EncoderConfig:
    channel_list: Sequence[int] = (64, 64, 128, 256, 512)
    im_channel: int = 1
    num_resblock_per_scale: int = 1
    num_output_resblck: int = 3
    latent_dim: int = 512
    use_non_local: bool = True


@dataclass
class DecoderConfig:
    channel_list: Sequence[int] = (512, 256, 128, 64, 64)
    im_channel: int = 1
    num_resblock_per_scale: int = 1
    num_input_resblck: int = 3
    latent_dim: int = 512
    use_non_local: bool = True


@dataclass
class CodebookConfig:
    num_codebook_vectors: int = 1024
    latent_dim: int = 512
    beta: float = 1.0


@dataclass
class IndexerConfig:
    channel_list: Sequence[int] = (64, 64, 128, 256, 512)
    im_channel: int = 1
    num_resblock_per_scale: int = 2
    num_output_resblck: int = 3
    latent_dim: int = 512
    use_non_local: bool = True
    num_classes: int = 1024


@dataclass
class DiscriminatorConfig:
    im_channel: int = 1
    num_filters_last: int = 64
    n_layers: int = 3


@dataclass
class PriorConfig:
    """Composite config for the frozen generative prior (lrGenerator16/8,
    reference model/vqgan_indexer.py:20-48)."""
    encoder: EncoderConfig = field(default_factory=EncoderConfig)
    decoder: DecoderConfig = field(default_factory=DecoderConfig)
    codebook: CodebookConfig = field(default_factory=CodebookConfig)
    indexer: IndexerConfig = field(default_factory=IndexerConfig)
    scale: int = 16  # 16 -> Indexer keeps LR grid; 8 -> one downsample (indexer.py:30,79)


# ---------------------------------------------------------------------------
# SR network — key surface mirrors option/train_stage3_x16.yml:43-58
# ---------------------------------------------------------------------------

@dataclass
class GPEMSRConfig:
    nf: int = 64
    nframes: int = 5
    groups: int = 8               # deformable groups (model/GPEMSR.py:79)
    front_RBs: int = 5
    back_RBs: int = 10
    w_ref: bool = True
    ref_fusion_feat_RBs: int = 1
    align_mode: str = "POD"
    fusion_mode: str = "ThreeDA"
    scale: int = 16               # 16 -> '16to1', 8 -> '8to1'
    # DCN implementation crossovers (ops/dcn.py): maps with H*W <= threshold
    # take the dense one-hot MXU path (matmul backward, training scales);
    # larger maps take the Pallas windowed kernel when radius > 0 (TPU only,
    # exact-guarded with a gather fallback) else the slab-gather path.
    # Profiled on v5e at the 64x64 L1 level: slab 28.9 ms, dense 13.7 ms,
    # windowed r=4 7.5 ms per call. Threshold 512 keeps every training-crop
    # map (GT 256^2 -> LR 16^2: L1 256px, L2 64px) on the dense one-hot path
    # while full-section serving (x16: L2 32^2=1024px; x8: L2 64^2, L3 32^2)
    # takes the windowed kernel — an r4 trace measured the dense L2 einsum at
    # 2.29 ms/section, as costly as the windowed L1 at 4x the pixels.
    dcn_dense_threshold: int = 512
    # Each radius is an int (symmetric) or a [Ry, Rx] pair (anisotropic
    # window, ops/dcn_pallas.py::parse_radius) — the trained x8 checkpoint's
    # cascade probes at (6, 4), and kernel cost ~ (2Ry+1)*(2Rx+1).
    dcn_window_radius: int | tuple = 4
    # L3/L2 align against flow-guided offsets that the coarse pyramid has
    # already mostly absorbed: the trained-v3 radius probe measured per-call
    # needs of (2,2) at L3 and L2 vs (4,4) at L1 over 1024^2 serving sections
    # (scripts/radius_sweep.py --offline --dense-threshold 128). Guards fall
    # back to the exact path on any content that exceeds the window.
    dcn_coarse_window_radius: int | tuple = 2
    # The cascade DCN refines features the L1 DCN already aligned, so its
    # residual offsets are small by construction: a radius-probe of the
    # trained v3 checkpoint over 1024^2 serving sections measured per-call
    # needs of (4, 4) for L1_dcn but only (2, 2) for cas_dcn
    # (scripts/radius_sweep.py --offline). r=2 runs the cascade's windowed
    # kernel over 25 shifts instead of 81; the exactness guard still falls
    # back to the gather path on any content that exceeds it.
    dcn_cascade_window_radius: int | tuple = 2
    prior: PriorConfig = field(default_factory=PriorConfig)

    def __post_init__(self):
        # YAML pairs arrive as lists; radii ride through jit/custom_vjp as
        # static arguments and must be hashable
        for f_ in ("dcn_window_radius", "dcn_coarse_window_radius",
                   "dcn_cascade_window_radius"):
            v = getattr(self, f_)
            if isinstance(v, list):
                setattr(self, f_, tuple(int(r) for r in v))


# ---------------------------------------------------------------------------
# Data / training / eval
# ---------------------------------------------------------------------------

@dataclass
class DatasetConfig:
    name: str = "CREMIDataset"
    mode: str = "train"
    dataroot_GT: str | None = None
    dataroot_LQ: str | None = None
    chooseGTtxt: str | None = None
    N_frames: int = 5
    GT_size: int = 256
    LQ_size: int = 16
    use_flip: bool = True
    use_rot: bool = True
    use_shuffle: bool = True
    n_workers: int = 8
    batch_size: int = 8
    interval_list: Sequence[int] = (1,)
    random_reverse: bool = False


@dataclass
class TrainConfig:
    current_step: int = 0
    start_epoch: int = 0
    lr_G: float = 4e-4
    lr_D: float = 4e-4
    lr_scheme: str = "CosineAnnealingLR_Restart"
    beta1: float = 0.9
    beta2: float = 0.99
    weight_decay_G: float = 0.0
    weight_decay_D: float = 0.0
    niter: int = 480000
    T_period: Sequence[int] = (40000, 80000, 120000, 120000, 120000)
    restarts: Sequence[int] = (40000, 120000, 240000, 360000)
    restart_weights: Sequence[float] = (1, 1, 1, 1)
    eta_min: float = 1e-7
    lr_steps: Sequence[int] = ()          # MultiStepLR_Restart milestones
    lr_gamma: float = 0.5
    clear_state: bool = False
    val_freq: int = 5000
    manual_seed: int = 0
    # stage-1 GAN settings (train_stage1.yml:80-88)
    gan_start: int = 40000
    gan_loss_factor: float = 0.05
    rec_loss_factor: float = 1.0
    codebook_loss_factor: float = 10.0
    r1_reg_weight: float = 1e-4
    net_d_reg_every: int = 16
    generator_update_rate: int = 1
    # dead-code revival (beyond the reference, off by default for parity):
    # every N generator steps, codebook rows unused over the window are
    # re-seeded from current-batch encoder outputs. Counters VQ collapse on
    # short schedules / low-diversity data.
    codebook_revive_every: int = 0
    # stage-3 (train_stage3_x16.yml:103-106); CX options mirror the
    # ContextualLoss constructor surface (model/contextual.py:191-196)
    ref_loss_factor: float = 0.01
    cx_loss_type: str = "cosine"     # 'cosine' | 'L1' | 'L2'
    cx_band_width: float = 0.5
    cx_is_cobi: bool = False
    cx_weight_sp: float = 0.1
    logger_freq: int = 100


@dataclass
class ParallelConfig:
    """TPU mesh layout. The reference supports DP only (NCCL DDP,
    train_stage1.py:18-25); we additionally expose a spatial axis used by
    shard_map-tiled full-section inference."""
    data: int = -1       # -1: all devices on the data axis
    spatial: int = 1
    dtype: str = "float32"       # param (master-weight) dtype
    # forward/backward compute dtype for the jitted train steps. "bfloat16"
    # casts params+batch at the top of every loss_fn (f32 master weights and
    # optimizer state are untouched; losses/reductions stay f32). Inference
    # has its own opt-in wrapper (utils/precision.bf16_inference).
    compute_dtype: str = "float32"
    # ship train batches host->device as u8 and normalize on device (4x less
    # transfer). Exact only for PNG-derived [0,1] data under crop/flip
    # augmentation (pixels stay k/255), hence opt-in.
    u8_transfer: bool = False


@dataclass
class ExperimentConfig:
    name: str = "experiment"
    stage: int = 1
    scale: int = 16
    root: str = "./runs"
    save_checkpoint_freq: int = 5000
    keep_checkpoints: int = 10
    datasets: dict = field(default_factory=dict)   # phase -> DatasetConfig
    network: GPEMSRConfig = field(default_factory=GPEMSRConfig)
    discriminator: DiscriminatorConfig = field(default_factory=DiscriminatorConfig)
    train: TrainConfig = field(default_factory=TrainConfig)
    parallel: ParallelConfig = field(default_factory=ParallelConfig)
    pretrain: dict = field(default_factory=dict)

    def __post_init__(self):
        ds = {}
        for phase, d in (self.datasets or {}).items():
            ds[phase] = d if isinstance(d, DatasetConfig) else _from_dict(DatasetConfig, d)
        self.datasets = ds


# ---------------------------------------------------------------------------
# Segmentation-eval subsystem — mirrors inference_code/config/seg_x16_superhuman.yaml
# ---------------------------------------------------------------------------

@dataclass
class SegModelConfig:
    model_type: str = "superhuman"   # 'superhuman' | 'mala'
    input_nc: int = 1
    output_nc: int = 3
    if_sigmoid: bool = True
    filters: Sequence[int] = (28, 36, 48, 64, 80)
    upsample_mode: str = "bilinear"  # 'bilinear' | 'transposeS'
    merge_mode: str = "add"
    pad_mode: str = "zero"
    relu_mode: str = "elu"


@dataclass
class SegDataConfig:
    data_folder: str = ""
    im_path: str = "x16"
    label_file: str = "cremiC_labels.h5"
    test_split: int = 50
    if_dilate: bool = True
    widen_way: bool = True           # True: seg_widen_border, False: genSegMalis
    shift_channels: int | None = None


@dataclass
class SegConfig:
    model: SegModelConfig = field(default_factory=SegModelConfig)
    data: SegDataConfig = field(default_factory=SegDataConfig)
    waterz_threshold: float = 0.50
    discretize_queue: int = 256
    # waterz scoring function (reference selects by C++ template string,
    # inference_seg.py:149-153): 'mean' | 'max' | 'min' | 'quantile:<q>'
    # or a full waterz template string (seg/native.py::parse_scoring_function)
    scoring_function: str = "mean"


_RESOLVE = {c.__name__: c for c in (
    EncoderConfig, DecoderConfig, CodebookConfig, IndexerConfig, DiscriminatorConfig,
    PriorConfig, GPEMSRConfig, DatasetConfig, TrainConfig, ParallelConfig,
    ExperimentConfig, SegModelConfig, SegDataConfig, SegConfig,
)}


def load_yaml(path: str, cls=ExperimentConfig):
    with open(path, "r") as f:
        d = yaml.safe_load(f)
    return _from_dict(cls, d)


def to_dict(cfg) -> dict:
    return dataclasses.asdict(cfg)


def prior_config_from_reference_dict(d: dict, scale: int = 16) -> PriorConfig:
    """Adapt a reference-style `argref` dict (option/train_stage3_x16.yml:59-86)
    into a PriorConfig."""
    key = f"Indexer{scale}"
    idx = d.get(key) or d.get("Indexer16") or d.get("Indexer8") or {}
    return PriorConfig(
        encoder=_from_dict(EncoderConfig, d.get("Encoder")),
        decoder=_from_dict(DecoderConfig, d.get("Decoder")),
        codebook=_from_dict(CodebookConfig, d.get("Codebook")),
        indexer=_from_dict(IndexerConfig, idx),
        scale=scale,
    )
