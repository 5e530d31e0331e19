"""Training configuration system — dataclass schema + JSON load/merge/override.

Keeps the reference's JSON config surface (section and field names from
``neuralSMIL/configs/base_config.py``) so reference configs load unchanged:
sections dataset/model/optimizer/loss_curriculum/scale_trans_beta/mesh_scaling/
augmentation/joint_importance/ignored_joint_locations/ignored_joints/
multi_dataset/output/training/smal_model. Precedence: CLI overrides > JSON >
mode defaults > base defaults (reference neuralSMIL/README.md:178-184).

Unlike the reference there is NO legacy import-time global config module —
the smal_model section resolves to an explicit :class:`ModelSpec` via
``resolve_model_spec`` (replacing ``apply_smal_file_override``'s module-global
reloading, config_utils.py:238).
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Tuple


@dataclass
class DatasetConfig:
    data_path: Optional[str] = None
    train_ratio: float = 0.85
    val_ratio: float = 0.05
    test_ratio: float = 0.1
    dataset_fraction: float = 0.5
    # (the reference's from_multiview flag is superseded by auto-dispatch on
    # the HDF5 metadata — multiview files always go through the
    # single-view-from-multiview path in the single-view trainer)
    frame_convention: str = "model_centric"   # or 'camera_centric'
    expand_all_views: bool = True
    # ×10-about-root UE transform in the model forward (reference
    # smil_image_regressor.py:2672). Our replicAnt loader re-parameterizes to
    # model-at-origin with metric units (translation_factor), so this defaults
    # off; enable for datasets storing reference-style UE-unit ground truth.
    use_ue_scaling: bool = False


@dataclass
class ModelConfig:
    backbone_name: str = "vit_large_patch16_224"
    # .npz dump of torchvision/timm weights (weight_port.py dump CLI on a
    # connected machine); loaded into the backbone subtree by the trainers
    pretrained_npz: Optional[str] = None
    freeze_backbone: bool = True
    backbone_unfreeze_epoch: Optional[int] = None
    backbone_lr_multiplier: float = 0.1
    hidden_dim: int = 1024
    head_type: str = "transformer_decoder"    # 'mlp' or 'transformer_decoder'
    # NOTE: the reference schema also carries use_unity_prior / rgb_only here
    # (base_config.py:86-87) only to forward them into its SMALFitter base
    # class. Our regressor has no fitter base; the equivalents are the fitter
    # CLI flags --unity-prior / --texture (cli/optimize_to_joints.py). Unknown
    # JSON keys from reference configs are warned about and ignored.
    input_resolution: Optional[int] = None
    transformer_depth: int = 6
    transformer_heads: int = 8
    transformer_dim_head: int = 64
    transformer_mlp_dim: int = 1024
    transformer_dropout: float = 0.1
    transformer_ief_iters: int = 3
    transformer_trans_scale_factor: int = 1


@dataclass
class OptimizerConfig:
    learning_rate: float = 5e-5
    weight_decay: float = 1e-4
    gradient_clip_norm: float = 1.0
    optimizer_type: str = "adamw"
    lr_schedule: Dict[int, float] = field(default_factory=dict)

    def get_learning_rate_for_epoch(self, epoch: int) -> float:
        lr = self.learning_rate
        for e in sorted(int(k) for k in self.lr_schedule):
            if epoch >= e:
                lr = self.lr_schedule[e] if e in self.lr_schedule else self.lr_schedule[str(e)]
        return lr


DEFAULT_BASE_WEIGHTS = {
    "global_rot": 0.0,
    "joint_rot": 0.001,
    "betas": 0.0005,
    "trans": 0.0005,
    "fov": 0.001,
    "cam_rot": 0.01,
    "cam_trans": 0.01,
    "log_beta_scales": 0.0005,
    "betas_trans": 0.0005,
    "keypoint_2d": 0.1,
    "keypoint_3d": 0.25,
    "silhouette": 0.0,
    "joint_angle_regularization": 0.001,
    "limb_scale_regularization": 0.01,
    "limb_trans_regularization": 1,
}


@dataclass
class LossCurriculumConfig:
    base_weights: Dict[str, float] = field(default_factory=lambda: dict(DEFAULT_BASE_WEIGHTS))
    curriculum_stages: Dict[int, Dict[str, float]] = field(default_factory=dict)

    def weights_for_epoch(self, epoch: int) -> Dict[str, float]:
        weights = dict(self.base_weights)
        for e in sorted(int(k) for k in self.curriculum_stages):
            if epoch >= e:
                stage = self.curriculum_stages.get(e, self.curriculum_stages.get(str(e), {}))
                weights.update(stage)
        return weights


@dataclass
class ScaleTransBetaConfig:
    mode: str = "entangled_with_betas"   # 'ignore' | 'separate' | 'entangled_with_betas'
    use_pca_transformation: bool = True
    ignore_loss_weights: Dict[str, float] = field(
        default_factory=lambda: {"log_beta_scales": 0.0, "betas_trans": 0.0}
    )
    separate_loss_weights: Dict[str, float] = field(
        default_factory=lambda: {"log_beta_scales": 0.1, "betas_trans": 0.1}
    )
    entangled_loss_weights: Dict[str, float] = field(
        default_factory=lambda: {"log_beta_scales": 0.0, "betas_trans": 0.0}
    )
    separate_trans_scale_factor: float = 0.01


@dataclass
class MeshScalingConfig:
    # the reference defaults this on (base_config.py:390); we default it off
    # because our canonical-frame GT (model-at-origin, verts+trans) conflicts
    # with the scale path's center-at-root re-anchoring unless the dataset's
    # scale really is unknown — enable explicitly for such data
    allow_mesh_scaling: bool = False
    init_mesh_scale: float = 1.0
    use_log_scale: bool = True


@dataclass
class AugmentationConfig:
    enabled: bool = False
    geometric_enabled: bool = False
    color_jitter_brightness: float = 0.2
    color_jitter_contrast: float = 0.2
    color_jitter_saturation: float = 0.15
    gaussian_noise_std: float = 0.015
    gaussian_blur_prob: float = 0.3
    gaussian_blur_kernel_range: Tuple[int, int] = (3, 7)
    random_erasing_prob: float = 0.2
    random_erasing_scale_range: Tuple[float, float] = (0.02, 0.1)
    # kept 0 like the reference: crop jitter is incompatible with
    # FoVPerspectiveCameras supervision (base_config.py:403,424)
    crop_jitter_fraction: float = 0.0
    scale_jitter_range: Tuple[float, float] = (0.9, 1.1)


@dataclass
class IgnoredJointLocationsConfig:
    enabled: bool = True
    ignored_joint_names: List[str] = field(default_factory=list)


@dataclass
class JointImportanceConfig:
    enabled: bool = True
    important_joint_names: List[str] = field(default_factory=list)
    weight_multiplier: float = 10.0


@dataclass
class IgnoredJointsConfig:
    ignored_joint_names: List[str] = field(default_factory=list)
    verbose: bool = True


@dataclass
class MultiDatasetConfig:
    enabled: bool = False
    datasets: List[Dict[str, Any]] = field(default_factory=list)
    validation_split_strategy: str = "per_dataset"


@dataclass
class OutputConfig:
    # checkpoints live at <output_dir>/<checkpoint_dir>; "." keeps them at the
    # run root (the reference nests under "checkpoints/" — set it to match)
    checkpoint_dir: str = "."
    plots_dir: str = "plots"
    visualizations_dir: str = "visualizations"
    train_visualizations_dir: str = "visualizations_train"
    save_checkpoint_every: int = 10
    generate_visualizations_every: int = 10
    plot_history_every: int = 10
    num_visualization_samples: int = 10


@dataclass
class TrainingHyperparameters:
    batch_size: int = 8
    num_epochs: int = 1000
    seed: int = 1234
    rotation_representation: str = "6d"
    num_workers: int = 8
    prefetch_factor: int = 4
    # "thread" (GIL-releasing decode) or "process" (true parallelism on
    # multi-core hosts; datasets are pickle-safe by design)
    worker_mode: str = "thread"
    # decode each training sample once and serve later epochs from RAM
    # (bounded by cache_max_bytes; augmentation stays outside the cache)
    cache_decoded_samples: bool = False
    cache_max_bytes: int = 2 << 30
    # stage the ENTIRE dataset in device HBM once and assemble batches as
    # device-side gathers (DeviceDataCache) — removes the per-step host wire
    # cost on the tunneled chip. Single-process meshes, augmentation off.
    device_data_cache: bool = False
    resume_checkpoint: Optional[str] = None
    reset_ief_token_embedding: bool = False
    use_gt_camera_init: bool = True
    use_mixed_precision: bool = False
    backbone_chunk_size: Optional[int] = None
    gradient_accumulation_steps: int = 1


@dataclass
class SmalModelConfig:
    smal_file: Optional[str] = None
    shape_family: Optional[int] = None
    # legacy SMAL data file holding per-family cluster means (reference
    # config.SMAL_DATA_FILE); only needed when shape_family >= 0
    smal_data_file: Optional[str] = None


@dataclass
class MultiViewSettings:
    """Multi-view mode extras (reference configs/multiview_config.py)."""

    num_views_to_use: int = 4
    min_views_per_sample: int = 2
    view_sampling: str = "random"
    cross_attention_heads: int = 8
    cross_attention_layers: int = 2
    num_canonical_cameras: int = 18


@dataclass
class TrainingConfig:
    """Full configuration (reference BaseTrainingConfig, base_config.py:550)."""

    dataset: DatasetConfig = field(default_factory=DatasetConfig)
    model: ModelConfig = field(default_factory=ModelConfig)
    optimizer: OptimizerConfig = field(default_factory=OptimizerConfig)
    loss_curriculum: LossCurriculumConfig = field(default_factory=LossCurriculumConfig)
    scale_trans_beta: ScaleTransBetaConfig = field(default_factory=ScaleTransBetaConfig)
    mesh_scaling: MeshScalingConfig = field(default_factory=MeshScalingConfig)
    augmentation: AugmentationConfig = field(default_factory=AugmentationConfig)
    joint_importance: JointImportanceConfig = field(default_factory=JointImportanceConfig)
    ignored_joint_locations: IgnoredJointLocationsConfig = field(
        default_factory=IgnoredJointLocationsConfig
    )
    ignored_joints: IgnoredJointsConfig = field(default_factory=IgnoredJointsConfig)
    multi_dataset: MultiDatasetConfig = field(default_factory=MultiDatasetConfig)
    output: OutputConfig = field(default_factory=OutputConfig)
    training: TrainingHyperparameters = field(default_factory=TrainingHyperparameters)
    smal_model: SmalModelConfig = field(default_factory=SmalModelConfig)
    multiview: MultiViewSettings = field(default_factory=MultiViewSettings)
    mode: str = "single_view"  # 'single_view' | 'multi_view'

    # --- behaviors ---

    def validate(self):
        errors = []
        if self.training.rotation_representation not in ("6d", "axis_angle"):
            errors.append(
                f"Invalid rotation_representation '{self.training.rotation_representation}'"
            )
        if self.model.head_type not in ("mlp", "transformer_decoder"):
            errors.append(f"Invalid head_type '{self.model.head_type}'")
        if self.scale_trans_beta.mode not in ("ignore", "separate", "entangled_with_betas"):
            errors.append(f"Invalid scale_trans_beta.mode '{self.scale_trans_beta.mode}'")
        ratios = self.dataset.train_ratio + self.dataset.val_ratio + self.dataset.test_ratio
        if abs(ratios - 1.0) > 1e-6:
            errors.append(f"dataset split ratios sum to {ratios}, expected 1.0")
        if not 0 < self.dataset.dataset_fraction <= 1.0:
            errors.append("dataset_fraction must be in (0, 1]")
        if self.training.batch_size < 1:
            errors.append("batch_size must be >= 1")
        if errors:
            raise ValueError("config validation failed:\n  " + "\n  ".join(errors))
        return self

    def get_loss_weights_for_epoch(self, epoch: int) -> Dict[str, float]:
        weights = self.loss_curriculum.weights_for_epoch(epoch)
        mode_weights = {
            "ignore": self.scale_trans_beta.ignore_loss_weights,
            "separate": self.scale_trans_beta.separate_loss_weights,
            "entangled_with_betas": self.scale_trans_beta.entangled_loss_weights,
        }[self.scale_trans_beta.mode]
        weights.update(mode_weights)
        return weights

    def get_learning_rate_for_epoch(self, epoch: int) -> float:
        return self.optimizer.get_learning_rate_for_epoch(epoch)

    def to_dict(self) -> Dict[str, Any]:
        return dataclasses.asdict(self)

    def save(self, path: str):
        with open(path, "w") as f:
            json.dump(self.to_dict(), f, indent=2, default=str)

    def regressor_config(self, spec) -> "Any":
        """Resolve to a RegressorConfig / MultiViewConfig for the given ModelSpec."""
        from smilify_tpu.models.multiview import MultiViewConfig
        from smilify_tpu.models.regressor import RegressorConfig

        import jax.numpy as jnp

        common = dict(
            backbone=self.model.backbone_name,
            head_type="transformer" if self.model.head_type == "transformer_decoder" else "mlp",
            rotation_representation=self.training.rotation_representation,
            n_pose=spec.n_joints - 1,
            n_betas=spec.n_betas,
            n_joints=spec.n_joints,
            scale_trans_mode=self.scale_trans_beta.mode,
            use_pca_scale_trans=self.scale_trans_beta.use_pca_transformation,
            ief_iters=self.model.transformer_ief_iters,
            decoder_dim=self.model.transformer_heads * self.model.transformer_dim_head,
            decoder_depth=self.model.transformer_depth,
            decoder_heads=self.model.transformer_heads,
            decoder_mlp_dim=self.model.transformer_mlp_dim,
            mlp_hidden=self.model.hidden_dim,
            dropout=self.model.transformer_dropout,
            # 'separate' mode shrinks raw per-joint translation outputs
            # (reference get_scale_trans_config, training_config.py:617)
            trans_scale_factor=(
                float(self.scale_trans_beta.separate_trans_scale_factor)
                if self.scale_trans_beta.mode == "separate"
                else float(self.model.transformer_trans_scale_factor)
            ),
            # bf16 on TPU MXU unless mixed precision is disabled
            compute_dtype=jnp.bfloat16 if self.training.use_mixed_precision else jnp.float32,
            allow_mesh_scaling=self.mesh_scaling.allow_mesh_scaling,
            init_mesh_scale=self.mesh_scaling.init_mesh_scale,
            use_log_mesh_scale=self.mesh_scaling.use_log_scale,
            use_ue_scaling=self.dataset.use_ue_scaling,
        )
        if self.mode == "multi_view":
            return MultiViewConfig(
                **common,
                max_views=self.multiview.num_views_to_use,
                num_canonical_cameras=self.multiview.num_canonical_cameras,
                fusion_heads=self.multiview.cross_attention_heads,
                fusion_layers=self.multiview.cross_attention_layers,
                camera_delta_mode=self.training.use_gt_camera_init,
                backbone_chunk_size=self.training.backbone_chunk_size,
            )
        return RegressorConfig(**common)


# ---------------------------------------------------------------------------
# loading / merging / overrides
# ---------------------------------------------------------------------------


def _deep_update(dst: dict, src: dict) -> dict:
    for k, v in src.items():
        if isinstance(v, dict) and isinstance(dst.get(k), dict):
            _deep_update(dst[k], v)
        else:
            dst[k] = v
    return dst


def _coerce_section(cls, data: dict):
    """Build a dataclass from a dict, keeping only known fields (warn on rest)."""
    known = {f.name for f in dataclasses.fields(cls)}
    kept = {k: v for k, v in data.items() if k in known}
    unknown = set(data) - known
    if unknown:
        print(f"WARNING: unknown {cls.__name__} fields ignored: {sorted(unknown)}")
    obj = cls(**kept)
    # int-keyed dicts arrive from JSON with string keys
    for f in dataclasses.fields(cls):
        v = getattr(obj, f.name)
        if isinstance(v, dict) and v and all(isinstance(k, str) and k.lstrip("-").isdigit() for k in v):
            setattr(obj, f.name, {int(k): val for k, val in v.items()})
    return obj


_SECTIONS = {
    "dataset": DatasetConfig,
    "model": ModelConfig,
    "optimizer": OptimizerConfig,
    "loss_curriculum": LossCurriculumConfig,
    "scale_trans_beta": ScaleTransBetaConfig,
    "mesh_scaling": MeshScalingConfig,
    "augmentation": AugmentationConfig,
    "joint_importance": JointImportanceConfig,
    "ignored_joint_locations": IgnoredJointLocationsConfig,
    "ignored_joints": IgnoredJointsConfig,
    "multi_dataset": MultiDatasetConfig,
    "output": OutputConfig,
    "training": TrainingHyperparameters,
    "smal_model": SmalModelConfig,
    "multiview": MultiViewSettings,
}


def config_from_dict(data: Dict[str, Any]) -> TrainingConfig:
    cfg = TrainingConfig()
    for name, cls in _SECTIONS.items():
        if name in data and isinstance(data[name], dict):
            base = dataclasses.asdict(getattr(cfg, name))
            merged = _deep_update(base, data[name])
            setattr(cfg, name, _coerce_section(cls, merged))
    if "mode" in data:
        cfg.mode = data["mode"]
    return cfg


def load_config(
    json_path: Optional[str] = None,
    overrides: Optional[Dict[str, Any]] = None,
    mode: Optional[str] = None,
) -> TrainingConfig:
    """Load with precedence: overrides > JSON > defaults.

    ``overrides`` uses dotted keys ('optimizer.learning_rate': 1e-4) — the CLI
    surface of the reference trainers.
    """
    data: Dict[str, Any] = {}
    if json_path:
        with open(json_path) as f:
            data = json.load(f)
    if mode:
        data["mode"] = mode
    cfg = config_from_dict(data)
    if overrides:
        for dotted, value in overrides.items():
            parts = dotted.split(".")
            obj = cfg
            for p in parts[:-1]:
                obj = getattr(obj, p)
            setattr(obj, parts[-1], value)
    cfg.validate()
    return cfg


def resolve_joint_importance(cfg: TrainingConfig, spec):
    """Combine joint_importance (boost) + ignored_joint_locations (zero) into
    one (K,) weight array, or None when inactive (reference
    smil_image_regressor.py:2955-3031 _compute_joint_importance_weights).

    Ignored joints always end up at 0, even if also listed as important.
    Unknown joint names warn and are skipped, matching the reference."""
    import numpy as np

    name2idx = {n: i for i, n in enumerate(spec.joint_names)}
    weights = np.ones(spec.n_joints, dtype=np.float32)
    active = False

    ji = cfg.joint_importance
    if ji.enabled and ji.important_joint_names and ji.weight_multiplier != 1.0:
        for name in ji.important_joint_names:
            if name in name2idx:
                weights[name2idx[name]] = ji.weight_multiplier
                active = True
            else:
                print(f"Warning: important joint '{name}' not found in model joints")

    il = cfg.ignored_joint_locations
    if il.enabled and il.ignored_joint_names:
        for name in il.ignored_joint_names:
            if name in name2idx:
                weights[name2idx[name]] = 0.0
                active = True
            else:
                print(f"Warning: ignored joint location '{name}' not found in model joints")

    return weights if active else None


def resolve_ignored_joint_indices(cfg: TrainingConfig, joint_names) -> List[int]:
    """Indices of ``ignored_joints`` (rotation/visibility ignore) — consumed at
    preprocessing time by zeroing keypoint visibility (reference
    dataset_preprocessing.py:108-137 _setup_ignored_joints_mapping)."""
    name2idx = {n: i for i, n in enumerate(joint_names)}
    out = []
    for name in cfg.ignored_joints.ignored_joint_names:
        if name in name2idx:
            out.append(name2idx[name])
            if cfg.ignored_joints.verbose:
                print(f"Will ignore joint '{name}' (index {name2idx[name]}) during preprocessing")
        else:
            print(f"Warning: ignored joint '{name}' not found in model joint names")
    return out


def resolve_model_spec(cfg: TrainingConfig, default_path: Optional[str] = None):
    """Explicit replacement for the reference's apply_smal_file_override
    (config_utils.py:238): build the ModelSpec from the configured pkl."""
    from smilify_tpu.core.spec import load_model_spec

    path = cfg.smal_model.smal_file or default_path
    if path is None:
        raise ValueError("smal_model.smal_file not set and no default provided")
    fam = cfg.smal_model.shape_family
    return load_model_spec(
        path, align_symmetry=False,
        shape_family=-1 if fam is None else int(fam),
        smal_data_file=cfg.smal_model.smal_data_file,
    )
