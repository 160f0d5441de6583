"""Default configuration tree.

Mirrors the reference default tree (projects/TemporalStereo/config.py:8-189)
plus TPU-native additions under ``TPU`` (mesh layout, precision policy, pallas
kernel toggles) that have no reference equivalent.
"""
from __future__ import annotations

import os

from .config import ConfigNode as CN


def get_default_config() -> CN:
    _C = CN()
    _C.MAX_DISP = 192
    _C.FRAME_IDXS = [0, -1]
    _C.LOG_DIR = os.path.join("./exps/")
    _C.SEED = 43  # reference dist_train.py:15 seed_everything(43)

    # ----------------------------------------------------------------- DATA
    _C.DATA = CN()
    for phase, (h, w, bs, same_lr) in {
        "TRAIN": (512, 960, 8, False),
        "VAL": (544, 960, 4, True),
        "TEST": (544, 960, 1, True),
    }.items():
        node = CN()
        node.DATA_ROOT = os.path.join("./datasets/SceneFlow/Flyingthings3D")
        node.TYPE = "SceneFlow"
        node.ANNFILE = "./splits/flyingthings3d/train.json" if phase == "TRAIN" else "./splits/flyingthings3d/test.json"
        node.HEIGHT = h
        node.WIDTH = w
        node.USE_COMMON_INTRINSICS = True
        node.DO_SAME_LR_TRANSFORM = same_lr
        node.MEAN = (0.485, 0.456, 0.406)
        node.STD = (0.229, 0.224, 0.225)
        node.FRAME_IDXS = [0]
        node.BATCH_SIZE = bs
        node.NUM_WORKERS = 4
        # fork-based process workers (torch DataLoader worker model): decode/
        # augment/collate escape the GIL; False falls back to the thread pool
        node.PROCESS_WORKERS = True
        _C.DATA[phase] = node

    # ----------------------------------------------------------- CHECKPOINT
    _C.CHECKPOINT = CN()
    _C.CHECKPOINT.EVERY_N_TRAIN_STEPS = 0
    _C.CHECKPOINT.EVERY_N_EPOCHS = 1
    _C.CHECKPOINT.KEEP = -1  # keep all (reference save_top_k=-1)

    # -------------------------------------------------------------- TRAINER
    _C.TRAINER = CN()
    _C.TRAINER.NAME = "TemporalStereo"
    _C.TRAINER.VERSION = "default"
    _C.TRAINER.MAX_EPOCHS = 10
    _C.TRAINER.MIN_EPOCHS = 1
    _C.TRAINER.PRECISION = "bf16"  # "f32" | "bf16" (compute dtype policy)
    _C.TRAINER.GRADIENT_CLIP_VAL = 0.1
    _C.TRAINER.LOG_EVERY_N_STEPS = 50
    _C.TRAINER.FLUSH_LOGS_EVERY_N_STEPS = 100
    # train-batch image dumps every N steps (reference hard-codes 2000,
    # TemporalStereo.py:165); 0 disables
    _C.TRAINER.VIS_EVERY_N_TRAIN_STEPS = 2000
    _C.TRAINER.CHECK_VAL_EVERY_N_EPOCHS = 1
    _C.TRAINER.RESUME_FROM_CHECKPOINT = ""
    _C.TRAINER.LOAD_FROM_CHECKPOINT = ""
    _C.TRAINER.FAST_DEV_RUN = False
    _C.TRAINER.SWA = CN()
    _C.TRAINER.SWA.ENABLED = True
    _C.TRAINER.SWA.START_FRACTION = 0.8  # reference dist_train.py:68
    _C.TRAINER.SWA.LR = 0.0  # 0 => keep scheduler lr
    # batches of train-mode forward passes re-estimating BN stats after the
    # final weight swap (torch swa_utils.update_bn semantics)
    _C.TRAINER.SWA.BN_UPDATE_STEPS = 50

    # ------------------------------------------------------------------ TPU
    _C.TPU = CN()
    _C.TPU.MESH = CN()
    _C.TPU.MESH.DATA = -1       # -1 => all devices on the data axis
    _C.TPU.MESH.AXIS_NAMES = ("data",)
    # pallas kernels: off by default — measured net-negative in-model on v5e
    # (pallas_call is a fusion barrier; see ops/cost.py:_use_pallas_cost)
    _C.TPU.USE_PALLAS = False
    _C.TPU.REMAT = False        # jax.checkpoint the per-frame forward
    _C.TPU.DONATE = True        # donate train-state buffers to the step fn
    # batches enqueued to the device ahead of the running step (async H2D
    # double-buffering, parallel/mesh.py:prefetch_to_device); 0 disables
    _C.TPU.HOST_PREFETCH = 2

    # ------------------------------------------------------------ OPTIMIZER
    _C.OPTIMIZER = CN()
    _C.OPTIMIZER.TYPE = "RMSProp"
    _C.OPTIMIZER.RMSPROP = CN()
    _C.OPTIMIZER.RMSPROP.LR = 1e-3
    _C.OPTIMIZER.ADAM = CN()
    _C.OPTIMIZER.ADAM.LR = 1e-3
    _C.OPTIMIZER.ADAM.BETAS = (0.9, 0.999)
    _C.OPTIMIZER.ADAMW = CN()
    _C.OPTIMIZER.ADAMW.LR = 1e-3
    _C.OPTIMIZER.ADAMW.BETAS = (0.9, 0.999)
    _C.OPTIMIZER.ADAMW.WEIGHT_DECAY = 1e-4

    _C.SCHEDULER = CN()
    _C.SCHEDULER.TYPE = "MultiStepLR"
    _C.SCHEDULER.STEP_LR = CN()
    _C.SCHEDULER.STEP_LR.STEP_SIZE = 10
    _C.SCHEDULER.STEP_LR.GAMMA = 0.1
    _C.SCHEDULER.MULTI_STEP_LR = CN()
    _C.SCHEDULER.MULTI_STEP_LR.MILESTONES = [10, 20]
    _C.SCHEDULER.MULTI_STEP_LR.GAMMA = 0.1
    _C.SCHEDULER.EXPONENTIAL_LR = CN()
    _C.SCHEDULER.EXPONENTIAL_LR.GAMMA = 0.9

    # ---------------------------------------------------------------- MODEL
    _C.MODEL = CN()
    _C.MODEL.WITH_PREVIOUS = False
    _C.MODEL.PREVIOUS_WITH_GRADIENT = False
    _C.MODEL.WITH_FLOW = False
    _C.MODEL.USE_LOCAL_MAP = False
    _C.MODEL.USE_PAST_COST = False
    _C.MODEL.LOCAL_MAP_SIZE = 0
    _C.MODEL.VIS_FEATURE = False

    _C.MODEL.BACKBONE = CN()
    _C.MODEL.BACKBONE.NAME = "TEMPORALSTEREO"
    _C.MODEL.BACKBONE.VARIANT = "v2s"  # "v2s" | "tiny" (tests/dry-runs)
    _C.MODEL.BACKBONE.IN_PLANES = 3
    _C.MODEL.BACKBONE.MEMORY_PERCENT = 1 / 8
    _C.MODEL.BACKBONE.NORM = "BN"
    _C.MODEL.BACKBONE.ACTIVATION = "SiLU"
    _C.MODEL.BACKBONE.PRETRAINED = ""  # path to imported weight file (msgpack / npz)

    _C.MODEL.AGGREGATION = CN()
    _C.MODEL.AGGREGATION.NAME = "TEMPORALSTEREO"
    _C.MODEL.AGGREGATION.NORM = "BN"
    _C.MODEL.AGGREGATION.ACTIVATION = "SiLU"
    for stage, (planes, c, nsample) in {
        "COARSE": (256, 32, 12),
        "FINE": (128, 16, 5),
        "PRECISE": (64, 8, 5),
    }.items():
        node = CN()
        node.IN_PLANES = planes
        node.C = c
        node.NUM_SAMPLE = nsample
        node.DELTA = 1.0
        node.BLOCK_COST_SCALE = 3
        node.TOPK = 2
        node.SPATIAL_FUSION = True  # ignored by PRECISE
        node.NORM = "BN3d"
        node.ACTIVATION = "SiLU"
        _C.MODEL.AGGREGATION[stage] = node

    _C.MODEL.PREDICTION = CN()
    _C.MODEL.PREDICTION.NAME = "SOFTARGMIN"
    _C.MODEL.PREDICTION.TEMPERATURE = 1.0
    _C.MODEL.PREDICTION.NORMALIZE = True

    # --------------------------------------------------------------- LOSSES
    _C.MODEL.LOSSES = CN()
    _C.MODEL.LOSSES.WARSSERSTEIN_DISTANCE_LOSS = CN()
    _C.MODEL.LOSSES.WARSSERSTEIN_DISTANCE_LOSS.MAX_DISP = 192
    _C.MODEL.LOSSES.WARSSERSTEIN_DISTANCE_LOSS.START_DISP = 0
    _C.MODEL.LOSSES.WARSSERSTEIN_DISTANCE_LOSS.GLOBAL_WEIGHT = 1.0
    _C.MODEL.LOSSES.WARSSERSTEIN_DISTANCE_LOSS.WEIGHTS = [1.2, 0.3, 0.1]
    _C.MODEL.LOSSES.WARSSERSTEIN_DISTANCE_LOSS.SPARSE = False

    _C.MODEL.LOSSES.SMOOTH_L1_LOSS = CN()
    _C.MODEL.LOSSES.SMOOTH_L1_LOSS.MAX_DISP = 192
    _C.MODEL.LOSSES.SMOOTH_L1_LOSS.START_DISP = 0
    _C.MODEL.LOSSES.SMOOTH_L1_LOSS.GLOBAL_WEIGHT = 1.0
    # 4 levels: [full, 1/4-refined, 1/4, 1/8] (reference sceneflow.yaml)
    _C.MODEL.LOSSES.SMOOTH_L1_LOSS.WEIGHTS = [2.0, 1.0, 0.7, 0.5]
    _C.MODEL.LOSSES.SMOOTH_L1_LOSS.SPARSE = False

    # ------------------------------------------------------------------ VAL
    _C.VAL = CN()
    _C.VAL.VIS_INTERVAL = 8
    _C.VAL.VIS_BATCH_INDEX = 4
    _C.VAL.LOWERBOUND = 0
    _C.VAL.UPPERBOUND = 192
    _C.VAL.DO_OCCLUSION_EVALUATION = True
    _C.VAL.EVAL_DISPARITY_IDS = [0, 1, 2, 3]

    return _C


def get_cfg(config_file: str = "", opts: list | None = None) -> CN:
    """Build a frozen config: defaults <- YAML overlay <- CLI opts.

    Mirrors reference get_cfg (projects/TemporalStereo/config.py:205-211).
    """
    cfg = get_default_config()
    if config_file:
        cfg.merge_from_file(config_file)
    if opts:
        cfg.merge_from_list(list(opts))
    cfg.freeze()
    return cfg
