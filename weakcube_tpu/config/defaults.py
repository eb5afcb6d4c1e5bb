"""Default configuration tree.

Key-compatible with the reference: the detectron2 defaults the codebase
actually reads, plus every Cube R-CNN extension added by
cubercnn/config/config.py:4-187. The reference's configs/*.yaml files merge
cleanly on top of this tree (verified by tests/test_config.py).
"""
from .config import CfgNode


def build_default_cfg() -> CfgNode:
    c = CfgNode()

    c.VERSION = 2
    c.OUTPUT_DIR = "./output"
    c.SEED = -1
    c.VIS_PERIOD = 0

    # ---- model ----------------------------------------------------------
    c.MODEL = CfgNode()
    c.MODEL.DEVICE = "tpu"
    c.MODEL.META_ARCHITECTURE = "RCNN3D"
    c.MODEL.WEIGHTS = ""
    c.MODEL.WEIGHTS_PRETRAIN = ""
    c.MODEL.MASK_ON = False
    c.MODEL.KEYPOINT_ON = False
    c.MODEL.LOAD_PROPOSALS = False
    c.MODEL.PIXEL_MEAN = [103.530, 116.280, 123.675]
    c.MODEL.PIXEL_STD = [57.375, 57.120, 58.395]
    c.MODEL.STABILIZE = 0.01
    c.MODEL.USE_BN = True
    c.MODEL.DEPTH_ON = False

    c.MODEL.BACKBONE = CfgNode()
    c.MODEL.BACKBONE.NAME = "build_dla_from_vision_fpn_backbone"
    c.MODEL.BACKBONE.FREEZE_AT = 0

    c.MODEL.FPN = CfgNode()
    c.MODEL.FPN.IN_FEATURES = ["p2", "p3", "p4", "p5", "p6"]
    c.MODEL.FPN.OUT_CHANNELS = 256
    c.MODEL.FPN.NORM = ""
    c.MODEL.FPN.FUSE_TYPE = "sum"

    c.MODEL.DLA = CfgNode()
    c.MODEL.DLA.TYPE = "dla34"
    c.MODEL.DLA.TRICKS = False

    c.MODEL.RESNETS = CfgNode()
    c.MODEL.RESNETS.DEPTH = 50
    c.MODEL.RESNETS.TORCHVISION = True
    c.MODEL.RESNETS.OUT_FEATURES = ["res4"]

    c.MODEL.ANCHOR_GENERATOR = CfgNode()
    c.MODEL.ANCHOR_GENERATOR.SIZES = [[32], [64], [128], [256], [512]]
    c.MODEL.ANCHOR_GENERATOR.ASPECT_RATIOS = [[0.5, 1.0, 2.0]]
    c.MODEL.ANCHOR_GENERATOR.OFFSET = 0.0

    c.MODEL.PROPOSAL_GENERATOR = CfgNode()
    c.MODEL.PROPOSAL_GENERATOR.NAME = "RPNWithIgnore"
    c.MODEL.PROPOSAL_GENERATOR.MIN_SIZE = 0

    c.MODEL.RPN = CfgNode()
    c.MODEL.RPN.HEAD_NAME = "StandardRPNHead"
    c.MODEL.RPN.IN_FEATURES = ["p2", "p3", "p4", "p5", "p6"]
    c.MODEL.RPN.IOU_THRESHOLDS = [0.3, 0.7]
    c.MODEL.RPN.IOU_LABELS = [0, -1, 1]
    c.MODEL.RPN.BATCH_SIZE_PER_IMAGE = 256
    c.MODEL.RPN.POSITIVE_FRACTION = 0.5
    c.MODEL.RPN.BBOX_REG_LOSS_TYPE = "smooth_l1"
    c.MODEL.RPN.BBOX_REG_LOSS_WEIGHT = 1.0
    c.MODEL.RPN.BBOX_REG_WEIGHTS = (1.0, 1.0, 1.0, 1.0)
    c.MODEL.RPN.SMOOTH_L1_BETA = 0.0
    c.MODEL.RPN.LOSS_WEIGHT = 1.0
    c.MODEL.RPN.PRE_NMS_TOPK_TRAIN = 2000
    c.MODEL.RPN.PRE_NMS_TOPK_TEST = 1000
    c.MODEL.RPN.POST_NMS_TOPK_TRAIN = 1000
    c.MODEL.RPN.POST_NMS_TOPK_TEST = 1000
    c.MODEL.RPN.NMS_THRESH = 0.7
    c.MODEL.RPN.BOUNDARY_THRESH = -1
    c.MODEL.RPN.CONV_DIMS = [-1]
    c.MODEL.RPN.IGNORE_THRESHOLD = 0.5
    c.MODEL.RPN.OBJECTNESS_UNCERTAINTY = "IoUness"

    c.MODEL.ROI_HEADS = CfgNode()
    c.MODEL.ROI_HEADS.NAME = "ROIHeads3D"
    c.MODEL.ROI_HEADS.NUM_CLASSES = 43
    c.MODEL.ROI_HEADS.IN_FEATURES = ["p2", "p3", "p4", "p5", "p6"]
    c.MODEL.ROI_HEADS.IOU_THRESHOLDS = [0.5]
    c.MODEL.ROI_HEADS.IOU_LABELS = [0, 1]
    c.MODEL.ROI_HEADS.BATCH_SIZE_PER_IMAGE = 512
    c.MODEL.ROI_HEADS.POSITIVE_FRACTION = 0.25
    c.MODEL.ROI_HEADS.SCORE_THRESH_TEST = 0.05
    c.MODEL.ROI_HEADS.NMS_THRESH_TEST = 0.5
    c.MODEL.ROI_HEADS.PROPOSAL_APPEND_GT = True

    c.MODEL.ROI_BOX_HEAD = CfgNode()
    c.MODEL.ROI_BOX_HEAD.NAME = "FastRCNNConvFCHead"
    c.MODEL.ROI_BOX_HEAD.NUM_FC = 2
    c.MODEL.ROI_BOX_HEAD.FC_DIM = 1024
    c.MODEL.ROI_BOX_HEAD.NUM_CONV = 0
    c.MODEL.ROI_BOX_HEAD.CONV_DIM = 256
    c.MODEL.ROI_BOX_HEAD.NORM = ""
    c.MODEL.ROI_BOX_HEAD.POOLER_RESOLUTION = 7
    c.MODEL.ROI_BOX_HEAD.POOLER_SAMPLING_RATIO = 0
    c.MODEL.ROI_BOX_HEAD.POOLER_TYPE = "ROIAlignV2"
    c.MODEL.ROI_BOX_HEAD.BBOX_REG_LOSS_TYPE = "smooth_l1"
    c.MODEL.ROI_BOX_HEAD.BBOX_REG_LOSS_WEIGHT = 1.0
    c.MODEL.ROI_BOX_HEAD.BBOX_REG_WEIGHTS = (10.0, 10.0, 5.0, 5.0)
    c.MODEL.ROI_BOX_HEAD.SMOOTH_L1_BETA = 0.0
    c.MODEL.ROI_BOX_HEAD.CLS_AGNOSTIC_BBOX_REG = False
    c.MODEL.ROI_BOX_HEAD.TRAIN_ON_PRED_BOXES = False

    rc = c.MODEL.ROI_CUBE_HEAD = CfgNode()
    rc.NAME = "CubeHead"
    rc.POOLER_RESOLUTION = 7
    rc.POOLER_SAMPLING_RATIO = 0
    rc.POOLER_TYPE = "ROIAlignV2"
    rc.NUM_CONV = 0
    rc.CONV_DIM = 256
    rc.NUM_FC = 2
    rc.FC_DIM = 1024
    rc.NUMBER_OF_PROPOSALS = 1000
    rc.Z_TYPE = "direct"            # ['direct', 'sigmoid', 'log', 'clusters']
    rc.POSE_TYPE = "6d"             # ['6d', 'euler', 'quaternion']
    rc.INVERSE_Z_WEIGHT = False
    rc.VIRTUAL_DEPTH = True
    rc.VIRTUAL_FOCAL = 512.0
    rc.DISENTANGLED_LOSS = True
    rc.CLUSTER_BINS = 1
    rc.ALLOCENTRIC_POSE = True
    rc.CHAMFER_POSE = True
    rc.SHARED_FC = True
    rc.DIMS_PRIORS_ENABLED = True
    rc.DIMS_PRIORS_FUNC = "exp"     # ['exp', 'sigmoid']
    rc.DIMS_PRIORS_PRECOMPUTED = False
    rc.USE_CONFIDENCE = 1.0
    rc.LOSS_W_3D = 1.0
    rc.LOSS_W_XY = 1.0
    rc.LOSS_W_POSE = 7.0
    rc.LOSS_W_NORMAL_VEC = 20.0
    rc.LOSS_W_IOU = 1.0
    rc.LOSS_W_SEG = 2.5
    rc.LOSS_W_Z = 1.0
    rc.LOSS_W_DIMS = 20.0
    rc.LOSS_W_DEPTH = 1.0
    rc.LOSS_W_JOINT = 1.0
    rc.SCALE_ROI_BOXES = 0.0
    rc.TEST = "bas"

    # ---- solver -----------------------------------------------------------
    c.SOLVER = CfgNode()
    c.SOLVER.TYPE = "sgd"
    c.SOLVER.IMS_PER_BATCH = 16
    c.SOLVER.BASE_LR = 0.001
    c.SOLVER.STEPS = (60000, 80000)
    c.SOLVER.MAX_ITER = 90000
    c.SOLVER.MOMENTUM = 0.9
    c.SOLVER.NESTEROV = False
    c.SOLVER.WEIGHT_DECAY = 0.0001
    c.SOLVER.WEIGHT_DECAY_NORM = 0.0
    c.SOLVER.GAMMA = 0.1
    c.SOLVER.LR_SCHEDULER_NAME = "WarmupMultiStepLR"
    c.SOLVER.WARMUP_FACTOR = 1.0 / 1000
    c.SOLVER.WARMUP_ITERS = 1000
    c.SOLVER.WARMUP_METHOD = "linear"
    c.SOLVER.CHECKPOINT_PERIOD = 5000
    c.SOLVER.BIAS_LR_FACTOR = 1.0
    c.SOLVER.WEIGHT_DECAY_BIAS = None
    c.SOLVER.CLIP_GRADIENTS = CfgNode()
    c.SOLVER.CLIP_GRADIENTS.ENABLED = False
    c.SOLVER.CLIP_GRADIENTS.CLIP_TYPE = "value"
    c.SOLVER.CLIP_GRADIENTS.CLIP_VALUE = 1.0
    c.SOLVER.CLIP_GRADIENTS.NORM_TYPE = 2.0
    c.SOLVER.AMP = CfgNode()
    c.SOLVER.AMP.ENABLED = False

    # ---- input / data ---------------------------------------------------
    c.INPUT = CfgNode()
    c.INPUT.MIN_SIZE_TRAIN = (800,)
    c.INPUT.MIN_SIZE_TRAIN_SAMPLING = "choice"
    c.INPUT.MAX_SIZE_TRAIN = 1333
    c.INPUT.MIN_SIZE_TEST = 800
    c.INPUT.MAX_SIZE_TEST = 1333
    c.INPUT.RANDOM_FLIP = "horizontal"
    c.INPUT.FORMAT = "BGR"

    c.DATASETS = CfgNode()
    c.DATASETS.TRAIN = ()
    c.DATASETS.TEST = ()
    c.DATASETS.CATEGORY_NAMES = []
    c.DATASETS.IGNORE_NAMES = []
    c.DATASETS.TRUNCATION_THRES = 0.99
    c.DATASETS.VISIBILITY_THRES = 0.01
    c.DATASETS.MIN_HEIGHT_THRES = 0.00
    c.DATASETS.MAX_DEPTH = 1e8
    c.DATASETS.MODAL_2D_BOXES = False
    c.DATASETS.TRUNC_2D_BOXES = True
    c.DATASETS.PROPOSAL_FILES_TRAIN = ()

    c.DATALOADER = CfgNode()
    c.DATALOADER.NUM_WORKERS = 4
    c.DATALOADER.SAMPLER_TRAIN = "TrainingSampler"
    c.DATALOADER.REPEAT_THRESHOLD = 0.0
    c.DATALOADER.FILTER_EMPTY_ANNOTATIONS = True
    c.DATALOADER.BALANCE_DATASETS = False

    # ---- test -----------------------------------------------------------
    c.TEST = CfgNode()
    c.TEST.EVAL_PERIOD = 0
    # eval batch per chip (the reference's d2 test loader defaults to 1
    # image/batch, build.py:222; batching is free win on TPU — the host
    # per-batch overhead of the tunnel amortises over the batch)
    # 32 amortises the tunnel RTT and keeps the chip busy: the r03 eval
    # loop at b8 spent ~22 ms computing per 277 ms batch (VERDICT r3 #3)
    c.TEST.IMS_PER_BATCH = 32
    c.TEST.DETECTIONS_PER_IMAGE = 100
    # Static (roi, class)-pair candidate budget entering the per-class NMS
    # at inference (the TPU replacement for the reference's dynamic
    # score-threshold nonzero(), fast_rcnn.py:67-83): the global top-k
    # scores over P proposals x C classes. 1024 is lossless in practice
    # (post-NMS keeps DETECTIONS_PER_IMAGE=100); lower values shrink the
    # (k, k) NMS IoU matrix quadratically.
    c.TEST.NMS_CANDIDATE_TOPK = 1024
    c.TEST.VISIBILITY_THRES = 1 / 2.0
    c.TEST.TRUNCATION_THRES = 1 / 2.0

    # ---- plotting / misc (reference extensions) -------------------------
    c.PLOT = CfgNode()
    c.PLOT.OUTPUT_DIR = ""
    c.PLOT.EVAL = ""
    c.PLOT.MODE2D = ""
    c.PLOT.SCORING_FUNC = None
    c.PLOT.PROPOSAL_FUNC = None
    c.PLOT.number_of_proposals = 1000

    c.TRAIN = CfgNode()
    c.TRAIN.pseudo_gt = "learn"

    c.log = False
    c.loss_functions = ["dims", "pose_alignment", "pose_ground", "iou", "z",
                        "z_pseudo_gt_patch", "depth"]

    # ---- TPU-native additions (not in the reference schema) -------------
    c.TPU = CfgNode()
    c.TPU.MESH_SHAPE = [-1]          # -1 = all devices, data parallel
    c.TPU.MESH_AXES = ["data"]
    c.TPU.MAX_GT_PER_IMAGE = 64      # static padding caps
    c.TPU.MAX_ANCHORS_SAMPLE = 256
    c.TPU.IMAGE_SIZE = 512           # square padded train resolution
    # optional aspect buckets: list of [H, W] static canvas shapes. Empty =
    # one square IMAGE_SIZE canvas. With buckets, each image goes to the
    # bucket that preserves the most content resolution (one compiled graph
    # per distinct shape; batches are grouped per bucket like d2's
    # AspectRatioGroupedDataset)
    c.TPU.ASPECT_BUCKETS = []
    c.TPU.COMPUTE_DTYPE = "bfloat16"
    # pose_ground: fit the (static pseudo-GT) ground plane ONCE per image in
    # the data pipeline instead of 1000-hypothesis RANSAC in every step
    c.TPU.CACHE_GROUND_NORMALS = True
    # Ship raw uint8 pixels to the device and normalise in-graph
    # (models/rcnn3d.py::_prep_image) instead of uploading a 4x-larger f32
    # canvas: on tunnel/PCIe-attached hosts the image upload is the eval
    # loop's bottleneck (926 ms/batch of 32 vs 88 ms compute measured).
    c.TPU.TRANSFER_UINT8 = True
    # Train-batch transfer diet (the tunnel moves ~110 MB/s; a b25@512
    # recipe batch was ~52 MB f32/bool — longer on the wire than the step
    # on the chip). Depth ships f16 (2x; ulp at 10 m = 8 mm, far under the
    # 50 mm RANSAC threshold) and ground masks ship bit-packed (8x;
    # ops/bitpack.py). Both decoded in-graph (models/rcnn3d.py::_roi_extra).
    c.TPU.TRANSFER_DEPTH_F16 = True
    c.TPU.TRANSFER_MASK_BITS = True
    # Pallas windowed-DMA ROIAlign on the INFERENCE path (double-buffered
    # window streaming; 41.7 ms/b32x1000-RoI pool vs 123.1 ms dense-matmul
    # on the v5e). TPU-only — non-TPU backends take the XLA gather pooler.
    c.TPU.USE_PALLAS_ROI_ALIGN = True
    # In-graph ground-plane RANSAC cost (pose_ground under the backbone
    # split, where the host normals cache is dropped): hypothesis count
    # (reference Plane_torch maxIteration=1000, ProposalNetwork/utils/
    # plane.py:79) and depth-map subsampling stride (reference use_nth=5,
    # roi_heads.py:466-528). Plane-recovery accuracy vs count is pinned by
    # tests/test_ops.py::test_ransac_hypothesis_count_accuracy.
    c.TPU.RANSAC_HYPOTHESES = 1000          # env: WEAKCUBE_RANSAC_HYP
    c.TPU.RANSAC_USE_NTH = 5                # env: WEAKCUBE_RANSAC_NTH
    # ---- training ROIAlign plans + step structure -----------------------
    # (YAML-first; the WEAKCUBE_* env vars of the same spelling override at
    # trace time for bench sweeps — see README "Environment overrides".)
    # Forward plan inside train graphs: "pallas" (windowed-DMA kernel,
    # ops/roi_align_pallas.py — bandwidth-proportional to the RoI window;
    # backbone split only; resolves to "matmul" on non-TPU backends where
    # the Mosaic kernel cannot lower), "matmul" (dense separable hat-matrix
    # einsums on the MXU), or "gather" (take_along_axis; ~3% HBM bandwidth
    # at recipe scale but runs in any step structure). Round-5 v5e
    # measurements of the rest program (tick-off, b25@512): gather-era
    # baseline ~200 ms, matmul+skip 185.1, pallas 164.6, pallas+skip 151.1.
    c.TPU.ROI_ALIGN_TRAIN_FWD = "pallas"    # env: WEAKCUBE_RA_TRAIN_FWD
    # Feature-gradient plan: "matmul" (scatter-free, default), "windowed"
    # (blocked scatter_add), or "autodiff" (XLA per-corner scatter).
    c.TPU.ROI_ALIGN_TRAIN_BWD = "matmul"    # env: WEAKCUBE_RA_TRAIN_BWD
    # RoI-axis chunk for the matmul plans' lax.scan (bounds the
    # (B, chunk, P, W, C) intermediate).
    c.TPU.ROI_ALIGN_CHUNK = 128             # env: WEAKCUBE_RA_CHUNK
    # Level-sorted chunk skipping for the matmul plans: sort RoIs by FPN
    # level and lax.cond-skip (chunk, level) pairs with no RoI at that
    # level — the dense einsums otherwise pay every level's FLOPs +
    # intermediate HBM traffic for ALL RoIs (bit-exact; see
    # ops/roi_align.py::matmul_fwd). Pool fwd 51.8 -> 41.8 ms, fwd+bwd
    # 122.5 -> 103.1 ms at recipe scale (v5e, 2026-08-22).
    c.TPU.ROI_ALIGN_LEVEL_SKIP = True       # env: WEAKCUBE_RA_LEVEL_SKIP
    # Train-step structure: "backbone" (four programs: backbone fwd | rest
    # fwd+bwd | backbone bwd | update — a structure in which the
    # matmul ROIAlign forward runs clean on the 2026-08 axon libtpu),
    # "backbone2" (same split with programs 3+4 merged: backbone bwd +
    # update in one program — one fewer dispatch, CPU-parity-tested like
    # "backbone"), True (grads | update two-program split, bit-identical
    # to the monolith), or False (one monolithic program — pair with
    # ROI_ALIGN_TRAIN_FWD="gather" on current libtpu).
    c.TPU.SPLIT_TRAIN_STEP = "backbone"     # env: WEAKCUBE_SPLIT_STEP
    return c
