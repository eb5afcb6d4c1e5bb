#!/bin/sh
# Weak Cube R-CNN training recipe — the published configuration
# (reference submit.sh recipe; here a plain TPU-host script: no LSF/GPU
# scheduler, one python process drives the whole chip/mesh).
#
# Prerequisites (the offline pseudo-GT pipeline, SURVEY §3.4):
#   1) python -m weakcube_tpu.data.generate_depth_maps --checkpoint <dav2.pth>
#   2) python -m weakcube_tpu.data.generate_ground_segmentations
#   3) python -m weakcube_tpu.data.filter_ground
#   4) python priors.py
#   5) 2D-only pretrain:
#      python tools/train_net.py --config-file configs/Base_Omni3D_2D_only.yaml \
#          OUTPUT_DIR output/omni3d-2d-only

python tools/train_net.py \
    --resume \
    --config-file configs/Omni_combined.yaml \
    OUTPUT_DIR output/weak-cube \
    log True \
    loss_functions "['iou', 'z_pseudo_gt_center', 'pose_alignment', 'pose_ground']" \
    MODEL.WEIGHTS_PRETRAIN output/omni3d-2d-only/model_final \
    MODEL.ROI_CUBE_HEAD.LOSS_W_IOU 4.0 \
    MODEL.ROI_CUBE_HEAD.LOSS_W_NORMAL_VEC 40.0 \
    MODEL.ROI_CUBE_HEAD.LOSS_W_Z 100.0 \
    MODEL.ROI_CUBE_HEAD.LOSS_W_DIMS 0.1 \
    MODEL.ROI_CUBE_HEAD.LOSS_W_POSE 4.0
