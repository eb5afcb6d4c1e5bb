#!/bin/sh
# Folder-inference demo (reference demo.sh equivalent).
python demo/demo.py \
    --config-file configs/Omni_combined.yaml \
    --input-folder "${1:-demo_images}" \
    --output-folder "${2:-demo_out}" \
    --threshold 0.25 \
    MODEL.WEIGHTS output/weak-cube/model_final
