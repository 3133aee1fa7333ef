#!/bin/bash
# Generate an OpenPose-format skeleton map from one image
# (counterpart of reference projects/mmpose4aigc/mmpose_openpose.sh,
# driving this framework's CLI instead of the mmdeploy pose_tracker).
INPUT_IMAGE=$1
POSE_CONFIG=${2:-configs/body_2d_keypoint/rtmpose/coco/rtmpose-m_8xb256-420e_coco-256x192.py}
POSE_CKPT=$3

python projects/mmpose4aigc/openpose_visualization.py \
    "$POSE_CONFIG" $POSE_CKPT \
    --input "$INPUT_IMAGE" \
    --kpt-thr 0.4
