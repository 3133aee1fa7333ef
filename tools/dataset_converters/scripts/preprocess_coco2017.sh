#!/usr/bin/env bash
# Unpack the OpenDataLab COCO 2017 archive into the mmpose-style data layout
# (counterpart of the reference script of the same name; used with
# `mim download --dataset` style downloads).
#
# Usage: bash tools/dataset_converters/scripts/preprocess_coco2017.sh DOWNLOAD_DIR DATA_ROOT

set -e
DOWNLOAD_DIR=$1
DATA_ROOT=$2

unzip $DOWNLOAD_DIR/OpenDataLab___COCO_2017/raw/Images/val2017.zip -d $DATA_ROOT
unzip $DOWNLOAD_DIR/OpenDataLab___COCO_2017/raw/Images/train2017.zip -d $DATA_ROOT
unzip $DOWNLOAD_DIR/OpenDataLab___COCO_2017/raw/Annotations/annotations_trainval2017.zip -d $DATA_ROOT
rm -rf $DOWNLOAD_DIR/OpenDataLab___COCO_2017
