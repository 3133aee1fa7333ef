#!/usr/bin/env bash
# Unpack the OpenDataLab AI Challenger archive into the mmpose-style data layout
# (counterpart of the reference script of the same name; used with
# `mim download --dataset` style downloads).
#
# Usage: bash tools/dataset_converters/scripts/preprocess_aic.sh DOWNLOAD_DIR DATA_ROOT

set -e
DOWNLOAD_DIR=$1
DATA_ROOT=$2

tar -zxvf $DOWNLOAD_DIR/OpenDataLab___AI_Challenger/raw/AI_Challenger.tar.gz -C $DATA_ROOT
rm -rf $DOWNLOAD_DIR/OpenDataLab___AI_Challenger
