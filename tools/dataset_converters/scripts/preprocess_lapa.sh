#!/usr/bin/env bash
# Unpack the OpenDataLab LaPa archive into the mmpose-style data layout
# (counterpart of the reference script of the same name; used with
# `mim download --dataset` style downloads).
#
# Usage: bash tools/dataset_converters/scripts/preprocess_lapa.sh DOWNLOAD_DIR DATA_ROOT

set -e
DOWNLOAD_DIR=$1
DATA_ROOT=$2

tar -zxvf $DOWNLOAD_DIR/OpenDataLab___LaPa/raw/LaPa.tar.gz -C $DATA_ROOT
rm -rf $DOWNLOAD_DIR/OpenDataLab___LaPa
