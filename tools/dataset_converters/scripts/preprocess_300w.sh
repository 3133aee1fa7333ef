#!/usr/bin/env bash
# Unpack the OpenDataLab 300W archive into the mmpose-style data layout
# (counterpart of the reference script of the same name; used with
# `mim download --dataset` style downloads).
#
# Usage: bash tools/dataset_converters/scripts/preprocess_300w.sh DOWNLOAD_DIR DATA_ROOT

set -e
DOWNLOAD_DIR=$1
DATA_ROOT=$2

tar -zxvf $DOWNLOAD_DIR/OpenDataLab___300w/raw/300w.tar.gz.00 -C $DOWNLOAD_DIR/
tar -xvf $DOWNLOAD_DIR/300w/300w.tar.00 -C $DATA_ROOT/
rm -rf $DOWNLOAD_DIR/300w $DOWNLOAD_DIR/OpenDataLab___300w
