#!/usr/bin/env bash
# Unpack the OpenDataLab HaGRID archive into the mmpose-style data layout
# (counterpart of the reference script of the same name; used with
# `mim download --dataset` style downloads).
#
# Usage: bash tools/dataset_converters/scripts/preprocess_hagrid.sh DOWNLOAD_DIR DATA_ROOT

set -e
DOWNLOAD_DIR=$1
DATA_ROOT=$2

cat $DOWNLOAD_DIR/OpenDataLab___HaGRID/raw/*.tar.gz.* | tar -xvz -C $DATA_ROOT/..
tar -xvf $DATA_ROOT/HaGRID.tar -C $DATA_ROOT/..
rm -rf $DOWNLOAD_DIR/OpenDataLab___HaGRID
