#!/usr/bin/env bash
# Multi-host evaluation launch (reference tools/dist_test.sh). Each TPU host
# runs the same command; per-host data sharding and result gather live in
# parallel/multihost.py.
#   Usage: ./tools/dist_test.sh <config> <checkpoint> [extra test.py args...]
CONFIG=$1
CHECKPOINT=$2
shift 2
python "$(dirname "$0")/test.py" "$CONFIG" "$CHECKPOINT" "$@"
