#!/usr/bin/env bash
# SLURM launcher (reference tools/slurm_train.sh): one task per TPU host.
#   Usage: GPUS=<hosts> ./tools/slurm_train.sh <partition> <job> <config> [...]
set -x
PARTITION=$1
JOB_NAME=$2
CONFIG=$3
shift 3
HOSTS=${HOSTS:-1}
srun -p "$PARTITION" --job-name="$JOB_NAME" --ntasks="$HOSTS" \
     --ntasks-per-node=1 --kill-on-bad-exit=1 \
     python "$(dirname "$0")/train.py" "$CONFIG" --multihost "$@"
