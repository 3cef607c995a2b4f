#!/usr/bin/env bash
# SLURM evaluation launcher (reference tools/slurm_test.sh).
#   Usage: ./tools/slurm_test.sh <partition> <job> <config> <ckpt> [...]
set -x
PARTITION=$1
JOB_NAME=$2
CONFIG=$3
CHECKPOINT=$4
shift 4
HOSTS=${HOSTS:-1}
srun -p "$PARTITION" --job-name="$JOB_NAME" --ntasks="$HOSTS" \
     --ntasks-per-node=1 --kill-on-bad-exit=1 \
     python "$(dirname "$0")/test.py" "$CONFIG" "$CHECKPOINT" "$@"
