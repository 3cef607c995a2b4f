#!/usr/bin/env bash
# Multi-host TPU launch (reference tools/dist_train.sh, torch.distributed ->
# jax.distributed). On TPU pods each host runs the SAME command; JAX picks
# up the pod topology from the environment, and `parallel/multihost.py`
# initializes jax.distributed + per-host data sharding.
#   Usage: ./tools/dist_train.sh <config> [extra train.py args...]
CONFIG=$1
shift
python "$(dirname "$0")/train.py" "$CONFIG" --multihost "$@"
