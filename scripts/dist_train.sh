#!/usr/bin/env bash
# Distributed training launcher (reference scripts/dist_train.sh).
# On TPU a single process drives every local chip through the jitted
# data-parallel step, so single-host needs no launcher; multi-host pods
# set the JAX coordinator env and run one process per host.
#   usage: ./scripts/dist_train.sh <num_hosts> <config> [extra args]
HOSTS=$1
CONFIG=$2
if [ $HOSTS -le 1 ]; then
    python train.py -opt $CONFIG "${@:3}"
else
    # one process per host; COORDINATOR_ADDRESS / NUM_PROCESSES /
    # PROCESS_ID are provided by the pod scheduler (e.g. GKE/xmanager)
    python train.py -opt $CONFIG --launcher jax "${@:3}"
fi
