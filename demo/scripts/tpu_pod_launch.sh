#!/bin/bash
# Launch one reconstruction across every host of a Cloud TPU pod slice.
# The TPU-native analog of the reference's `accelerate launch --multi_gpu`
# (see docs/launch/multi_device.md): each TPU-VM worker runs the same
# command with --multihost; jax.distributed wires the hosts together and the
# solver shards measurements (and, with recon_params.shard_canvas, the
# object canvas) over the global mesh. Rank 0 writes all outputs.
#
#   bash scripts/tpu_pod_launch.sh my-tpu-pod us-central2-b params/tBL_WSe2_reconstruct.yml
#
# Requires: gcloud CLI, a TPU VM pod slice already created, and ptyrad_tpu
# installed on every worker (use --worker=all with pip for that too).

set -euo pipefail

TPU_NAME="${1:?usage: tpu_pod_launch.sh TPU_NAME ZONE PARAMS_PATH}"
ZONE="${2:?usage: tpu_pod_launch.sh TPU_NAME ZONE PARAMS_PATH}"
PARAMS_PATH="${3:?usage: tpu_pod_launch.sh TPU_NAME ZONE PARAMS_PATH}"

# On Cloud TPU, jax.distributed.initialize() auto-discovers the coordinator
# and process ids from the TPU metadata, so no --coordinator_address /
# --num_processes / --process_id flags are needed — --multihost alone does.
gcloud compute tpus tpu-vm ssh "$TPU_NAME" --zone "$ZONE" --worker=all \
  --command="cd ~/demo && ptyrad-tpu run --params_path '$PARAMS_PATH' --multihost"
