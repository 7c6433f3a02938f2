#!/bin/bash
# Launch wrapper (reference `run_aff.sh`) — TPU edition.
#
# On TPU there is no per-device process launcher: ONE process per host
# drives all local chips through the jax.sharding mesh, and multi-host
# pods coordinate via jax.distributed (main.py calls
# jax.distributed.initialize() automatically under multi-host env vars
# such as MEGASCALE/JAX_COORDINATOR or TPU pod metadata).
#
# Single host (any number of local chips — the data mesh axis spans them):
#   bash run_aff.sh
# Multi-host pod: run this same script on every worker (e.g. with
#   `gcloud compute tpus tpu-vm ssh --worker=all --command=...`).

# dataset path
DATA=imagenet/

# config file path
CONFIG=ml_autofocusformermod_tpu/configs/aff_small.yaml

# checkpoint path for resume (.pth imports directly, orbax dirs too)
RESUME=checkpoints/aff_small.pth

python main.py \
    --data-path $DATA \
    --cfg $CONFIG \
    --eval \
    --resume $RESUME \

# Comment out '--eval' and '--resume' to start training from fresh.
# To enlarge the effective batch size, use '--accumulation-steps'.
# Parallelism knobs beyond data parallel (the reference's only axis) are
# config keys: TPU.MESH_MODEL (tensor), TPU.MESH_SEQ (sequence),
# TPU.ZERO1 (optimizer-state sharding); pipeline parallelism is the
# parallel/pp.py executor (see tests/test_pp.py and __graft_entry__.py).
