#!/usr/bin/env bash
# Full pipeline: surf -> offsets_surfs -> bake -> volsurfs -> bake textures.
# Mirrors the reference scripts/train.sh:14-21 stage chain; stages
# communicate through the run directory.
#
# Usage: scripts/train.sh <dataset> <scene> [nr_surfs] [exp_name]
set -e
DATASET=${1:?dataset}
SCENE=${2:?scene}
NR_SURFS=${3:-5}
EXP=${4:-default}
RUNS=${RUNS_PATH:-./runs}
PY="python -m volsurfs_tpu.training.trainer"
BAKE="python -m volsurfs_tpu.baking.baker"

run_id=pipeline
surf_dir="$RUNS/surf/$EXP/$SCENE/$run_id"
offs_dir="$RUNS/offsets_surfs/$EXP/$SCENE/$run_id"
vs_dir="$RUNS/volsurfs/$EXP/$SCENE/$run_id"

# stage 1: single-SDF NeuS
$PY --method surf --dataset "$DATASET" --scene "$SCENE" --exp_name "$EXP" \
    --run_id $run_id --runs_path "$RUNS"

# stage 2: k offset surfaces, warm-started from surf's SDF
last_surf=$(ls "$surf_dir/checkpoints" | sort | tail -1)
$PY --method offsets_surfs --dataset "$DATASET" --scene "$SCENE" --exp_name "$EXP" \
    --run_id $run_id --runs_path "$RUNS" \
    --exp_config config/offsets_surfs/base_${NR_SURFS}.cfg \
    --models_path "$surf_dir/checkpoints/$last_surf/models"

# stage 3: extract + simplify + atlas the k shells
$BAKE --method offsets_surfs --dataset "$DATASET" --scene "$SCENE" --exp_name "$EXP" \
    --run_id $run_id --runs_path "$RUNS" \
    --extract_meshes --simplify_meshes --compute_meshes_xatlas

# stage 4: SH neural textures on the shells
last_offs=$(ls "$offs_dir/checkpoints" | sort | tail -1)
$PY --method volsurfs --dataset "$DATASET" --scene "$SCENE" --exp_name "$EXP" \
    --run_id $run_id --runs_path "$RUNS" \
    --exp_config config/volsurfs/base_${NR_SURFS}.cfg \
    --meshes_path "$offs_dir/meshes" \
    --models_path "$offs_dir/checkpoints/$last_offs/models"

# stage 5: bake textures + scene.json for the viewer
$BAKE --method volsurfs --dataset "$DATASET" --scene "$SCENE" --exp_name "$EXP" \
    --run_id $run_id --runs_path "$RUNS" \
    --meshes_path "$offs_dir/meshes" --extract_textures
