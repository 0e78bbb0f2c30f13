#!/usr/bin/env bash
# Paper-results reproduction: 5-mesh pipeline on all six Shelly scenes
# (reference scripts/train_all_shelly.sh). One scene per invocation; under a
# multi-chip fleet, run one scene per chip.
set -e
for scene in khady kitten pug horse fernvase woolly; do
    bash scripts/train.sh shelly "$scene" 5 paper
done
