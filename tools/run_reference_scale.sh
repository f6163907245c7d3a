#!/bin/bash
# Reference-scale end-to-end receipt run (VERDICT r4 #1).
#
# Reproduces the reference's only published benchmark volume
# (docs/instructions.rst:87-112 — 1100x1100x600 = 0.726 GVx) on one TPU
# chip + one host core, producing <wd>/timing.json. Two phases so the
# expensive synthetic-world preparation doesn't hold the chip:
#
#   tools/run_reference_scale.sh prep   # host-only, ~20 min
#   tools/run_reference_scale.sh run    # the timed pipeline on the chip
#   tools/run_reference_scale.sh table  # README table + TIMING_r05.json
#
# The pipeline phase re-hydrates the HBM-resident volume store from the
# chunk store written by prep (start.py reruns without --overwrite).
set -e
WD=${WD:-/root/wd_gvx}
PY=${PY:-/opt/venv/bin/python}
REPO="$(cd "$(dirname "$0")/.." && pwd)"
SHAPE="1100 1100 600"
ARGS="--working_dir $WD --shape $SHAPE --n_cells 40 --world neuron \
      --chunk_size 256 256 128 \
      --kv compartments.dist_axoness_averaging=500 \
      --kv spines.semseg2coords_spines.k=20"

case "${1:-run}" in
  prep)
    $PY "$REPO/examples/start.py" $ARGS --overwrite --until_step 0 ;;
  run)
    $PY "$REPO/examples/start.py" $ARGS ;;
  table)
    $PY "$REPO/tools/regen_perf_table.py" "$WD/timing.json" \
        --copy "$REPO/TIMING_r05.json" ;;
  *)
    echo "usage: $0 {prep|run|table}"; exit 1 ;;
esac
