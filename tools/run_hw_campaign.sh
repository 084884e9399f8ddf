#!/bin/sh
# Round-4 hardware measurement campaign: run SOLO on the chip, in order.
# Appends to docs/hw_campaign_r4.log (gitignored; survives reboots, unlike
# /tmp).  Grid runs update tools/grid_goldens.json.  Stages are independent:
# a stage that times out leaves the others' rows intact, and the script can
# be re-run — grid goldens are keyed per row and merge.
set -x
cd "$(dirname "$0")/.."
LOG=docs/hw_campaign_r4.log
{
  echo "=== campaign start $(date -u +%Y-%m-%dT%H:%M:%SZ)"
  echo "=== coldstart image #1 (fresh process)"
  timeout 900 python tools/coldstart_probe.py --size 1024x683
  echo "=== coldstart image #2 (fresh process, disk cache warm)"
  timeout 900 python tools/coldstart_probe.py --size 1024x683
  echo "=== coldstart video #1"
  timeout 1200 python tools/coldstart_probe.py --video
  echo "=== coldstart video #2"
  timeout 1200 python tools/coldstart_probe.py --video
  echo "=== grid: plain batch foveated"
  timeout 3000 python tools/benchmark_grid.py \
    --variants plain batch foveated --update-goldens
  echo "=== grid: foveated-moving heatmap-device heatmap-uint8"
  timeout 3000 python tools/benchmark_grid.py \
    --variants foveated-moving heatmap-device heatmap-uint8 \
    --repeats 2 --update-goldens
  echo "=== grid: heatmap config5 (readback-bound; 1 repeat)"
  timeout 3000 python tools/benchmark_grid.py \
    --variants heatmap config5 --repeats 1 --update-goldens
  echo "=== grid: htc_vive_pro foveated rows"
  timeout 2400 python tools/benchmark_grid.py \
    --display htc_vive_pro --resolutions 1440x1600 \
    --variants plain foveated foveated-moving --update-goldens
  echo "=== campaign done $(date -u +%Y-%m-%dT%H:%M:%SZ)"
} >> "$LOG" 2>&1
