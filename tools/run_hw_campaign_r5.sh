#!/bin/sh
# Round-5 full-grid refresh: run SOLO on the chip, in order.  Unlike the r4
# script this runs the grid in CHECK mode (goldens must already hold — any
# JOD drift fails the stage) and publishes min/median/max spread per row.
# Appends to docs/hw_campaign_r5_grid.log; stages are independent.
set -x
cd "$(dirname "$0")/.."
LOG=docs/hw_campaign_r5_grid.log
{
  echo "=== r5 grid refresh start $(date -u +%Y-%m-%dT%H:%M:%SZ)"
  echo "=== grid: plain batch foveated"
  timeout 4500 python tools/benchmark_grid.py \
    --variants plain batch foveated
  echo "=== grid: foveated-moving heatmap-device"
  timeout 4500 python tools/benchmark_grid.py \
    --variants foveated-moving heatmap-device
  echo "=== grid: heatmap heatmap-uint8 (readback-bound; 2 repeats)"
  timeout 4500 python tools/benchmark_grid.py \
    --variants heatmap heatmap-uint8 --repeats 2
  echo "=== grid: htc_vive_pro rows"
  timeout 3000 python tools/benchmark_grid.py \
    --display htc_vive_pro --resolutions 1440x1600 \
    --variants plain foveated foveated-moving
  echo "=== r5 grid refresh done $(date -u +%Y-%m-%dT%H:%M:%SZ)"
} >> "$LOG" 2>&1
