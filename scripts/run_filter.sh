#!/bin/bash
# Filter sweep across objects x logs (reference bash/run_filter.sh:10-18).
# Usage: scripts/run_filter.sh "sphere box potato" "0 1 2" [extra overrides...]
objects=${1:-"sphere box potato"}
logs=${2:-"0"}
shift 2 2>/dev/null
python -m midastouch_tpu.apps.sweep mode=filter \
  objects=$(echo $objects | tr ' ' ',') logs=$(echo $logs | tr ' ' ',') "$@"
