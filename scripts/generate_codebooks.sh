#!/bin/bash
# Codebook generation sweep (reference bash/generate_codebooks.sh:11-15).
# Usage: scripts/generate_codebooks.sh "sphere box potato" [overrides...]
objects=${1:-"sphere box potato"}
shift 1 2>/dev/null
python -m midastouch_tpu.apps.sweep mode=codebooks \
  objects=$(echo $objects | tr ' ' ',') "$@"
