#!/bin/bash
# Sweep a list of catalog entries through the gate replica at the
# sf1-equivalent fixture, chunked so each Spark session's pinned
# scaffolding stays bounded. Usage:
#   tools/sweep_sf1eq.sh <entry-list-file> <log-file> [chunk-size]
set -u
LIST="$1"; LOG="$2"; CHUNK="${3:-16}"
export PYSPARK_SUBMIT_ARGS="--driver-memory 48g pyspark-shell"
cd /root/repo
mapfile -t ENTRIES < "$LIST"
total=${#ENTRIES[@]}
echo "sweep start: $total entries, chunk=$CHUNK, fixture=.scale/sf1eq" | tee -a "$LOG"
for ((i=0; i<total; i+=CHUNK)); do
  chunk=("${ENTRIES[@]:i:CHUNK}")
  echo "=== chunk $((i/CHUNK+1)): ${chunk[*]}" | tee -a "$LOG"
  timeout 3000 python tools/check_oracle.py .scale/sf1eq "${chunk[@]}" >> "$LOG" 2>&1
  echo "=== chunk $((i/CHUNK+1)) exit=$?" | tee -a "$LOG"
done
echo "sweep done" | tee -a "$LOG"
