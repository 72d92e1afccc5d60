#!/bin/bash
# Round-11 measurement pipeline: run sequentially (sbt is exclusive).
# Usage: nohup bash scripts/r11_pipeline.sh > /tmp/r11_pipeline.log 2>&1 &
set -x
cd /root/repo

echo "=== load check (bench wants < 2) ==="; uptime

echo "=== 1. bench at sf0.1 ==="
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt -batch "runMain graft.Bench" \
  > /tmp/r11_bench.log 2>&1

echo "=== 2. ScaleSmoke big (regenerates SCALE.md core) ==="
SPARK_DRIVER_MEM=24g sbt -batch "runMain graft.tools.ScaleSmoke 10000 big" \
  > /tmp/r11_scalesmoke.log 2>&1

echo "=== 3. RecallAtScale tune (adaptive-nprobe recipe numbers) ==="
SPARK_DRIVER_MEM=24g sbt -batch "runMain graft.tools.RecallAtScale 1000000 tune" \
  > /tmp/r11_nprobetune.log 2>&1

echo "=== 4. fresh HybridPruneAB 100k (record) ==="
sbt -batch "runMain graft.tools.HybridPruneAB 100000 3" \
  > /tmp/r11_hpab100k.log 2>&1

echo "=== pipeline done ==="; uptime
