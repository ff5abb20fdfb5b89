#!/usr/bin/env bash
# Host-JVM smoke test of the compose topology (this sandbox cannot run
# Docker): the SAME three mains the containers run, wired onto one
# shared directory exactly as docker-compose.yml wires /app/data.
#   producer  -> drops paced JSON batches on $WORK/incoming
#   consumer  -> drains them (AvailableNow) into $WORK/processed
#   dashboard -> renders one tick of panels from $WORK/processed
# Usage: docker/smoke.sh [sfDir] [workDir]
set -euo pipefail
cd "$(dirname "$0")/.."
SF_DIR="${1:-/root/testdata/sf0.001}"
WORK="${2:-/tmp/graft_compose_smoke}"
rm -rf "$WORK" && mkdir -p "$WORK"

CONF="$WORK/site.conf"
cat > "$CONF" <<EOF
graft {
  producer {
    data {
      sourceDir = "$SF_DIR"
      table = "events"
      batchSize = 0
      intervalSeconds = 0
    }
    file {
      outputDir = "$WORK/incoming"
      format = "json"
    }
  }
  consumer {
    source {
      directory = "$WORK/incoming"
      format = "json"
      maxFilesPerTrigger = 2
    }
    output {
      directory = "$WORK/processed"
      format = "parquet"
      checkpointDir = "$WORK/checkpoint"
      triggerSeconds = 1
      drainOnce = true
    }
  }
  dashboard {
    ticks = 1
    refreshSeconds = 1
    topK = 5
    htmlFile = "$WORK/dashboard.html"
    port = -1
  }
}
EOF

run() { sbt -batch "runMain $1 $CONF" 2>&1 | grep -E "[A-Z_]+=[0-9]|panel|refresh" || true; }

echo "== producer (graft.streaming.ProducerMain) =="
run graft.streaming.ProducerMain
test -d "$WORK/incoming" || { echo "FAIL: no bus dir"; exit 1; }

echo "== consumer (graft.streaming.ConsumerMain, AvailableNow drain) =="
run graft.streaming.ConsumerMain
for d in raw pickup_agg dropoff_agg combined_agg; do
  test -d "$WORK/processed/$d" || { echo "FAIL: missing dataset $d"; exit 1; }
done

echo "== dashboard (graft.streaming.DashboardDemo, one tick) =="
run graft.streaming.DashboardDemo
test -s "$WORK/dashboard.html" || { echo "FAIL: no dashboard html"; exit 1; }

echo "SMOKE_OK work=$WORK"
