#!/bin/bash
# Round-4 chip experiment batch: wavefront-compaction A/B + region-level
# sweep. Run from the repo root; writes /tmp/chip_probes_r4.log. Each
# step is independently timeout-bounded (the tunnel sometimes hangs).
# Usage: run [ENV=V ...] -- tool.py [args...]
cd "$(dirname "$0")/.."
LOG=/tmp/chip_probes_r4.log
: > $LOG
run() {
  local envs=()
  while [[ "$1" != "--" ]]; do envs+=("$1"); shift; done
  shift
  echo "==== ${envs[*]} $* ====" >> $LOG
  timeout 1800 env "${envs[@]}" python tools/"$@" >> $LOG 2>&1
  echo "rc=$?" >> $LOG
}
# 1. wavefront-compaction A/B (fused/compact.py), end-to-end renders —
#    the round-4 go/no-go decision, so it runs first
run -- probe_compact.py terrain 4
run -- probe_compact.py sweep 8
# 2. region (4th gate level) sweep on the 1M-tri terrain probe:
#    REG default is 4; 0 compiles the level out
run FREDHOLM_TRAV_REG=0 -- probe_traversal.py
run FREDHOLM_TRAV_REG=4 -- probe_traversal.py
run FREDHOLM_TRAV_REG=8 -- probe_traversal.py
run FREDHOLM_TRAV_REG=16 -- probe_traversal.py
# 3. compaction on the dense-kernel scenes
run -- probe_compact.py cornell 16
run -- probe_compact.py cornell1080 16
echo done >> $LOG
