#!/bin/bash
# Round-3 chip experiment batch: traversal A/B + stats + ablations.
# Run from the repo root; writes /tmp/chip_probes.log. Each step is
# independently timeout-bounded (the tunnel sometimes hangs).
cd "$(dirname "$0")/.."
LOG=/tmp/chip_probes.log
: > $LOG
run() {
  echo "==== $* ====" >> $LOG
  timeout 2400 env "$@" python tools/probe_traversal.py >> $LOG 2>&1
  echo "rc=$?" >> $LOG
}
run FREDHOLM_TRAV_GATE=
run FREDHOLM_TRAV_GATE=twopass
run FREDHOLM_TRAV_STATS=1
run FREDHOLM_TRAV_STATS=1 FREDHOLM_TRAV_GATE=twopass
run FREDHOLM_TRAV_ABLATE=notri
run FREDHOLM_TRAV_ABLATE=nogrp
run FREDHOLM_TRAV_ABLATE=noblkdma
echo done >> $LOG
