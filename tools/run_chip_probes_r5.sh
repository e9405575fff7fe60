#!/bin/bash
# Round-5 chip experiment batch. Waits for the axon tunnel (ping behind
# backoff), then runs each probe independently timeout-bounded.
# Writes /tmp/chip_probes_r5.log. Usage: run [ENV=V ...] -- tool.py [args]
cd "$(dirname "$0")/.."
LOG=${CHIP_LOG:-/tmp/chip_probes_r5.log}
: > $LOG

ping_tunnel() {
  timeout 120 python - <<'EOF' >/dev/null 2>&1
import jax
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
import jax.numpy as jnp
assert jax.devices()[0].platform != "cpu"
float(jnp.sum(jnp.ones((8, 128))))
EOF
}

echo "waiting for tunnel..." >> $LOG
until ping_tunnel; do
  echo "$(date +%H:%M:%S) tunnel down" >> $LOG
  sleep 60
done
echo "$(date +%H:%M:%S) tunnel up" >> $LOG

run() {
  local envs=()
  while [[ "$1" != "--" ]]; do envs+=("$1"); shift; done
  shift
  echo "==== ${envs[*]} $* ====" >> $LOG
  timeout 1800 env "${envs[@]}" python tools/"$@" >> $LOG 2>&1
  echo "rc=$?" >> $LOG
}

# 1. sub-window sweep gating A/B (the round-5 go/no-go) on the realistic
#    terrain workload; then the wider-tile variant (quad32)
run FREDHOLM_TRAV_SUBROWS=0 -- probe_subwindow.py
run FREDHOLM_TRAV_SUBROWS=8 -- probe_subwindow.py
run FREDHOLM_TRAV_SUBLANES=32 FREDHOLM_TRAV_SUBROWS=8 -- probe_subwindow.py
# 2. bf16 VPU/bandwidth microprobe (decides the bf16-gates lever)
run -- probe_bf16.py
# 3. end-to-end effect of sub-window gating on the bench scenes
run FREDHOLM_TRAV_SUBROWS=0 -- ../bench.py --only 4
run FREDHOLM_TRAV_SUBROWS=8 -- ../bench.py --only 4
run FREDHOLM_TRAV_SUBROWS=0 -- ../bench.py --only 2
run FREDHOLM_TRAV_SUBROWS=8 -- ../bench.py --only 2
echo done >> $LOG
