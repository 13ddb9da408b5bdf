#!/bin/bash
# Poll the TPU tunnel with a cheap dispatch until it responds, then run the
# given command (default: the round-4 measurement sweep). Useful because the
# axon tunnel to the round's chip drops for long stretches (it died mid
# round 3 and again early round 4); every benchmark otherwise hangs on its
# first dispatch.
#
#   bash tools/wait_for_chip.sh [cmd...]
#
# Probe = interpreter startup (the image's sitecustomize imports the axon
# plugin) + one real reduction on device, bounded at 150 s.
set -u
cd "$(dirname "$0")/.."
CMD=("$@")
if [ ${#CMD[@]} -eq 0 ]; then
    CMD=(bash tools/measure_round4.sh /tmp/round4_measurements)
fi
i=0
while true; do
    i=$((i + 1))
    echo "[wait_for_chip] probe $i $(date +%H:%M:%S)"
    if timeout 150 python -u -c "
import jax, jax.numpy as jnp
assert jax.default_backend() in ('tpu', 'axon'), jax.default_backend()
print('probe ok:', float(jnp.ones((8, 128)).sum()))
" 2>&1 | grep -q "probe ok: 1024"; then
        echo "[wait_for_chip] chip is back $(date +%H:%M:%S) — running: ${CMD[*]}"
        exec "${CMD[@]}"
    fi
    sleep 120
done
