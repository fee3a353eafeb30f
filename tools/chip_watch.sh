#!/bin/bash
# Poll chip health until the tunnel recovers (matmul probe completes fast).
for i in $(seq 1 40); do
  out=$(timeout 240 python tools/chip_probe.py 2>/dev/null)
  if [ -n "$out" ]; then
    echo "[$(date +%H:%M:%S)] $out"
    tf=$(echo "$out" | grep -oP 'best \K[0-9.]+')
    # recovered if >= 10 TF/s
    if python -c "import sys; sys.exit(0 if float('$tf' or 0) >= 10 else 1)" 2>/dev/null; then
      echo RECOVERED; exit 0
    fi
  else
    echo "[$(date +%H:%M:%S)] probe timed out"
  fi
  sleep 120
done
echo NEVER_RECOVERED
