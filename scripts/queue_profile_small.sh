#!/bin/bash
# Profile the Small forward after the budget chase. Waits on pid $1.
cd "$(dirname "$0")/.."
export PYTHONPATH=$PWD:/root/.axon_site
export JAX_PLATFORMS=axon
if [ -n "$1" ]; then
  while kill -0 "$1" 2>/dev/null; do sleep 30; done
fi
echo "=== profile small_fwd ==="
timeout 3500 python scripts/profile_fwd.py small_fwd /tmp/prof_small_dir
echo "=== done ==="
