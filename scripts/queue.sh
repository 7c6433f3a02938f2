#!/bin/bash
# Sequential chip-bench queue runner (one chip, one process).
#
# Usage: scripts/queue.sh <name> [wait_pid]
#   Runs the commands in scripts/queues/<name>.txt one per line, in order.
#   Lines starting with '#' are comments; blank lines are skipped.
#   Each line may carry env assignments (VAR=val ... cmd) and should wrap
#   long runs in `timeout N`.
#   Touch .queue_stop_<name> in the repo root to stop between items.
#   [wait_pid]: block until that pid exits before starting (chaining).
#
# Logs go to logs/queue_<name>.log (append) when run via nohup, e.g.:
#   nohup scripts/queue.sh r3a > logs/queue_r3a.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
REPO=$PWD
export PYTHONPATH=$PWD:/root/.axon_site
export JAX_PLATFORMS=axon

NAME=${1:?usage: queue.sh <name> [wait_pid]}
LIST="$REPO/scripts/queues/$NAME.txt"
[ -f "$LIST" ] || { echo "no such queue: $LIST" >&2; exit 1; }

if [ -n "${2:-}" ]; then
  echo "=== waiting for pid $2 $(date) ==="
  while kill -0 "$2" 2>/dev/null; do sleep 10; done
fi

i=0
while IFS= read -r line || [ -n "$line" ]; do
  case "$line" in ''|'#'*) continue;; esac
  i=$((i + 1))
  if [ -e "$REPO/.queue_stop_$NAME" ]; then
    echo "=== STOPPED by .queue_stop_$NAME $(date) ==="
    exit 0
  fi
  echo "=== [$NAME-$i] $line $(date) ==="
  bash -c "$line"
  echo "=== [$NAME-$i] rc=$? $(date) ==="
done < "$LIST"
echo "=== queue_$NAME done $(date) ==="
