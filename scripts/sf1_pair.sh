#!/bin/bash
# Alternating base<->HEAD sf1 bench pair (SCALING.md epoch convention,
# r12 verdict item 6): runs bench.py at .tmp/sf1 in a worktree pinned
# to the epoch base commit, then at HEAD, alternating, so box drift is
# visible inside the series rather than between sessions.
# Usage: scripts/sf1_pair.sh <base_commit> <n_pairs>
set -e
BASE_COMMIT=${1:?base commit}
PAIRS=${2:-1}
REPO=/root/repo
WT=/tmp/r13_base_wt
SF1=$REPO/.tmp/sf1
[ -d "$WT" ] || git -C "$REPO" worktree add "$WT" "$BASE_COMMIT"
mkdir -p "$WT/.tmp" && ln -sfn "$SF1" "$WT/.tmp/sf1"
for i in $(seq 1 "$PAIRS"); do
  echo "== pair $i base ($BASE_COMMIT) load: $(cat /proc/loadavg | cut -d' ' -f1)"
  (cd "$WT" && SPARK_GRAFT_SF_DIR=.tmp/sf1 SPARK_GRAFT_CPUS=32 python bench.py 2>/dev/null)
  echo "== pair $i HEAD load: $(cat /proc/loadavg | cut -d' ' -f1)"
  (cd "$REPO" && SPARK_GRAFT_SF_DIR=.tmp/sf1 SPARK_GRAFT_CPUS=32 python bench.py 2>/dev/null)
done
