#!/bin/bash
# Stage-2 rebalanced round-5 queue: waits for the in-flight parity task
# (PID $1) to finish, then runs cheaper high-value rows first (the two
# red return-parity seeds), then the dexterous/SDF evidence runs.
set -u
cd /root/repo
WAIT_PID=${1:-}
if [ -n "$WAIT_PID" ]; then
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 5; done
fi
DEADLINE=$(( ${2:-$(( $(date +%s) + 2100 ))} ))

run() { # name time_budget [max_epochs] [seed]
  local name=$1 tb=$2 cap=${3:-} seed=${4:-}
  local now rem; now=$(date +%s); rem=$(( DEADLINE - now ))
  if [ "$rem" -lt 100 ]; then echo "QUEUE2: deadline, skip $name"; return; fi
  if [ "$tb" -gt $(( rem - 50 )) ]; then tb=$(( rem - 50 )); fi
  echo "QUEUE2: $name tb=${tb}s rem=${rem}s"
  env PARITY_TASKS="$name" PARITY_TIME_BUDGET="$tb" \
    ${cap:+PARITY_MAX_EPOCHS=$cap} ${seed:+PARITY_SEED=$seed} \
    timeout $(( tb + 600 )) python parity.py \
    > "runs/r5/${name}${seed:+_s$seed}.log" 2>&1
  echo "QUEUE2: $name done rc=$? $(date +%s)"
}

run AllegroHandADR 420 1600
run BallBalance 150 750 3
run Ingenuity 220 1500 2
run AllegroHand 450 2400
run IndustRealTaskPegsInsert 400 512
run Trifinger 300 1024
echo "QUEUE2: all done $(date +%s)"
if [ $(( DEADLINE - $(date +%s) )) -gt 180 ]; then
  BENCH_TASKS=AnymalTerrain timeout $(( DEADLINE - $(date +%s) )) \
    python bench.py > runs/r5/bench_terrain2.log 2>&1
  echo "QUEUE2: terrain bench done rc=$?"
fi
run FactoryTaskNutBoltScrew 420 2048
echo "QUEUE2: tail done $(date +%s)"
