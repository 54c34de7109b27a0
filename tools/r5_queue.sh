#!/bin/bash
# Round-5 parity/evidence queue: sequential TPU training runs, each under
# a wall-clock budget (PARITY_TIME_BUDGET) so every run writes its
# PARITY.json row + curve even if the milestone isn't reached in time.
# Order = VERDICT r4 priority. A global deadline guards the round end.
set -u
cd /root/repo
mkdir -p runs/r5
DEADLINE=$(( $(date +%s) + ${QUEUE_SECONDS:-2460} ))

run() { # name time_budget [max_epochs]
  local name=$1 tb=$2 cap=${3:-}
  local now rem; now=$(date +%s); rem=$(( DEADLINE - now ))
  if [ "$rem" -lt 120 ]; then echo "QUEUE: deadline, skip $name"; return; fi
  if [ "$tb" -gt $(( rem - 60 )) ]; then tb=$(( rem - 60 )); fi
  echo "QUEUE: $name tb=${tb}s cap=${cap:-default} rem=${rem}s"
  PARITY_TASKS="$name" PARITY_TIME_BUDGET="$tb" \
    ${cap:+PARITY_MAX_EPOCHS=$cap} \
    timeout $(( tb + 420 )) python parity.py \
    > "runs/r5/${name}.log" 2>&1
  echo "QUEUE: $name done rc=$? $(date +%s)"
}

run FactoryTaskNutBoltScrew 480
run AllegroHand 720 2400
run AllegroHandADR 420 1600
run IndustRealTaskPegsInsert 450 512
run Trifinger 360 1024
run AntSAC 300 2000
run ShadowHandLSTM 300 600
echo "QUEUE: all done $(date +%s)"
